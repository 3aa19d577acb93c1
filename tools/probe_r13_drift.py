"""r13 drift adjudication (r12 VERDICT #7): window_topk read +18% and
ann_ivfpq_probe +16% r11->r12 — both under the ±20% noise floor with
zero plan-skeleton drift.  Quiet-host A/B: run this script once per code
tree (the r11 checkout and this repo), each invocation standing up the
prerequisites (index table, ANN index), discarding 2 warm-up repeats
(JIT), then timing N repeats of each line.  Alternate invocations
r11/r13/r11/r13 so slow host drift cancels across batches; compare the
pooled medians and mins.  The r12 record already hints noise:
ann_ivfpq_probe's min-of-5 moved only 0.932 -> 0.951 (+2%) while its
median moved +16%.

Usage: python tools/probe_r13_drift.py <tree> [repeats]
"""

from __future__ import annotations

import importlib.util
import sys
import tempfile
import time

TREE = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

sys.path.insert(0, TREE)

spec = importlib.util.spec_from_file_location("bench_ab", f"{TREE}/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from persistor_spark.session import build_session  # noqa: E402

spark = build_session("drift-ab")
wd = tempfile.mkdtemp(prefix="drift_ab_")
ctx = bench.Ctx(spark, wd)
bench.bench_ingest_persist(ctx)
bench.bench_index_layout(ctx)  # window_topk reads the sorted index table
bench.bench_ann_ivfpq_build(ctx)

for line in ("window_topk", "ann_ivfpq_probe"):
    fn = getattr(bench, f"bench_{line}")
    xs = []
    for i in range(N + 2):
        t0 = time.time()
        ret = fn(ctx)
        dt = ret if getattr(fn, "self_timed", False) else time.time() - t0
        if i >= 2:  # first two repeats are JIT/cache warm-up
            xs.append(round(dt, 3))
    s = sorted(xs)
    med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    print(f"DRIFT {TREE} {line}: median {med:.3f} min {min(xs):.3f} runs {xs}")

spark.stop()
