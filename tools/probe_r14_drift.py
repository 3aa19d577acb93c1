"""r14 drift adjudication (r13 VERDICT #4): dedup_exactsubstr's min-of-5
inflated 2.04x and window_analytics 1.58x r12->r13 while the cross-run
canary-min ratios read only cpu 1.13x / io 1.24x — beyond what the
measured host-generation slowdown explains, with zero plan-skeleton
drift.  Same protocol as tools/probe_r13_drift.py: run this script once
per code tree (the r12 checkout 9e48c38 in a pinned worktree, and this
repo), alternating invocations A/B/A/B so slow host drift cancels across
batches; each invocation discards 2 JIT warm-up repeats then times N
repeats of each line.  Neither line needs the ingest/ANN prerequisites —
both read only the fixture tables — so the probe stands up nothing.

Usage: python tools/probe_r14_drift.py <tree> [repeats]
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

spark = build_session("drift-ab-r14")
wd = tempfile.mkdtemp(prefix="drift_ab14_")
ctx = bench.Ctx(spark, wd)

for line in ("dedup_exactsubstr", "window_analytics"):
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
