"""Generic interleaved A/B line prober (r14 optimization round).

Same protocol as tools/probe_r14_drift.py but parameterized: run this
script once per code tree, alternating invocations A/B/A/B so slow host
drift cancels across batches; each invocation discards warm-up repeats
then times N repeats of each requested line IN BENCH ORDER (so lines with
ctx dependencies — e.g. resubmit_join needs ingest_persist +
index_layout — can be requested together).

Usage: python tools/probe_r14_ab.py <tree> <line,line,...> [repeats] [warmups]
"""

from __future__ import annotations

import importlib.util
import sys
import tempfile
import time

TREE = sys.argv[1]
LINES = sys.argv[2].split(",")
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4
WARM = int(sys.argv[4]) if len(sys.argv) > 4 else 2

sys.path.insert(0, TREE)

spec = importlib.util.spec_from_file_location("bench_ab", f"{TREE}/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from persistor_spark.session import build_session  # noqa: E402

spark = build_session("ab-r14")
wd = tempfile.mkdtemp(prefix="ab14_")
ctx = bench.Ctx(spark, wd)

for line in LINES:
    fn = getattr(bench, f"bench_{line}")
    xs = []
    for i in range(N + WARM):
        t0 = time.time()
        ret = fn(ctx)
        dt = ret if getattr(fn, "self_timed", False) else time.time() - t0
        if i >= WARM:
            xs.append(round(dt, 3))
    s = sorted(xs)
    med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    print(f"AB {TREE} {line}: median {med:.3f} min {min(xs):.3f} runs {xs}")

spark.stop()
