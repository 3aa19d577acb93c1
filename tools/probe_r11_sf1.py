"""r11 probe (r10 VERDICT #5): the NEXT tier of expensive bench lines at
10x the bench SF — graph_pagerank, dedup_minhash, index_compaction,
ann_ivfpq_probe, bm25_search — same harness as tools/probe_r10_sf1.py
(whose stage_sf1 is reused verbatim): sf0.1 fixtures replicated 10x with
distinct ids/times into a staged sf1 dir, run through the UNCHANGED bench
functions by repointing SPARK_GRAFT_SF_DIR, one warm session.

One measurement per (line, scale) — a slope probe, not a median benchmark;
pair with BENCH_r11's medians.  pagerank's old probe showed 7x at 10x
edges (ARCHITECTURE §6, r6-era code); this re-measures it on the current
node-bounded broadcast-rank implementation."""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import probe_r10_sf1 as harness

harness.LINES = [
    "graph_pagerank",
    "dedup_minhash",
    "index_compaction",
    "ann_ivfpq_probe",
    "bm25_search",
]
SRC = harness.SRC

if __name__ == "__main__":
    # warm-up pass: plan/JIT/page-cache warm-up otherwise inflates the
    # sf0.1 baselines and flatters every ratio (see probe_r10_sf1)
    _, spark = harness.run_lines(SRC)
    print("-- warm-up done; timed passes follow --", flush=True)
    base, spark = harness.run_lines(SRC, spark)
    dest = tempfile.mkdtemp(prefix="persistor-sf1-") + "/sf1"
    print("staging 10x fixtures ->", dest, flush=True)
    harness.stage_sf1(spark, dest)
    big, spark = harness.run_lines(dest, spark)
    print(json.dumps({
        "sf0.1": base,
        "sf1": big,
        "ratio": {k: round(big[k] / base[k], 2) for k in base},
    }))
    shutil.rmtree(os.path.dirname(dest), ignore_errors=True)
    spark.stop()
