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


def stage_orders_lineitem(spark, dest: str) -> None:
    """graph_pagerank reads orders+lineitem (the r10 harness stages only
    events/documents/embeddings).  10 replicas with DISJOINT order,
    customer, and supplier keys -> 10 disconnected copies of the purchase
    graph = genuinely 10x nodes AND 10x edges (shifting only orderkey
    would collapse the replicas onto the same (cust, supp) pairs and the
    distinct would dedup them away)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    n_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    n_c = orders.agg(F.max("o_custkey")).first()[0] + 1
    n_s = li.agg(F.max("l_suppkey")).first()[0] + 1
    for r in range(10):
        (
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * n_o))
            .withColumn("o_custkey", F.col("o_custkey") + F.lit(r * n_c))
            .write.mode("append")
            .parquet(f"{dest}/orders.parquet")
        )
        (
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * n_o))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(r * n_s))
            .write.mode("append")
            .parquet(f"{dest}/lineitem.parquet")
        )

if __name__ == "__main__":
    # warm-up pass: plan/JIT/page-cache warm-up otherwise inflates the
    # sf0.1 baselines and flatters every ratio (see probe_r10_sf1)
    _, spark = harness.run_lines(SRC)
    print("-- warm-up done; timed passes follow --", flush=True)
    base, spark = harness.run_lines(SRC, spark)
    dest = tempfile.mkdtemp(prefix="persistor-sf1-") + "/sf1"
    print("staging 10x fixtures ->", dest, flush=True)
    harness.stage_sf1(spark, dest)
    stage_orders_lineitem(spark, dest)
    big, spark = harness.run_lines(dest, spark)
    print(json.dumps({
        "sf0.1": base,
        "sf1": big,
        "ratio": {k: round(big[k] / base[k], 2) for k in base},
    }))
    shutil.rmtree(os.path.dirname(dest), ignore_errors=True)
    spark.stop()
