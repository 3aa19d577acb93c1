"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is timed end-to-end (fixture load -> plan -> action); DataFrames
are materialized via count()/collect() of bounded results, never full
collects of large outputs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark import fixtures  # noqa: E402
from persistor_spark.plans import resubmit  # noqa: E402
from persistor_spark.plans.query import IndexQuery  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf() -> float:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else -1.0


def bench_ingest_index(spark):
    """Full ingest: messages -> index_metadata materialized."""
    return fixtures.run_fixture_ingest(spark, SF_DIR).index_metadata.count()


def bench_point_lookup(spark):
    t = fixtures.run_fixture_ingest(spark, SF_DIR)
    return IndexQuery(t.index_metadata).get("b3_m000000123").count()


def bench_filter_query(spark):
    t = fixtures.run_fixture_ingest(spark, SF_DIR)
    flt = [
        {"broker_id": "b0", "ordering_key": "k4"},
        {"business_source_key": "src2", "publish_time": {"$gte": "2024-01-03T00:00:00Z"}},
    ]
    return IndexQuery(t.index_metadata).query_df(flt, ["unique_id"]).count()


def bench_position_join(spark):
    t = fixtures.run_fixture_ingest(spark, SF_DIR)
    records = resubmit.align(t.index_metadata, t.blob_records)
    return records.count()


def bench_window_topk(spark):
    from pyspark.sql import Window

    t = fixtures.run_fixture_ingest(spark, SF_DIR)
    w = Window.partitionBy("broker_id").orderBy("publish_time", "unique_id")
    return (
        t.index_metadata.filter(F.col("publish_time").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .count()
    )


def bench_lineitem_agg(spark):
    """TPC-H Q1-style pricing summary (pins the built-in agg surface)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .collect()
    )


def bench_join_agg(spark):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )


QUERIES = {
    "ingest_index": bench_ingest_index,
    "point_lookup": bench_point_lookup,
    "filter_query": bench_filter_query,
    "position_join": bench_position_join,
    "window_topk": bench_window_topk,
    "lineitem_agg": bench_lineitem_agg,
    "join_agg": bench_join_agg,
}


def main():
    spark = build_session("persistor-bench")
    # warm the JVM + file listing so per-query times reflect plan execution
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark)
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": _sf(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
