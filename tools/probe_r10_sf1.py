"""r10 probe (r9 VERDICT #5): the five most expensive bench lines at 10x
the bench SF (sf0.1 fixtures replicated 10x with distinct ids/times into a
staged sf1 dir), run through the UNCHANGED bench functions by repointing
SPARK_GRAFT_SF_DIR.  One measurement per (line, scale) — this is a slope
probe, not a median benchmark; pair it with BENCH_r10's medians.

Prints one line per bench line: sf0.1 seconds, sf1 seconds, ratio (10x
data at ratio <= ~10 = at-worst-linear; receiver/stream lines carry fixed
per-batch scheduling overhead, so sublinear ratios are expected there)."""
import importlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

LINES = [
    "ingest_persist",
    "stream_ingest",
    "ann_ivfpq_build",
    "dedup_dhash",
    "receiver_ingest",
]
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_sf1(spark, dest: str) -> None:
    """10x replicas with distinct ids; events get +r days so delivery
    order and window buckets stay deterministic, embeddings get a tiny
    direction-preserving scale so k-means isn't fed 10 exact copies."""
    from pyspark.sql import functions as F

    from persistor_spark.sources.registry import load_table

    os.makedirs(dest, exist_ok=True)
    ev = load_table(spark, SRC, "events")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    for r in range(10):
        (
            ev.select(
                (F.col("event_id") + F.lit(r * n_ev)).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {r} DAYS")).alias("ts"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
            .write.mode("append")
            .parquet(f"{dest}/events.parquet")
        )
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_d = docs.agg(F.max("doc_id")).first()[0] + 1
    for r in range(10):
        (
            docs.select(
                (F.col("doc_id") + F.lit(r * n_d)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            .write.mode("append")
            .parquet(f"{dest}/documents.parquet")
        )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_e = emb.agg(F.max("vec_id")).first()[0] + 1
    for r in range(10):
        (
            emb.select(
                (F.col("vec_id") + F.lit(r * n_e)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x * (1.0 + r * 1e-5)
                ).alias("embedding"),
                "label",
            )
            .write.mode("append")
            .parquet(f"{dest}/embeddings.parquet")
        )


def run_lines(sf_dir: str, spark=None) -> dict:
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    import bench

    importlib.reload(bench)
    if spark is None:
        spark = bench.build_session(f"probe-sf1")
        spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    workdir = tempfile.mkdtemp(prefix="probe-sf1-")
    ctx = bench.Ctx(spark, workdir)
    bench.load_table(spark, sf_dir, "events").count()
    out = {}
    try:
        for name in LINES:
            fn = bench.QUERIES[name]
            t0 = time.time()
            ret = fn(ctx)
            out[name] = round(
                ret if getattr(fn, "self_timed", False) else time.time() - t0, 2
            )
            print(f"  {name} @ {sf_dir}: {out[name]}s", flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return out, spark


if __name__ == "__main__":
    # warm-up pass: plan/JIT/page-cache warm-up otherwise inflates the
    # sf0.1 baselines (first cold run measured ingest_persist at 9.1 s vs
    # its 3.4 s bench median) and flatters every ratio
    _, spark = run_lines(SRC)
    print("-- warm-up done; timed passes follow --", flush=True)
    base, spark = run_lines(SRC, spark)
    dest = tempfile.mkdtemp(prefix="persistor-sf1-") + "/sf1"
    print("staging 10x fixtures ->", dest, flush=True)
    stage_sf1(spark, dest)
    big, spark = run_lines(dest, spark)
    print(json.dumps({
        "sf0.1": base,
        "sf1": big,
        "ratio": {k: round(big[k] / base[k], 2) for k in base},
    }))
    shutil.rmtree(os.path.dirname(dest), ignore_errors=True)
    spark.stop()
