"""r12 slope probe (r11 VERDICT #5): incremental vs full compaction at
10x data where the extra data is ALREADY COMPACTED.

The claim under test: `compact_small_files`' cost scales with the
small-file APPENDIX bytes, not table bytes.  The realistic 100 TB shape
is a table that grew 10x through past (compacted) history while the
between-maintenance appendix stays ingest-rate-sized — so this probe
holds the appendix FIXED (the sf0.1 odd-doc half, 40 appends) while the
compacted base grows 10x, and times:

  - index_compaction        (full rewrite: must grow ~linearly in data)
  - compact_small_files     (incremental: must stay ~flat)

Uses the r10 harness's documents staging.  One measurement per (line,
scale) after a warm-up pass — a slope probe, not a median benchmark.
"""
import importlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import probe_r10_sf1 as harness  # noqa: E402

SRC = harness.SRC


def time_compactions(spark, sf_dir: str, base_docs_pred, appendix_docs_pred):
    """Build the two fragmented layouts and time both maintenance paths.
    base_docs_pred selects the compacted-base rows (grows with SF);
    appendix_docs_pred selects the appendix rows (FIXED-size across
    scales — the ingest-rate-sized slice)."""
    from pyspark.sql import functions as F

    from persistor_spark.analytics import dedup
    from persistor_spark.plans import fsutil, maintenance
    from persistor_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    workdir = tempfile.mkdtemp(prefix="probe-r12-")
    out = {}
    try:
        # ---- full-rewrite line: bench_index_compaction's exact shape,
        # but appendix fixed to the same slice the incremental line gets
        idx_full = f"{workdir}/full"
        dedup.lsh_index_save(
            dedup.build_band_table(docs.filter(base_docs_pred)), idx_full
        )
        bt = dedup.build_band_table(
            docs.filter(appendix_docs_pred).select("doc_id", "text")
        ).localCheckpoint()
        for i in range(40):
            bt.filter(F.expr("(id div 2) % 40") == i).write.mode(
                "append"
            ).partitionBy("band").parquet(idx_full)
        t0 = time.time()
        stats = maintenance.compact_parquet(spark, idx_full, partition_col="band")
        out["index_compaction_full"] = round(time.time() - t0, 2)
        assert stats["files_after"] < stats["files_before"], stats

        # ---- incremental line: same base + appendix, appendix-only merge
        idx_inc = f"{workdir}/inc"
        dedup.lsh_index_save(
            dedup.build_band_table(docs.filter(base_docs_pred)), idx_inc
        )
        base_sizes = [
            sz for _, sz in fsutil.list_files_with_size(spark, idx_inc)
        ]
        for i in range(40):
            bt.filter(F.expr("(id div 2) % 40") == i).write.mode(
                "append"
            ).partitionBy("band").parquet(idx_inc)
        appendix = [
            sz
            for _, sz in fsutil.list_files_with_size(spark, idx_inc)
            if sz < min(base_sizes)
        ]
        thresh = (
            (min(base_sizes) + max(appendix)) // 2 if appendix else min(base_sizes)
        )
        t0 = time.time()
        stats = maintenance.compact_small_files(
            spark, idx_inc, partition_col="band", small_file_bytes=thresh
        )
        out["compact_small_files"] = round(time.time() - t0, 2)
        assert stats["files_small"] >= 40, stats
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return out


def main():
    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_SF_DIR"] = SRC
    import bench

    importlib.reload(bench)
    spark = bench.build_session("probe-r12")
    spark.sparkContext.setLogLevel("ERROR")

    n_d = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id"))
        .first()[0]
        + 1
    )
    # the FIXED appendix slice: the sf0.1 odd-doc half, identified by the
    # ORIGINAL id range so it stays the same rows at both scales
    appendix_pred = (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < n_d)
    base_pred = F.col("doc_id") % 2 == 0

    # warm-up, then timed sf0.1 pass
    time_compactions(spark, SRC, base_pred, appendix_pred)
    base = time_compactions(spark, SRC, base_pred, appendix_pred)
    print("sf0.1:", base, flush=True)

    dest = tempfile.mkdtemp(prefix="persistor-r12-sf1-") + "/sf1"
    os.makedirs(dest, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
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
    big = time_compactions(spark, dest, base_pred, appendix_pred)
    print("sf1 (10x base, fixed appendix):", big, flush=True)
    print(
        json.dumps(
            {
                "sf0.1": base,
                "sf1": big,
                "ratio": {k: round(big[k] / base[k], 2) for k in base},
            }
        )
    )
    shutil.rmtree(os.path.dirname(dest), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
