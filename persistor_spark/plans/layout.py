"""Physical-layout strategies for the index and blob tables at scale.

The reference's layout tuning is Mongo's _id index; a Spark deployment has
richer levers (SURVEY §4.2):

- partitioned writes (plans.ingest.write_blobs) -> partition pruning;
- sorted-by-unique_id parquet (write_index optimize_layout) -> row-group
  min/max pruning for point lookups;
- BUCKETED tables (this module) -> shuffle-free joins for the hot join keys
  (index ⨝ blob on location_key; replay id-sets ⨝ index on unique_id).

Bucketing pre-shuffles ONCE at write time: both sides of a join bucketed by
the same key into the same bucket count join with NO Exchange — at 100 TB
that converts the resubmit join's dominant cost into a map-side zip.
Verified by the no-Exchange plan assertion in tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.  Managed
    is required — Spark tracks bucketing metadata in the catalog, not in
    parquet files."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key (no shuffle).

    The merge hint keeps the planner on sort-merge: for table sizes under the
    broadcast threshold it would otherwise pick a broadcast join and skip the
    bucket layout entirely (fine at small scale — but this function exists to
    exercise the big-table path)."""
    left = spark.table(left_table).hint("merge")
    return left.join(spark.table(right_table).hint("merge"), on, how)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> int:
    """Rewrite a parquet table into ~target-sized files (the small-files
    problem: streaming foreachBatch appends one file per partition per
    micro-batch; a day of 30s triggers is ~2880 files per partition, and
    open/footer costs dominate scans).  Returns the new file count.

    Rewrite is atomic-by-rename at the directory level: write to a temp dir,
    then swap.  On object stores use a manifest/Delta instead; locally the
    rename is safe."""
    import math
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    out = df.repartition(n_files)
    if sort_col:
        out = out.sortWithinPartitions(sort_col)
    out.write.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan repartitions data across the cluster.
    Broadcast exchanges don't count — they replicate a small side, which is
    the cheap kind; the scale hazard is `Exchange hashpartitioning`."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan


def write_minmax_manifest(
    spark: SparkSession, table_path: str, manifest_path: str, col: str = "unique_id"
) -> int:
    """Iceberg-lite file manifest: one row per parquet data file with the
    min/max of `col` (+ row count).  A point/IN-list lookup then consults
    the manifest (ONE small file) and opens only the matching data files —
    at 100 TB the table's file listing is ~10^6 entries and dominates
    point-lookup latency (the sf1 probe in ARCHITECTURE.md §6 already shows
    it at sf-local scale); the manifest turns that into metadata the way
    Iceberg/Delta manifests do.  Returns the number of files manifested.

    Rebuild after each layout rewrite/compaction; streaming appends would
    instead append manifest rows per commit (the Delta transaction-log
    shape)."""
    from pyspark.sql import functions as F

    mf = (
        spark.read.parquet(table_path)
        .groupBy(F.col("_metadata.file_path").alias("file"))
        .agg(
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    mf.coalesce(1).write.mode("overwrite").parquet(manifest_path)
    return spark.read.parquet(manifest_path).count()


def manifest_pruned_scan(
    spark: SparkSession,
    table_path: str,
    manifest_path: str,
    values,
    col: str = "unique_id",
) -> DataFrame:
    """Scan only the data files whose [min_v, max_v] range can contain one
    of `values`; equivalent to reading the whole table with an isin filter
    (row-group pruning still applies within each opened file).  The manifest
    filter runs distributed; only the surviving file PATHS (a handful for
    point/IN-list lookups) are collected."""
    import functools

    from pyspark.sql import functions as F

    values = list(values)
    mf = spark.read.parquet(manifest_path)
    keep = functools.reduce(
        lambda a, b: a | b,
        [(F.lit(v) >= F.col("min_v")) & (F.lit(v) <= F.col("max_v")) for v in values],
    )
    files = [r["file"] for r in mf.filter(keep).select("file").collect()]
    if not files:
        # miss: preserve schema via an empty scan of the table
        return spark.read.parquet(table_path).filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(col).isin(values))


def load_manifest(spark: SparkSession, manifest_path: str) -> list:
    """Collect the manifest rows driver-side: [(file, min_v, max_v, n_rows)].
    The manifest is metadata — file-count-sized, not data-sized — and a
    serving layer holds it resident exactly like Mongo holds its _id index;
    re-reading it per lookup costs a Spark job per query."""
    return [
        (r["file"], r["min_v"], r["max_v"], r["n_rows"])
        for r in spark.read.parquet(manifest_path).collect()
    ]


def manifest_pruned_scan_cached(
    spark: SparkSession,
    table_path: str,
    manifest_rows: list,
    values,
    col: str = "unique_id",
) -> DataFrame:
    """manifest_pruned_scan against a preloaded manifest: the file pruning
    is a pure driver-side range check (microseconds), so a point lookup is
    ONE Spark job over the single matching file."""
    from pyspark.sql import functions as F

    values = list(values)
    files = [
        f
        for f, lo, hi, _ in manifest_rows
        if any(lo <= v <= hi for v in values)
    ]
    if not files:
        return spark.read.parquet(table_path).filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(col).isin(values))
