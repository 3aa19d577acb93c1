"""Blob-store readers for the resubmit path (reference S4/S5 fetchers +
R5 parallel fetch; SURVEY.md §3.3).

The reference fetches whole blobs one goroutine per blob and decodes Avro in
2 packaging workers (resubmitter.go:39-49).  Spark replaces all of that with
one distributed scan:

- the blob table is directory-partitioned by the mask columns, so a replay
  constrained to a time range / version touches only those directories
  (partition pruning — the reference always fetches whole blobs);
- `location_key` and `position` are materialized columns (SURVEY.md §7.3
  hard points 2-3), so no dependence on physical file names or row order —
  reading back is a plain scan + the position-align join.

`positions_from_files` exists for FOREIGN blob dirs (written by the Go
reference itself, without a position column): it reconstructs 1-based
positions from physical row order per file via input_file_name().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_blob_records(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read back a blob table written by plans.ingest.write_blobs.  The
    engine's own layout carries location_key + position columns; nothing to
    reconstruct."""
    return spark.read.format(fmt).load(path)


def positions_from_files(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """Reconstruct in-blob positions for a foreign blob directory: one blob ==
    one file, position == physical row order (the reference's write order,
    sender.go:186-192).

    Row order within a file is preserved by Spark's per-file readers when a
    file isn't split; for OCF avro blobs of <= BatchSize records that holds.
    `order_col` overrides with an explicit ordering when one exists.
    """
    with_file = df.withColumn("location_key", F.input_file_name())
    if order_col:
        w = Window.partitionBy("location_key").orderBy(order_col)
    else:
        w = Window.partitionBy("location_key").orderBy(F.monotonically_increasing_id())
    return with_file.withColumn("position", F.row_number().over(w).cast("int"))


def prune_to_locations(blobs: DataFrame, metadata: DataFrame) -> DataFrame:
    """Restrict a blob scan to the locations a replay actually touches —
    a broadcast semi-join on location_key (the Spark analogue of R4's
    group-by + per-blob fetch: only referenced blobs are read)."""
    locs = metadata.select("location_key").distinct()
    return blobs.join(F.broadcast(locs), "location_key", "left_semi")
