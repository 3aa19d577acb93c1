"""In-blob record positions (reference: sender.go:129,186-192; consumed
0-based at resubmitter util.go:47; single-record blobs carry NULL position and
skip deserialization, resubmitter.go:176-182).

The reference's `location_position` is the physical write order inside a blob
— unreproducible under Spark's retry/parallel writes.  Resolution (SURVEY.md
§7.3 hard point 2): make position EXPLICIT — a dense `row_number` per
location_key ordered by the deterministic `unique_id` — and materialize it in
both the blob records and the index, removing any dependence on physical file
order.  D9's position-align join validates the round trip.

Scale note: the window partitions by `location_key`, whose cardinality grows
with data volume while per-blob row counts stay bounded by the batch size
(≤5000, persistor.toml:79) — so each window partition is small and the single
shuffle is well-distributed; no global sort, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_positions(
    df: DataFrame,
    location_col: str = "location_key",
    order_col: str = "unique_id",
    null_for_singletons: bool = True,
) -> DataFrame:
    """Add `location_position` (1-based INT, dense per blob; NULL for
    single-record blobs when `null_for_singletons`, matching the reference's
    convertSingle shortcut)."""
    w = Window.partitionBy(location_col).orderBy(order_col)
    pos = F.row_number().over(w).cast("int")
    if null_for_singletons:
        # the blob-size count uses the SAME (partition, order) spec with an
        # unbounded frame — order-insensitive, so the value is unchanged,
        # but Spark then evaluates both functions in ONE Window node over
        # ONE sort (the orderless count spec forced a second Sort per
        # batch on every ingest path; r14 opt, guide §2.4)
        n = F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        pos = F.when(n > 1, pos)
    return df.withColumn("location_position", pos)


def with_blob_positions(
    df: DataFrame,
    location_col: str = "location_key",
    order_col: str = "record_id",
) -> DataFrame:
    """Blob-side `position`: always dense 1-based (blob files number every
    record; NULL-position is an index-side convention only — FIXTURES.md §3)."""
    w = Window.partitionBy(location_col).orderBy(order_col)
    return df.withColumn("position", F.row_number().over(w).cast("int"))
