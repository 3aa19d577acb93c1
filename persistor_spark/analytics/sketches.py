"""Distributed frequency sketches (count-min) as plain DataFrame aggregates.

A count-min sketch (Cormode & Muthukrishnan 2005) summarizes item
frequencies in a depth x width counter grid: row r counts items by
hash_r(item) % width; the estimate is the MIN over rows, an upper-biased
approximation with error <= 2N/width at probability 1 - 2^-depth.

Spark-first shape: building the sketch is ONE groupBy over (row, bucket) —
a shuffle of at most depth*width distinct keys regardless of corpus size,
which is why the sketch (not the exact count) is what a 100 TB profiling
pass ships back to the driver.  Merging sketches from different partitions/
days is the SAME groupBy-sum (counters are additive), so incremental
maintenance is free.  Estimation joins the (small, broadcastable) sketch to
the probe items.

Hashes default to the md5-derived 60-bit family (seeded per row by prefix),
computable identically in DuckDB — the a21 oracle checks the ENTIRE counter
grid cell by cell, not just point estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from persistor_spark.analytics.dedup import md5_hash64


def _row_hash(col: Column, row: int, width: int) -> Column:
    # per-row hash family: seed folded in as a string prefix (portable to
    # DuckDB: md5(concat(r, ':', item)))
    return F.pmod(md5_hash64(F.concat(F.lit(f"{row}:"), col)), F.lit(width))


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row INT, bucket INT, cnt LONG), one output row per
    NON-EMPTY counter cell (cells absent from the result are zero)."""
    item = F.col(item_col)
    cells = df.select(
        F.posexplode(
            F.array(*[_row_hash(item, r, width) for r in range(depth)])
        ).alias("row", "bucket"),
        *( [F.col(weight_col).alias("__w")] if weight_col else [] ),
    )
    agg = (
        cells.groupBy("row", "bucket").agg(F.sum("__w").alias("cnt"))
        if weight_col
        else cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return agg.select(
        F.col("row").cast("int"), F.col("bucket").cast("int"), F.col("cnt").cast("long")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate frequencies for `items[item_col]` against a sketch:
    min over the depth rows (missing cells = 0).  The sketch is tiny
    (<= depth*width rows) — broadcast it; the probe never shuffles."""
    probes = items.select(F.col(item_col).alias("item")).distinct()
    cells = probes.select(
        "item",
        F.posexplode(
            F.array(*[_row_hash(F.col("item"), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = cells.join(
        F.broadcast(sketch), ["row", "bucket"], "left"
    ).withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    return (
        joined.groupBy("item")
        .agg(F.min("cnt").alias("estimate"))
        .select("item", F.col("estimate").cast("long"))
    )


def merge_sketches(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter grids are additive — merging partial sketches (per-day,
    per-partition, per-stream-epoch) is a groupBy-sum."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
