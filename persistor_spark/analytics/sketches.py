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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

def hll_registers(
    df: DataFrame, item_col: str, p: int = 8, hash_prefix: str = ""
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): (register INT,
    max_rho INT), one row per non-empty register (absent = 0).

    The 60-bit md5 hash splits into a p-bit register index (top bits) and a
    (60-p)-bit suffix w; rho = leading zeros of w + 1, computed EXACTLY in
    integers via the minimal binary string (`bin`, identical in DuckDB —
    no float log2, so the oracle matches bit for bit).  Like the count-min
    grid, the shuffle is bounded by 2^p keys regardless of corpus size —
    the sketch is what a 100 TB distinct-count profiling pass ships around,
    and `hll_merge` (register-wise MAX) is the map-side-combine contract.
    """
    return hll_registers_grouped(df, item_col, [], p, hash_prefix)


def hll_registers_grouped(
    df: DataFrame,
    item_col: str,
    group_cols: list,
    p: int = 8,
    hash_prefix: str = "",
) -> DataFrame:
    """Per-group HLL register tables — one (group..., register, max_rho)
    row set per group key, e.g. per event-time window: the shape a
    streaming distinct-count monitor ships (mergeable across partitions
    AND across groups via register-wise MAX).  Shuffle bounded by
    |groups| x 2^p rows regardless of stream volume."""
    suffix_bits = 60 - p
    df = df.filter(F.col(item_col).isNotNull())
    h = md5_hash64(F.concat(F.lit(hash_prefix), F.col(item_col).cast("string")))
    reg = F.shiftright(h, suffix_bits)
    w = h.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits) - F.length(F.bin(w)) + 1
    )
    keep = [F.col(c) for c in group_cols]
    return (
        df.select(
            *keep,
            reg.cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Registers merge by MAX — the union sketch equals the sketch of the
    union, so per-partition/per-day sketches combine losslessly."""
    return (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """Distinct-count estimate from a register table (driver-side — the
    table is <= 2^p rows by construction).  Standard bias-corrected raw
    estimate with the small-range (linear counting) correction."""
    import math

    m = 1 << p
    rows = {r["register"]: r["max_rho"] for r in registers.collect()}  # collect-ok: HLL registers, m-bounded
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    raw = alpha * m * m / sum(2.0 ** -rows.get(j, 0) for j in range(m))
    zeros = m - len(rows)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


# ---------------------------------------------------------------------------
# Bloom filter (set-membership pre-filter)
# ---------------------------------------------------------------------------

def bloom_bits(
    df: DataFrame, item_col: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """Bloom filter as a set-bit table: (bit INT), distinct positions set by
    the k md5-derived hash rows.  <= m_bits rows however large the input —
    at scale this is the broadcastable stand-in for shipping an eval/block
    set to every executor (false positives only, never false negatives;
    pair with an exact verify join downstream)."""
    item = F.col(item_col)
    return (
        df.select(
            F.explode(
                F.array(*[_row_hash(item, r, m_bits) for r in range(k)])
            ).alias("bit")
        )
        .distinct()
        .select(F.col("bit").cast("int"))
    )


def bloom_probe(
    items: DataFrame,
    bits: DataFrame,
    item_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Membership probe: adds `maybe_member` (true iff ALL k positions are
    set).  The bits table broadcasts; the probe never shuffles the corpus
    side."""
    item = F.col(item_col)
    # probe DISTINCT values and AND the per-position hits: counting
    # matched rows against k gives false negatives when the probe side
    # has duplicate values (2k matched rows != k) or when two of an
    # item's k positions collide (k-1 distinct rows) — both violating
    # the never-false-negatives contract
    probed = items.select(item_col).distinct().withColumn(
        "__bits", F.array(*[_row_hash(item, r, m_bits) for r in range(k)])
    )
    exploded = probed.select(item_col, F.explode("__bits").alias("bit"))
    hits = (
        exploded.join(F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy(item_col)
        .agg(F.min(F.col("__set").isNotNull()).alias("maybe_member"))
    )
    return items.join(hits, item_col, "left")


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Mergeable equi-width histogram sketch: (bin, n) counts over
    [lo, hi), values clamped into the edge bins.  The quantile member of
    the sketch family (CMS = frequency, HLL = distinct, Bloom =
    membership): ADDITIVE like CMS — hist(A union B) = hist(A) + hist(B)
    bin-wise — so per-partition grids combine map-side and per-day grids
    merge by summation (`merge_sketches`-style) without touching rows.

    Scale shape: one narrow map + one agg whose key space is <= n_bins
    regardless of corpus size.  Bin assignment is exact-integer-safe:
    floor((x - lo) / (hi - lo) * n_bins) computed in double is the same
    in any engine for the same doubles.

    NULL and NaN values are excluded: floor(NaN) converts to bin 0 on the
    long cast (silently dragging low quantiles down) and a NULL bin row
    would pollute merge consumers."""
    x = F.col(value_col).cast("double")
    df = df.filter(x.isNotNull() & ~F.isnan(x))
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n_bins))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    bins: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, locate the
    bin where the cumulative count crosses q*N and interpolate linearly
    inside it — percentiles WITHOUT a global sort, the sketch answer to
    `percentile_approx`.  Error is bounded by one bin width.

    The cumulative table is a triangular self-join of the <= n_bins-row
    grid (bounded by n_bins^2, never the data; no global window, so no
    SinglePartition).  All inputs are exact integer counts + literals,
    so the double arithmetic is order-independent and cross-engine
    stable."""
    spark = bins.sparkSession
    width = (hi - lo) / n_bins
    prior = bins.select(F.col("bin").alias("b2"), F.col("n").alias("n2"))
    cum = (
        bins.join(F.broadcast(prior), F.col("b2") <= F.col("bin"))
        .groupBy("bin", "n")
        .agg(F.sum("n2").alias("cum"))
        .withColumn("cum_prev", F.col("cum") - F.col("n"))
    )
    total = cum.agg(F.max("cum").alias("grand_n"))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    # target rank t = q*N; the containing bin is the one with
    # cum_prev < t <= cum.  q=0 gives t=0, which no (cum_prev, cum] interval
    # contains — the extra arm clamps it to the first POPULATED bin (the
    # unique row with cum_prev = 0), whose floor the interpolation then
    # returns (t - cum_prev = 0).
    hit = (
        qdf.crossJoin(F.broadcast(total))
        .withColumn("t", F.col("q") * F.col("grand_n"))
        .join(
            F.broadcast(cum),
            ((F.col("cum_prev") < F.col("t")) & (F.col("t") <= F.col("cum")))
            | ((F.col("t") == F.lit(0.0)) & (F.col("cum_prev") == F.lit(0))),
        )
    )
    est = (
        F.lit(float(lo))
        + (
            F.col("bin")
            + (F.col("t") - F.col("cum_prev")) / F.col("n")
        )
        * F.lit(float(width))
    )
    return hit.select("q", F.round(est, 4).alias("est")).orderBy("q")


def kmv_sketch(
    df: DataFrame,
    item_col: str,
    k: int = 64,
    group_col: str = "source",
    shards: int = 32,
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) sketch per group: the k
    smallest distinct 60-bit item hashes (Bar-Yossef 2002, Beyer 2007).
    The fourth sketch family member: HLL answers "how many distinct",
    KMV additionally supports UNION (bottom-k of merged sketches) and
    INTERSECTION/Jaccard (matching hashes in the union sketch), which
    registers cannot.

    Scale shape: distinct-hash dedup is one groupBy; the bottom-k is
    TWO-LEVEL so no partition ever holds a group's full hash set — level
    1 takes k per (group, hash mod `shards`) shard (parallelism = groups
    x shards), level 2 reduces the <= k*shards survivors per group.
    Exact equivalence to a single global bottom-k holds because the k
    smallest of a group are each the smallest of their own shard's k.
    Output: (g, h) with <= k rows per group, hashes distinct-by-build."""
    from pyspark.sql import Window

    hashes = (
        df.select(
            F.col(group_col).alias("g"), md5_hash64(F.col(item_col)).alias("h")
        )
        # NULL items hash to NULL, and ascending sort is nulls-FIRST: a
        # NULL row would steal the bottom-k's first slot in both window
        # levels and skew kmv_estimate / kmv_pair_estimates
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w1 = Window.partitionBy("g", F.pmod(F.col("h"), F.lit(shards))).orderBy("h")
    lvl1 = (
        hashes.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    w2 = Window.partitionBy("g").orderBy("h")
    return (
        lvl1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# the hash domain of md5_hash64: 60 bits of md5, values in [0, 2^60)
_KMV_DOMAIN = float(1 << 60)


def _kmv_est(n_col: Column, hk_col: Column, k: int) -> Column:
    """The KMV estimator as a Column: exact when the sketch is unsaturated
    (n < k holds every distinct hash), else (k-1)/theta with
    theta = h_k / 2^60.  Double math only — (k-1)*2^60 would overflow
    BIGINT."""
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(float(k - 1)) / (hk_col.cast("double") / F.lit(_KMV_DOMAIN))
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate from a `kmv_sketch`:
    (g, est_distinct).  One bounded agg over <= k rows per group."""
    per = sketch.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")
    )
    return per.select(
        "g", F.round(_kmv_est(F.col("n"), F.col("hk"), k), 4).alias("est_distinct")
    )


def kmv_pair_estimates(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Pairwise union / Jaccard / intersection estimates for every group
    pair (a < b) from ONE shared sketch table.

    Method (Beyer 2007): the union sketch of (a, b) is the bottom-k of
    the merged hash sets — computable from the two k-row sketches alone;
    with K = |union sketch| rows of which `m` appear in BOTH input
    sketches, jaccard_est = m/K and intersection_est = jaccard_est *
    union_est.  Everything is bounded by pairs x 2k rows: the sketches
    ARE the data, the corpus is never touched again."""
    from pyspark.sql import Window

    groups = sketch.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("a"))
        .join(groups.select(F.col("g").alias("b")), F.col("a") < F.col("b"))
    )
    # per-pair merged hash multiset -> distinct -> bottom-k union sketch
    sk_a = sketch.select(F.col("g").alias("a"), "h")
    sk_b = sketch.select(F.col("g").alias("b"), "h")
    merged = (
        pairs.join(sk_a, "a").select("a", "b", "h")
        .unionByName(pairs.join(sk_b, "b").select("a", "b", "h"))
        .distinct()
    )
    wu = Window.partitionBy("a", "b").orderBy("h")
    union_sk = (
        merged.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # membership of each union-sketch hash in both sides
    in_a = sk_a.withColumn("in_a", F.lit(1))
    in_b = sk_b.withColumn("in_b", F.lit(1))
    tagged = (
        union_sk.join(in_a, ["a", "h"], "left").join(in_b, ["b", "h"], "left")
    )
    per = tagged.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("nu"),
        F.max("h").alias("hku"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("m"),
    )
    union_est = _kmv_est(F.col("nu"), F.col("hku"), k)
    jacc = F.col("m").cast("double") / F.col("nu").cast("double")
    return per.select(
        "a",
        "b",
        F.round(union_est, 4).alias("est_union"),
        F.round(jacc, 4).alias("est_jaccard"),
        F.round(jacc * union_est, 4).alias("est_intersection"),
    )
