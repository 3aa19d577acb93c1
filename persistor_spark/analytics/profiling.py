"""Data-distribution profiling: join/agg key skew diagnostics.

Before committing to a shuffle strategy at 100 TB you measure the key
distribution: a handful of hot keys means salting (the d21 skew-salted agg)
or AQE skew-join handling; near-uniform means a plain hash shuffle is fine.
`key_skew_profile` is that measurement as ONE aggregation pass over the
per-key counts — the decision input for the salting/broadcast choices made
elsewhere in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-`top_n` hottest keys with the global distribution stats attached.

    Output: (key, n_rows, total_rows, n_keys, avg_rows, max_share,
    skew_factor, p50_rows, p99_rows) — `skew_factor` is max over mean per-key
    count (1.0 = perfectly uniform), `max_share` the hottest key's fraction
    of all rows.  Two shuffles total: the per-key count and the single-row
    stats aggregate; the top-n is a TakeOrdered, the stats row attaches via
    a broadcast single-row join (no cross product at scale).
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        # UNROUNDED (r14, the e46 class): avg-of-integers and the two
        # max-over-sum/avg quotients are bit-identical doubles
        F.avg("n_rows").alias("avg_rows"),
        (F.max("n_rows") / F.sum("n_rows")).alias("max_share"),
        (F.max("n_rows") / F.avg("n_rows")).alias("skew_factor"),
        F.round(F.percentile("n_rows", F.lit(0.5)), 4).alias("p50_rows"),
        F.round(F.percentile("n_rows", F.lit(0.99)), 4).alias("p99_rows"),
    ).withColumn("j", F.lit(1))
    top = counts.orderBy(F.desc("n_rows"), "key").limit(top_n).withColumn("j", F.lit(1))
    return (
        top.join(F.broadcast(stats), "j")
        .drop("j")
        .orderBy(F.desc("n_rows"), "key")
    )


def dataset_card(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row dataset summary (the "dataset card" numbers): doc/source/
    lang counts, exact-dup rate via distinct text fingerprints, token
    volume, and the quality-gate pass rate.  One aggregation over one scan
    plus the count-distinct expansions — no per-metric rescans."""
    from persistor_spark.analytics.text import gopher_flags, token_count

    flags = gopher_flags(df, text_col).withColumn("fp", F.md5(F.lower(F.col(text_col))))
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("fp").alias("n_distinct_texts"),
        # UNROUNDED integer quotients (r14, the e46 class)
        (
            (F.count(F.lit(1)) - F.countDistinct("fp")).cast("double")
            / F.count(F.lit(1))
        ).alias("dup_rate"),
        F.sum(token_count(text_col)).alias("total_tokens"),
        F.avg(token_count(text_col)).alias("avg_tokens"),
        (
            F.count(F.when(F.col("keep"), 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("quality_pass_rate"),
    )


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-version diff: per-id status across two snapshots — 'added'
    (only in new), 'removed' (only in old), 'changed' (both, different
    content fingerprint), 'unchanged'.  The audit between two builds of a
    corpus before retraining: what moved, and how much.

    One full-outer join on the id keyed by content md5 on each side; at
    scale both snapshots bucket by id so the join co-locates.  Row-level
    output (id, status) — counts are a groupBy away."""
    # presence is tracked by explicit markers: md5(NULL) is NULL, so
    # driving added/removed off fingerprint nullability would misclassify
    # any row whose text is NULL as absent from its own snapshot
    o = old_df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("old_fp"),
        F.lit(1).alias("__in_old"),
    )
    n = new_df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("new_fp"),
        F.lit(1).alias("__in_new"),
    )
    return (
        o.join(n, "id", "full_outer")
        .select(
            "id",
            F.when(F.col("__in_old").isNull(), F.lit("added"))
            .when(F.col("__in_new").isNull(), F.lit("removed"))
            .when(
                ~(F.col("old_fp").eqNullSafe(F.col("new_fp"))), F.lit("changed")
            )
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .orderBy("id")
    )


def market_basket_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
) -> DataFrame:
    """Association rules over (basket, item) rows: for every unordered
    item pair co-occurring in >= `min_pair_count` baskets, the support,
    both directional confidences, and the lift — the classic a-priori
    first stage (pairs only; higher-order itemsets compose by re-joining
    the survivors, which the min-count threshold keeps sparse).

    Scale shape: one distinct on (basket, item), a basket-keyed self-join
    whose fan-out is bounded by basket size (a TPC-H order holds a
    handful of parts — never a corpus-wide quadratic), and item-pair /
    item aggregations that combine map-side.  The scalar basket count
    rides in as a literal (one count job), not a cross join."""
    it = items.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = it.select("bk").distinct().count()
    item_n = it.groupBy(F.col("item").alias("i")).agg(
        F.count(F.lit(1)).alias("n_i")
    )
    pairs = (
        it.alias("x")
        .join(it.alias("y"), "bk")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(
            F.col("x.item").alias("p1"), F.col("y.item").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= F.lit(min_pair_count))
    )
    return (
        pairs.join(F.broadcast(item_n.select(F.col("i").alias("p1"), F.col("n_i").alias("n1"))), "p1")
        .join(F.broadcast(item_n.select(F.col("i").alias("p2"), F.col("n_i").alias("n2"))), "p2")
        .select(
            "p1",
            "p2",
            "pair_n",
            # UNROUNDED integer quotients (r14, the e46 class)
            (F.col("pair_n") / F.lit(float(n_baskets))).alias("support"),
            (F.col("pair_n").cast("double") / F.col("n1")).alias("conf_1_2"),
            (F.col("pair_n").cast("double") / F.col("n2")).alias("conf_2_1"),
            (
                F.col("pair_n") * F.lit(float(n_baskets)) / (F.col("n1") * F.col("n2"))
            ).alias("lift"),
        )
    )


def column_stats_drift(
    df: DataFrame,
    split_col: str,
    numeric_cols: list,
) -> DataFrame:
    """Per-column statistics drift between two halves of a table (the
    split column must yield exactly the labels 'a' and 'b'): count /
    null-count / min / max / mean for each half, side by side with the
    mean delta — the schema-on-read data-quality check that catches a
    broken upstream (nulls spiking, a value domain shifting) BEFORE the
    bad batch lands in training data.

    One narrow explode to long format (column, value, half) + ONE
    bounded agg (key space = columns x 2), so the pass costs a single
    corpus scan no matter how many columns are profiled.  min/max/counts
    are exact; means are rounded to 4 (float-sum tolerance discipline)."""
    longf = df.select(
        F.col(split_col).alias("half"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"), F.col(c).cast("double").alias("v")
                )
                for c in numeric_cols
            ])
        ).alias("s"),
    ).select("half", F.col("s.column").alias("column"), F.col("s.v").alias("v"))
    per = longf.groupBy("column", "half").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("nulls"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.round(F.avg("v"), 4).alias("vavg"),
    )
    a = per.filter(F.col("half") == "a").select(
        "column",
        F.col("n").alias("n_a"),
        F.col("nulls").alias("nulls_a"),
        F.col("vmin").alias("min_a"),
        F.col("vmax").alias("max_a"),
        F.col("vavg").alias("avg_a"),
    )
    b = per.filter(F.col("half") == "b").select(
        "column",
        F.col("n").alias("n_b"),
        F.col("nulls").alias("nulls_b"),
        F.col("vmin").alias("min_b"),
        F.col("vmax").alias("max_b"),
        F.col("vavg").alias("avg_b"),
    )
    return (
        a.join(b, "column", "full_outer")
        .withColumn("avg_delta", F.round(F.col("avg_b") - F.col("avg_a"), 4))
        .orderBy("column")
    )


def psi_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population-stability-index drift per group vs the whole-corpus
    reference: PSI = sum_buckets (p_g - p_ref) * ln(p_g / p_ref) over the
    REFERENCE's quantile buckets (the standard scorecard-monitoring
    formulation — buckets equalized on the reference so each holds ~1/k
    of it).  PSI < 0.1 reads "stable", 0.1-0.25 "shifting", > 0.25
    "population changed" — the per-source drift alarm for a feed.

    Scale shape: the k-1 bucket edges are ONE exact-percentile aggregate
    (a single row, broadcast back via crossJoin), bucket assignment is a
    narrow expression over the edge array, and everything downstream of
    the single (groups x k)-bounded count table derives FROM that table
    (ref counts = per-bucket sums, reference total = one collected scalar)
    — exactly TWO corpus scans total (edges + counts), no matter how the
    plan fans out.  Zero-probability buckets are clamped to 1e-6 (the
    conventional PSI epsilon) so the log stays finite."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = df.agg(
        F.percentile(F.col(value_col).cast("double"), F.array(*[F.lit(q) for q in qs])).alias(
            "__edges"
        )
    )
    bucketed = df.crossJoin(F.broadcast(edges)).select(
        F.col(group_col).alias("grp"),
        F.aggregate(
            "__edges",
            F.lit(0),
            lambda acc, e: acc
            + F.when(F.col(value_col).cast("double") > e, 1).otherwise(0),
        ).alias("bucket"),
    )
    per = bucketed.groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("n_g"))
    # groups x k rows: safe (and cheap) to pin, so the ref/tot/grid
    # consumers below don't each re-instantiate the corpus-scan subtree
    per = per.localCheckpoint()
    ref = per.groupBy("bucket").agg(F.sum("n_g").alias("n_ref"))
    ref_tot = per.agg(F.sum("n_g")).first()[0]
    tot = per.groupBy("grp").agg(F.sum("n_g").alias("tot_g"))
    if not ref_tot:
        # empty (or all-NULL) input: no reference distribution to drift
        # from — return an empty, correctly-typed result instead of
        # dividing by a None total
        return tot.select(
            F.col("grp").alias(group_col),
            F.lit(None).cast("double").alias("psi"),
        ).filter(F.lit(False))
    # densify to the full groups x buckets grid (bounded, tiny) so EVERY
    # bucket contributes its own (eps-clamped) term — lumping the missing
    # buckets would mis-state PSI because p_ref varies per bucket
    spark = df.sparkSession
    # crossjoin-ok: 1-row totals x n_buckets literal range — bounded grid densify
    grid = tot.crossJoin(
        spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    )
    eps = 1e-6
    joined = (
        grid.join(per, ["grp", "bucket"], "left")
        .join(ref, "bucket", "left")
        .select(
            "grp",
            F.greatest(
                F.coalesce(F.col("n_g"), F.lit(0)) / F.col("tot_g"), F.lit(eps)
            ).alias("p_g"),
            F.greatest(
                F.coalesce(F.col("n_ref"), F.lit(0)) / F.lit(float(ref_tot)),
                F.lit(eps),
            ).alias("p_ref"),
        )
    )
    return (
        joined.groupBy("grp")
        .agg(
            F.round(
                F.sum(
                    (F.col("p_g") - F.col("p_ref"))
                    * F.log(F.col("p_g") / F.col("p_ref"))
                ),
                4,
            ).alias("psi")
        )
        .select(F.col("grp").alias(group_col), "psi")
        .orderBy(group_col)
    )


def ks_two_sample_pairs(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance for EVERY pair of groups:
    D = max_x |ECDF_a(x) - ECDF_b(x)| — the nonparametric "did this
    metric's distribution shift between segments" test (segments = event
    types, crawl snapshots, sources...).

    Shape: group the values first (per (group, v) counts — tie-safe ECDF
    at distinct support points), build the bounded group-pair list from
    the distinct groups (G(G-1)/2 rows, broadcast), then ONE ordered
    cumsum per pair over the pair's merged support.  Work tracks
    pairs x distinct-values, never |df|^2."""
    from pyspark.sql import Window

    counts = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sizes = counts.groupBy("g").agg(F.sum("n").alias("tot"))
    # pair list built from the sizes frame itself (self-join on g < g), so
    # the group column keeps ITS OWN dtype — the old literal pair list
    # hardcoded strings and silently miscompared or failed on e.g. int
    # segment ids (r9 advisor); NULL groups drop symmetrically (no pair).
    # Still G(G-1)/2 rows, still broadcast, no driver collect at all.
    gs = sizes.select("g")
    pairs_df = (
        gs.alias("pa")
        .join(gs.alias("pb"), F.col("pa.g") < F.col("pb.g"))
        .select(F.col("pa.g").alias("ga"), F.col("pb.g").alias("gb"))
    )
    # each (group, v) row joins into every pair that group belongs to
    sided = counts.join(
        F.broadcast(pairs_df),
        (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb")),
    ).select(
        "ga",
        "gb",
        "v",
        F.when(F.col("g") == F.col("ga"), F.col("n")).otherwise(0).alias("na"),
        F.when(F.col("g") == F.col("gb"), F.col("n")).otherwise(0).alias("nb"),
    )
    per_v = sided.groupBy("ga", "gb", "v").agg(
        F.sum("na").alias("na"), F.sum("nb").alias("nb")
    )
    w = Window.partitionBy("ga", "gb").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "ga",
        "gb",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    tot_a = sizes.select(F.col("g").alias("ga"), F.col("tot").alias("tot_a"))
    tot_b = sizes.select(F.col("g").alias("gb"), F.col("tot").alias("tot_b"))
    return (
        cum.join(F.broadcast(tot_a), "ga")
        .join(F.broadcast(tot_b), "gb")
        .groupBy("ga", "gb")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("tot_a") - F.col("cb") / F.col("tot_b")
                    )
                ),
                4,
            ).alias("ks_stat"),
            F.first("tot_a").cast("long").alias("n_a"),
            F.first("tot_b").cast("long").alias("n_b"),
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "ks_stat",
            "n_a",
            "n_b",
        )
        .orderBy("group_a", "group_b")
    )
