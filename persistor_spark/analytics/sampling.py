"""Deterministic sampling for training-data mixture construction.

Building a training set means hitting target PROPORTIONS per source/domain
("40% web, 30% code, ...") from pools of very different sizes.  The operators
here compute the per-stratum fractions that realize a target mix and apply
them with seeded (reproducible) Bernoulli sampling — `sampleBy` under the
hood, so at 100 TB this is a narrow scan with per-row RNG, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def mixture_fractions(
    df: DataFrame, strata_col: str, weights: dict, total_rows: int | None = None
) -> dict:
    """Per-stratum sampling fractions realizing `weights` (relative target
    proportions).  The mix is anchored on the most-constrained stratum: the
    largest achievable total is found, then each stratum samples
    target_rows/stratum_rows of its pool (capped at 1.0).
    `total_rows` overrides the anchor with an explicit budget."""
    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()}  # collect-ok: per-stratum counts, <= #strata rows
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"strata absent from data: {sorted(missing)}")
    wsum = float(sum(weights.values()))
    norm = {k: w / wsum for k, w in weights.items()}
    max_total = min(counts[k] / norm[k] for k in norm if norm[k] > 0)
    # `is not None`, not truthiness: an explicit budget of 0 means "sample
    # nothing", not "use the largest achievable mixture"
    total = min(total_rows, max_total) if total_rows is not None else max_total
    return {k: min((norm[k] * total) / counts[k], 1.0) for k in norm}


def sample_mixture(
    df: DataFrame,
    strata_col: str,
    weights: dict,
    seed: int = 42,
    total_rows: int | None = None,
) -> DataFrame:
    """Seeded stratified sample matching the target mix; strata not in
    `weights` are dropped.  Reproducible for a fixed seed + input."""
    fractions = mixture_fractions(df, strata_col, weights, total_rows)
    return df.sampleBy(strata_col, fractions, seed=seed)


def _hash_unit(col, seed: int):
    """Deterministic uniform [0,1) from md5 — portable: DuckDB computes the
    identical value via CAST(CONCAT('0x', substr(md5(...),1,15)) AS BIGINT),
    so hash-threshold sampling is exactly reproducible across engines (and
    across Spark versions, unlike rand(seed) whose stream is tied to
    partition layout)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(str(seed)), col.cast("string"))), 1, 15), 16, 10).cast("long")
    return h.cast("double") / F.lit(float(1 << 60))


def sample_mixture_hashed(
    df: DataFrame,
    strata_col: str,
    weights: dict,
    seed: int = 42,
    id_col: str = "doc_id",
    total_rows: int | None = None,
) -> DataFrame:
    """Deterministic mixture sampling: keep a row iff
    hash_unit(seed, id) < fraction(stratum).  Same mix math as
    `sample_mixture`, but membership depends ONLY on (seed, id) — never on
    partitioning or row order — so reruns, backfills, and incremental
    appends select the same rows.  That stability is what makes training-set
    builds auditable; `sampleBy`'s per-partition RNG stream cannot give it.
    A narrow scan (the fraction map is a literal CASE) — no shuffle beyond
    the driver-side stratum counts in mixture_fractions."""
    fractions = mixture_fractions(df, strata_col, weights, total_rows)
    frac = F.lit(None).cast("double")
    expr = None
    for k, v in sorted(fractions.items()):
        cond = F.col(strata_col) == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    frac = expr.otherwise(F.lit(None)) if expr is not None else frac
    return df.withColumn("_frac", frac).filter(
        F.col("_frac").isNotNull() & (_hash_unit(F.col(id_col), seed) < F.col("_frac"))
    ).drop("_frac")


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    (shard, seq_id, seq_offset) so that concatenating a shard's docs in id
    order and cutting every `budget` tokens yields the training sequences —
    the standard LLM pretraining packing (documents stream into fixed-length
    windows; a doc starts at its cumulative-token offset).

    Scale shape: shard = md5-hash(id) % n_shards spreads docs evenly and
    deterministically; within a shard the only operation is ONE window
    cumulative sum ordered by id.  Shard count bounds window partition size
    (100 TB / n_shards per partition — raise n_shards with corpus size; each
    shard's packing is independent so this parallelizes perfectly).  Output
    adds: shard, seq_id (shard-local window index), seq_offset (token
    position where the doc starts inside its window), spans (how many
    budget-windows the doc touches — docs longer than `budget` straddle)."""
    from pyspark.sql import Window

    from persistor_spark.analytics.dedup import md5_hash64

    h = md5_hash64(F.col(id_col).cast("string"))
    shard = (h % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    budget = int(budget)
    out = (
        df.withColumn("shard", shard)
        .withColumn("_cum", F.sum(token_col).over(w))
        .withColumn("_before", (F.col("_cum") - F.col(token_col)).cast("long"))
        # exact integer div (`div`), not `/`+cast: double division rounds
        # near 2^53 and a flipped boundary would desync seq_id from the
        # exactly-computed seq_offset (same rule as ntile_exact below)
        .withColumn("seq_id", F.expr(f"_before div {budget}"))
        .withColumn("seq_offset", (F.col("_before") % budget).cast("long"))
        .withColumn(
            "spans",
            F.expr(f"(_cum - 1) div {budget}") - F.col("seq_id") + 1,
        )
        .drop("_cum", "_before")
    )
    return out


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY `quota` rows per stratum (fewer only when the pool is
    smaller), chosen by ranking on the deterministic id hash — a
    distributed 'reservoir' whose selection is a pure function of
    (seed, ids present): stable across reruns and physical layout,
    unlike reservoir sampling over an arbitrary iteration order.

    Complements the fraction-based mixers: fractions hit proportions in
    expectation; quotas hit exact per-stratum counts (what a fixed-size
    eval/calibration split needs).  One window rank per stratum — the
    shuffle key is the stratum, so raise stratum cardinality, not quota,
    at scale (a single giant stratum serializes its own sort; salt or
    pre-filter if one stratum is the whole corpus).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _hash_unit(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_qrk", F.row_number().over(w))
        .filter(F.col("_qrk") <= quota)
        .drop("_qrk")
    )


def assign_splits(
    df: DataFrame,
    weights: dict | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: u = hash_unit(seed, id)
    lands each row in the cumulative-weight interval of its split.  Pure
    function of (seed, id) — stable under repartition, rerun, and
    incremental append (the same row NEVER migrates between splits), which
    is what makes held-out sets trustworthy.  Splits are exhaustive and
    disjoint by construction.  Narrow scan, zero shuffle at any scale.

    `weights` iterates in insertion order; thresholds are the running
    Python-float sums, so an oracle reproducing them must use the same
    accumulated values (repr-exact), not re-derived decimals.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    total = float(sum(weights.values()))
    u = _hash_unit(F.col(id_col), seed)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def split_thresholds(weights: dict) -> list[float]:
    """The exact cumulative thresholds assign_splits uses (running Python
    float sums) — exposed so oracles/consumers can embed repr-identical
    literals instead of re-deriving them with different rounding."""
    total = float(sum(weights.values()))
    out, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append(cum)
    return out


def temperature_mixture_weights(
    df: DataFrame,
    strata_col: str = "source",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based mixture weights over sources: w_s ∝ n_s^alpha
    (alpha=1 is proportional sampling, alpha=0 uniform; 0.2-0.5 is the
    standard low-resource up-weighting range — cf. mT5 / UniMax multilingual
    sampling).  Also reports effective_epochs = w_s·N/n_s, the number of
    passes over stratum s a sampler drawing N total examples would make —
    the over-sampling diagnostic that catches small sources being repeated
    to death.

    Scale shape: ONE count aggregation keyed by stratum (S rows out), then
    a broadcast of the 1-row total — nothing here grows with the corpus.
    """
    counts = df.groupBy(F.col(strata_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    p = counts.withColumn(
        "__w", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    tot = p.agg(
        F.sum("__w").alias("__tw"), F.sum("n_docs").cast("double").alias("__N")
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(F.col("__w") / F.col("__tw"), 6).alias("weight"),
            F.round(
                F.col("__w") / F.col("__tw") * F.col("__N") / F.col("n_docs"), 6
            ).alias("effective_epochs"),
        )
        .orderBy("source")
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data writes:
    shard = md5(seed, id) mod n_shards, position = rank of the hash within
    the shard.  Reading shards round-robin then yields a reproducible
    global random order — the shuffle-before-training step, as a pure
    function of (seed, id): stable under repartition and rerun, and
    append-only-growing (new docs land at fresh positions without moving
    old ones between shards).

    Scale shape: the shard key is a narrow hash map; the position is a
    per-shard sort (row_number windowed by shard) — the one genuinely
    expensive part of a global shuffle, but it is n/n_shards per partition,
    external-sort-friendly, and only paid when materializing the final
    training order.  No global single-partition window anywhere.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("_", F.lit(str(seed)), F.col(id_col).cast("string")))
    hb = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), h.alias("__h"), (hb % n_shards).cast("int").alias("shard"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "position")
    )


def temperature_sample(
    df: DataFrame,
    total_n: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    seed: int = 7,
) -> DataFrame:
    """Materialize a temperature mixture (temperature_mixture_weights) into
    an actual sample: per-source target = floor(weight_6dp * total_n + 1e-6),
    capped by availability, selected by per-source md5(seed,id) rank — the
    deterministic draw that turns the a47 weights into a training set.

    The weight is rounded to 6 decimals BEFORE the floor (both here and in
    any SQL twin) so the target count can never flip on a pow() ULP; the
    +1e-6 absorbs the one remaining representation gap.  Scale shape: one
    stratum count agg, a broadcast of the S-row target table, and a
    per-source rank window (partition-bounded, never global)."""
    counts = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = counts.withColumn(
        "__w", F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    )
    tot = w.agg(F.sum("__w").alias("__tw")).withColumn("__j", F.lit(1))
    targets = (
        w.withColumn("__j", F.lit(1))
        .join(F.broadcast(tot), "__j")
        .select(
            "__s",
            F.least(
                F.floor(
                    F.round(F.col("__w") / F.col("__tw"), 6) * F.lit(total_n)
                    + F.lit(1e-6)
                ).cast("long"),
                F.col("__n"),
            ).alias("__target"),
        )
    )
    ranked = df.withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy(strata_col).orderBy(
                F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col))), id_col
            )
        ),
    )
    return (
        ranked.join(F.broadcast(targets), ranked[strata_col] == F.col("__s"))
        .filter(F.col("__r") <= F.col("__target"))
        .select(id_col, strata_col, F.col("__r").alias("sample_rank"))
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Greedy corpus selection under a global token budget: take documents
    highest-score-first (ties broken by `id_col`) until the cumulative token
    count would exceed `budget_tokens` — the "fill the training mix from the
    top of the quality ranking" step.

    The global running sum is computed WITHOUT a single-partition window:
    rows are range-partitioned on (score DESC, id), per-partition token
    totals (one tiny P-row collect) become literal prefix offsets, and the
    running sum is offset + a per-partition window — every stage is bounded
    by a partition, so the same plan holds at 100 TB with P sized to the
    corpus.  The range-partitioned frame is localCheckpoint-ed so the
    offsets job and the output job see identical partition boundaries
    (RangePartitioner samples per run).  Output cumulative values are
    boundary-independent (the ordering is total), so results are
    deterministic across runs.
    """
    base = df.select(
        F.col(id_col),
        F.col(score_col).alias("score"),
        # NULL token counts cost nothing against the budget; without the
        # coalesce an all-null partition sums to NULL and the driver-side
        # offset accumulation below would TypeError
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("n_tokens"),
    )
    r = base.repartitionByRange(
        num_partitions, F.col("score").desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id())
    r = r.localCheckpoint(eager=True)
    totals = {
        row["__pid"]: row["t"]
        for row in r.groupBy("__pid").agg(F.sum("n_tokens").alias("t")).collect()  # collect-ok: per-partition token sums, P rows
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid] or 0
    # P-row broadcast join, not a chained CASE: expression depth stays O(1)
    # however many range partitions the corpus needs
    off_df = r.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __offset long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            "cum_tokens",
            (F.coalesce("__offset", F.lit(0)) + F.sum("n_tokens").over(w)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
        .select(id_col, "score", "n_tokens", "cum_tokens")
        .orderBy(id_col)
    )


def global_row_number(
    df: DataFrame,
    order_cols,
    out_col: str = "rn",
    num_partitions: int = 32,
) -> tuple[DataFrame, int]:
    """Global 1-based row_number over a total ordering WITHOUT a
    single-partition window, plus the total row count.

    Same two-level shape as `select_token_budget`: rows are range-
    partitioned on the ordering, per-partition row counts (one P-row
    collect) become literal prefix offsets broadcast-joined back, and the
    global rank is offset + a per-partition row_number.  Every stage is
    bounded by a partition, so the plan holds at 100 TB with
    `num_partitions` sized to the corpus.  The range-partitioned frame is
    localCheckpoint-ed so the counts job and the output job see identical
    partition boundaries (RangePartitioner samples per run); the output
    ranks are boundary-independent because the ordering is total.

    `order_cols` must be a total ordering (include a unique tiebreak
    column) or ranks are nondeterministic across runs.
    """
    r = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    r = r.localCheckpoint(eager=True)
    counts = {
        row["__pid"]: row["c"]
        for row in r.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()  # collect-ok: per-partition counts, P rows
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = r.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __offset long"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        r.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            out_col,
            (F.coalesce("__offset", F.lit(0)) + F.row_number().over(w)).cast(
                "long"
            ),
        )
        .drop("__pid", "__offset")
    )
    return out, acc


def ntile_exact(
    df: DataFrame,
    n: int,
    order_cols,
    out_col: str = "bucket",
    num_partitions: int = 32,
) -> DataFrame:
    """Distributed `ntile(n)`: bit-identical bucket assignment to
    `F.ntile(n).over(Window.orderBy(*order_cols))` but with NO
    single-partition window — the global rank comes from
    `global_row_number` and the bucket from ntile's arithmetic rule
    (the first N % n buckets get one extra row), evaluated in exact
    integer `div` so no float boundary can flip a row cross-engine.
    """
    ranked, total = global_row_number(df, order_cols, "__rn", num_partitions)
    base, rem = divmod(total, n)
    big = base + 1
    cut = big * rem
    rn = F.col("__rn")
    # rows 1..cut fill the `rem` buckets of size base+1; the rest fill
    # buckets of size base.  base can be 0 only when total < n, where
    # every row lands in the first branch (cut == total), so the
    # otherwise-branch divisor is clamped without changing any result.
    bucket = F.when(
        rn <= F.lit(cut), F.expr(f"((__rn - 1) div {big}) + 1")
    ).otherwise(F.expr(f"{rem} + ((__rn - 1 - {cut}) div {max(base, 1)}) + 1"))
    return ranked.withColumn(out_col, bucket.cast("int")).drop("__rn")


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols,
    out_col: str = "cum",
    num_partitions: int = 32,
) -> tuple[DataFrame, int]:
    """Global running sum of a LONG column over a total ordering WITHOUT a
    single-partition window, plus the grand total — the generalization of
    `select_token_budget`'s two-level prefix-sum (range partition ->
    per-partition totals as literal offsets -> per-partition running
    window).  Long values only: integer prefix sums are associative, so
    the offset + window decomposition is EXACT and order-noise-free
    (float inputs should be quantized to integers first — the engine-
    parity discipline every cents/token-count caller already follows).

    `order_cols` must be a total ordering or the running sum is
    nondeterministic across runs.  Returns (df + out_col, grand_total).
    """
    r = df.withColumn("__v", F.col(value_col).cast("long")).repartitionByRange(
        num_partitions, *order_cols
    ).withColumn("__pid", F.spark_partition_id())
    r = r.localCheckpoint(eager=True)
    totals = {
        row["__pid"]: row["t"]
        for row in r.groupBy("__pid").agg(F.sum("__v").alias("t")).collect()  # collect-ok: per-partition weight sums, P rows
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid] or 0
    off_df = r.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __offset long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            out_col,
            (F.coalesce("__offset", F.lit(0)) + F.sum("__v").over(w)).cast("long"),
        )
        .drop("__pid", "__offset", "__v")
    )
    return out, acc
