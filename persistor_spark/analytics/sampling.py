"""Deterministic sampling for training-data mixture construction.

Building a training set means hitting target PROPORTIONS per source/domain
("40% web, 30% code, ...") from pools of very different sizes.  The operators
here compute the per-stratum fractions that realize a target mix and apply
them with seeded (reproducible) Bernoulli sampling — `sampleBy` under the
hood, so at 100 TB this is a narrow scan with per-row RNG, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mixture_fractions(
    df: DataFrame, strata_col: str, weights: dict, total_rows: int | None = None
) -> dict:
    """Per-stratum sampling fractions realizing `weights` (relative target
    proportions).  The mix is anchored on the most-constrained stratum: the
    largest achievable total is found, then each stratum samples
    target_rows/stratum_rows of its pool (capped at 1.0).
    `total_rows` overrides the anchor with an explicit budget."""
    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()}
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"strata absent from data: {sorted(missing)}")
    wsum = float(sum(weights.values()))
    norm = {k: w / wsum for k, w in weights.items()}
    max_total = min(counts[k] / norm[k] for k in norm if norm[k] > 0)
    total = min(total_rows, max_total) if total_rows else max_total
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

    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    shard = (h % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        df.withColumn("shard", shard)
        .withColumn("_cum", F.sum(token_col).over(w))
        .withColumn("_before", (F.col("_cum") - F.col(token_col)).cast("long"))
        .withColumn("seq_id", (F.col("_before") / budget).cast("long"))
        .withColumn("seq_offset", (F.col("_before") % budget).cast("long"))
        .withColumn(
            "spans",
            ((F.col("_cum") - 1) / budget).cast("long") - F.col("seq_id") + 1,
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
