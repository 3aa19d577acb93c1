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
