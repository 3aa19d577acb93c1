"""BM25 full-text retrieval over a document corpus.

The inverted-index shape mirrors ngram_jaccard's posting-list design: one
exploded (doc, term, tf) table, shuffled by term — the classic distributed
search layout (posting lists partitioned by term).  Scoring a query touches
only the query terms' posting lists; the per-term idf join is a broadcast.

BM25 (Robertson/Sparck Jones):
    score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·|d|/avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Everything is built-in expressions (one exploded aggregation + two joins) —
no UDFs, fully codegen-able, and the index is materializable/cacheable for
repeated queries.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

K1 = 1.2
B = 0.75


@dataclass
class BM25Index:
    postings: DataFrame  # (id, term, tf, dl)
    idf: DataFrame  # (term, idf)
    n_docs: int
    avgdl: float


def build_index(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> BM25Index:
    """Tokenize (single-space, matching analytics.text), build posting lists
    with term frequencies, document lengths, and per-term idf."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    postings = (
        toks.groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dl, "id")
    )
    n_docs = df.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]  # collect-ok: 1-row scalar (avg doclen)
    if avgdl is None:  # empty corpus: empty postings, not float(None)
        avgdl = 1.0
    idf = (
        postings.groupBy("term")
        .agg(F.countDistinct("id").alias("df"))
        .select(
            "term",
            F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1).alias("idf"),
        )
    )
    return BM25Index(postings=postings, idf=idf, n_docs=n_docs, avgdl=float(avgdl))


def search(index: BM25Index, query_terms: list, k: int = 10) -> DataFrame:
    """Top-k documents for a bag-of-terms query: (id, score, rank).
    Deterministic tie-break by id; scores rounded to 4 decimals."""
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order irrelevant
    hits = index.postings.filter(F.col("term").isin(terms)).join(
        F.broadcast(index.idf), "term"
    )
    per_term = hits.select(
        "id",
        (
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / index.avgdl))
        ).alias("s"),
    )
    scored = per_term.groupBy("id").agg(F.round(F.sum("s"), 4).alias("score"))
    from pyspark.sql import Window

    # Global top-k via orderBy().limit(k): Spark plans TakeOrderedAndProject
    # (per-partition heap + driver merge), NOT a single-partition sort — the
    # r1 plan ranked every scored doc through a partition-less WindowExec.
    # The row_number window then runs over only the k survivors (constant
    # partition key keeps WindowExec happy; k rows make it free).
    order = [F.col("score").desc(), F.col("id").asc()]
    topk = scored.orderBy(*order).limit(k)
    # pmod(id, 1) is always 0 but non-foldable, so the partition spec
    # survives optimization and WindowExec never warns / single-partitions
    # anything larger than the k survivors.
    w = Window.partitionBy(F.pmod(F.col("id"), F.lit(1))).orderBy(*order)
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("id", "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    fused(d) = Σ_i 1/(k0 + rank_i(d)) over the systems that returned d —
    the standard way to combine lexical (BM25) and dense (embedding
    cosine) retrieval without score calibration.

    Shape: each input ranking is already a top-N list (bounded, a few
    rows), so the full-outer joins below are joins of tiny frames — at
    100 TB the expensive part is PRODUCING the rankings (posting-list /
    ANN probes); fusion cost is O(Σ list lengths) regardless of corpus.

    Determinism: contributions are added left-to-right with explicit
    coalesce(·, 0) terms (not a union + float sum agg, whose partial-merge
    order is partition-dependent), so the fused score is bit-identical to
    a SQL oracle computing the same left-to-right sum.  Output
    (id, rrf, rank) with rrf rounded to 6 decimals and rank ordered by
    (rrf DESC, id ASC).
    """
    fused = None
    for i, r in enumerate(rankings):
        ri = r.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))).alias(f"c{i}"),
        )
        fused = ri if fused is None else fused.join(ri, "id", "full_outer")
    score = F.coalesce(F.col("c0"), F.lit(0.0))
    for i in range(1, len(rankings)):
        score = score + F.coalesce(F.col(f"c{i}"), F.lit(0.0))
    scored = fused.select("id", F.round(score, 6).alias("rrf"))
    order = [F.col("rrf").desc(), F.col("id").asc()]
    topk = scored.orderBy(*order).limit(k)
    # same non-foldable constant partition spec as search(): the window
    # ranks only the k survivors of TakeOrderedAndProject
    w = Window.partitionBy(F.pmod(F.col("id"), F.lit(1))).orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w)).select("id", "rrf", "rank")
