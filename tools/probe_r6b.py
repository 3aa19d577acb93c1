"""Second round-6 probe session: the late-r6 additions at 10x growth
(sf0.01 -> sf0.1) plus engineered worst cases.  Prints one line per probe;
results recorded in ARCHITECTURE section 6."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as e
from persistor_spark.session import build_session
from persistor_spark.sources.registry import load_table

spark = build_session("probe_r6b")
SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s {out}", flush=True)
    return dt, out


Q = e.queries()

# -- 10x growth: run each new entry at both SFs --------------------------
for key in [
    "a117_kmv_intersection",
    "a118_two_stage_rerank",
    "e50_ewma_smoothing",
    "a119_nucleus_vocab",
    "a120_quantile_normalize",
    "a121_entity_resolution",
    "a122_ols_sufficient_stats",
    "a123_ams_f2",
    "a124_image_dhash_pairs",
    "a126_coverage_selection",
    "e53_pareto_abc",
    "e54_sequence_gaps",
    "d33_zonemap_audit",
    "a125_personalized_pagerank",
]:
    for sf, name in [(SF01, "sf0.01"), (SF1, "sf0.1")]:
        t(f"{key} {name}", lambda k=key, s=sf: Q[k](spark, s).count())

# -- worst case: entity resolution with ONE block (every customer in the
# same nation+segment) — candidate volume n(n-1)/2, the hot-block hazard
# the a121 docstring warns about ----------------------------------------
cust = load_table(spark, SF1, "customer")  # 15 000 customers
one_block = cust.select(
    F.lit(0).alias("c_nationkey_orig"),
    F.col("c_custkey"),
    F.col("c_name"),
    F.lit(0).alias("c_nationkey"),
    F.col("c_acctbal"),
    F.lit("X").alias("c_mktsegment"),
)


def er_one_block():
    a = one_block.select(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").alias("a"), F.col("c_name").alias("name_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    b = one_block.select(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").alias("b"), F.col("c_name").alias("name_b"),
        F.col("c_acctbal").alias("bal_b"),
    )
    pairs = a.join(b, ["nk", "seg"]).filter(F.col("a") < F.col("b"))
    name_sim = F.lit(1.0) - F.levenshtein("name_a", "name_b") / F.greatest(
        F.length("name_a"), F.length("name_b")
    )
    bal_sim = F.lit(1.0) - F.least(
        F.abs(F.col("bal_a") - F.col("bal_b")) / F.lit(10000.0), F.lit(1.0)
    )
    scored = pairs.select(
        (F.lit(0.7) * name_sim + F.lit(0.3) * bal_sim).alias("score")
    )
    return scored.filter(F.col("score") >= 0.97).count()


t("a121 WORST one-block 15k customers (112M pairs)", er_one_block)


# the LIBRARY path over the same worst case: blocked_candidate_pairs
# enforces the max_block_size sub-split (r7), bounding candidates at
# ~n*cap/2 — print it beside the raw hazard so probe runs show both
def er_one_block_capped():
    from persistor_spark.analytics import dedup

    return dedup.blocked_candidate_pairs(
        one_block, ("c_nationkey", "c_mktsegment"), "c_custkey",
        max_block_size=2000,  # the a121 entry's cap
    ).count()


t("a121 CAPPED same block via blocked_candidate_pairs", er_one_block_capped)

# -- worst case: KMV with one group holding the whole corpus vocabulary --
from persistor_spark.analytics import sketches

toks1 = load_table(spark, SF1, "documents").select(
    F.lit("all").alias("source"), F.explode(F.split("text", " ")).alias("w")
)
t(
    "a117 WORST single-group whole-corpus vocab (sf0.1)",
    lambda: sketches.kmv_estimate(
        sketches.kmv_sketch(toks1, "w", k=64, group_col="source"), 64
    ).count(),
)

# -- worst case: coverage selection when every doc is identical (the
# greedy degenerates: round 1 covers everything, rounds 2-5 must still
# terminate on the empty remainder) --------------------------------------
dup_docs = (
    load_table(spark, SF1, "documents")
    .select(F.col("doc_id"), F.lit("a b c d e f g h").alias("text"))
)


def coverage_degenerate():
    from persistor_spark.analytics.dedup import shingles

    s = dup_docs.select(
        "doc_id", F.explode(shingles("text", 2)).alias("sh")
    ).localCheckpoint()
    remaining = s
    picked = 0
    for _ in range(5):
        top = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("doc_id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        picked += 1
        newly = s.filter(F.col("doc_id") == top[0]["doc_id"]).select("sh")
        remaining = (
            remaining.filter(F.col("doc_id") != top[0]["doc_id"])
            .join(newly, "sh", "left_anti")
            .localCheckpoint()
        )
    return f"picked={picked}"


t("a126 WORST all-identical corpus (sf0.1 doc count)", coverage_degenerate)

spark.stop()
