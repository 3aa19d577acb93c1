"""Late-round-6 scaling probes for ARCHITECTURE section 6: the a107-a112 /
e45-e47 / d28 additions at 10x and under their worst-case skew.

- a107 sorted-neighborhood: candidate volume is n*w BY CONSTRUCTION, so a
  total sort-key collision (every doc identical prefix) must NOT change the
  runtime — the property that distinguishes it from LSH banding under skew.
- a109 edit-distance join: blocking on (first token, length band); the hot
  first-token worst case concentrates one block and goes quadratic in the
  block — probe it to justify the production cap note in the docstring.
- a111 skip-gram: fan-out is exactly 3 tokens per position; linear at 10x.
- a108 basket rules / e45 / e46 / e47 / d28 ride the natural sf0.01 ->
  sf0.1 10x of lineitem/events.

Prints one line per probe.
"""
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


def replicate_docs(docs, k):
    """k copies with distinct doc_ids (replicas are exact dups of the
    original — the worst case for any dedup candidate generator)."""
    reps = spark.range(k).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )


from persistor_spark.analytics import dedup, profiling  # noqa: E402

docs = load_table(spark, SF01, "documents")

# -- a107 sorted-neighborhood: 1x / 10x / 10x-with-constant-sort-key ------
t("a107 1x (500 docs)", lambda: dedup.sorted_neighborhood_pairs(docs, 10, 0.5).count())
d10 = replicate_docs(docs, 10).localCheckpoint(eager=True)
t("a107 10x (5k docs)", lambda: dedup.sorted_neighborhood_pairs(d10, 10, 0.5).count())
# total key collision: every doc gets the same 20-char prefix -> sort
# degenerates to doc_id order; candidates stay exactly n*w
collide = d10.withColumn("text", F.concat(F.lit("xxxxxxxxxxxxxxxxxxxx "), "text"))
t(
    "a107 10x constant-key worst case",
    lambda: dedup.sorted_neighborhood_pairs(collide, 10, 0.5).count(),
)

# -- a109 edit-distance join: 10x, then hot-first-token worst case --------
t("a109 1x", lambda: dedup.edit_distance_pairs(docs, 8).count())
t("a109 10x", lambda: dedup.edit_distance_pairs(d10, 8).count())
hot = d10.withColumn("text", F.concat(F.lit("the "), "text"))
t(
    "a109 10x hot-token worst case (single block)",
    lambda: dedup.edit_distance_pairs(hot, 8).count(),
)

# -- a111 skip-gram co-occurrence: linear fan-out (3 per position) --------
t("a111 1x", lambda: e._a111_skipgram_cooccurrence.__wrapped__(spark, SF01).count()
  if hasattr(e._a111_skipgram_cooccurrence, "__wrapped__")
  else len(e._a111_skipgram_cooccurrence(spark, SF01).collect()))


def skipgram_on(d):
    pos = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    lefts = pos.select(
        "doc_id",
        F.col("w").alias("wa"),
        F.explode(F.array(F.col("pos") + 1, F.col("pos") + 2, F.col("pos") + 3)).alias("tpos"),
    )
    rights = pos.select("doc_id", F.col("pos").alias("tpos"), F.col("w").alias("wb"))
    return (
        lefts.join(rights, ["doc_id", "tpos"])
        .groupBy(F.least("wa", "wb").alias("w1"), F.greatest("wa", "wb").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(30)
    )


t("a111 10x docs", lambda: skipgram_on(d10).count())

# -- a110 Heaps curve at 10x docs ----------------------------------------
from persistor_spark.analytics.sampling import ntile_exact  # noqa: E402


def heaps_on(d):
    buckets = ntile_exact(d.select("doc_id"), 10, ["doc_id"], "bucket")
    grams = d.select("doc_id", F.explode(dedup.shingles("text", 3)).alias("gram"))
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return first.join(
        buckets.select(F.col("doc_id").alias("first_doc"), "bucket"), "first_doc"
    ).groupBy("bucket").count()


t("a110 1x", lambda: heaps_on(docs).count())
t("a110 10x", lambda: heaps_on(d10).count())

# -- a108 / e45 / e46 / e47 / d28: natural 10x via sf0.01 -> sf0.1 --------
for sf, name in [(SF01, "sf0.01"), (SF1, "sf0.1")]:
    li = load_table(spark, sf, "lineitem")
    t(
        f"a108 basket rules {name}",
        lambda l=li: profiling.market_basket_rules(l, "l_orderkey", "l_partkey", 3).count(),
    )
for sf, name in [(SF01, "sf0.01"), (SF1, "sf0.1")]:
    t(f"e45 markov {name}", lambda s=sf: e._e45_markov_transitions(spark, s).count())
    t(f"e46 twa {name}", lambda s=sf: e._e46_time_weighted_avg(spark, s).count())
    t(f"e47 churn {name}", lambda s=sf: e._e47_weekly_churn(spark, s).count())
    t(f"d28 tiering {name}", lambda s=sf: e._d28_storage_tiering(spark, s).count())

spark.stop()
