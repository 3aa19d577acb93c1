"""Round-6 scaling probes for ARCHITECTURE section 6: the r5 additions
(a91 HLL, a92 Bloom, a93 containment, e34 band join) at 10x and under
their worst-case skew.  Prints one line per probe."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as e
from persistor_spark.session import build_session
from persistor_spark.sources.registry import load_table

spark = build_session("probe_r6")
SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s {out}", flush=True)
    return dt, out


from persistor_spark.analytics import dedup, sketches

# -- a91 HLL: shuffle bounded by 2^p registers; should be ~flat 10x ------
for sf, name in [(SF01, "sf0.01"), (SF1, "sf0.1")]:
    docs = load_table(spark, sf, "documents")
    t(
        f"a91 hll p=8 {name}",
        lambda d=docs: (
            lambda regs: f"est={sketches.hll_estimate(regs.cache(), 8):.0f} regs={regs.count()}"
        )(sketches.hll_registers(d, "text", p=8)),
    )

# -- a92 Bloom: bits bounded by m_bits; corpus side never shuffles -------
for sf, name in [(SF01, "sf0.01"), (SF1, "sf0.1")]:
    docs = load_table(spark, sf, "documents")
    evalset = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("text").alias("item")
    )
    corpus = docs.select("doc_id", F.col("text").alias("item"))
    def run(ev=evalset, c=corpus):
        bits = sketches.bloom_bits(ev, "item")
        out = sketches.bloom_probe(c, bits, "item")
        n = out.filter(F.col("maybe_member")).count()
        return f"maybe={n}"
    t(f"a92 bloom {name}", run)

# -- e34 band join: natural vs all-equal-balance worst case --------------
for sf, name in [(SF01, "sf0.01"), (SF1, "sf0.1")]:
    t(f"e34 band natural {name}", lambda s=sf: f"rows={e._e34_band_join(spark, s).count()}")

# worst case: every balance identical -> every same-nation pair passes
cust1 = load_table(spark, SF1, "customer").select("c_custkey", "c_nationkey")
n_cust = cust1.count()
def e34_worst():
    c = cust1.withColumn("c_acctbal", F.lit(100.0))
    eps = 1.0
    bucket = F.floor(F.col("c_acctbal")).cast("long")
    left = c.withColumn("__b", F.explode(F.array(bucket - 1, bucket, bucket + 1)))
    right = c.select(
        F.col("c_nationkey").alias("r_nat"), bucket.alias("__b"),
        F.col("c_custkey").alias("r_key"), F.col("c_acctbal").alias("r_bal"),
    )
    pairs = left.join(
        right,
        (left["c_nationkey"] == right["r_nat"]) & (left["__b"] == right["__b"])
        & (left["c_custkey"] != right["r_key"])
        & (F.abs(left["c_acctbal"] - right["r_bal"]) <= eps),
    )
    return f"n_cust={n_cust} pairs={pairs.count()}"
t("e34 band WORST all-equal sf0.1", e34_worst)

# -- a93 containment: natural vs hot-shingle corpus, capped vs not -------
hot = " zzz qqq www"  # one shingle shared by EVERY doc once appended
for sf, name in [(SF001, "sf0.001"), (SF01, "sf0.01")]:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    t(f"a93 containment natural {name}",
      lambda d=docs: f"pairs={dedup.containment_pairs(d, 0.9).count()}")
    hotdocs = docs.withColumn("text", F.concat(F.col("text"), F.lit(hot)))
    t(f"a93 containment HOT uncapped {name}",
      lambda d=hotdocs: f"pairs={dedup.containment_pairs(d, 0.9).count()}")
    t(f"a93 containment HOT capped df<=1000 {name}",
      lambda d=hotdocs: f"pairs={dedup.containment_pairs(d, 0.9, max_doc_freq=1000).count()}")

spark.stop()
