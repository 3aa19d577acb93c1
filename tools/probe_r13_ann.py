"""r13: measure per-query recall@5 of the four ANN exactness entries
(a32/a55/a60 ivfpq on the clustered corpus, a34 opq on the raw corpus)
against Spark brute force at each SF, to pick the threshold floors that
replace their exact-equality oracles (r12 VERDICT #3)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from persistor_spark.analytics import similarity  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402


def recall_stats(out, truth):
    hits = truth.join(out.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
    per = (
        truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_eff"))
        .join(hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")), "query_id", "left")
        .withColumn("recall", F.coalesce("n_hit", F.lit(0)) / F.col("k_eff"))
    )
    rows = per.collect()
    rec = [r["recall"] for r in rows]
    return min(rec), sum(rec) / len(rec), len(rec)


def main():
    spark = build_session()
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        sf_dir = f"/root/testdata/{sf}"
        cl = e._cl_embs(spark, sf_dir)
        raw = e._embs(spark, sf_dir)
        q_cl = cl.filter(F.col("vec_id") < 10)
        q_raw = raw.filter(F.col("vec_id") < 10)
        truth_cl = similarity.brute_force_topk(cl, q_cl, k=5).select("query_id", "vec_id")
        truth_raw = similarity.brute_force_topk(raw, q_raw, k=5).select("query_id", "vec_id")
        outs = {
            "a32": (e._a_ivfpq_topk(spark, sf_dir), truth_cl),
            "a55": (e._a55_ivfpq_persist(spark, sf_dir), truth_cl),
            "a60": (e._a60_ivfpq_add(spark, sf_dir), truth_cl),
            "a34": (e._a_opq_topk(spark, sf_dir), truth_raw),
        }
        for name, (out, truth) in outs.items():
            mn, mean, nq = recall_stats(out, truth)
            print(f"{sf} {name}: min={mn:.2f} mean={mean:.3f} n_queries={nq}", flush=True)


if __name__ == "__main__":
    main()
