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
    """Probes the RAW approximate searches the entries wrap (the entries
    themselves now RETURN threshold-verdict rows, not top-k rows — this
    tool reconstructs their search stage with the exact entry parameters
    so the documented floors stay reproducible)."""
    spark = build_session()
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        sf_dir = f"/root/testdata/{sf}"
        cl = e._cl_embs(spark, sf_dir)
        raw = e._embs(spark, sf_dir)
        q_cl = cl.filter(F.col("vec_id") < 10)
        q_raw = raw.filter(F.col("vec_id") < 10)
        truth_cl = similarity.brute_force_topk(cl, q_cl, k=5).select("query_id", "vec_id")
        truth_raw = similarity.brute_force_topk(raw, q_raw, k=5).select("query_id", "vec_id")
        idx8 = e._shared_ivfpq8(spark, sf_dir)
        a32 = similarity.ivfpq_search(idx8, q_cl, k=5, nprobe=4, rerank_factor=24)
        a60_idx = similarity.ivfpq_add(
            similarity.ivfpq_build(cl.filter(F.col("vec_id") % 2 == 0), n_centroids=8),
            cl.filter(F.col("vec_id") % 2 == 1),
        )
        a60 = similarity.ivfpq_search(a60_idx, q_cl, k=5, nprobe=4, rerank_factor=24)
        a34 = similarity.opq_topk(
            raw, q_raw, k=5, m=16, ksub=16, n_iter=2, rerank_factor=16
        )
        outs = {
            "a32/a55": (a32, truth_cl),  # a55 = a32 through save/load, identical
            "a60/a159": (a60, truth_cl),  # a159 = a60 through the streamed add
            "a34": (a34, truth_raw),
        }
        for name, (out, truth) in outs.items():
            mn, mean, nq = recall_stats(out, truth)
            print(f"{sf} {name}: min={mn:.2f} mean={mean:.3f} n_queries={nq}", flush=True)


if __name__ == "__main__":
    main()
