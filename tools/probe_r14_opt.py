"""Optimization-round phase profiler (guide §1: measure first).

Decomposes the heaviest bench lines into their sub-phases with wall-clock
timers and setJobDescription labels, so the r14 optimization targets the
phase that actually costs, not the one that looks expensive.

Usage: python tools/probe_r14_opt.py <line> [repeats]
Lines: ingest_persist receiver_pull stream ivfpq_build dhash pagerank
       minhash compaction
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark import fixtures  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402
from persistor_spark.sources.registry import load_table  # noqa: E402


class T:
    """Phase timer: t('name') prints and records the time since last call."""

    def __init__(self):
        self.t0 = time.time()
        self.out = []

    def __call__(self, name):
        dt = time.time() - self.t0
        self.out.append((name, round(dt, 3)))
        print(f"  {name}: {dt:.3f}s", file=sys.stderr)
        self.t0 = time.time()


def profile_ingest_persist(spark, workdir, rep):
    from persistor_spark.plans import ingest

    t = T()
    result = fixtures.run_fixture_ingest(spark, SF_DIR, persist_intermediate=True)
    t("plan_build")
    # materialize the shared prefix alone (what the persist() caches)
    result._intermediate.write.format("noop").mode("overwrite").save()
    t("derivation_noop(shared prefix incl cache fill)")
    result.index_metadata.write.format("noop").mode("overwrite").save()
    t("index_noop(window over cached)")
    result.blob_records.write.format("noop").mode("overwrite").save()
    t("blob_noop(window over cached)")
    ingest.write_blobs(result, f"{workdir}/blobs_{rep}", fmt="parquet")
    t("write_blobs(parquet)")
    ingest.write_index(result, f"{workdir}/index_raw_{rep}", optimize_layout=False)
    t("write_index")
    result.unpersist()
    t("unpersist")


def profile_receiver_pull(spark, workdir, rep):
    from persistor_spark.plans import ingest
    from persistor_spark.sources.file_subscription import (
        DEFAULT_MAX_OUTSTANDING_BYTES,
        FileSubscription,
        decode_pubsub,
    )
    import concurrent.futures as cf

    msgs = fixtures.load_messages(spark, SF_DIR)
    n_msgs = msgs.count()
    batch = max(1, -(-n_msgs // 4))
    sub = FileSubscription(
        f"{workdir}/sub_{rep}",
        batch_size=batch,
        max_outstanding_messages=batch,
        max_outstanding_bytes=max(
            DEFAULT_MAX_OUTSTANDING_BYTES,
            msgs.agg(F.sum(F.octet_length("payload"))).first()[0] or 0,
        ),
    )
    t = T()
    sub.publish(msgs.select("payload", "attributes", "publish_time", "ordering_key"))
    t("publish(prep, untimed in bench)")
    cfg = fixtures.fixture_ingest_config()
    blobs = f"{workdir}/recv_blobs_{rep}"
    index = f"{workdir}/recv_index_{rep}"
    pulls = 0
    while True:
        batch_df = sub.pull(spark)
        t(f"pull_{pulls}")
        if batch_df.isEmpty():
            t(f"isEmpty_{pulls}(final)")
            break
        pulls += 1
        res = ingest.run_batch(
            decode_pubsub(batch_df, "persistor-sub"),
            cfg,
            persist_intermediate=True,
            blob_name=F.concat(F.col("broker_id"), F.lit(f"-p{pulls}")),
        )
        t(f"isEmpty+plan_{pulls}")
        with cf.ThreadPoolExecutor(max_workers=2) as pool:
            for f in [
                pool.submit(ingest.write_blobs, res, blobs),
                pool.submit(ingest.write_index, res, index),
            ]:
                f.result()
        t(f"write_blobs+index_{pulls}")
        res.unpersist()
        sub.ack_df(batch_df)
        t(f"ack_{pulls}")


def profile_stream(spark, workdir, rep):
    from persistor_spark.streaming import ingest_stream

    t = T()
    msgs = fixtures.load_messages(spark, SF_DIR)
    src = f"{workdir}/stream_src_{rep}"
    for i in range(4):
        msgs.filter(F.col("event_seq") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    t("prep(source chunks, untimed in bench)")
    sinks = ingest_stream.StreamSinks(
        blob_path=f"{workdir}/stream_blobs_{rep}",
        index_path=f"{workdir}/stream_index_{rep}",
        deadletter_path=f"{workdir}/stream_dlq_{rep}",
        checkpoint_path=f"{workdir}/stream_ckpt_{rep}",
    )
    cfg = fixtures.fixture_ingest_config()
    stream = ingest_stream.file_stream(spark, src, max_files_per_trigger=1)
    q, metrics = ingest_stream.run_stream(
        stream, cfg, sinks, exactly_once_index=False, exactly_once_blobs=False
    )
    q.awaitTermination(600)
    t("run_stream total")
    print(f"  batches={metrics.batches}", file=sys.stderr)
    for i, d in enumerate(getattr(metrics, "batch_seconds", []) or []):
        print(f"  batch_{i}: {d:.3f}s", file=sys.stderr)


def profile_ivfpq_build(spark, workdir, rep):
    from persistor_spark.analytics import similarity

    embs = load_table(spark, SF_DIR, "embeddings")
    n = embs.count()
    t = T()
    v = similarity._as_double(embs, "vec_id", "embedding")
    withn = v.select(
        "id", "v", (F.lit(1.0) / similarity.norm(F.col("v"))).alias("inv")
    ).localCheckpoint()
    t("norm_checkpoint")
    mat = withn.select(
        "id",
        F.col("v").alias("raw"),
        F.transform("v", lambda x: x * F.col("inv")).alias("nv"),
    ).localCheckpoint()
    t("normalized_checkpoint")
    cents = similarity.kmeans_train(
        mat.select(F.col("id").alias("vec_id"), F.col("nv").alias("embedding")),
        16,
        2,
        n_vectors=n,
        materialize_input=False,
    )
    t("kmeans_train(2 iters)")
    by_cid = dict(cents)
    cmat = similarity._lit_matrix(
        [by_cid.get(c, cents[0][1]) for c in range(cents[-1][0] + 1)]
    )
    assigned = (
        mat.withColumn("cid", similarity._argmax_cid(F.col("nv"), cents))
        .select(
            "cid",
            "id",
            "raw",
            F.zip_with(
                "nv", F.element_at(cmat, F.col("cid") + 1), lambda a, b: a - b
            ).alias("r"),
        )
        .localCheckpoint()
    )
    t("assign_checkpoint")
    codebooks = similarity.pq_train(
        assigned.select("id", "r"),
        16,
        16,
        2,
        id_col="id",
        vec_col="r",
        dim=len(cents[0][1]),
        n_vectors=n,
        normalize=False,
    )
    t("pq_train(2 iters)")
    dsub = len(codebooks[0][0])
    code_cols = [
        similarity._argmax_pick(
            similarity._sub_scores(F.col("r"), codebooks[j], j, dsub, l2_bias=True),
            list(range(16)),
        )
        for j in range(len(codebooks))
    ]
    cells = assigned.select("cid", "id", "raw", F.array(*code_cols).alias("codes"))
    cells = cells.localCheckpoint()
    t("encode+cells_checkpoint")
    cells.count()
    t("cells_count")


def profile_dhash(spark, workdir, rep):
    from persistor_spark.analytics import multimodal

    docs = load_table(spark, SF_DIR, "documents")
    t = T()
    media = multimodal.synthesize_media(spark, docs)
    media.write.format("noop").mode("overwrite").save()
    t("synthesize_media_noop")
    media = multimodal.synthesize_media(spark, docs)
    hashes = multimodal.image_dhash(media).localCheckpoint()
    t("synthesize+dhash+checkpoint")
    multimodal.dhash_near_pairs(hashes, max_hamming=20, k=10).count()
    t("near_pairs_count")


def profile_pagerank(spark, workdir, rep):
    from persistor_spark.analytics import graph

    t = T()
    edges = graph.bipartite_interaction_edges(
        load_table(spark, SF_DIR, "orders"), load_table(spark, SF_DIR, "lineitem")
    )
    edges2 = edges.select("src", "dst").localCheckpoint()
    t("edges_checkpoint(join+distinct)")
    deg = edges2.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    n = deg.count()
    t("degree_count")
    e = edges2.join(F.broadcast(deg), "src").select("src", "dst", "deg")
    base = (1.0 - 0.85) / n
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    for i in range(3):
        ranks = (
            e.join(F.broadcast(ranks), e.src == F.col("node"))
            .groupBy("dst")
            .agg(
                (F.lit(base) + F.lit(0.85) * F.sum(F.col("rank") / F.col("deg"))).alias(
                    "rank"
                )
            )
            .select(F.col("dst").alias("node"), "rank")
            .localCheckpoint()
        )
        t(f"iter_{i}")
    ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node").agg(
        F.sum("rank")
    ).collect()
    t("final_agg")


def profile_minhash(spark, workdir, rep):
    from persistor_spark.analytics import dedup

    docs = load_table(spark, SF_DIR, "documents")
    t = T()
    dedup.minhash_lsh_pairs(docs, 0.8).count()
    t("minhash_lsh_pairs_count")


def profile_compaction(spark, workdir, rep):
    from persistor_spark.analytics import dedup
    from persistor_spark.plans import maintenance

    docs = load_table(spark, SF_DIR, "documents")
    idx = f"{workdir}/frag_lsh_{rep}"
    t = T()
    dedup.lsh_index_save(
        dedup.build_band_table(docs.filter(F.col("doc_id") % 2 == 0)), idx
    )
    t("base_build(prep)")
    bt = dedup.build_band_table(
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    ).localCheckpoint()
    for i in range(40):
        bt.filter(F.expr("(id div 2) % 40") == i).write.mode("append").partitionBy(
            "band"
        ).parquet(idx)
    t("40_appends(prep)")
    stats = maintenance.compact_parquet(spark, idx, partition_col="band")
    t("compact_parquet(timed region)")
    print(f"  {stats}", file=sys.stderr)


PROFILES = {
    "ingest_persist": profile_ingest_persist,
    "receiver_pull": profile_receiver_pull,
    "stream": profile_stream,
    "ivfpq_build": profile_ivfpq_build,
    "dhash": profile_dhash,
    "pagerank": profile_pagerank,
    "minhash": profile_minhash,
    "compaction": profile_compaction,
}


def main():
    line = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session("persistor-opt-probe")
    workdir = tempfile.mkdtemp(prefix="persistor-optprobe-")
    load_table(spark, SF_DIR, "events").count()  # warm listing/JVM
    for rep in range(reps):
        print(f"== {line} rep {rep} ==", file=sys.stderr)
        spark.sparkContext.setJobDescription(f"probe:{line}:{rep}")
        PROFILES[line](spark, workdir, rep)
    spark.stop()


if __name__ == "__main__":
    main()
