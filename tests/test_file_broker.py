"""FileBroker stand-in: the K8 publish -> S3 consume loop EXECUTED.

Previously K7/K8/S3 were pinned by option-parity tests only (no broker in
the container).  The FileBroker speaks the Kafka wire schema on parquet
segments, so the real decode_kafka mapping and the real run_stream ingest
consume what the real kafka_ready projection publishes — the reference's
per-key order guarantee (resubmitter_job.go:387-455) asserted end to end.
"""

import json

from pyspark.sql import Window, functions as F

from persistor_spark.sources.file_broker import FileBroker


def _kafka_ready(spark, n_keys=8, n_seq=5):
    """A shuffled kafka_ready frame: keys k0..k{n-1}, publish_seq 1..n_seq,
    payload JSON encoding (key, seq) so order survives any transport."""
    rows = [
        (f"k{k}", json.dumps({"key": f"k{k}", "seq": s}), s)
        for k in range(n_keys)
        for s in range(1, n_seq + 1)
    ]
    import random

    random.Random(7).shuffle(rows)
    return spark.createDataFrame(rows, "key string, value string, publish_seq int")


def test_publish_assigns_monotone_offsets_per_key(spark, tmp_path):
    broker = FileBroker(str(tmp_path / "broker"), n_partitions=4)
    df = _kafka_ready(spark)
    marks1 = broker.publish(df, "resubmit")
    # second produce call: offsets must CONTINUE, not restart
    marks2 = broker.publish(df, "resubmit")
    assert sum(marks1.values()) == 40 and sum(marks2.values()) == 80

    wire = broker.read_batch_raw(spark, "resubmit").select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "partition",
        "offset",
    )
    # each key lives wholly in one partition (hash partitioner contract)
    assert wire.select("key", "partition").distinct().groupBy("key").count().filter(
        "count > 1"
    ).count() == 0
    # per-partition offsets are dense 0..n-1 across both produce calls
    per_part = wire.groupBy("partition").agg(
        F.count("*").alias("n"), F.min("offset").alias("mn"), F.max("offset").alias("mx")
    )
    assert per_part.filter(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
    ).count() == 0
    # within a produce call, a key's offsets ascend with publish_seq: decode
    # the payload's seq and check offset order == seq order per (key, call)
    seq = F.get_json_object("value", "$.seq").cast("int")
    w = Window.partitionBy("key").orderBy("offset")
    decoded = wire.withColumn("seq", seq).withColumn(
        "prev_seq", F.lag("seq").over(w)
    )
    # per key in offset order the seq pattern must be 1..5,1..5 (two calls)
    viol = decoded.filter(
        F.col("prev_seq").isNotNull()
        & (F.col("seq") != F.col("prev_seq") + 1)
        & ~((F.col("prev_seq") == 5) & (F.col("seq") == 1))
    )
    assert viol.count() == 0


def test_broker_roundtrip_through_run_stream(spark, tmp_path):
    """Publish -> readStream(decode_kafka) -> run_stream: the consumed
    ingest must hold every published record, with per-ordering-key arrival
    order (event_seq = broker offset) equal to publish order."""
    from persistor_spark import fixtures
    from persistor_spark.streaming import ingest_stream

    broker = FileBroker(str(tmp_path / "broker"), n_partitions=2)
    broker.publish(_kafka_ready(spark, n_keys=6, n_seq=4), "replay")

    stream = broker.read_stream(spark, "replay", max_files_per_trigger=1)
    sinks = ingest_stream.StreamSinks(
        blob_path=str(tmp_path / "blobs"),
        index_path=str(tmp_path / "index"),
        deadletter_path=str(tmp_path / "dlq"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q, metrics = ingest_stream.run_stream(
        stream, fixtures.fixture_ingest_config(), sinks
    )
    q.awaitTermination(300)
    assert metrics.batches >= 1

    idx = spark.read.parquet(sinks.index_path)
    blobs_df = spark.read.parquet(sinks.blob_path)
    assert idx.count() == 24 and blobs_df.count() == 24
    # broker_id carries the topic; broker_msg_id is partition-offset
    assert idx.select("broker_id").distinct().collect()[0][0] == "replay"
    # per ordering key, arrival order (the broker offset, embedded in
    # unique_id = topic_partition-offset) must equal publish order — THE
    # R7 guarantee, now observed through a real consume.  payload carries
    # the original (key, seq), joined back via record_id == unique_id.
    joined = idx.select("ordering_key", "unique_id").join(
        blobs_df.select(F.col("record_id").alias("unique_id"), "payload"),
        "unique_id",
    )
    offset = F.element_at(F.split("unique_id", "-"), -1).cast("int")
    seq = F.get_json_object("payload", "$.seq").cast("int")
    w = Window.partitionBy("ordering_key").orderBy(offset)
    viol = (
        joined.withColumn("seq", seq)
        .withColumn("prev", F.lag("seq").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("seq") != F.col("prev") + 1))
    )
    assert viol.count() == 0
    # and the published payload set survives the loop byte-for-byte
    want = {
        r["value"]
        for r in _kafka_ready(spark, n_keys=6, n_seq=4).select("value").collect()
    }
    got = {r["payload"] for r in blobs_df.select("payload").collect()}
    assert got == want


def test_concurrent_publishers_serialize(spark, tmp_path):
    """r7 VERDICT #4: two interleaved publishers to ONE topic must
    serialize through the state flock — before the lock, both would load
    the same high-water marks and one advance was silently lost,
    producing duplicate offsets and a marks file short of the topic's
    true contents."""
    import threading

    root = str(tmp_path / "broker")
    df = _kafka_ready(spark)  # 40 rows
    errs = []

    def worker():
        try:
            # each thread gets its OWN FileBroker instance (distinct fds —
            # the flock must conflict across instances, not object state)
            FileBroker(root, n_partitions=4).publish(df, "resubmit")
        except Exception as exc:  # pragma: no cover - failure path
            errs.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []

    broker = FileBroker(root, n_partitions=4)
    wire = broker.read_batch_raw(spark, "resubmit")
    assert wire.count() == 120
    # no lost update: marks equal the per-partition row counts on disk
    marks = broker._load_marks("resubmit")
    on_disk = {
        r["partition"]: r["n"]
        for r in wire.groupBy("partition").agg(F.count("*").alias("n")).collect()
    }
    assert {p: n for p, n in marks.items() if n} == on_disk
    # offsets dense per partition (duplicates = the pre-lock corruption)
    per_part = wire.groupBy("partition").agg(
        F.countDistinct("offset").alias("d"),
        F.count("*").alias("n"),
        F.min("offset").alias("mn"),
        F.max("offset").alias("mx"),
    )
    bad = per_part.filter(
        (F.col("d") != F.col("n"))
        | (F.col("mn") != 0)
        | (F.col("mx") != F.col("n") - 1)
    )
    assert bad.count() == 0, bad.collect()


def test_concurrent_subscription_publishers_serialize(spark, tmp_path):
    """Same invariant for FileSubscription: concurrent publishes must
    claim disjoint id windows (duplicate message_ids would make one ack
    retire two different payloads)."""
    import threading

    from persistor_spark.sources.file_subscription import FileSubscription

    root = str(tmp_path / "sub")
    msgs = spark.range(30).select(
        F.format_string("payload-%d", "id").cast("binary").alias("data")
    )
    errs = []

    def worker():
        try:
            FileSubscription(root, batch_size=100).publish(msgs)
        except Exception as exc:  # pragma: no cover - failure path
            errs.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []

    sub = FileSubscription(root, batch_size=100)
    assert sub.stats()["backlog_published"] == 90
    backlog = spark.read.parquet(f"{root}/backlog")
    assert backlog.count() == 90
    assert backlog.select("message_id").distinct().count() == 90
