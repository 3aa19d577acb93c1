"""Operational-parity pieces: size estimator (T12), interval params (Q10),
broker option builders (S1/S2/K7), metrics listener (E4)."""

import datetime

import pytest
from pyspark.sql import functions as F

from persistor_spark import fixtures
from persistor_spark.config import IngestConfig
from persistor_spark.functions import sizes
from persistor_spark.plans.query import extract_interval_params
from persistor_spark.sources import brokers
from persistor_spark.streaming import ingest_stream, metrics as smetrics


def test_message_size_expression(spark):
    df = spark.createDataFrame(
        [("abcd", {"k1": "vv", "k22": "x"}), (None, {}), ("xy", None)],
        "payload string, attributes map<string,string>",
    )
    got = [r[0] for r in df.select(sizes.message_size()).collect()]
    # 4 + (2+2) + (3+1) = 12; 0; 2
    assert got == [12, 0, 2]


def test_batch_memory_predicate(spark, sf_dir):
    msgs = fixtures.load_messages(spark, sf_dir)
    sized = msgs.withColumn("sz", sizes.message_size())
    cfg = IngestConfig()
    ok = sized.filter(sizes.batch_memory_ok(F.col("sz"), cfg.batch.batch_memory_bytes))
    assert ok.count() == msgs.count()  # fixture messages are tiny


def test_interval_params_defaults_and_future_rejection():
    now = datetime.datetime(2024, 6, 1, 12, 0, 0)
    t_from, t_to = extract_interval_params(None, None, now=now)
    assert t_from == datetime.datetime(1, 1, 1)
    assert t_to == now
    t_from, t_to = extract_interval_params("2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z", now=now)
    assert (t_from.month, t_to.month) == (1, 2)
    with pytest.raises(ValueError, match="can't be in the future"):
        extract_interval_params(None, "2030-01-01T00:00:00Z", now=now)


def test_broker_option_builders():
    cfg = fixtures.fixture_ingest_config()
    ps = brokers.pubsub_source_options(cfg, "proj", "sub")
    assert ps["maxOutstandingMessages"] == str(cfg.batch.batch_size)
    assert int(ps["maxOutstandingBytes"]) >= 1024
    sb = brokers.servicebus_source_options(cfg, "ns", "t", "s")
    assert sb["maxBatchSize"] == str(cfg.batch.batch_size)
    ks = brokers.kafka_sink_options("b:9092", "t")
    assert ks["kafka.max.in.flight.requests.per.connection"] == "1"  # per-key order


def test_pubsub_without_connector_raises_clearly(spark):
    cfg = fixtures.fixture_ingest_config()
    with pytest.raises(brokers.ConnectorUnavailable, match="connector"):
        brokers.pubsub_stream(spark, cfg, "proj", "sub")


def test_metrics_listener_collects_progress(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    fixtures.load_messages(spark, sf_dir).limit(100).write.parquet(src)
    listener = smetrics.attach(spark)
    try:
        stream = ingest_stream.file_stream(spark, src)
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        import time

        for _ in range(40):
            if listener.counters.input_rows >= 100:
                break
            time.sleep(0.5)
        snap = listener.counters.snapshot()
        assert snap["input_rows"] >= 100
        assert snap["batches"] >= 1
        assert snap["duration_ms_q50"] >= 0
    finally:
        smetrics.detach(spark, listener)


def test_prometheus_text_format():
    c = smetrics.Counters(batches=3, input_rows=1500, processed_rows_per_sec_last=50.0,
                          batch_duration_ms=[10, 20, 30])
    text = smetrics.to_prometheus_text(c)
    assert "persistor_processed_messages_total 1500" in text
    assert 'quantile="0.5"' in text and 'quantile="0.99"' in text
    assert text.endswith("\n")
    # every non-comment line is "name{labels} value"
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            name, value = line.rsplit(" ", 1)
            float(value)
