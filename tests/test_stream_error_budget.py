"""E3 policy as a query supervisor: a temporary sink failure fails the query
WITHOUT committing the batch; the supervised restart replays it — no data
loss (the at-least-once property the reference gets from per-message nacks)."""

import pytest
from pyspark.sql import functions as F

from persistor_spark import fixtures
from persistor_spark.streaming import flow_control as fc, ingest_stream


@pytest.fixture()
def setup(spark, sf_dir, tmp_path):
    msgs = fixtures.load_messages(spark, sf_dir).limit(60)
    src = str(tmp_path / "src")
    msgs.withColumn("__c", F.col("event_seq") % 3).repartition(3, "__c").drop(
        "__c"
    ).write.parquet(src)
    sinks = ingest_stream.StreamSinks(
        blob_path=str(tmp_path / "blobs"),
        index_path=str(tmp_path / "index"),
        deadletter_path=str(tmp_path / "dlq"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    return msgs, src, sinks


def test_supervisor_replays_failed_batch(spark, setup, monkeypatch):
    msgs, src, sinks = setup
    from persistor_spark.plans import ingest as ingest_mod

    real_write = ingest_mod.write_blobs_merge
    calls = {"n": 0}

    def flaky_write(result, path, fmt="avro"):
        calls["n"] += 1
        if calls["n"] == 2:  # second batch's blob write: transient outage
            raise fc.TemporaryIngestError("simulated storage outage")
        return real_write(result, path, fmt=fmt)

    monkeypatch.setattr(ingest_mod, "write_blobs_merge", flaky_write)
    budget = fc.ErrorBudget(max_errors=5, window_s=60)
    total = ingest_stream.run_stream_supervised(
        lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
        fixtures.fixture_ingest_config(),
        sinks,
        error_budget=budget,
    )
    # one temporary failure recorded, then the replay drained everything
    assert budget.current == 1
    assert spark.read.parquet(sinks.index_path).count() == msgs.count()
    # no duplicates despite the replay (offsets for the failed batch were
    # never committed; successful batches were)
    idx = spark.read.parquet(sinks.index_path)
    assert idx.select("unique_id").distinct().count() == msgs.count()
    assert total.indexed == msgs.count()


def test_supervisor_stops_on_fatal(spark, setup, monkeypatch):
    _, src, sinks = setup
    from persistor_spark.plans import ingest as ingest_mod

    def fatal_write(result, path, fmt="avro"):
        raise fc.FatalIngestError("schema broke")

    monkeypatch.setattr(ingest_mod, "write_blobs_merge", fatal_write)
    with pytest.raises(Exception) as exc_info:
        ingest_stream.run_stream_supervised(
            lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
            fixtures.fixture_ingest_config(),
            sinks,
        )
    assert "schema broke" in str(exc_info.value)


def test_supervisor_budget_exhaustion(spark, setup, monkeypatch):
    _, src, sinks = setup
    from persistor_spark.plans import ingest as ingest_mod

    def always_fail(result, path, fmt="avro"):
        raise fc.TemporaryIngestError("persistent outage")

    monkeypatch.setattr(ingest_mod, "write_blobs_merge", always_fail)
    with pytest.raises(Exception) as exc_info:
        ingest_stream.run_stream_supervised(
            lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
            fixtures.fixture_ingest_config(),
            sinks,
            error_budget=fc.ErrorBudget(max_errors=2, window_s=60),
        )
    assert "budget" in str(exc_info.value).lower()


def test_exactly_once_index_under_duplicate_delivery(spark, sf_dir, tmp_path):
    """An at-least-once source delivering every message twice: the merge-mode
    index ends exactly-once on unique_id."""
    msgs = fixtures.load_messages(spark, sf_dir).limit(80)
    dup = msgs.unionByName(msgs)  # duplicate delivery
    src = str(tmp_path / "dupsrc")
    dup.repartition(4).write.parquet(src)

    sinks = ingest_stream.StreamSinks(
        blob_path=str(tmp_path / "b"),
        index_path=str(tmp_path / "i"),
        deadletter_path=str(tmp_path / "d"),
        checkpoint_path=str(tmp_path / "c"),
    )
    q, _ = ingest_stream.run_stream(
        ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
        fixtures.fixture_ingest_config(),
        sinks,
        exactly_once_index=True,
    )
    q.awaitTermination(300)
    idx = spark.read.parquet(sinks.index_path)
    assert idx.count() == 80
    assert idx.select("unique_id").distinct().count() == 80
