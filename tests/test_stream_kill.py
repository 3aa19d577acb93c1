"""REAL kill -9 of a streaming ingest OS process mid-micro-batch, then a
checkpoint resume to completion (the streaming sibling of
test_maintenance_kill): the in-process streaming tests exercise the
mid-batch crash window with an INJECTED exception (run_stream's
fault_injector, mirroring the reference's handler_test writer-failure
injection); here the whole JVM dies at an arbitrary point — partial
parquet writes, uncommitted checkpoint offsets, half-finished merge —
and the resumed stream must still land EXACTLY the batch-reference
index: the E1 effectively-once claim (checkpoint replay + anti-join
merge writers on unique_id / (location_key, record_id)) under a real
crash, not a thrown exception.

Asserts are kill-point agnostic: whatever batch died, the resume
replays everything uncommitted, the merge writers dedup whatever DID
land, and the final index row set equals plans.ingest.run_batch over
the same messages (same DLQ split, zero duplicate unique_ids)."""

import os
import signal
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, signal, sys, threading

    repo, src, base, delay = sys.argv[1], sys.argv[2], sys.argv[3], float(sys.argv[4])
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from persistor_spark.session import build_session
    from persistor_spark.streaming import ingest_stream
    from persistor_spark import fixtures

    spark = build_session("stream-kill-worker", master="local[4]", shuffle_partitions=4)
    sinks = ingest_stream.StreamSinks(
        blob_path=f"{base}/blobs",
        index_path=f"{base}/index",
        deadletter_path=f"{base}/dlq",
        checkpoint_path=f"{base}/ckpt",
    )
    # armed after session build: the delay spends itself inside the
    # micro-batch loop, not inside JVM startup
    threading.Timer(delay, lambda: os.kill(os.getpid(), signal.SIGKILL)).start()
    ingest_stream.run_stream_supervised(
        lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
        fixtures.fixture_ingest_config(),
        sinks,
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    print("COMPLETED", flush=True)
    """
)

# the stable index columns (d40/d53's comparison set): the stream stamps
# its own wall-clock indexer_ingestion_time, so that column is excluded
COLS = [
    "unique_id",
    "business_source_key",
    "business_object_key",
    "index_source_key",
    "ordering_key",
    "publish_time",
    "ingestion_time",
]


def test_heal_virgin_checkpoint_semantics(tmp_path):
    """Unit pins for the heal's precondition: wipe ONLY a no-commit
    checkpoint with offsets entries; never touch a committed one."""
    from persistor_spark.streaming import ingest_stream

    # virgin-bricked: offsets/0 (torn content), no commits -> wiped
    ck = tmp_path / "ck1"
    (ck / "offsets").mkdir(parents=True)
    (ck / "commits").mkdir()
    (ck / "offsets" / "0").write_text("{torn")
    (ck / "metadata").write_text('{"id":"x"}')
    assert ingest_stream.heal_virgin_checkpoint(str(ck)) is True
    assert not ck.exists()

    # committed batch present -> untouched (standard replay handles it)
    ck2 = tmp_path / "ck2"
    (ck2 / "offsets").mkdir(parents=True)
    (ck2 / "commits").mkdir()
    (ck2 / "offsets" / "0").write_text("v1")
    (ck2 / "offsets" / "1").write_text("{torn")
    (ck2 / "commits" / "0").write_text("v1")
    assert ingest_stream.heal_virgin_checkpoint(str(ck2)) is False
    assert (ck2 / "offsets" / "1").exists()

    # empty / missing -> no-op
    ck3 = tmp_path / "ck3"
    (ck3 / "offsets").mkdir(parents=True)
    assert ingest_stream.heal_virgin_checkpoint(str(ck3)) is False
    assert ingest_stream.heal_virgin_checkpoint(str(tmp_path / "absent")) is False


def test_resume_over_bricked_first_batch_checkpoint(spark, sf_dir, tmp_path):
    """End-to-end over the exact state the kill -9 run produced (a torn
    offsets/0, nothing committed): without the heal, every resume dies
    with STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY; with it, the
    supervisor replays from scratch and lands the batch reference."""
    from pyspark.sql import functions as F

    from persistor_spark import fixtures
    from persistor_spark.plans import ingest
    from persistor_spark.streaming import ingest_stream

    base = str(tmp_path)
    src = f"{base}/src"
    msgs = fixtures.load_messages(spark, sf_dir)
    for i in range(2):
        (
            msgs.filter(F.col("event_seq") % 2 == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    ck = tmp_path / "ckpt"
    (ck / "offsets").mkdir(parents=True)
    (ck / "commits").mkdir()
    (ck / "offsets" / "0").write_text("{torn json")
    (ck / "metadata").write_text('{"id":"00000000-0000-0000-0000-000000000000"}')
    sinks = ingest_stream.StreamSinks(
        blob_path=f"{base}/blobs",
        index_path=f"{base}/index",
        deadletter_path=f"{base}/dlq",
        checkpoint_path=str(ck),
    )
    ingest_stream.run_stream_supervised(
        lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
        fixtures.fixture_ingest_config(),
        sinks,
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    got = sorted(
        map(tuple, spark.read.parquet(f"{base}/index").select(*COLS).collect())
    )
    ref = sorted(
        map(
            tuple,
            ingest.run_batch(
                msgs,
                fixtures.fixture_ingest_config(),
                failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
            ).index_metadata.select(*COLS).collect(),
        )
    )
    assert got == ref


@pytest.mark.parametrize("delay", [2.0, 5.0])
def test_stream_killed_midbatch_resumes_exactly_once(
    spark, sf_dir, tmp_path, delay
):
    from pyspark.sql import functions as F

    from persistor_spark import fixtures
    from persistor_spark.plans import ingest
    from persistor_spark.streaming import ingest_stream

    base = str(tmp_path)
    src = f"{base}/src"
    msgs = fixtures.load_messages(spark, sf_dir)
    # 4 source chunks -> 4 micro-batches at max_files_per_trigger=1
    for i in range(4):
        (
            msgs.filter(F.col("event_seq") % 4 == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    proc = subprocess.run(
        [sys.executable, str(script), REPO, src, base, str(delay)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    killed = proc.returncode == -signal.SIGKILL
    if not killed:
        assert "COMPLETED" in proc.stdout

    # resume IN THIS session from the same checkpoint: availableNow
    # drains whatever the dead worker never committed
    sinks = ingest_stream.StreamSinks(
        blob_path=f"{base}/blobs",
        index_path=f"{base}/index",
        deadletter_path=f"{base}/dlq",
        checkpoint_path=f"{base}/ckpt",
    )
    ingest_stream.run_stream_supervised(
        lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
        fixtures.fixture_ingest_config(),
        sinks,
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )

    got = spark.read.parquet(f"{base}/index")
    # effectively-once: no unique_id landed twice despite the replay of
    # the killed batch over its possibly-partial first attempt
    assert got.count() == got.select("unique_id").distinct().count()
    # the final row set is the batch reference, row for row
    ref = ingest.run_batch(
        msgs,
        fixtures.fixture_ingest_config(),
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    ).index_metadata
    got_rows = sorted(map(tuple, got.select(*COLS).collect()))
    ref_rows = sorted(map(tuple, ref.select(*COLS).collect()))
    assert got_rows == ref_rows, (
        f"stream-after-kill diverged from batch reference "
        f"(killed={killed}, delay={delay}s): "
        f"{len(got_rows)} vs {len(ref_rows)} rows"
    )
