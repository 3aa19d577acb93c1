"""File-backed broker stand-in with Kafka-shaped semantics (r6 VERDICT #8).

The container ships no broker, so K7/K8/S3 were pinned by option-parity
only.  This module closes the loop EXECUTABLY: a `FileBroker` is a
directory of topics, each topic an append-only set of parquet segment
files carrying the exact wire schema Spark's Kafka source exposes
(key/value binary, topic, partition, offset, timestamp, headers) — so the
SAME `decode_kafka` mapping (streaming/ingest_stream.py) that would parse
a real broker parses the stand-in, and the SAME `_order_for_publish`
discipline (sources/brokers.py:84-96) that feeds the Kafka producer feeds
`publish`.  What graduates from "option parity" to "executed":

- K8 publish: per-key hash partitioning, per-partition publish_seq order,
  monotone offsets (the in.flight=1 + idempotence order guarantee made
  observable — resubmitter_job.go:387-455).
- S3 consume: readStream over the topic in segment order through
  decode_kafka -> MESSAGE_SCHEMA -> the full ingest derivation.

Semantics vs a real broker (documented deltas): offsets are claimed from
a high-water-mark file under an exclusive flock (`_statelock.state_lock`),
so concurrent publishers to one topic SERIALIZE rather than corrupt the
marks; at-least-once delivery via the file source's file-level tracking;
retention = everything (no compaction).

Reference: the resubmit target topic + Kafka iterator pair
(resubmitter_job.go:387-455, iterator.go:27-61).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from persistor_spark.sources._statelock import state_lock
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# the Spark Kafka source's record shape (headers opt-in variant)
WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType()),
                        StructField("value", BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


class FileBroker:
    """A directory-backed topic store speaking the Kafka wire schema."""

    def __init__(self, root: str, n_partitions: int = 4):
        self.root = root.rstrip("/")
        self.n_partitions = n_partitions
        os.makedirs(self.root, exist_ok=True)

    # -- internals --------------------------------------------------------

    def _topic_dir(self, topic: str) -> str:
        return f"{self.root}/{topic}"

    def _marks_path(self, topic: str) -> str:
        return f"{self.root}/.{topic}.offsets.json"

    def _load_marks(self, topic: str) -> dict[int, int]:
        """Per-partition next-offset high-water marks."""
        try:
            with open(self._marks_path(topic)) as fh:
                return {int(k): v for k, v in json.load(fh).items()}
        except FileNotFoundError:
            return {p: 0 for p in range(self.n_partitions)}

    def _save_marks(self, topic: str, marks: dict[int, int]) -> None:
        tmp = self._marks_path(topic) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({str(k): v for k, v in marks.items()}, fh)
        os.replace(tmp, self._marks_path(topic))

    # -- producer (K7/K8) -------------------------------------------------

    def publish(self, records_kafka_ready: DataFrame, topic: str) -> dict[int, int]:
        """Produce one batch: the resubmit `kafka_ready` projection
        (key/value strings + publish_seq) lands as wire records.

        Producer semantics made concrete: partition = hash(key) mod N
        (every row of a key goes to ONE partition), rows within a
        partition take offsets in (key, publish_seq) order — exactly the
        order _order_for_publish would hand the Kafka producer — and
        offsets continue from the topic's high-water marks, so per-key
        order is monotone ACROSS produce calls too.  Returns the new
        high-water marks.

        Scale shape: one narrow map + one bounded per-partition window
        (batch-sized, N-partition key space); the marks file is N small
        integers, not data.
        """
        # the whole claim-offsets -> write -> advance-marks sequence is one
        # critical section: without the lock, interleaved publishers both
        # read the same marks and one side's advance is lost, desyncing the
        # high-water marks from the topic's contents (r7 VERDICT #4)
        with state_lock(self._marks_path(topic)):
            return self._publish_locked(records_kafka_ready, topic)

    def _publish_locked(self, records_kafka_ready: DataFrame, topic: str) -> dict[int, int]:
        from pyspark.sql import Window

        marks = self._load_marks(topic)
        base = F.create_map(
            *[x for p, o in sorted(marks.items()) for x in (F.lit(p), F.lit(o))]
        )
        # null keys (a real producer round-robins them) pin to the hash of
        # the empty string — deterministic beats round-robin for replay
        part = F.pmod(
            F.xxhash64(F.coalesce(F.col("key"), F.lit(""))), F.lit(self.n_partitions)
        ).cast("int")
        order_cols = (
            ["key", "publish_seq"]
            if "publish_seq" in records_kafka_ready.columns
            else ["key"]
        )
        w = Window.partitionBy("partition").orderBy(*order_cols)
        wire = (
            records_kafka_ready.withColumn("partition", part)
            .withColumn(
                "offset",
                base[F.col("partition")] + F.row_number().over(w) - F.lit(1),
            )
            .select(
                F.col("key").cast("binary"),
                F.col("value").cast("binary"),
                F.lit(topic).alias("topic"),
                "partition",
                "offset",
                F.current_timestamp().alias("timestamp"),
                F.lit(None).cast(WIRE_SCHEMA["headers"].dataType).alias("headers"),
            )
        )
        # single evaluation: the write and the mark-advance must see the
        # SAME rows (a non-deterministic input re-evaluated for the counts
        # would desync the high-water marks from what was written, breaking
        # offset monotonicity), so count from the persisted wire frame
        wire = wire.persist()
        wire.write.mode("append").parquet(self._topic_dir(topic))
        # advance marks by the batch's per-partition row counts (an
        # N-row aggregate of the batch — never a rescan of the topic)
        produced = {
            r["partition"]: r["n"]
            for r in wire.groupBy("partition")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # collect-ok: per-partition batch counts (comment above)
        }
        wire.unpersist()
        new_marks = {
            p: marks.get(p, 0) + produced.get(p, 0)
            for p in range(self.n_partitions)
        }
        self._save_marks(topic, new_marks)
        return new_marks

    # -- consumer (S3) ----------------------------------------------------

    def read_batch_raw(self, spark: SparkSession, topic: str) -> DataFrame:
        """Everything currently in the topic, wire-shaped."""
        return spark.read.schema(WIRE_SCHEMA).parquet(self._topic_dir(topic))

    def read_stream(
        self, spark: SparkSession, topic: str, max_files_per_trigger: int = 1
    ) -> DataFrame:
        """The S3 iterator: a readStream over the topic's segments, decoded
        through the SAME decode_kafka mapping a real broker would use —
        MESSAGE_SCHEMA rows ready for run_stream."""
        from persistor_spark.streaming.ingest_stream import decode_kafka

        raw = (
            spark.readStream.schema(WIRE_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(self._topic_dir(topic))
        )
        return decode_kafka(raw, topic)
