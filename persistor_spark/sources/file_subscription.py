"""File-backed subscription stand-in with Pub/Sub / Service Bus semantics.

`FileBroker` (sources/file_broker.py) graduated K7/K8/S3 from option-parity
to executed code; this module does the same for S1 (Pub/Sub receiver,
receiver.go:31-58) and S2 (Service Bus batch iterator, receiver.go:61-76).
The container ships no broker, so what executes here is the RECEIVER-side
contract those brokers impose on the engine:

- **at-least-once with ack/nack**: a pulled message is leased for an ack
  deadline; `ack` retires it, `nack` (Service Bus: `abandon`) returns it
  immediately, a crashed consumer's lease simply expires and the message
  is redelivered.  Downstream exactly-once is the engine's job (E1's
  idempotent MERGE) — the e2e test drives a redelivered batch through the
  real ingest and asserts the index stays duplicate-free.
- **flow control** (receiver.go:38-44): outstanding messages/bytes are
  capped, and the caps are RAISED to at least the batch bounds so a full
  batch is pullable in one go ("otherwise we will be waiting for timeout
  to hit").  `pull` enforces both budgets against currently-leased volume.
- **batch assembly**: `pull` returns at most BatchSize messages per call
  (brokerutil.IntoBatchedMessageStreamSettings / the Service Bus
  BatchIterator's BatchSize); fewer when the backlog or the flow-control
  budget is smaller (the BatchTimeout arm — a file backlog never blocks).

`decode_pubsub` then maps the wire rows onto MESSAGE_SCHEMA exactly as
`decode_kafka` does for the Kafka wire shape, promoting the business keys
the broker delivers as attributes (sender.go:136-160 deletes the promoted
keys again at index-build time — unchanged downstream).

Stand-in deltas vs a real broker (documented, same contract as
FileBroker): consumer state lives in one JSON file guarded by an exclusive
flock (`_statelock.state_lock` — the real broker owns ack state
server-side), retention = everything, and redelivery order is
deterministic (publish_time, message_id) rather than best-effort.  The ack-state file grows with acked
history — test scaffolding, not a production queue.

Scale shape: the backlog is parquet (distributed reads); per-pull driver
state is bounded by the BATCH size (a narrow id+size candidate listing,
then a broadcast semi-join to fetch full rows), never the backlog size.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from persistor_spark.config import IngestConfig
from persistor_spark.sources._statelock import state_lock

# What the Pub/Sub / Service Bus client hands the receiver callback: an id
# assigned by the broker, opaque data, string attributes, a publish time,
# and an optional ordering key.
WIRE_SCHEMA = StructType(
    [
        StructField("message_id", StringType(), False),
        StructField("data", BinaryType()),
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("publish_time", TimestampType()),
        StructField("ordering_key", StringType()),
        StructField("size_bytes", LongType(), False),
    ]
)

# Go client defaults the reference starts from before raising to batch
# bounds (pubsub.DefaultReceiveSettings: 1000 messages / 1e9 bytes).
DEFAULT_MAX_OUTSTANDING_MESSAGES = 1000
DEFAULT_MAX_OUTSTANDING_BYTES = 1_000_000_000


class FileSubscription:
    """A directory-backed subscription executing lease/ack/flow-control."""

    def __init__(
        self,
        root: str,
        batch_size: int = 100,
        ack_deadline_s: float = 10.0,
        max_outstanding_messages: int = DEFAULT_MAX_OUTSTANDING_MESSAGES,
        max_outstanding_bytes: int = DEFAULT_MAX_OUTSTANDING_BYTES,
        clock=time.time,
    ):
        self.root = root.rstrip("/")
        self.batch_size = batch_size
        self.ack_deadline_s = ack_deadline_s
        self.max_outstanding_messages = max_outstanding_messages
        self.max_outstanding_bytes = max_outstanding_bytes
        self.clock = clock
        os.makedirs(self.root, exist_ok=True)

    # -- constructors applying the reference's settings derivation --------

    @classmethod
    def for_pubsub(cls, root: str, cfg: IngestConfig, **kw) -> "FileSubscription":
        """S1 (receiver.go:31-58): flow-control caps start at the client
        defaults and are raised to at least the batch bounds."""
        return cls(
            root,
            batch_size=cfg.batch.batch_size,
            max_outstanding_messages=max(
                DEFAULT_MAX_OUTSTANDING_MESSAGES, cfg.batch.batch_size
            ),
            max_outstanding_bytes=max(
                DEFAULT_MAX_OUTSTANDING_BYTES, cfg.batch.batch_memory_bytes
            ),
            **kw,
        )

    @classmethod
    def for_servicebus(cls, root: str, cfg: IngestConfig, **kw) -> "FileSubscription":
        """S2 (receiver.go:61-76): a batch iterator bounded by BatchSize;
        no receiver-side flow-control raise beyond the batch itself."""
        return cls(root, batch_size=cfg.batch.batch_size, **kw)

    # -- internals ---------------------------------------------------------

    def _backlog_dir(self) -> str:
        return f"{self.root}/backlog"

    def _state_path(self) -> str:
        return f"{self.root}/state.json"

    def _load_state(self) -> dict:
        try:
            with open(self._state_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"acked": {}, "leases": {}, "next_id": 0, "deliveries": {}}

    def _save_state(self, state: dict) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._state_path())

    # -- producer ----------------------------------------------------------

    def publish(self, messages: DataFrame) -> int:
        """Append a batch to the backlog.  `messages` carries data/
        attributes/ordering_key/publish_time (missing columns default);
        the broker assigns message ids — monotone across publish calls,
        in (publish_time, ordering_key, data) order within a call.

        The id window is batch-sized (one produce call), not
        backlog-sized — same bound as FileBroker.publish's offset window.

        Claim-ids -> write -> advance-next_id is one flock'd critical
        section (r7 VERDICT #4): concurrent publishers serialize instead
        of both claiming the same id window.
        """
        with state_lock(self._state_path()):
            return self._publish_locked(messages)

    def _publish_locked(self, messages: DataFrame) -> int:
        from pyspark.sql import Window

        state = self._load_state()
        base = state["next_id"]
        df = messages
        if "data" not in df.columns and "payload" in df.columns:
            df = df.withColumn("data", F.col("payload").cast("binary"))
        for col, default in (
            ("attributes", F.lit(None).cast(WIRE_SCHEMA["attributes"].dataType)),
            ("publish_time", F.current_timestamp()),
            ("ordering_key", F.lit(None).cast("string")),
        ):
            if col not in df.columns:
                df = df.withColumn(col, default)
        w = Window.orderBy("publish_time", "ordering_key", F.xxhash64("data"))
        wire = df.select(
            F.format_string(
                "m%09d", F.lit(base) + F.row_number().over(w) - F.lit(1)
            ).alias("message_id"),
            "data",
            "attributes",
            "publish_time",
            "ordering_key",
            F.length(F.coalesce(F.col("data"), F.lit(b""))).cast("long").alias(
                "size_bytes"
            ),
        )
        # single evaluation: ids and the advanced high-water mark must come
        # from the SAME materialization, or a non-deterministic input could
        # write k ids but advance next_id by a different count — duplicate
        # message_ids across publish calls (one ack would retire two rows)
        wire = wire.persist()
        wire.write.mode("append").parquet(self._backlog_dir())
        n = wire.count()
        wire.unpersist()
        state["next_id"] = base + n
        self._save_state(state)
        return n

    # -- consumer (S1/S2) --------------------------------------------------

    def pull(self, spark: SparkSession, max_messages: int | None = None) -> DataFrame:
        """Lease and return the next batch of deliverable messages.

        Deliverable = not acked and not under an active lease (an expired
        lease IS deliverable — that's the at-least-once redelivery).  The
        batch is bounded by min(batch_size, flow-control budget): both the
        outstanding-message and outstanding-byte caps count currently
        leased volume (receiver.go:38-44).

        Lease accounting (expire -> budget -> take -> save) runs under the
        state flock so two pullers never lease the same message twice
        within one deadline window.
        """
        with state_lock(self._state_path()):
            return self._pull_locked(spark, max_messages)

    def _pull_locked(self, spark: SparkSession, max_messages: int | None) -> DataFrame:
        now = self.clock()
        state = self._load_state()
        # expire stale leases (crashed consumer -> redelivery)
        active = {
            mid: (exp, size)
            for mid, (exp, size) in state["leases"].items()
            if exp > now
        }
        budget_msgs = min(
            self.batch_size if max_messages is None else max_messages,
            self.max_outstanding_messages - len(active),
        )
        budget_bytes = self.max_outstanding_bytes - sum(
            size for _, size in active.values()
        )
        if budget_msgs <= 0 or budget_bytes <= 0:
            return spark.createDataFrame([], WIRE_SCHEMA)

        import pandas as pd

        backlog = spark.read.schema(WIRE_SCHEMA).parquet(self._backlog_dir())
        blocked = set(state["acked"]) | set(active)
        candidates = backlog.select("message_id", "size_bytes", "publish_time")
        if blocked:
            # pandas frame -> Arrow batch transfer: a list-of-tuples
            # createDataFrame pickles row by row, which at a 100k-message
            # acked history costs ~a second PER PULL (measured at sf0.1)
            blocked_df = spark.createDataFrame(
                pd.DataFrame({"message_id": sorted(blocked)})
            )
            candidates = candidates.join(
                F.broadcast(blocked_df), "message_id", "left_anti"
            )
        # deterministic delivery order; listing bounded to the batch size
        head = candidates.orderBy("publish_time", "message_id").limit(
            budget_msgs
        ).collect()
        taken, used = [], 0
        for r in head:
            if (taken or active) and used + r["size_bytes"] > budget_bytes:
                # the oversize exception (a message larger than the cap is
                # still delivered) applies only when NOTHING is outstanding —
                # otherwise the leased volume would exceed the byte cap
                break
            taken.append(r["message_id"])
            used += r["size_bytes"]
            state["deliveries"][r["message_id"]] = (
                state["deliveries"].get(r["message_id"], 0) + 1
            )
            active[r["message_id"]] = (now + self.ack_deadline_s, r["size_bytes"])
        state["leases"] = {k: list(v) for k, v in active.items()}
        self._save_state(state)
        if not taken:
            return spark.createDataFrame([], WIRE_SCHEMA)
        ids = spark.createDataFrame(pd.DataFrame({"message_id": taken}))
        return backlog.join(F.broadcast(ids), "message_id", "left_semi")

    def ack(self, message_ids) -> None:
        """Retire messages permanently (Pub/Sub Ack / Service Bus Complete)."""
        with state_lock(self._state_path()):
            state = self._load_state()
            for mid in message_ids:
                state["acked"][mid] = True
                state["leases"].pop(mid, None)
            self._save_state(state)

    def nack(self, message_ids) -> None:
        """Drop the lease -> immediate redelivery (Pub/Sub Nack / Service
        Bus Abandon)."""
        with state_lock(self._state_path()):
            state = self._load_state()
            for mid in message_ids:
                state["leases"].pop(mid, None)
            self._save_state(state)

    # Service Bus vocabulary (servicebus iterator Complete/Abandon)
    complete = ack
    abandon = nack

    def stats(self) -> dict:
        """{"backlog_published", "acked", "leased", "deliveries"} — the
        deliveries map makes at-least-once observable in tests."""
        now = self.clock()
        state = self._load_state()
        return {
            "backlog_published": state["next_id"],
            "acked": len(state["acked"]),
            "leased": sum(1 for exp, _ in state["leases"].values() if exp > now),
            "deliveries": dict(state["deliveries"]),
        }


def decode_pubsub(raw: DataFrame, subscription: str) -> DataFrame:
    """Wire rows -> MESSAGE_SCHEMA, the Pub/Sub analogue of decode_kafka:
    business keys and version arrive as broker attributes and are promoted
    to columns (the index build later strips the promoted attributes —
    sender.go:136-160, unchanged downstream)."""
    attr = lambda k: F.element_at(F.coalesce(  # noqa: E731
        F.col("attributes"), F.create_map().cast("map<string,string>")
    ), k)
    return raw.select(
        F.lit(subscription).alias("broker_id"),
        F.col("message_id").alias("broker_msg_id"),
        F.col("ordering_key"),
        F.col("data").cast("string").alias("payload"),
        F.col("attributes"),
        attr("business_source_key").alias("business_source_key"),
        attr("business_object_key").alias("business_object_key"),
        attr("attr_version").alias("attr_version"),
        F.col("publish_time"),
        F.current_timestamp().alias("ingestion_time"),
        F.lit(None).cast("long").alias("event_seq"),
        attr("event_type").alias("event_type"),
    )
