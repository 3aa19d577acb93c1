"""Broker source/sink configuration builders (reference S1-S3 receivers,
K7/K8 topic factories).

Kafka is first-class in Spark (streaming.ingest_stream.kafka_stream).  GCP
Pub/Sub and Azure Service Bus have no built-in Spark source; production
deployments use the public connectors (e.g. the Pub/Sub Lite / Service Bus
Spark connectors) — absent those jars this module still provides the full
OPTION MAPPING from the reference's batch settings, so a deployment with the
connector on the classpath is a one-line `.format(...)` swap, and a container
without it fails with a clear error instead of a Spark class-not-found.
"""

from __future__ import annotations

from persistor_spark.config import IngestConfig


class ConnectorUnavailable(RuntimeError):
    pass


def pubsub_source_options(cfg: IngestConfig, project: str, subscription: str) -> dict:
    """S1 (receiver.go:31-58): outstanding messages/bytes are raised to at
    least the batch bounds — mapped onto the connector's flow-control knobs."""
    return {
        "projectId": project,
        "subscriptionId": subscription,
        "maxMessagesPerPull": str(cfg.batch.batch_size),
        "maxOutstandingMessages": str(cfg.batch.batch_size),
        "maxOutstandingBytes": str(max(cfg.batch.batch_memory_bytes, 1024)),
        "maxWaitMs": str(cfg.batch.batch_timeout_s * 1000),
    }


def servicebus_source_options(cfg: IngestConfig, namespace: str, topic: str, subscription: str) -> dict:
    """S2 (receiver.go:61-76): batch iterator bounds."""
    return {
        "namespace": namespace,
        "topic": topic,
        "subscription": subscription,
        "maxBatchSize": str(cfg.batch.batch_size),
        "maxWaitTimeMs": str(cfg.batch.batch_timeout_s * 1000),
    }


def pubsub_stream(spark, cfg: IngestConfig, project: str, subscription: str):
    """readStream for Pub/Sub — requires a connector jar on the classpath."""
    opts = pubsub_source_options(cfg, project, subscription)
    try:
        return spark.readStream.format("pubsublite").options(**opts).load()
    except Exception as exc:  # noqa: BLE001
        raise ConnectorUnavailable(
            "Pub/Sub Spark connector not on the classpath; deploy the "
            "connector jar or bridge through Kafka (the reference supports "
            "both brokers interchangeably)"
        ) from exc


def kafka_sink_options(bootstrap: str, topic: str, batch_size: int = 5000, batch_bytes: int = 1_000_000) -> dict:
    """K7 (sender/initialization.go:35-91): publisher batch settings.  The
    `key` column of the sink DataFrame carries the ordering key (R7: broker
    preserves per-key order per partition)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
        "kafka.batch.size": str(batch_bytes),
        "kafka.linger.ms": "5",
        "kafka.max.in.flight.requests.per.connection": "1",  # per-key ordering
        "kafka.enable.idempotence": "true",
    }


def publish_kafka(records_kafka_ready, bootstrap: str, topic: str, checkpoint: str):
    """K8: publish resubmit records (resubmit.resubmit()'s kafka_ready
    projection) — ordering-key rows keep order via the key column."""
    return (
        records_kafka_ready.write.format("kafka")
        .options(**kafka_sink_options(bootstrap, topic))
        .save()
    )
