"""DuckDB-oracle CTE builders.

The driver's correctness gate runs each __spark_entry__.queries() entry AND
its oracle_sql() twin, hashing both result sets.  The persistor tables don't
exist as parquet — they are derived from `events` (FIXTURES.md) — so every
oracle query starts from these CTEs, which replicate plans.ingest.run_batch's
semantics in portable ANSI SQL.  MESSAGES_SQL itself is shared verbatim with
the Spark fixture loader (persistor_spark.fixtures), so the two sides cannot
drift at the messages layer; the index/blob/deadletter CTEs mirror the
DataFrame pipeline and are pinned by the D-series queries.
"""

from __future__ import annotations

from persistor_spark.fixtures import DEADLETTER_PRED_SQL, MESSAGES_SQL

# location_key as built by operators.blob_naming with the fixture config:
# bucket=persistor-bucket, prefix=msg, mask=year/month/day + {attr_version},
# blob name = broker_id, clock = ingestion_time.
_LOCATION_KEY_SQL = """
    'gs://persistor-bucket/msg/'
      || CAST(year(ingestion_time) AS STRING) || '/'
      || lpad(CAST(month(ingestion_time) AS STRING), 2, '0') || '/'
      || lpad(CAST(day(ingestion_time) AS STRING), 2, '0') || '/'
      || coalesce(attr_version, 'unknown') || '/'
      || 'blob-' || broker_id || '.avro'
"""

# Shared CTE prologue: messages -> live (non-dead-lettered) -> keyed (ids +
# location) -> pos (window positions).
CTE_PROLOGUE = f"""
WITH messages AS ({MESSAGES_SQL}),
live AS (
  SELECT * FROM messages WHERE NOT ({DEADLETTER_PRED_SQL})
),
keyed AS (
  SELECT *,
    broker_id || '_' || broker_msg_id AS unique_id,
    CASE WHEN business_source_key IS NOT NULL AND business_object_key IS NOT NULL
         THEN business_source_key || '_' || business_object_key END AS index_source_key,
    {_LOCATION_KEY_SQL} AS location_key
  FROM live
),
pos AS (
  SELECT *,
    count(*) OVER (PARTITION BY location_key) AS blob_n,
    CAST(row_number() OVER (PARTITION BY location_key ORDER BY unique_id) AS INT) AS rn
  FROM keyed
),
index_metadata AS (
  SELECT broker_id, broker_msg_id, unique_id, business_source_key,
         business_object_key, index_source_key, ordering_key, location_key,
         CASE WHEN blob_n = 1 THEN NULL ELSE rn END AS location_position,
         publish_time, ingestion_time,
         ingestion_time + INTERVAL 1 MINUTE AS indexer_ingestion_time,
         FALSE AS confirmation_flag
  FROM pos
),
blob_records AS (
  SELECT location_key, rn AS position, unique_id AS record_id, payload
  FROM pos
),
deadletter AS (
  SELECT broker_id || '_' || broker_msg_id AS unique_id, payload,
         CASE CAST(event_seq % 3 AS INT)
           WHEN 0 THEN 'Storage error'
           WHEN 1 THEN 'Metadata parser error'
           ELSE 'MongoDB storage error' END AS dead_letter_error_category,
         'simulated persist failure' AS dead_letter_error_reason,
         CASE WHEN event_seq % 3 = 2 THEN 'Dataphos Persistor - Indexer'
              ELSE 'Dataphos Persistor - Core' END AS dead_letter_source
  FROM messages WHERE {DEADLETTER_PRED_SQL}
)
"""


def with_prologue(query: str) -> str:
    """Wrap a SELECT that references the derived persistor tables."""
    return CTE_PROLOGUE + query
