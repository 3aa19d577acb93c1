"""SQL catalog surface: expose the persistor tables to plain Spark SQL.

The reference's query surface is 4 fixed HTTP endpoints; this engine's
north star is an *analytics engine*, so the same tables are first-class SQL
relations — `spark.sql("SELECT ... FROM index_metadata ...")` — with every
Catalyst capability (joins, windows, rollups) available over them, not just
the 4 operations.  IndexQuery remains the parity API; this module is the
superset face.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from persistor_spark.sources import blobs as blob_src


def register_catalog(
    spark: SparkSession,
    index_path: str | None = None,
    blob_path: str | None = None,
    deadletter_path: str | None = None,
    blob_format: str = "parquet",
) -> dict:
    """Register persisted engine tables as temp views; returns {name: df}.
    Missing paths are skipped (e.g. a deployment with no DLQ yet)."""
    out: dict[str, DataFrame] = {}
    if index_path:
        out["index_metadata"] = spark.read.parquet(index_path)
    if blob_path:
        out["blob_records"] = blob_src.read_blob_records(spark, blob_path, fmt=blob_format)
    if deadletter_path:
        try:
            out["deadletter"] = spark.read.parquet(deadletter_path)
        except Exception:  # noqa: BLE001 — empty DLQ: no files yet
            pass
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out


# Canned views joining the catalog the way the services did — registered as
# SQL on top of the base views so users can build on them.
_DERIVED_VIEWS = {
    # every reconstructable message with its payload (the resubmit join as a view)
    "reconstructed_messages": """
        SELECT m.unique_id, m.ordering_key, m.business_source_key,
               m.business_object_key, m.index_source_key, m.location_key,
               m.location_position, m.publish_time, b.payload
        FROM index_metadata m JOIN blob_records b
          ON m.location_key = b.location_key
         AND m.location_position = b.position
        UNION ALL
        SELECT m.unique_id, m.ordering_key, m.business_source_key,
               m.business_object_key, m.index_source_key, m.location_key,
               m.location_position, m.publish_time, b.payload
        FROM index_metadata m JOIN blob_records b
          ON m.location_key = b.location_key
        WHERE m.location_position IS NULL
    """,
    # per-blob manifest (R4's grouping as a view)
    "blob_manifest": """
        SELECT location_key, count(*) AS n_records,
               min(location_position) AS min_position,
               max(location_position) AS max_position,
               min(publish_time) AS first_publish,
               max(publish_time) AS last_publish
        FROM index_metadata GROUP BY location_key
    """,
}


def register_derived_views(spark: SparkSession) -> list:
    """Register the canned derived views (requires base views present)."""
    created = []
    for name, sql in _DERIVED_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")
        created.append(name)
    return created


def register_analytics_views(spark: SparkSession, sf_dir: str) -> list:
    """SQL face for the analytics side: register the corpus tables
    (`documents`, `embeddings`, `events`) plus derived views computed by the
    analytics operators — so a SQL-speaking user reads quality flags, text
    stats, and the dataset card with plain `spark.sql(...)`, every Catalyst
    capability composing on top.  The views are lazy DataFrames: nothing
    computes until queried, and filters/projections push through them into
    the parquet scans."""
    from persistor_spark.analytics import profiling, text
    from persistor_spark.sources.registry import load_table

    created = []
    for t in ("documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        created.append(t)
    docs = load_table(spark, sf_dir, "documents")
    for name, df in (
        ("doc_stats", text.with_text_stats(docs)),
        ("doc_quality", text.gopher_flags(docs)),
        ("dataset_card", profiling.dataset_card(docs)),
    ):
        df.createOrReplaceTempView(name)
        created.append(name)
    return created
