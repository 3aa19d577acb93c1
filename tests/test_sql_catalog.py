"""SQL catalog: the persistor tables as plain Spark SQL relations."""

import pytest

from persistor_spark import sql_catalog
from persistor_spark.plans import ingest


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory, ingested):
    base = tmp_path_factory.mktemp("cat")
    ingest.write_blobs(ingested, str(base / "blobs"), fmt="parquet")
    ingest.write_index(ingested, str(base / "index"))
    ingested.deadletter.write.parquet(str(base / "dlq"))
    views = sql_catalog.register_catalog(
        spark,
        index_path=str(base / "index"),
        blob_path=str(base / "blobs"),
        deadletter_path=str(base / "dlq"),
    )
    sql_catalog.register_derived_views(spark)
    return views


def test_base_views_queryable(spark, catalog, ingested):
    n = spark.sql("SELECT count(*) FROM index_metadata").collect()[0][0]
    assert n == ingested.index_metadata.count()
    assert spark.sql("SELECT count(*) FROM deadletter").collect()[0][0] == (
        ingested.deadletter.count()
    )


def test_arbitrary_sql_over_catalog(spark, catalog):
    # something the 4 reference endpoints cannot express: windowed dedup audit
    rows = spark.sql(
        """
        SELECT broker_id, count(*) AS n,
               count(DISTINCT location_key) AS blobs,
               max(location_position) AS deepest
        FROM index_metadata GROUP BY broker_id ORDER BY broker_id
        """
    ).collect()
    assert len(rows) == 4 and all(r["n"] > 0 for r in rows)


def test_reconstructed_messages_view(spark, catalog, ingested):
    n = spark.sql("SELECT count(*) FROM reconstructed_messages").collect()[0][0]
    assert n == ingested.index_metadata.count()
    sample = spark.sql(
        "SELECT unique_id, payload FROM reconstructed_messages "
        "WHERE payload IS NULL LIMIT 1"
    ).collect()
    assert sample == []


def test_blob_manifest_view(spark, catalog, ingested):
    n = spark.sql("SELECT count(*) FROM blob_manifest").collect()[0][0]
    assert n == ingested.index_metadata.select("location_key").distinct().count()


def test_analytics_views_queryable_via_sql(spark, sf_dir):
    from persistor_spark import sql_catalog

    created = sql_catalog.register_analytics_views(spark, sf_dir)
    assert {"documents", "doc_stats", "doc_quality", "dataset_card"} <= set(created)
    # plain SQL over the derived views, composing a join + filter
    row = spark.sql(
        """
        SELECT count(*) AS n
        FROM doc_quality q JOIN doc_stats s ON q.doc_id = s.doc_id
        WHERE q.keep AND s.token_count >= 20
        """
    ).collect()[0]
    assert row["n"] > 0
    card = spark.sql("SELECT n_docs, quality_pass_rate FROM dataset_card").collect()[0]
    assert card["n_docs"] == spark.table("documents").count()
    # pushdown: the filter reaches the leaf — the parquet scan's
    # PushedFilters, or the cache filter when another test already cached
    # the documents table (Spark substitutes the InMemoryRelation)
    plan = (
        spark.sql("SELECT doc_id FROM doc_stats WHERE doc_id = 7")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EqualTo(doc_id,7)" in plan or "= 7)" in plan
