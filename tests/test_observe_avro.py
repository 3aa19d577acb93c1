"""observe()-based lineage and blob-format resolution."""

from pyspark.sql import functions as F

from persistor_spark.plans import ingest, resubmit


def test_resubmit_observed_counters(ingested):
    meta = ingested.index_metadata.filter(F.col("broker_id") == "b0").limit(25)
    records, meta_obs, rec_obs = resubmit.resubmit_observed(meta, ingested.blob_records)
    n = records.count()  # the single action materializes both observations
    assert rec_obs.get["published"] == n
    assert meta_obs.get["starting"] == 25
    counts = resubmit.LineageCounts(
        starting=meta_obs.get["starting"],
        indexed=meta_obs.get["starting"],
        fetched=rec_obs.get["published"],
        deserialized=rec_obs.get["published"],
        published=rec_obs.get["published"],
    )
    assert counts.http_status() == 200


def test_avro_fallback_resolution(spark):
    # the test container has no spark-avro module -> parquet fallback;
    # on distros with the module this resolves to avro unchanged
    resolved = ingest.resolve_blob_format(spark, "avro")
    assert resolved in ("avro", "parquet")
    if not ingest.avro_available(spark):
        assert resolved == "parquet"
    assert ingest.resolve_blob_format(spark, "parquet") == "parquet"


def test_write_blobs_with_avro_request(spark, tmp_path, ingested):
    """Requesting avro must not crash on a distro without the module."""
    path = str(tmp_path / "blobs_avro")
    ingest.write_blobs(ingested, path, fmt="avro")
    back = spark.read.parquet(path) if not ingest.avro_available(spark) else (
        spark.read.format("avro").load(path)
    )
    assert back.count() == ingested.blob_records.count()
