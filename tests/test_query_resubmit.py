"""Query-surface + resubmit pipeline behavior (reference:
indexer-api/lib/indexer.go:41-90, resubmitter_test.go golden flows)."""

import datetime

from pyspark.sql import functions as F

from persistor_spark.plans import resubmit
from persistor_spark.plans.query import IndexQuery


def test_point_lookup_projection(ingested):
    iq = IndexQuery(ingested.index_metadata)
    row = iq.get("b1_m000000085").collect()
    assert len(row) == 1
    assert row[0]["unique_id"] == "b1_m000000085"


def test_interval_envelope(ingested):
    iq = IndexQuery(ingested.index_metadata)
    res = iq.get_interval(
        datetime.datetime(2024, 1, 5),
        datetime.datetime(2024, 1, 10),
        "b1",
        limit=10,
        offset=0,
    )
    assert res.total_count >= res.returned_count
    assert res.returned_count == res.messages.count() == min(res.total_count, 10)
    assert res.limit == 10 and res.offset == 0


def test_interval_pagination_stable(ingested):
    """Pages are disjoint and ordered (our deterministic deviation from
    Mongo natural order, SURVEY.md §4.3)."""
    iq = IndexQuery(ingested.index_metadata)
    args = (datetime.datetime(2024, 1, 2), datetime.datetime(2024, 1, 20), "b2")
    p1 = [r[0] for r in iq.get_interval(*args, limit=5, offset=0).messages.select("unique_id").collect()]
    p2 = [r[0] for r in iq.get_interval(*args, limit=5, offset=5).messages.select("unique_id").collect()]
    assert len(set(p1) & set(p2)) == 0
    assert p1 == sorted(p1) and p2 == sorted(p2)
    assert p1[-1] < p2[0]


def test_interval_excludes_upper_bound(ingested):
    iq = IndexQuery(ingested.index_metadata)
    lo, hi = datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 6)
    res = iq.query_df(
        [{"broker_id": "b1", "publish_time": {"$gte": lo.isoformat() + "Z", "$lt": hi.isoformat() + "Z"}}]
    )
    n_direct = iq.get_interval_count(lo, hi, "b1")
    assert res.count() == n_direct


def test_get_all_df_semi_join(ingested, spark):
    ids = ["b1_m000000085", "b0_m000000004", "zz_none"]
    iq = IndexQuery(ingested.index_metadata)
    df = iq.get_all_df(spark.createDataFrame([(i,) for i in ids], "unique_id string"))
    got = sorted(r["unique_id"] for r in df.select("unique_id").collect())
    assert got == ["b0_m000000004", "b1_m000000085"]


def test_resubmit_round_trip(ingested):
    """Every indexed message is reconstructed with its original payload
    (the reference's golden resubmit expectation, resubmitter_test.go:52-1045)."""
    records = resubmit.align(ingested.index_metadata, ingested.blob_records)
    n_idx = ingested.index_metadata.count()
    assert records.count() == n_idx
    # payload joined by position must equal payload joined by id
    by_id = ingested.index_metadata.join(
        ingested.blob_records.select(F.col("record_id").alias("unique_id"), "payload"),
        "unique_id",
    ).select("unique_id", "payload")
    mismatch = records.select("unique_id", "payload").exceptAll(by_id)
    assert mismatch.count() == 0


def test_resubmit_subset_broadcast(ingested):
    """Replaying a small id set broadcasts the metadata side (the common
    production shape: few blobs touched)."""
    meta = ingested.index_metadata.filter(F.col("broker_id") == "b2").limit(50)
    records, kafka_ready = resubmit.resubmit(meta, ingested.blob_records, broadcast_metadata=True)
    n = records.count()
    assert 0 < n <= 50
    assert set(kafka_ready.columns) == {"key", "value", "publish_seq"}


def test_lineage_counts_and_status(ingested):
    meta = ingested.index_metadata.limit(20)
    records = resubmit.align(meta, ingested.blob_records)
    counts = resubmit.lineage(meta, records)
    assert counts.starting == 20
    assert counts.published == 20
    assert counts.http_status() == 200
    # partial failure -> 206 (handler.go:115-139 rules)
    partial = resubmit.LineageCounts(10, 10, 8, 8, 8)
    assert partial.http_status() == 206
    dead = resubmit.LineageCounts(10, 0, 0, 0, 0)
    assert dead.http_status() == 400


def test_locations_touched_matches_group_by(ingested):
    g = resubmit.locations_touched(ingested.index_metadata)
    assert g.count() == ingested.index_metadata.select("location_key").distinct().count()


def test_publish_order_preserved_per_key(spark, ingested, tmp_path):
    """R7 end to end: the publish sink must observe each ordering key's
    records in publish_seq order (resubmitter_job.go:387-455 publishes each
    key sequentially with max-in-flight 1).  publish_files_ordered writes
    the exact partitioning + intra-partition order publish_kafka hands the
    producer; reading files back in physical row order makes the guarantee
    observable."""
    from pyspark.sql import Window

    from persistor_spark.sources import blobs as blob_src, brokers

    _, kafka_ready = resubmit.resubmit(ingested.index_metadata, ingested.blob_records)
    out = str(tmp_path / "pub")
    brokers.publish_files_ordered(kafka_ready, out)

    got = blob_src.positions_from_files(spark.read.parquet(out))
    # within each (file=producer partition, key): physical order == seq order
    w = Window.partitionBy("location_key", "key").orderBy("position")
    viol = (
        got.withColumn("prev", F.lag("publish_seq").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") >= F.col("publish_seq")))
    )
    assert viol.count() == 0
    # every key lands wholly in ONE producer partition
    spread = (
        got.select("location_key", "key").distinct().groupBy("key").count().filter("count > 1")
    )
    assert spread.count() == 0
    # non-vacuous: multi-record keys exist
    assert got.groupBy("key").count().filter("count > 1").count() > 0
    # sequences are dense 1..n per key
    stats = got.groupBy("key").agg(
        F.count("*").alias("n"), F.min("publish_seq").alias("mn"), F.max("publish_seq").alias("mx")
    )
    assert stats.filter((F.col("mn") != 1) | (F.col("mx") != F.col("n"))).count() == 0
