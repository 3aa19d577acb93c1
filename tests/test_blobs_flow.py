"""Blob read-back round trip (S4/S5 + R5/R6 over real files) and flow-control
policy (E2/E3)."""

import pytest
from pyspark.sql import functions as F

from persistor_spark.plans import ingest, resubmit
from persistor_spark.sources import blobs
from persistor_spark.streaming import flow_control as fc


def test_write_read_resubmit_round_trip(spark, tmp_path, ingested):
    """Persist blobs to disk, read them back, position-join against the
    index: every indexed message reconstructs with its payload."""
    path = str(tmp_path / "blobstore")
    ingest.write_blobs(ingested, path, fmt="parquet")
    back = blobs.read_blob_records(spark, path)
    assert back.count() == ingested.blob_records.count()

    records = resubmit.align(ingested.index_metadata, back)
    assert records.count() == ingested.index_metadata.count()
    by_id = ingested.index_metadata.join(
        ingested.blob_records.select(F.col("record_id").alias("unique_id"), "payload"),
        "unique_id",
    ).select("unique_id", "payload")
    assert records.select("unique_id", "payload").exceptAll(by_id).count() == 0


def test_prune_to_locations_semi_join(spark, tmp_path, ingested):
    path = str(tmp_path / "blobstore2")
    ingest.write_blobs(ingested, path, fmt="parquet")
    back = blobs.read_blob_records(spark, path)
    meta = ingested.index_metadata.filter(F.col("broker_id") == "b1").limit(30)
    pruned = blobs.prune_to_locations(back, meta)
    wanted = {r[0] for r in meta.select("location_key").distinct().collect()}
    got = {r[0] for r in pruned.select("location_key").distinct().collect()}
    assert got == wanted


def test_positions_from_files_foreign_layout(spark, tmp_path):
    """A foreign blob dir (no position column): positions reconstruct
    1..n per file from physical order."""
    p = str(tmp_path / "foreign")
    spark.range(100).selectExpr("cast(id as string) as record_id").coalesce(1).write.parquet(
        p + "/f1"
    )
    spark.range(100, 150).selectExpr("cast(id as string) as record_id").coalesce(1).write.parquet(
        p + "/f2"
    )
    df = spark.read.parquet(p + "/f1", p + "/f2")
    got = blobs.positions_from_files(df, order_col="record_id")
    stats = got.groupBy("location_key").agg(
        F.min("position").alias("mn"), F.max("position").alias("mx"), F.count("*").alias("n")
    )
    for r in stats.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"]


# -- flow control ------------------------------------------------------------

def test_classify():
    assert fc.classify(fc.FatalIngestError("x")) == "fatal"
    assert fc.classify(fc.TemporaryIngestError("x")) == "temporary"
    assert fc.classify(RuntimeError("x")) == "temporary"

    class AnalysisException(Exception):
        pass

    assert fc.classify(AnalysisException("schema")) == "fatal"


def test_error_budget_window():
    b = fc.ErrorBudget(max_errors=3, window_s=60)
    assert b.record(now=0.0) and b.record(now=1.0) and b.record(now=2.0)
    assert not b.record(now=3.0)  # 4th inside the window
    # events age out of the window
    assert b.record(now=100.0)
    assert b.current == 1


def test_guard_batch_policy():
    budget = fc.ErrorBudget(max_errors=2, window_s=60)

    def ok():
        return "fine"

    def temp_fail():
        raise fc.TemporaryIngestError("blip")

    def fatal_fail():
        raise fc.FatalIngestError("schema broke")

    assert fc.guard_batch(budget, ok) == "fine"
    assert fc.guard_batch(budget, temp_fail) is None  # swallowed, counted
    assert fc.guard_batch(budget, temp_fail) is None
    with pytest.raises(fc.BudgetExhausted):
        fc.guard_batch(budget, temp_fail)
    with pytest.raises(fc.FatalIngestError):
        fc.guard_batch(budget, fatal_fail)


# ---------------------------------------------------------------------------
# S6: Mongo payload fetcher (directory-store stand-in, reference mongo.go)
# ---------------------------------------------------------------------------

def _mongo_store(spark, tmp_path):
    from persistor_spark.sources import mongo_payloads as mp

    root = str(tmp_path / "mongostore")
    a = spark.createDataFrame(
        [(f"m{i}", bytes(f"payload-a-{i}", "utf8")) for i in range(5)],
        "id string, data binary",
    )
    b = spark.createDataFrame(
        [(f"m{i}", bytes(f"payload-b-{i}", "utf8")) for i in range(3)],
        "id string, data binary",
    )
    mp.write_collection(a, root, "colA")
    mp.write_collection(b, root, "colB")
    return root


def test_mongo_fetch_joins_per_collection(spark, tmp_path):
    from persistor_spark.sources import mongo_payloads as mp

    root = _mongo_store(spark, tmp_path)
    locs = spark.createDataFrame(
        [("colA/m1",), ("colA/m4",), ("colB/m0",)], "location_key string"
    )
    got = {r["location_key"]: r for r in mp.fetch_payloads(spark, root, locs).collect()}
    assert got["colA/m1"]["data"] == b"payload-a-1"
    assert got["colA/m4"]["data"] == b"payload-a-4"
    assert got["colB/m0"]["data"] == b"payload-b-0"
    assert all(r["error_category"] is None for r in got.values())


def test_mongo_fetch_routes_errors_rowwise(spark, tmp_path):
    from persistor_spark.sources import mongo_payloads as mp

    root = _mongo_store(spark, tmp_path)
    locs = spark.createDataFrame(
        [("colA/m1",), ("colA/m99",), ("noslash",), ("a/b/c",), ("/m1",)],
        "location_key string",
    )
    got = {r["location_key"]: r for r in mp.fetch_payloads(spark, root, locs).collect()}
    assert got["colA/m1"]["error_category"] is None
    assert got["colA/m99"]["error_category"] == mp.NOT_FOUND
    for bad in ("noslash", "a/b/c"):
        assert got[bad]["error_category"] == mp.INVALID_KEY
        assert got[bad]["data"] is None
    # empty-segment keys parse (reference only checks segment COUNT,
    # mongo.go:155-162) and surface as not-found, like FindOne would
    assert got["/m1"]["error_category"] == mp.NOT_FOUND
    assert got["/m1"]["data"] is None


def test_mongo_fetch_missing_collection_routes_not_found(spark, tmp_path):
    # a well-formed key referencing an absent collection must NOT abort the
    # replay: the reference's FindOne yields per-key ErrNoDocuments
    from persistor_spark.sources import mongo_payloads as mp

    root = _mongo_store(spark, tmp_path)
    locs = spark.createDataFrame(
        [("colA/m1",), ("ghost/m1",), ("ghost/m2",)], "location_key string"
    )
    got = {r["location_key"]: r for r in mp.fetch_payloads(spark, root, locs).collect()}
    assert got["colA/m1"]["error_category"] is None
    assert got["ghost/m1"]["error_category"] == mp.NOT_FOUND
    assert got["ghost/m2"]["error_category"] == mp.NOT_FOUND
    # ... including when EVERY referenced collection is absent
    only_ghost = spark.createDataFrame([("ghost/m1",)], "location_key string")
    rows = mp.fetch_payloads(spark, root, only_ghost).collect()
    assert rows[0]["error_category"] == mp.NOT_FOUND


def test_mongo_fetch_null_payload_is_not_an_error(spark, tmp_path):
    # a stored document whose data is legitimately NULL decodes as an empty
    # payload with NO error (the reference returns record.Data as-is)
    from persistor_spark.sources import mongo_payloads as mp

    root = str(tmp_path / "nullstore")
    recs = spark.createDataFrame(
        [("m0", b"x"), ("m1", None)], "id string, data binary"
    )
    mp.write_collection(recs, root, "colN")
    locs = spark.createDataFrame(
        [("colN/m0",), ("colN/m1",), ("colN/m9",)], "location_key string"
    )
    got = {r["location_key"]: r for r in mp.fetch_payloads(spark, root, locs).collect()}
    assert got["colN/m0"]["error_category"] is None
    assert got["colN/m1"]["error_category"] is None and got["colN/m1"]["data"] is None
    assert got["colN/m9"]["error_category"] == mp.NOT_FOUND


def test_mongo_connector_env_contract(monkeypatch):
    from persistor_spark.sources import mongo_payloads as mp

    monkeypatch.delenv(mp.CONNECTION_STRING_ENV, raising=False)
    monkeypatch.setenv(mp.STORAGE_DATABASE_ENV, "persistor")
    try:
        mp.mongo_connector_options("colA")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
    monkeypatch.setenv(mp.CONNECTION_STRING_ENV, "mongodb://h:27017")
    opts = mp.mongo_connector_options("colA")
    assert opts == {
        "spark.mongodb.read.connection.uri": "mongodb://h:27017",
        "spark.mongodb.read.database": "persistor",
        "spark.mongodb.read.collection": "colA",
    }


def test_mongo_fetch_corrupt_collection_propagates(spark, tmp_path):
    """Only the missing-path case routes as document_not_found; a genuine
    store failure (corrupt parquet footer here) must propagate — the
    reference distinguishes ErrNoDocuments from decode/IO errors
    (mongo.go:128-133)."""
    import pytest

    from persistor_spark.sources import mongo_payloads as mp

    root = _mongo_store(spark, tmp_path)
    corrupt = tmp_path / "mongostore" / "colX"
    corrupt.mkdir(parents=True, exist_ok=True)
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    locs = spark.createDataFrame(
        [("colA/m1",), ("colX/m1",)], "location_key string"
    )
    with pytest.raises(Exception) as exc_info:
        mp.fetch_payloads(spark, root, locs).collect()
    # never misreported as the per-document not-found route
    assert mp.NOT_FOUND not in str(exc_info.value)
