"""Filter-dialect translator golden cases (reference: mongo.go:212-239,
util.go:190-285; SURVEY.md §7.3 hard point 5)."""

import pytest
from pyspark.sql import Row, functions as F

from persistor_spark.functions import filters as fd


@pytest.fixture(scope="module")
def idx(spark):
    schema = (
        "unique_id string, broker_id string, ordering_key string, "
        "business_source_key string, location_position int, "
        "publish_time timestamp, additional_metadata map<string,string>"
    )
    rows = [
        ("u1", "b0", "k1", "src1", 1, None, {"a": "1", "b": "x"}),
        ("u2", "b0", "k2", "src2", 2, None, {"a": "2"}),
        ("u3", "b1", "k1", None, None, None, {}),
    ]
    return spark.createDataFrame(rows, schema)


def ids(df):
    return sorted(r[0] for r in df.select("unique_id").collect())


def test_equality_conjunction(idx):
    got = idx.filter(fd.translate([{"broker_id": "b0", "ordering_key": "k1"}]))
    assert ids(got) == ["u1"]


def test_or_of_ands(idx):
    got = idx.filter(
        fd.translate([{"broker_id": "b1"}, {"ordering_key": "k2"}])
    )
    assert ids(got) == ["u2", "u3"]


def test_operator_docs(idx):
    got = idx.filter(fd.translate([{"location_position": {"$gte": 2}}]))
    assert ids(got) == ["u2"]
    got = idx.filter(fd.translate([{"ordering_key": {"$in": ["k1", "k9"]}}]))
    assert ids(got) == ["u1", "u3"]
    got = idx.filter(fd.translate([{"location_position": {"$gte": 1, "$lt": 2}}]))
    assert ids(got) == ["u1"]


def test_additional_metadata_dotted_path(idx):
    """`additional_metadata.<key>` prefix is queryable (util.go:208-220)."""
    got = idx.filter(fd.translate([{"additional_metadata.a": "2"}]))
    assert ids(got) == ["u2"]


def test_empty_or_matches_nothing(idx):
    assert idx.filter(fd.translate([])).count() == 0


def test_empty_conjunction_matches_all(idx):
    assert idx.filter(fd.translate([{}])).count() == 3


def test_invalid_key_rejected():
    with pytest.raises(fd.InvalidQueryKeys):
        fd.translate([{"no_such_field": 1}])


def test_unsupported_operator_rejected():
    with pytest.raises(fd.InvalidQueryKeys):
        fd.translate([{"broker_id": {"$regex": "b.*"}}])


def test_timestamp_coercion():
    flt = fd.coerce_timestamps([{"publish_time": "2024-01-03T00:00:00Z"}])
    import datetime

    assert flt[0]["publish_time"] == datetime.datetime(2024, 1, 3, tzinfo=datetime.timezone.utc)
    flt = fd.coerce_timestamps([{"publish_time": {"$gte": "2024-01-03T12:30:00.5Z"}}])
    assert flt[0]["publish_time"]["$gte"].microsecond == 500000


def test_timestamp_in_list_coerced_elementwise():
    # $in/$nin operands are lists of wire strings; each element parses
    # individually (util.go:222-253 walks operator-doc values recursively).
    import datetime

    flt = fd.coerce_timestamps(
        [{"publish_time": {"$in": ["2024-01-03T00:00:00Z", "2024-01-04T00:00:00Z"]}}]
    )
    got = flt[0]["publish_time"]["$in"]
    assert got == [
        datetime.datetime(2024, 1, 3, tzinfo=datetime.timezone.utc),
        datetime.datetime(2024, 1, 4, tzinfo=datetime.timezone.utc),
    ]
    with pytest.raises(fd.InvalidTimestamp):
        fd.coerce_timestamps([{"publish_time": {"$in": ["2024-01-03T00:00:00Z", "nope"]}}])


def test_timestamp_garbage_rejected():
    with pytest.raises(fd.InvalidTimestamp):
        fd.coerce_timestamps([{"publish_time": "not-a-time"}])
    with pytest.raises(fd.InvalidTimestamp):
        fd.coerce_timestamps([{"ingestion_time": 12345}])


def test_non_timestamp_fields_untouched():
    flt = fd.coerce_timestamps([{"broker_id": "b0"}])
    assert flt == [{"broker_id": "b0"}]


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    """The translated Column must reach the parquet scan as a pushed filter —
    the Catalyst analogue of the reference's Mongo-side filtering (§4.1)."""
    p = str(tmp_path / "idx")
    spark.range(100).selectExpr(
        "cast(id as string) as unique_id", "'b0' as broker_id"
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p).filter(fd.translate([{"unique_id": "7"}]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "unique_id" in plan
