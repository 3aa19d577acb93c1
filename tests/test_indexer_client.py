"""S7 — Indexer-API HTTP client against a LIVE in-process Indexer API.

Reference parity checked live over the wire:
- GetAll chunking by MetadataCapacity (resubmitter_job.go:120-147),
- interval/query paging with offset += returned_count until total_count
  (resubmitter_job.go:157-196, 212-251),
- wire-timestamp round trip (indexer.go:224 dateFormat),
- the distributed mapInPandas interval pull equals the driver loop.
"""

import datetime

import pytest

from persistor_spark import server as srv
from persistor_spark.plans.query import IndexQuery
from persistor_spark.sources.indexer_client import (
    DEFAULT_METADATA_CAPACITY,
    IndexerHttpClient,
    from_env,
)

LB = datetime.datetime(2000, 1, 1)
# the server rejects a future upper bound (util.go:80-120 parity)
UB = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def api(ingested):
    s = srv.serve_indexer_api(
        {"messages": IndexQuery(ingested.index_metadata, cache_counts=True)}
    )
    srv.start_background(s)
    yield f"http://127.0.0.1:{s.server_address[1]}"
    s.shutdown()


@pytest.fixture(scope="module")
def all_ids(ingested):
    return sorted(r.unique_id for r in ingested.index_metadata.select("unique_id").collect())


def test_get_single(api):
    c = IndexerHttpClient(api)
    msgs = c.get("messages", "b1_m000000085")
    assert len(msgs) == 1
    m = msgs[0]
    assert m["unique_id"] == "b1_m000000085"
    # wire timestamps come back as naive datetimes, ready for a TimestampType df
    assert isinstance(m["publish_time"], datetime.datetime)
    assert m["publish_time"].tzinfo is None


def test_get_all_chunks_by_capacity(api, all_ids):
    ids = all_ids[:25]
    # capacity 7 forces ceil(25/7)=4 requests (resubmitter_job.go:120-124)
    chunked = IndexerHttpClient(api, metadata_capacity=7).get_all("messages", ids)
    single = IndexerHttpClient(api, metadata_capacity=10_000).get_all("messages", ids)
    key = lambda m: m["unique_id"]  # noqa: E731
    assert sorted(map(key, chunked)) == sorted(ids)
    assert sorted(chunked, key=key) == sorted(single, key=key)


def test_interval_paging_walks_offsets(api, ingested):
    n = ingested.index_metadata.filter("broker_id = 'b1'").count()
    got = IndexerHttpClient(api, metadata_capacity=13).get_interval("messages", "b1", LB, UB)
    assert len(got) == n
    assert len({m["unique_id"] for m in got}) == n


def test_queried_paging(api, ingested):
    filters = [{"broker_id": "b1"}]
    n = ingested.index_metadata.filter("broker_id = 'b1'").count()
    got = IndexerHttpClient(api, metadata_capacity=17).get_queried("messages", filters)
    assert len(got) == n


def test_metadata_df_matches_index(api, spark, ingested, all_ids):
    ids = all_ids[:40]
    df = IndexerHttpClient(api, metadata_capacity=11).metadata_df(spark, "messages", ids)
    local = (
        ingested.index_metadata.filter(ingested.index_metadata.unique_id.isin(ids))
        .drop("confirmation_flag")
    )
    assert sorted(df.columns) == sorted(local.columns)
    def norm(frame):
        # map columns are unhashable dicts — compare via sorted repr
        return sorted(
            repr(sorted(r.asDict(recursive=True).items()))
            for r in frame.select(*sorted(frame.columns)).collect()
        )

    assert norm(df) == norm(local)


def test_distributed_interval_fetch_matches_driver_loop(api, spark):
    c = IndexerHttpClient(api, metadata_capacity=19)
    df = c.fetch_interval_df(spark, "messages", "b1", LB, UB)
    loop = c.get_interval("messages", "b1", LB, UB)
    assert df.count() == len(loop)
    assert {r.unique_id for r in df.select("unique_id").collect()} == {
        m["unique_id"] for m in loop
    }


def test_env_and_validation(api, monkeypatch):
    monkeypatch.setenv("INDEXER_URL", api)
    monkeypatch.delenv("RSB_META_CAPACITY", raising=False)
    c = from_env()
    assert c.metadata_capacity == DEFAULT_METADATA_CAPACITY
    monkeypatch.setenv("RSB_META_CAPACITY", "123")
    assert from_env().metadata_capacity == 123
    with pytest.raises(ValueError):
        IndexerHttpClient(api, metadata_capacity=0)
    monkeypatch.delenv("INDEXER_URL")
    with pytest.raises(ValueError):
        IndexerHttpClient(None)
