"""Q11 interval-count cache behavior (reference cache_test.go:29-146)."""

import datetime

from persistor_spark.plans.query import IndexQuery


def test_count_cache_hits_and_eviction(ingested):
    iq = IndexQuery(ingested.index_metadata, cache_counts=True)
    args = (datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 10), "b1")
    n1 = iq.get_interval_count(*args)
    assert iq._count_cache  # populated
    n2 = iq.get_interval_count(*args)  # served from cache
    assert n1 == n2
    # envelope path shares the cache
    res = iq.get_interval(*args, limit=5, offset=0)
    assert res.total_count == n1
    # LRU eviction caps the cache
    for day in range(1, 25):
        for broker in ("b0", "b1", "b2", "b3", "bx"):
            iq.get_interval_count(
                datetime.datetime(2024, 1, day),
                datetime.datetime(2024, 1, day, 12),
                broker,
            )
    assert len(iq._count_cache) <= IndexQuery.COUNT_CACHE_SIZE


def test_cache_disabled_by_default(ingested):
    iq = IndexQuery(ingested.index_metadata)
    args = (datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 10), "b1")
    iq.get_interval_count(*args)
    assert not iq._count_cache


def test_get_all_routes_large_lists_to_semi_join(ingested):
    iq = IndexQuery(ingested.index_metadata)
    real = [r[0] for r in ingested.index_metadata.select("unique_id").limit(30).collect()]
    ids = real + [f"zz_{i}" for i in range(IndexQuery.IN_LIST_THRESHOLD)]
    got = iq.get_all(ids, ["unique_id"])
    assert got.count() == 30
