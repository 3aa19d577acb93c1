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


def test_count_cache_anti_stampede(ingested):
    """N concurrent callers of the SAME interval must run ONE count job —
    the keyed-mutex semantics of the reference's cache wrapper
    (indexer-api/lib/repo/mtx.go:40-108)."""
    import threading
    import time

    iq = IndexQuery(ingested.index_metadata, cache_counts=True)
    computes = {"n": 0}
    real = iq._compute_count

    def slow_compute(df):
        computes["n"] += 1
        time.sleep(0.3)  # widen the stampede window
        return real(df)

    iq._compute_count = slow_compute
    args = (datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 10), "b2")
    results = []
    threads = [
        threading.Thread(target=lambda: results.append(iq.get_interval_count(*args)))
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert computes["n"] == 1  # 7 callers blocked on the key lock, then hit cache
    assert len(set(results)) == 1
    # different keys don't serialize behind each other's lock
    other = (datetime.datetime(2024, 1, 6), datetime.datetime(2024, 1, 9), "b0")
    assert iq.get_interval_count(*other) >= 0
    assert computes["n"] == 2


def test_interval_envelope_single_scan(ingested):
    """The paged envelope computes count + page from ONE materialization:
    the page job must not re-run the filter scan."""
    iq = IndexQuery(ingested.index_metadata)
    args = (datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 10), "b1")
    res = iq.get_interval(*args, limit=5, offset=0)
    assert res._source is not None and res._source.is_cached
    assert res.messages.count() == res.returned_count
    res.unpersist()
    assert not res._source.is_cached


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
