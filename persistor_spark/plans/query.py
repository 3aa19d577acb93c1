"""Index query surface — the Indexer API's 4 operations over `index_metadata`
(reference: indexer-api/lib/repo/mongo.go:90-249, indexer.go:41-90).

Design notes (SURVEY.md §2.1 Q1-Q12, §4.3):
- Every operation is a declarative filter+project over the index DataFrame, so
  Catalyst pushes predicates/projections into the parquet scan — the Spark
  analogue of the hand-built BSON pushdowns (§4.1).
- The reference paginates in Mongo NATURAL order (no sort — mongo.go:172-178),
  which is nondeterministic; we order by `unique_id` (declared deviation,
  SURVEY.md §4.3 item 3) so pages are stable and oracle-checkable.
- `Interval` envelope reproduces indexer.go:41-47.
- At scale: point/IN-list lookups are parquet scans with pushed filters (and
  benefit from index-table sorting/Z-order on unique_id); the count+page pair
  shares one cached filter when the caller keeps the DataFrame.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from persistor_spark.config import QueryConfig
from persistor_spark.functions import filters as filter_dialect

# Per-endpoint projections (indexer-api/lib/util.go:146-188).
UNIQUE_REQUEST_ATTRIBUTES = [
    "broker_id",
    "broker_msg_id",
    "business_source_key",
    "business_object_key",
    "unique_id",
    "index_source_key",
    "ordering_key",
    "additional_metadata",
    "location_key",
    "location_position",
    "publish_time",
    "ingestion_time",
    "indexer_ingestion_time",
    "confirmation_flag",
]
INTERVAL_REQUEST_ATTRIBUTES = [
    "broker_id",
    "broker_msg_id",
    "business_source_key",
    "business_object_key",
    "unique_id",
    "ordering_key",
    "additional_metadata",
    "location_key",
    "location_position",
    "publish_time",
]
QUERY_REQUEST_ATTRIBUTES = INTERVAL_REQUEST_ATTRIBUTES


def extract_interval_params(
    from_str: str | None,
    to_str: str | None,
    now: datetime | None = None,
) -> tuple[datetime, datetime]:
    """Q10 (util.go:69-120): `from` defaults to the zero time, `to` defaults
    to now, and a future upper bound is rejected."""
    from persistor_spark.functions.timestamps import parse_query_wire

    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    t_from = (
        parse_query_wire(from_str).replace(tzinfo=None) if from_str else datetime(1, 1, 1)
    )
    t_to = parse_query_wire(to_str).replace(tzinfo=None) if to_str else now
    if t_to > now:
        raise ValueError(
            "error during upper interval bound parsing: the given bound can't "
            f"be in the future (current time: {now}, given time:{t_to})"
        )
    return t_from, t_to


@dataclass
class Interval:
    """Paged result envelope (indexer-api/lib/indexer.go:41-47).

    `_source` is the persisted filtered DataFrame both the count and the
    page were computed from (one scan, not two); call `unpersist()` once
    the page has been consumed."""

    total_count: int
    returned_count: int
    limit: int
    offset: int
    messages: DataFrame
    _source: DataFrame | None = field(default=None, repr=False)

    def unpersist(self) -> None:
        if self._source is not None:
            self._source.unpersist()


class IndexQuery:
    """Query API over an index_metadata DataFrame.

    `cache_counts` reproduces the reference's interval-count cache (Q11:
    indexer-api/lib/repo/cache.go, LRU size 100) — worthwhile because the
    count is the expensive half of every paged envelope and dashboards poll
    identical intervals."""

    COUNT_CACHE_SIZE = 100  # cache.go wiring: main.go:36 WithSize(100)

    def __init__(
        self,
        index_metadata: DataFrame,
        cfg: QueryConfig | None = None,
        cache_counts: bool = False,
    ):
        self.idx = index_metadata
        self.cfg = cfg or QueryConfig()
        self.cfg.validate()
        self.cache_counts = cache_counts
        self._count_cache: "OrderedDict" = __import__("collections").OrderedDict()
        # Anti-stampede: one lock per cache key, so N concurrent callers of
        # the same interval run ONE count job and share it — the reference's
        # keyed RW mutex around the Mongo count (indexer-api/lib/repo/
        # mtx.go:40-108).  _cache_guard protects both dicts.
        self._cache_guard = threading.Lock()
        self._key_locks: dict = {}

    # -- Q1: point lookup -------------------------------------------------
    def get(self, unique_id: str, attributes: Sequence[str] | None = None) -> DataFrame:
        attrs = list(attributes or UNIQUE_REQUEST_ATTRIBUTES)
        return self.idx.filter(F.col("unique_id") == unique_id).select(*attrs)

    # Above this many ids a literal IN-list stops being a pushed filter and
    # bloats the plan; route to a broadcast semi join instead (the resubmit
    # metadata page size, resubmitter.go:45-49, is the natural cutover).
    IN_LIST_THRESHOLD = 10_000

    # -- Q2: IN-list lookup ----------------------------------------------
    def get_all(self, unique_ids: Sequence[str], attributes: Sequence[str] | None = None) -> DataFrame:
        """`unique_id IN (...)` — literal IN-list (parquet-pushable) for
        typical sizes, auto-switching to a broadcast semi join past
        IN_LIST_THRESHOLD ids."""
        ids = list(unique_ids)
        attrs = list(attributes or UNIQUE_REQUEST_ATTRIBUTES)
        if len(ids) > self.IN_LIST_THRESHOLD:
            ids_df = self.idx.sparkSession.createDataFrame(
                [(i,) for i in ids], "unique_id string"
            )
            return self.get_all_df(ids_df, attrs)
        return self.idx.filter(F.col("unique_id").isin(ids)).select(*attrs)

    def get_all_df(self, ids_df: DataFrame, attributes: Sequence[str] | None = None) -> DataFrame:
        attrs = list(attributes or UNIQUE_REQUEST_ATTRIBUTES)
        return (
            self.idx.join(F.broadcast(ids_df), on="unique_id", how="left_semi").select(*attrs)
        )

    # -- Q3/Q4: interval scan + count envelope ----------------------------
    def _interval_filter(self, time_from: datetime, time_to: datetime, broker_id: str):
        # publish_time ∈ [from, to) AND broker_id = b (mongo.go:164-170; the
        # handler's from/to arg swap nets out to this — SURVEY.md Q3 note).
        return (
            (F.col("publish_time") >= F.lit(time_from))
            & (F.col("publish_time") < F.lit(time_to))
            & (F.col("broker_id") == broker_id)
        )

    def get_interval(
        self,
        time_from: datetime,
        time_to: datetime,
        broker_id: str,
        limit: int | None = None,
        offset: int | None = None,
        attributes: Sequence[str] | None = None,
    ) -> Interval:
        limit = self.cfg.default_limit if limit is None else limit
        offset = self.cfg.default_offset if offset is None else offset
        if limit <= 0 or offset < 0:
            raise ValueError("limit must be > 0 and offset >= 0 (util.go:34-67)")
        attrs = list(attributes or INTERVAL_REQUEST_ATTRIBUTES)
        # ONE materialization feeds both the count and the page: the count
        # job populates the persisted blocks, the page job reads them back —
        # the filter+scan runs once, not twice.  (The reference pays find +
        # CountDocuments; Mongo's index makes that cheap, a parquet scan
        # doesn't.)  Caller unpersists via Interval.unpersist().
        filtered = self.idx.filter(
            self._interval_filter(time_from, time_to, broker_id)
        ).persist()
        # Q4 CountDocuments (mongo.go:194-209), LRU-cached when enabled (Q11)
        total = self.get_interval_count(time_from, time_to, broker_id, _filtered=filtered)
        page = filtered.orderBy("unique_id").offset(offset).limit(limit).select(*attrs)
        returned = min(max(total - offset, 0), limit)
        return Interval(total, returned, limit, offset, page, _source=filtered)

    def _key_lock(self, key) -> threading.Lock:
        with self._cache_guard:
            return self._key_locks.setdefault(key, threading.Lock())

    def get_interval_count(
        self,
        time_from: datetime,
        time_to: datetime,
        broker_id: str,
        _filtered: DataFrame | None = None,
    ) -> int:
        df = (
            _filtered
            if _filtered is not None
            else self.idx.filter(self._interval_filter(time_from, time_to, broker_id))
        )
        if not self.cache_counts:
            return self._compute_count(df)
        key = (time_from, time_to, broker_id)
        # per-key lock: the first caller computes, concurrent callers for the
        # SAME interval block on it and then read the cache; callers for
        # other intervals proceed in parallel (mtx.go keyed-RWMutex parity).
        with self._key_lock(key):
            with self._cache_guard:
                if key in self._count_cache:
                    self._count_cache.move_to_end(key)
                    return self._count_cache[key]
            n = self._compute_count(df)
            with self._cache_guard:
                self._count_cache[key] = n
                while len(self._count_cache) > self.COUNT_CACHE_SIZE:
                    old_key, _ = self._count_cache.popitem(last=False)
                    self._key_locks.pop(old_key, None)
            return n

    def _compute_count(self, filtered: DataFrame) -> int:
        return filtered.count()

    # -- Q5: generic Mongo-dialect query ----------------------------------
    def query(
        self,
        filters: list[dict],
        limit: int | None = None,
        offset: int | None = None,
        attributes: Sequence[str] | None = None,
    ) -> Interval:
        limit = self.cfg.default_limit if limit is None else limit
        offset = self.cfg.default_offset if offset is None else offset
        attrs = list(attributes or QUERY_REQUEST_ATTRIBUTES)
        cond = filter_dialect.translate(filters)
        filtered = self.idx.filter(cond).persist()  # one scan for count + page
        total = filtered.count()
        page = filtered.orderBy("unique_id").offset(offset).limit(limit).select(*attrs)
        returned = min(max(total - offset, 0), limit)
        return Interval(total, returned, limit, offset, page, _source=filtered)

    def query_df(self, filters: list[dict], attributes: Sequence[str] | None = None) -> DataFrame:
        """Unpaged variant for in-engine composition (resubmit uses this —
        client-side offset pagination R2/R3 is unnecessary over a DataFrame)."""
        attrs = list(attributes or QUERY_REQUEST_ATTRIBUTES)
        return self.idx.filter(filter_dialect.translate(filters)).select(*attrs)
