"""S7 — Indexer-API HTTP client: the Resubmitter's metadata source.

Reference parity (resubmitter-api/lib/indexer/indexer.go):
- ``Get`` / ``GetAll`` / ``GetAllInInterval`` / ``GetQueried`` over the four
  Indexer API endpoints (indexer.go:62-67, route constants indexer.go:77-83).
- ``GetAll`` chunks the id list by MetadataCapacity per request
  (resubmitter_job.go:120-147); interval and query fetches page with
  limit=MetadataCapacity and ``offset += returned_count`` until
  ``offset >= total_count`` (resubmitter_job.go:157-196, 212-251).
- MetadataCapacity defaults to 10 000 (resubmitter.go:40-49), overridable via
  RSB_META_CAPACITY (resubmitter.go:81-96); base URL via INDEXER_URL
  (indexer.go:77).

Scale shape: a paged HTTP API serializes through one endpoint, so the driver
loop is inherently sequential per collection — exactly the reference's shape
(one goroutine walks the offset space).  For cluster-scale pulls,
``fetch_interval_df`` computes the page count from the first response's
``total_count`` and fans the remaining page fetches out to executors with
``mapInPandas`` (one HTTP GET per task, Arrow-batched rows out), so N
executors pull N pages concurrently against a replicated API — the fetch
stays distributed even though the source is an HTTP service.
"""

from __future__ import annotations

import json
import os
import urllib.parse
import urllib.request
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from persistor_spark.functions.timestamps import parse_query_wire
from persistor_spark.schemas import INDEX_METADATA_SCHEMA

BASE_URL_ENV = "INDEXER_URL"  # indexer.go:77
META_CAPACITY_ENV = "RSB_META_CAPACITY"  # resubmitter.go:81
DEFAULT_METADATA_CAPACITY = 10_000  # resubmitter.go:46

# Columns the HTTP wire carries (indexer.go:36-50 Message struct; the index
# parquet adds confirmation_flag, which the API envelope does not expose).
_WIRE_TS = ("publish_time", "ingestion_time", "indexer_ingestion_time")


def _wire_fmt(dt: datetime) -> str:
    """Go dateFormat 2006-01-02T15:04:05.99999999Z (indexer.go:224)."""
    frac = dt.strftime("%f").rstrip("0")
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}.{frac}Z" if frac else f"{base}Z"


def _http_json(url: str, body: dict | None = None, timeout: float = 120.0):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url,
        data=data,
        method="POST" if data is not None else "GET",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _parse_message(msg: dict) -> dict:
    out = dict(msg)
    for k in _WIRE_TS:
        v = out.get(k)
        if isinstance(v, str):
            out[k] = parse_query_wire(v).replace(tzinfo=None)
    return out


class IndexerHttpClient:
    """The four Indexer calls the Resubmitter makes (indexer.go:62-67)."""

    def __init__(
        self,
        base_url: str | None = None,
        metadata_capacity: int | None = None,
    ):
        self.base_url = (base_url or os.environ.get(BASE_URL_ENV, "")).rstrip("/")
        if not self.base_url:
            raise ValueError(f"no base url (set {BASE_URL_ENV} or pass base_url)")
        if metadata_capacity is None:
            env = os.environ.get(META_CAPACITY_ENV, "")
            metadata_capacity = int(env) if env else DEFAULT_METADATA_CAPACITY
        if metadata_capacity <= 0:  # resubmitter.go:93-96 positive-int check
            raise ValueError(f"{META_CAPACITY_ENV} must be positive")
        self.metadata_capacity = metadata_capacity

    # -- Get (indexer.go:91-118) -----------------------------------------
    def get(self, collection: str, unique_id: str) -> list[dict]:
        url = f"{self.base_url}/exact/{collection}/{urllib.parse.quote(unique_id)}"
        doc = _http_json(url)
        return [_parse_message(doc)]

    # -- GetAll, chunked by capacity (resubmitter_job.go:120-147) --------
    def get_all(self, collection: str, ids: list[str]) -> list[dict]:
        url = f"{self.base_url}/all/{collection}"
        cap = self.metadata_capacity
        out: list[dict] = []
        for i in range(0, len(ids), cap):
            batch = ids[i : i + cap]
            out.extend(_parse_message(m) for m in _http_json(url, {"ids": batch}))
        return out

    def _page_url(self, path: str, lb, ub, limit: int, offset: int) -> str:
        qs = urllib.parse.urlencode(
            {"from": _wire_fmt(lb), "to": _wire_fmt(ub), "limit": limit, "offset": offset}
        )
        return f"{self.base_url}{path}?{qs}"

    # -- GetAllInInterval paging loop (resubmitter_job.go:157-196) -------
    def get_interval(
        self, collection: str, broker_id: str, lb: datetime, ub: datetime
    ) -> list[dict]:
        path = f"/range/{collection}/{broker_id}"
        first = _http_json(self._page_url(path, lb, ub, self.metadata_capacity, 0))
        msgs = [_parse_message(m) for m in first["messages"]]
        total, offset = first["total_count"], first["returned_count"]
        while offset < total:
            page = _http_json(self._page_url(path, lb, ub, self.metadata_capacity, offset))
            got = page["returned_count"]
            if got == 0:  # defensive: a shrinking collection must not spin
                break
            msgs.extend(_parse_message(m) for m in page["messages"])
            offset += got
        return msgs

    # -- GetQueried paging loop (resubmitter_job.go:212-251) -------------
    def get_queried(self, collection: str, filters: list[dict]) -> list[dict]:
        body = {"filters": filters}
        base = f"{self.base_url}/query/{collection}"
        cap = self.metadata_capacity
        first = _http_json(f"{base}?limit={cap}&offset=0", body)
        msgs = [_parse_message(m) for m in first["messages"]]
        total, offset = first["total_count"], first["returned_count"]
        while offset < total:
            page = _http_json(f"{base}?limit={cap}&offset={offset}", body)
            got = page["returned_count"]
            if got == 0:
                break
            msgs.extend(_parse_message(m) for m in page["messages"])
            offset += got
        return msgs

    # -- DataFrame adapters ----------------------------------------------
    def _to_df(self, spark: SparkSession, msgs: list[dict]) -> DataFrame:
        # every wire field is omitempty (indexer.go:36-50) — all-nullable
        fields = [
            type(f)(f.name, f.dataType, True)
            for f in INDEX_METADATA_SCHEMA.fields
            if f.name != "confirmation_flag"
        ]
        schema = type(INDEX_METADATA_SCHEMA)(fields)
        rows = [tuple(m.get(f.name) for f in fields) for m in msgs]
        return spark.createDataFrame(rows, schema)

    def metadata_df(
        self, spark: SparkSession, collection: str, ids: list[str]
    ) -> DataFrame:
        """GetAll as a DataFrame — the R8 pipeline's metadata input."""
        return self._to_df(spark, self.get_all(collection, ids))

    def fetch_interval_df(
        self,
        spark: SparkSession,
        collection: str,
        broker_id: str,
        lb,
        ub,
        max_tasks: int | None = None,
    ) -> DataFrame:
        """Distributed interval pull: page 0 on the driver discovers
        total_count; remaining pages are fetched BY EXECUTORS (one HTTP GET
        per mapInPandas task) so a wide pull parallelizes across the cluster
        instead of serializing through the driver loop.

        ``max_tasks`` caps concurrent fetch tasks.  Default leaves two task
        slots free: when the Indexer API is served FROM THE SAME Spark
        application (the in-process test/server shape), its handlers run
        Spark jobs too — fetch tasks holding every slot while blocked on
        HTTP would starve those jobs into a distributed deadlock.  Against
        a separate API deployment, pass ``max_tasks`` >= the page count for
        full fan-out."""
        import pandas as pd  # noqa: PLC0415 — executor-side import pattern

        path = f"/range/{collection}/{broker_id}"
        cap = self.metadata_capacity
        first = _http_json(self._page_url(path, lb, ub, cap, 0))
        total = first["total_count"]
        head = self._to_df(spark, [_parse_message(m) for m in first["messages"]])
        if first["returned_count"] >= total:
            return head
        offsets = list(range(first["returned_count"], total, cap))
        base_url, schema = self.base_url, head.schema
        field_names = [f.name for f in schema.fields]

        def fetch(batches):
            for pdf in batches:
                for off in pdf["offset"]:
                    qs = urllib.parse.urlencode(
                        {"from": _wire_fmt(lb), "to": _wire_fmt(ub), "limit": cap, "offset": int(off)}
                    )
                    page = _http_json(f"{base_url}{path}?{qs}")
                    rows = [_parse_message(m) for m in page["messages"]]
                    # the precomputed stride assumes every non-final page
                    # returns exactly `cap` rows; a short page (server
                    # clamped the limit, rows deleted between page 0 and
                    # this fetch) would silently SKIP cap-len(rows) rows at
                    # the next offset — fail the job loudly instead and
                    # point at the adaptive serial pager
                    if int(off) + cap < total and len(rows) != cap:
                        raise RuntimeError(
                            f"short page at offset {int(off)}: got {len(rows)} of "
                            f"{cap} expected — fixed-stride paging would lose rows; "
                            "re-run via the serial get_interval (adaptive offsets)"
                        )
                    yield pd.DataFrame(
                        {name: [r.get(name) for r in rows] for name in field_names}
                    )

        if max_tasks is None:
            max_tasks = max(1, spark.sparkContext.defaultParallelism - 2)
        n_parts = min(len(offsets), max_tasks)
        pages = spark.createDataFrame([(o,) for o in offsets], "offset long")
        tail = pages.repartition(n_parts).mapInPandas(fetch, schema)
        return head.unionByName(tail)


def from_env(metadata_capacity: int | None = None) -> IndexerHttpClient:
    """FromEnv (indexer.go:71-73): base URL from INDEXER_URL."""
    return IndexerHttpClient(None, metadata_capacity)
