"""HTTP serving surface: drive both APIs over live ThreadingHTTPServers
with stdlib urllib (reference endpoint/status semantics:
indexer-api/lib/handler.go:35-177, resubmitter-api handler.go:68-241)."""

import datetime
import json
import urllib.error
import urllib.request

import pytest

from persistor_spark import server as srv
from persistor_spark.plans.query import IndexQuery


def _req(port, path, body=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url,
        data=data,
        method=method or ("POST" if data is not None else "GET"),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def indexer_port(ingested):
    s = srv.serve_indexer_api(
        {"messages": IndexQuery(ingested.index_metadata, cache_counts=True)}
    )
    srv.start_background(s)
    yield s.server_address[1]
    s.shutdown()


def test_exact_lookup_and_wire_timestamps(indexer_port):
    status, doc = _req(indexer_port, "/exact/messages/b1_m000000085")
    assert status == 200
    assert doc["unique_id"] == "b1_m000000085"
    # query-API wire layout (util.go:77): RFC3339, trailing zeros trimmed
    assert "T" in doc["publish_time"] and doc["publish_time"].endswith("Z")


def test_exact_unknown_id_is_400(indexer_port):
    status, body = _req(indexer_port, "/exact/messages/nope")
    assert status == 400 and body["message"] == srv.ON_BAD_REQUEST


def test_unknown_collection_is_400(indexer_port):
    status, _ = _req(indexer_port, "/exact/elsewhere/b1_m000000085")
    assert status == 400


def test_get_all_roundtrip_and_required_field(indexer_port):
    ids = ["b1_m000000085", "b2_m000000002"]
    status, rows = _req(indexer_port, "/all/messages", body={"ids": ids})
    assert status == 200 and sorted(r["unique_id"] for r in rows) == sorted(ids)
    status, body = _req(indexer_port, "/all/messages", body={"wrong": []})
    assert status == 400 and "ids" in body["error"]


def test_range_envelope_and_pagination(indexer_port):
    base = "/range/messages/b1?from=2024-01-05T00:00:00Z&to=2024-01-10T00:00:00Z"
    status, env = _req(indexer_port, base + "&limit=5")
    assert status == 200
    assert set(env) == {"total_count", "returned_count", "limit", "offset", "messages"}
    assert env["limit"] == 5 and env["returned_count"] == len(env["messages"]) <= 5
    status2, page2 = _req(indexer_port, base + "&limit=5&offset=5")
    ids1 = {m["unique_id"] for m in env["messages"]}
    ids2 = {m["unique_id"] for m in page2["messages"]}
    assert not ids1 & ids2


def test_range_default_pagination(indexer_port):
    status, env = _req(
        indexer_port, "/range/messages/b1?from=2024-01-01T00:00:00Z&to=2024-01-30T00:00:00Z"
    )
    assert status == 200 and env["limit"] == 20 and env["offset"] == 0


def test_range_future_upper_bound_is_400(indexer_port):
    future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(days=2)
    status, body = _req(
        indexer_port,
        "/range/messages/b1?to=" + future.strftime("%Y-%m-%dT%H:%M:%SZ"),
    )
    assert status == 400 and "future" in body["error"]


def test_query_filters_and_validation(indexer_port):
    status, env = _req(
        indexer_port,
        "/query/messages?limit=3",
        body={"filters": [{"broker_id": "b1"}]},
    )
    assert status == 200 and env["returned_count"] == len(env["messages"]) == 3
    # whitelist violation -> 400 (handler.go:137-145)
    status, _ = _req(indexer_port, "/query/messages", body={"filters": [{"evil": 1}]})
    assert status == 400
    # malformed timestamp -> 400 (handler.go:147-155)
    status, _ = _req(
        indexer_port,
        "/query/messages",
        body={"filters": [{"publish_time": {"$gte": "not-a-time"}}]},
    )
    assert status == 400
    # unparseable body -> 400
    req = urllib.request.Request(
        f"http://127.0.0.1:{indexer_port}/query/messages", data=b"{nope", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_unknown_route_is_404(indexer_port):
    status, _ = _req(indexer_port, "/nothing/here")
    assert status == 404


@pytest.fixture(scope="module")
def resub_server(spark, ingested, tmp_path_factory):
    root = tmp_path_factory.mktemp("resub_api")
    blobs = str(root / "blobs")
    ingested.blob_records.write.parquet(blobs)
    out_root = str(root / "topics")
    s = srv.serve_resubmitter_api(
        {"messages": IndexQuery(ingested.index_metadata)},
        srv.FileResubmitter(spark, blobs, out_root),
        default_topic="",
    )
    srv.start_background(s)
    yield s.server_address[1], out_root
    s.shutdown()


def test_resubmit_requires_topic(resub_server):
    port, _ = resub_server
    status, body = _req(port, "/resubmit/messages", body={"ids": ["x"]})
    assert status == 400 and body["msg"] == srv.RESUBMIT_NO_TOPIC


def test_resubmit_ids_publishes_to_topic_sink(spark, resub_server):
    port, out_root = resub_server
    ids = ["b1_m000000085", "b2_m000000002"]
    status, body = _req(port, "/resubmit/messages?topic=t1", body={"ids": ids})
    assert status == 200 and body["msg"] == srv.RESUBMIT_SUCCESS
    assert body["summary"]["starting"] == body["summary"]["published"] == 2
    rows = spark.read.parquet(f"{out_root}/t1").collect()
    assert sorted({r["unique_id"] for r in rows}) == sorted(ids)


def test_resubmit_interval_defaults(resub_server, ingested):
    port, _ = resub_server
    status, body = _req(port, "/range/messages?topic=t2", body={"broker_id": "b1"})
    n_b1 = ingested.index_metadata.filter("broker_id = 'b1'").count()
    assert status == 200 and body["summary"]["published"] == n_b1


def test_resubmit_query_filters(resub_server, ingested):
    port, _ = resub_server
    status, body = _req(
        port, "/query/messages?topic=t3", body={"filters": [{"broker_id": "b2"}]}
    )
    n_b2 = ingested.index_metadata.filter("broker_id = 'b2'").count()
    assert status == 200 and body["summary"]["published"] == n_b2
