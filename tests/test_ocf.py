"""Avro OCF blob contract: codec spec compliance, Spark write/read round
trip, and the resubmit position-align join over avro-backed blobs — the
reference's canonical storage format exercised LIVE (write_to_avro.go:34-74,
avro.go:37-89)."""

import json

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from persistor_spark import fixtures
from persistor_spark.formats import avro_ocf, ocf_io


# ------------------------------------------------------------------- codec


def _records(n=5):
    return [
        {
            "ID": f"b0_m{i}",
            "Data": f"payload-{i}-é中".encode("utf-8"),
            "Metadata": {"k": str(i), "event_type": "create"} if i % 2 else {},
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_round_trip(codec):
    recs = _records()
    blob = avro_ocf.encode_ocf(recs, codec=codec)
    schema, got = avro_ocf.decode_ocf(blob)
    assert schema["name"] == "persistorrecord"
    assert got == recs


def test_ocf_header_structure():
    """Magic + avro.schema/avro.codec metadata per the Avro 1.11 spec —
    what any conforming reader (hamba/avro included) requires."""
    blob = avro_ocf.encode_ocf(_records(1), codec="deflate")
    assert blob[:4] == b"Obj\x01"
    r = avro_ocf._Reader(blob, 4)
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        for _ in range(abs(n)):
            k = r.read_bytes().decode()
            meta[k] = r.read_bytes()
    assert meta["avro.codec"] == b"deflate"
    parsed = json.loads(meta["avro.schema"])
    assert [f["name"] for f in parsed["fields"]] == ["ID", "Data", "Metadata"]


def test_empty_and_multiblock():
    assert avro_ocf.decode_ocf(avro_ocf.encode_ocf([]))[1] == []
    recs = _records(25)
    blob = avro_ocf.encode_ocf(recs, block_records=7)  # forces 4 blocks
    assert avro_ocf.decode_ocf(blob)[1] == recs


def test_deterministic_bytes():
    """Same records + same sync marker => byte-identical blob (idempotent
    task-retry overwrite)."""
    sync = avro_ocf.sync_marker_for("gs://b/p/blob-x.avro")
    a = avro_ocf.encode_ocf(_records(), sync=sync)
    b = avro_ocf.encode_ocf(_records(), sync=sync)
    assert a == b


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "ID": st.text(min_size=1, max_size=40),
                "Data": st.binary(max_size=200),
                "Metadata": st.dictionaries(
                    st.text(min_size=1, max_size=10), st.text(max_size=20), max_size=4
                ),
            }
        ),
        max_size=30,
    ),
    st.sampled_from(["null", "deflate"]),
)
def test_codec_property_round_trip(recs, codec):
    assert avro_ocf.decode_ocf(avro_ocf.encode_ocf(recs, codec=codec))[1] == recs


def test_zigzag_longs():
    for n in [0, -1, 1, 63, -64, 2**31, -(2**31), 2**62, -(2**62)]:
        r = avro_ocf._Reader(avro_ocf.encode_long(n))
        assert r.read_long() == n


# ------------------------------------------------------------ spark plumbing


@pytest.fixture(scope="module")
def ocf_store(spark, sf_dir, tmp_path_factory):
    res = fixtures.run_fixture_ingest(spark, sf_dir)
    base = str(tmp_path_factory.mktemp("ocfblobs"))
    manifest = ocf_io.write_blobs_ocf(res, base)
    return res, base, manifest


def test_spark_ocf_round_trip(spark, ocf_store):
    """write_blobs_ocf -> read_blob_records_ocf reproduces the blob-record
    table EXACTLY (location_key, position, record_id, payload, metadata)."""
    res, base, manifest = ocf_store
    want = res.blob_records.select(
        "location_key", "position", "record_id", "payload", "metadata"
    )
    got = ocf_io.read_blob_records_ocf(
        spark, base, blob_base_url=ocf_io.base_url(want.first()["location_key"])
    )
    assert manifest.count() == want.select("location_key").distinct().count()
    assert got.count() == want.count()
    j = "location_key", "position"
    cmp = got.alias("g").join(want.alias("w"), list(j), "full_outer")
    assert cmp.filter("g.record_id IS NULL OR w.record_id IS NULL").count() == 0
    assert cmp.filter("g.record_id != w.record_id OR g.payload != w.payload").count() == 0
    # metadata maps equal (map_entries sorted compare)
    bad_meta = cmp.filter(
        F.to_json(F.map_entries("g.metadata")) != F.to_json(F.map_entries("w.metadata"))
    )
    assert bad_meta.count() == 0


def test_resubmit_over_ocf_blobs(spark, sf_dir, ocf_store):
    """D9 semantics against avro-backed blobs: every indexed row aligns to
    exactly its own payload through the OCF read path."""
    from persistor_spark.plans import resubmit

    res, base, _ = ocf_store
    blobs = ocf_io.read_blob_records_ocf(
        spark, base, blob_base_url=ocf_io.base_url(res.blob_records.first()["location_key"])
    )
    records = resubmit.align(res.index_metadata, blobs, broadcast_metadata=True)
    n = res.index_metadata.count()
    assert records.count() == n
    assert records.filter(F.col("unique_id") != F.col("record_id")).count() == 0 if "record_id" in records.columns else True
    # payload fidelity vs the original messages
    orig = fixtures.load_messages(spark, sf_dir).select(
        F.concat_ws("_", "broker_id", "broker_msg_id").alias("unique_id"),
        F.col("payload").alias("orig_payload"),
    )
    assert records.join(orig, "unique_id").filter(F.col("payload") != F.col("orig_payload")).count() == 0


def test_write_blobs_fmt_ocf_dispatch(spark, sf_dir, tmp_path):
    """plans.ingest.write_blobs(fmt='ocf') routes to the OCF writer."""
    from persistor_spark.plans import ingest

    res = fixtures.run_fixture_ingest(spark, sf_dir)
    base = str(tmp_path / "viaingest")
    ingest.write_blobs(res, base, fmt="ocf")
    import glob

    files = glob.glob(base + "/**/*.avro", recursive=True)
    assert files
    _, recs = avro_ocf.decode_ocf(open(files[0], "rb").read())
    assert recs and set(recs[0]) == {"ID", "Data", "Metadata"}


# ------------------------------------------------- blob-client seam (K1/K2)


def test_blob_client_seam_writes_via_registered_scheme(spark, sf_dir, tmp_path):
    res = fixtures.run_fixture_ingest(spark, sf_dir)
    root = str(tmp_path / "memstore")
    ocf_io.register_blob_client("mem", ocf_io.PrefixRewriteBlobClient(root))
    try:
        manifest = ocf_io.write_blobs_ocf(res, "mem://unit-bucket/blobs")
        rows = manifest.collect()
        assert rows and all(r["path"].startswith("mem://unit-bucket/blobs/") for r in rows)
        import os

        for r in rows:
            local = os.path.join(root, r["path"].replace("mem://", "", 1))
            assert os.path.getsize(local) == r["n_bytes"]
    finally:
        ocf_io._BLOB_CLIENTS.pop("mem", None)


def test_blob_client_unregistered_scheme_raises():
    with pytest.raises(ValueError, match="no blob client registered"):
        ocf_io.blob_client_for("gs://bucket/prefix")


def test_durable_manifest_survives_and_matches(spark, sf_dir, tmp_path):
    """manifest_path mode: manifest persisted to parquet (fault-tolerant at
    cluster scale) and the returned read matches the checkpointed variant."""
    res = fixtures.run_fixture_ingest(spark, sf_dir)
    base = str(tmp_path / "blobs")
    mpath = str(tmp_path / "manifest")
    durable = ocf_io.write_blobs_ocf(res, base, manifest_path=mpath)
    assert durable.count() == res.blob_records.select("location_key").distinct().count()
    # it is a real parquet read, not executor state
    reread = spark.read.parquet(mpath)
    assert reread.count() == durable.count()


def test_read_blob_records_ocf_non_utf8_payload(spark, tmp_path):
    """The persistorrecord Data field is arbitrary BYTES: a Go-written blob
    carrying a binary payload (gzip/protobuf) must not UnicodeDecodeError
    the whole scan — it comes back as a marked base64 string."""
    import base64
    import os

    from persistor_spark.formats import avro_ocf, ocf_io

    raw = bytes([0x1F, 0x8B, 0xFF, 0x00, 0x80])  # not valid UTF-8
    recs = [
        {"ID": "m1", "Data": b"plain text", "Metadata": {}},
        {"ID": "m2", "Data": raw, "Metadata": {}},
    ]
    base = str(tmp_path / "blobs")
    os.makedirs(f"{base}/d1", exist_ok=True)
    with open(f"{base}/d1/blob-x.avro", "wb") as fh:
        fh.write(avro_ocf.encode_ocf(recs))

    got = {
        r["record_id"]: r["payload"]
        for r in ocf_io.read_blob_records_ocf(spark, base, "gs://bkt").collect()
    }
    assert got["m1"] == "plain text"
    assert got["m2"] == "base64:" + base64.b64encode(raw).decode("ascii")
