"""CLI surface smoke tests — the reference's service entry points collapse to
these subcommands (persistor/cmd/*, indexer-api handler, resubmitter handler).

Pins the OCF blob-format branch of `cmd_ingest` (blob_rows must be counted by
decoding the OCF files, not by a parquet read that would see zero rows).
"""

import json

import pytest

from persistor_spark import cli, fixtures


def _run_cli(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1])


@pytest.fixture(scope="module")
def source_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_src") / "messages")
    fixtures.load_messages(spark, sf_dir).limit(500).write.parquet(d)
    return d


def test_cli_ingest_ocf_counts_blob_rows(spark, source_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc, emitted = _run_cli(
        capsys, ["ingest", "--source", source_dir, "--out", out, "--blob-format", "ocf"]
    )
    assert rc == 0
    # every indexed message has exactly one blob record, decoded from OCF
    assert emitted["indexed"] > 0
    assert emitted["blob_rows"] == emitted["indexed"]


def test_cli_ingest_parquet_then_query_get(spark, source_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc, emitted = _run_cli(
        capsys,
        ["ingest", "--source", source_dir, "--out", out, "--blob-format", "parquet"],
    )
    assert rc == 0 and emitted["blob_rows"] == emitted["indexed"]

    uid = (
        spark.read.parquet(f"{out}/index").select("unique_id").limit(1).collect()[0][0]
    )
    rc, rows = _run_cli(capsys, ["query", "--index", f"{out}/index", "get", uid])
    assert rc == 0
    assert len(rows) == 1 and rows[0]["unique_id"] == uid


def test_cli_analyze_list_and_run(capsys):
    import json as _json

    from persistor_spark import cli

    assert cli.main(["analyze", "list"]) == 0
    names = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "a62_dataset_card" in names
    assert cli.main(["analyze", "nope"]) == 2


def test_cli_resubmit_ocf_blobs(spark, source_dir, tmp_path, capsys):
    """ingest --blob-format ocf -> resubmit --blob-format ocf: blobs written
    in the reference's live OCF contract are resubmittable from the CLI
    (previously the resubmit read side hard-coded parquet with no flag)."""
    from persistor_spark import fixtures

    out = str(tmp_path / "out")
    rc, emitted = _run_cli(
        capsys, ["ingest", "--source", source_dir, "--out", out, "--blob-format", "ocf"]
    )
    assert rc == 0 and emitted["indexed"] > 0
    base_url = fixtures.fixture_ingest_config().storage.base_url
    rc, summary = _run_cli(
        capsys,
        [
            "resubmit", "--index", f"{out}/index", "--blobs", f"{out}/blobs",
            "--out", str(tmp_path / "resub"),
            "--blob-format", "ocf", "--blob-base-url", base_url,
        ],
    )
    assert rc == 0
    assert summary["published"] == summary["starting"] == emitted["indexed"]
