"""The bench record contract the driver and the cross-round grader rely
on (r14 review findings): bench.py's compact sole-stdout line must keep
the cross-run canary-normalization chain alive whichever record shape a
round's bench_rN_local.json was saved from, and a raising bench line
must still emit a parseable JSON line on the REAL stdout (the driver's
parsed:null failure mode this round eliminated).

No SparkSession — these pin pure record-handling logic, so they run in
milliseconds and guard the seam pytest otherwise never touches (bench.py
is an entry point, not a library import elsewhere)."""

import importlib.util
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench_from(dirpath):
    """Import a copy of bench.py living at dirpath, so _prev_canary
    globs THAT directory's bench_r*_local.json instead of the repo's."""
    shutil.copy(os.path.join(REPO, "bench.py"), os.path.join(dirpath, "bench.py"))
    spec = importlib.util.spec_from_file_location(
        f"bench_copy_{os.path.basename(dirpath)}", os.path.join(dirpath, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prev_canary_accepts_full_record_shape():
    d = tempfile.mkdtemp(prefix="benchrec-")
    try:
        b = _load_bench_from(d)
        with open(os.path.join(d, "bench_r13_local.json"), "w") as fh:
            json.dump({"canary": {"cpu": [0.30, 0.28], "io": [0.15, 0.13]}}, fh)
        got = b._prev_canary()
        assert got == {"cpu": 0.28, "io": 0.13, "ref": "r13"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_prev_canary_accepts_compact_shape_and_prefers_newest():
    # r14+: a round saved from the compact stdout line carries only
    # "canary_min" — the chain must not silently skip back to an older
    # full-shape record (the r15 KeyError regression the review caught)
    d = tempfile.mkdtemp(prefix="benchrec-")
    try:
        b = _load_bench_from(d)
        with open(os.path.join(d, "bench_r13_local.json"), "w") as fh:
            json.dump({"canary": {"cpu": [0.30], "io": [0.15]}}, fh)
        with open(os.path.join(d, "bench_r14_local.json"), "w") as fh:
            json.dump({"canary_min": {"cpu": 0.25, "io": 0.12}}, fh)
        got = b._prev_canary()
        assert got == {"cpu": 0.25, "io": 0.12, "ref": "r14"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_prev_canary_skips_malformed_records():
    d = tempfile.mkdtemp(prefix="benchrec-")
    try:
        b = _load_bench_from(d)
        with open(os.path.join(d, "bench_r14_local.json"), "w") as fh:
            fh.write("{not json")
        with open(os.path.join(d, "bench_r12_local.json"), "w") as fh:
            json.dump({"canary": {"cpu": [0.4], "io": [0.2]}}, fh)
        got = b._prev_canary()
        assert got == {"cpu": 0.4, "io": 0.2, "ref": "r12"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_failing_bench_still_emits_sole_stdout_json_line():
    # drive the real entry point with a missing fixture dir: stdout must
    # carry EXACTLY one line, parseable JSON, with the error recorded —
    # never an empty stdout (parsed:null) and never JVM chatter
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/nonexistent-bench-fixture")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert proc.returncode != 0  # the failure still propagates
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be the sole JSON line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "headline_queries_total"
    assert "nonexistent-bench-fixture" in rec["error"]
