"""REAL kill -9 of a maintenance OS process mid-operation (the
test_receiver_multiprocess pattern applied to the journaled maintenance
swaps): every existing crash-recovery test constructs the crashed state
by hand (re-created journals, staged half-swaps); here a live
delete_by_key / compact_small_files worker process is SIGKILLed at an
arbitrary point and the parent heals with the PUBLIC recovery API.

Two-sided convergence asserts (the kill lands wherever it lands):
after healing, the table is EITHER untouched (killed before the journal
committed) OR exactly original-minus-victims (journal committed; replay
finishes moves -> manifest -> removals) — never a third state: no
half-deleted victims, no dangling manifest entries, no surviving
journal, and manifest-pruned lookups agree with a full scan.
Compaction is stronger: rows are IDENTICAL in every arm.

The kernel drops the worker's maintenance flock on kill, so the
parent's heal must acquire it cleanly — also covered here.

Reference: persistor's receiver proves crash-redelivery with a real
kill (receiver.go's at-least-once contract); the maintenance layer
this engine adds must meet the same bar.
"""

import os
import signal
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, signal, sys, threading

    repo, table, manifest, op, delay = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], float(sys.argv[5])
    )
    keys = sys.argv[6].split(",") if len(sys.argv) > 6 else []
    sys.path.insert(0, repo)
    from persistor_spark.session import build_session
    from persistor_spark.plans import maintenance

    spark = build_session("maint-kill-worker", master="local[4]", shuffle_partitions=4)
    # arm the timer only once the session is live, so the delay spends
    # itself INSIDE the maintenance op, not inside JVM startup
    threading.Timer(delay, lambda: os.kill(os.getpid(), signal.SIGKILL)).start()
    if op == "delete":
        maintenance.delete_by_key(spark, table, manifest, keys)
    else:
        maintenance.compact_small_files(spark, table, manifest_path=manifest)
    print("COMPLETED", flush=True)
    """
)


def _build_table(spark, tmp_path, n_rows=400, n_files=8):
    from pyspark.sql import functions as F

    from persistor_spark.plans import layout

    table = str(tmp_path / "ktable")
    manifest = str(tmp_path / "kmanifest")
    (
        spark.range(n_rows)
        .select(
            F.format_string("id%06d", F.col("id")).alias("unique_id"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
        .repartitionByRange(n_files, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    layout.write_minmax_manifest(spark, table, manifest)
    return table, manifest


def _rows(spark, table):
    return sorted(
        (r["unique_id"], r["v"]) for r in spark.read.parquet(table).collect()
    )


def _assert_consistent(spark, table, manifest, victims):
    """Post-heal invariants shared by every kill arm."""
    import glob as g

    from persistor_spark.plans import layout

    assert g.glob(f"{table}.__delete_journal_*.json") == []
    assert g.glob(f"{table}.__smallcompact_journal_*.json") == []
    # every manifest entry points at a live file, and together they ARE
    # the table's file set (no dangling entries, no untracked files)
    def _norm(p):
        p = p.split("://", 1)[-1]
        return p[5:] if p.startswith("file:") else p

    mf_files = {
        _norm(r["file"])
        for r in spark.read.parquet(manifest).select("file").collect()
    }
    disk = {
        os.path.join(d, f)
        for d, _, fs in os.walk(table)
        for f in fs
        if f.endswith(".parquet")
    }
    assert mf_files == disk, (mf_files ^ disk)
    # pruned lookups agree with a full scan for victims and survivors
    probe = list(victims) + ["id000005", "id000399"]
    pruned = sorted(
        (r["unique_id"], r["v"])
        for r in layout.manifest_pruned_scan(
            spark, table, manifest, probe
        ).collect()
    )
    from pyspark.sql import functions as F

    full = sorted(
        (r["unique_id"], r["v"])
        for r in spark.read.parquet(table)
        .filter(F.col("unique_id").isin(probe))
        .collect()
    )
    assert pruned == full


def _run_worker(tmp_path, table, manifest, op, delay, keys=()):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    argv = [sys.executable, str(script), REPO, table, manifest, op, str(delay)]
    if keys:
        argv.append(",".join(keys))
    return subprocess.run(argv, capture_output=True, text=True, timeout=300)


@pytest.mark.parametrize("delay", [0.7, 2.5])
def test_delete_killed_midflight_converges(spark, tmp_path, delay):
    from persistor_spark.plans import maintenance

    table, manifest = _build_table(spark, tmp_path)
    original = _rows(spark, table)
    victims = ["id000010", "id000123", "id000350"]
    survivors = [r for r in original if r[0] not in victims]

    proc = _run_worker(tmp_path, table, manifest, "delete", delay, victims)
    killed = proc.returncode == -signal.SIGKILL

    maintenance.recover_pending_deletes(spark, table)
    after = _rows(spark, table)
    if killed:
        # two-sided: the journal either committed before the kill or not
        assert after in (original, survivors), (
            f"diverged state after kill at {delay}s: {len(after)} rows"
        )
    else:
        assert "COMPLETED" in proc.stdout
        assert after == survivors
    _assert_consistent(spark, table, manifest, victims)

    # healing again is a no-op, and a fresh delete finishes the job in
    # the survived-original arm (the flock the dead worker held is gone)
    assert maintenance.recover_pending_deletes(spark, table)["journals"] == 0
    maintenance.delete_by_key(spark, table, manifest, victims)
    assert _rows(spark, table) == survivors
    _assert_consistent(spark, table, manifest, victims)


def test_compaction_killed_midflight_preserves_rows(spark, tmp_path):
    from persistor_spark.plans import maintenance

    table, manifest = _build_table(spark, tmp_path)
    # fragment: append 3 tiny files so compact_small_files has real work
    from pyspark.sql import functions as F

    for i in range(3):
        (
            spark.range(i * 2, i * 2 + 2)
            .select(
                F.format_string("zz%06d", F.col("id") + 1000 * i).alias("unique_id"),
                F.lit(-1).cast("long").alias("v"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )
    from persistor_spark.plans import layout

    layout.write_minmax_manifest(spark, table, manifest)
    original = _rows(spark, table)

    proc = _run_worker(tmp_path, table, manifest, "compact", 1.5)
    killed = proc.returncode == -signal.SIGKILL

    # the public heal for this path: recovery of both journal kinds plus
    # the swap healer, exactly what compact_small_files runs first
    maintenance.recover_swap(spark, table)
    maintenance.recover_small_compactions(spark, table)
    maintenance.recover_pending_deletes(spark, table)
    # compaction never changes the row set, killed or not
    assert _rows(spark, table) == original
    if not killed:
        assert "COMPLETED" in proc.stdout

    # a fresh compaction on the healed table completes and still
    # preserves rows; manifest consistency holds afterwards
    maintenance.compact_small_files(spark, table, manifest_path=manifest)
    assert _rows(spark, table) == original
    _assert_consistent(spark, table, manifest, [])
