"""Round-8 10x maintenance probes (r7 VERDICT #5).

Two late-r7 maintenance changes shipped with pytest coverage but no 10x
measurement (ARCHITECTURE section 6 pattern):

1. compact_parquet(partition_col=...) per-value SALTED sizing: a hot
   partition value must produce ceil(value_rows / target) files written by
   that many tasks — not one straggler-written mega-file.  Probe: a 2 M-row
   band table (16 values, band 0 holding ~50 % of rows), fragmented by 40
   appends, compacted at a 100k-row target.

2. delete_by_key journal replay-before-plan: a crashed delete A pending on
   a 10x table must be replayed before delete B plans, and the combined
   cost must stay ~the cost of two deletes (replay is move+manifest work,
   not a table rewrite).  Probe: 2 M-row/64-file sorted index table; crash
   A before its move-in, then time B (replay + plan + swap) vs a plain
   delete on an identical journal-free copy.

Run: python tools/probe_r8.py
"""

from __future__ import annotations

import glob
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from persistor_spark.session import build_session


def probe_salted_compaction(spark, root: str) -> None:
    from persistor_spark.plans import fsutil
    from persistor_spark.plans import maintenance

    path = f"{root}/band_table"
    # 2 M rows, 16 band values, band 0 hot: ids 0..999999 -> band 0,
    # the rest spread over bands 1..15
    df = spark.range(2_000_000).select(
        F.when(F.col("id") < 1_000_000, F.lit(0))
        .otherwise((F.col("id") % 15 + 1).cast("int"))
        .alias("band"),
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    frag = df.withColumn("b", F.col("doc_id") % 40)
    t0 = time.time()
    for i in range(40):
        frag.filter(F.col("b") == i).drop("b").write.mode("append").partitionBy(
            "band"
        ).parquet(path)
    prep = time.time() - t0
    before = len(fsutil.list_files(spark, path))

    t0 = time.time()
    stats = maintenance.compact_parquet(
        spark, path, partition_col="band", target_rows_per_file=100_000
    )
    elapsed = time.time() - t0

    per_value = {
        int(d.rsplit("=", 1)[1]): len(glob.glob(f"{d}/part-*.parquet"))
        for d in glob.glob(f"{path}/band=*")
    }
    hot = per_value.get(0)
    print(
        f"salted_compaction: prep {prep:.1f}s  files {before} -> "
        f"{stats['files_after']}  wall {elapsed:.2f}s  rows {stats['rows']}"
    )
    print(
        f"  hot band=0 (1 M rows, 100k target): {hot} files "
        f"(unsalted would be 1); cold bands max "
        f"{max(v for k, v in per_value.items() if k != 0)} files"
    )
    assert spark.read.parquet(path).count() == 2_000_000
    assert hot is not None and hot >= 8, f"salting ineffective: {per_value}"


def probe_journal_replay(spark, root: str) -> None:
    from persistor_spark.plans import layout, maintenance

    def build(table: str, mf: str) -> None:
        df = spark.range(2_000_000).select(
            F.format_string("id%09d", F.col("id")).alias("unique_id"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        df.repartitionByRange(64, "unique_id").sortWithinPartitions(
            "unique_id"
        ).write.parquet(table)
        layout.write_minmax_manifest(spark, table, mf)

    # arm 1: plain delete on a journal-free copy (the baseline)
    t_plain, mf_plain = f"{root}/idx_plain", f"{root}/mf_plain"
    build(t_plain, mf_plain)
    t0 = time.time()
    maintenance.delete_by_key(spark, t_plain, mf_plain, ["id000010000"])
    plain = time.time() - t0

    # arm 2: crash delete A before its move-in, then time delete B
    t_rec, mf_rec = f"{root}/idx_rec", f"{root}/mf_rec"
    build(t_rec, mf_rec)
    real = maintenance._replay_delete_plan

    def crash(*a, **k):
        raise RuntimeError("simulated crash before move-in")

    maintenance._replay_delete_plan = crash
    try:
        maintenance.delete_by_key(spark, t_rec, mf_rec, ["id000010000"])
    except RuntimeError:
        pass
    finally:
        maintenance._replay_delete_plan = real
    assert glob.glob(f"{t_rec}.__delete_journal_*.json"), "crash state missing"

    t0 = time.time()
    maintenance.delete_by_key(spark, t_rec, mf_rec, ["id000020000"])
    replay_plus_delete = time.time() - t0

    after = spark.read.parquet(t_rec)
    n = after.count()
    assert n == 1_999_998, n
    assert (
        after.filter(
            F.col("unique_id").isin("id000010000", "id000020000")
        ).count()
        == 0
    )
    assert glob.glob(f"{t_rec}.__delete_journal_*.json") == []
    print(
        f"journal_replay: plain delete {plain:.2f}s; "
        f"replay(crashed A) + delete B {replay_plus_delete:.2f}s "
        f"on 2 M rows / 64 files — replay adds move+manifest work only"
    )


def main() -> None:
    spark = build_session("probe-r8")
    root = tempfile.mkdtemp(prefix="probe-r8-")
    try:
        probe_salted_compaction(spark, root)
        probe_journal_replay(spark, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
