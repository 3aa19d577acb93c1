"""r13 feature-cost probes at sf0.1 (warm JVM): what do the three new
mechanisms cost when they are NOT needed, and what does the recovery
path cost when they are?

1. write_index_merge lock overhead, uncontended — the lock must be ~free
   for the single-writer common case (one flock open/close per merge).
2. mergeSchema scan overhead on an evolved (two-footer-generation) table
   vs a plain scan of the same files — footer reconciliation is per-file
   METADATA work, so the delta must not track row volume.
3. manifest_lookup_resilient: healthy lookup vs healing lookup (stale
   resident rows -> reload manifest + retry) — the heal pays one
   manifest read + one retried pruned scan, not a table scan.

Usage: python tools/probe_r13_features.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark import fixtures  # noqa: E402
from persistor_spark.plans import fsutil, ingest, layout, maintenance  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main():
    spark = build_session("r13-feature-probe")
    msgs = fixtures.load_messages(spark, SF)
    cfg = fixtures.fixture_ingest_config()

    # --- 1. locked-merge overhead, uncontended ------------------------
    root = tempfile.mkdtemp(prefix="probe_lock_")
    res = ingest.run_batch(
        msgs.filter(F.col("event_seq") % 4 == 0), cfg,
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    res.index_metadata.persist().count()
    dt_plain, _ = t(lambda: ingest.write_index_merge(res, f"{root}/t_plain"))
    dt_lock, _ = t(
        lambda: ingest.write_index_merge(
            res, f"{root}/t_lock", lock_path=f"{root}/lk"
        )
    )
    # second merge = the anti-join-against-existing shape, both modes
    res2 = ingest.run_batch(
        msgs.filter(F.col("event_seq") % 4 == 1), cfg,
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    res2.index_metadata.persist().count()
    dt_plain2, _ = t(lambda: ingest.write_index_merge(res2, f"{root}/t_plain"))
    dt_lock2, _ = t(
        lambda: ingest.write_index_merge(
            res2, f"{root}/t_lock", lock_path=f"{root}/lk"
        )
    )
    print(
        f"lock-overhead: first merge plain {dt_plain:.2f}s locked {dt_lock:.2f}s"
        f" | second merge plain {dt_plain2:.2f}s locked {dt_lock2:.2f}s",
        flush=True,
    )

    # --- 2. mergeSchema scan overhead ---------------------------------
    evo = tempfile.mkdtemp(prefix="probe_evo_") + "/t"
    cols = ["unique_id", "business_source_key", "ordering_key", "publish_time"]
    res.index_metadata.select(*cols).repartition(16).write.parquet(evo)
    (
        res2.index_metadata.select(*cols)
        .withColumn("index_schema_version", F.lit(2).cast("int"))
        .repartition(16)
        .write.mode("append")
        .parquet(evo)
    )
    for _ in range(2):  # warm then measure
        dt_plain_scan, n1 = t(lambda: spark.read.parquet(evo).count())
        dt_merge_scan, n2 = t(
            lambda: spark.read.option("mergeSchema", "true").parquet(evo).count()
        )
    files = len(fsutil.list_files(spark, evo))
    print(
        f"mergeSchema-overhead: plain scan {dt_plain_scan:.2f}s vs "
        f"mergeSchema {dt_merge_scan:.2f}s over {files} files / {n1} rows "
        f"(rows equal: {n1 == n2})",
        flush=True,
    )

    # --- 3. resilient lookup: healthy vs healing ----------------------
    root3 = tempfile.mkdtemp(prefix="probe_heal_")
    table, mf = f"{root3}/t", f"{root3}/mf"
    idx = res.index_metadata.withColumn("__s", F.crc32("unique_id") % 20)
    (
        idx.filter(F.col("__s") < 16).drop("__s")
        .repartitionByRange(8, "unique_id").sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    for i in range(16, 20):
        idx.filter(F.col("__s") == i).drop("__s").coalesce(1).write.mode(
            "append"
        ).parquet(table)
    layout.write_minmax_manifest(spark, table, mf)
    resident = layout.load_manifest(spark, mf)
    probes = ["b0_m000000008", "b1_m000000025", "b2_m000000006"]
    dt_healthy, (df, h) = t(
        lambda: layout.manifest_lookup_resilient(spark, table, resident, probes, mf)
    )
    assert h is None
    sizes = dict(fsutil.list_files_with_size(spark, table))
    thresh = (max(sizes.values()) + min(sizes.values())) // 2
    maintenance.compact_small_files(
        spark, table, small_file_bytes=thresh, manifest_path=mf
    )
    dt_heal, (df2, h2) = t(
        lambda: layout.manifest_lookup_resilient(spark, table, resident, probes, mf)
    )
    assert h2 is not None
    fresh = h2
    dt_healthy2, (df3, h3) = t(
        lambda: layout.manifest_lookup_resilient(spark, table, fresh, probes, mf)
    )
    assert h3 is None
    print(
        f"resilient-lookup: healthy {dt_healthy:.2f}s | healing "
        f"{dt_heal:.2f}s (reload+retry) | healthy-after-heal {dt_healthy2:.2f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
