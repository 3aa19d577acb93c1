"""Layout maintenance: compaction for append-heavy partitioned parquet.

The persisted index layouts here grow by appending one file per partition
per batch (`dedup.lsh_index_append`, `similarity.ivfpq_add_to_disk`, the
streaming ingest's per-trigger writes).  Appending is the right write path
— no rewrites in the hot loop — but after many cycles each partition holds
many small files and scan cost goes listing/open-bound.  `compact_parquet`
is the periodic fix: rewrite each partition's row set into ~target-sized
files, swapping the layouts with deferred cleanup of the old one.

All file manipulation here goes through `plans.fsutil` (the Hadoop
FileSystem API), so these routines run against any store Spark itself can
reach — file:/, hdfs://, gs://, abfss://, s3a:// — not just the local
filesystem (r6 ADVICE item; the earlier implementation used
os.rename/os.remove and was local-only).

Swap semantics (be precise — this runs inside live streaming loops via
`compact_every`):

- The compacted copy is fully written to a sibling temp dir before any
  rename, so the data itself is never at risk.
- The swap is TWO renames (old -> trash, new -> live).  Rename can't
  exchange two directories atomically, so there is a brief window between
  them where the live path does not exist: a reader LISTING the dataset
  exactly then sees FileNotFound, and a crash there leaves the layout
  only under the trash name (recover by renaming it back).  Readers that
  already listed the old layout keep their snapshot — parquet files are
  immutable and the old files live on under the trash name.
- The old layout is NOT deleted in the same call.  Deleting immediately
  would yank files out from under a concurrent scan that listed the old
  file set but hasn't opened every file yet.  Instead each call removes
  the trash dirs left by PREVIOUS compactions of the same path — an
  in-flight scan gets at least one full compaction interval to finish,
  which bounds trash growth at one extra copy of the dataset.  Pass
  `drop_trash_now=True` only when no concurrent readers exist (tests,
  offline maintenance).

On object stores, directory rename is the connector's copy+delete
(O(data), non-atomic) — the two-rename swap still yields
duplicates-or-old rather than data loss, but at serious scale compact
into a new versioned prefix and flip a pointer instead (the Iceberg/
Delta pattern this hand-rolled layout approximates); that also removes
the no-live-path window.
"""

from __future__ import annotations

import uuid

from persistor_spark.plans import fsutil


def sweep_trash(spark, path: str) -> int:
    """Remove trash dirs left by previous `compact_parquet` calls on
    `path`.  Returns the number of dirs removed."""
    removed = 0
    for old in fsutil.glob(spark, f"{fsutil.escape(path)}.__trash_*"):
        fsutil.delete(spark, old, recursive=True)
        removed += 1
    return removed


def drop_compact_orphans(spark, path: str) -> int:
    """Remove stale `__compact_` copies of `path` while the live dir is
    INTACT (a crash between the tmp write and the first rename leaves an
    orphaned copy behind).  Clearing orphans whenever the live dir exists
    guarantees at most the one in-flight copy exists at any crash point,
    which is what makes `recover_swap`'s choice unambiguous — the same
    invariant the receiver's `_drop_compact_orphans` maintains for its
    private dirs.  No-op (0) when `path` is missing."""
    if not fsutil.exists(spark, path):
        return 0
    removed = 0
    for old in fsutil.glob(spark, f"{fsutil.escape(path)}.__compact_*"):
        fsutil.delete(spark, old, recursive=True)
        removed += 1
    return removed


def recover_swap(spark, path: str) -> str | None:
    """Finish a `compact_parquet` swap that crashed between its two
    renames (r11 self-audit: the receiver recovers its own dirs this way,
    but a crashed compaction of any OTHER layout — the LSH/IVF-PQ index
    tables, the persisted query index — left the live path missing until
    manual repair).  The swap writes the pruned copy IN FULL before any
    rename, so when the live path is missing the newest `__compact_` copy
    is complete and preferred; the displaced `__trash_` original is the
    fallback (a superset with the pre-compaction layout).  Returns which
    arm restored ("compact" / "trash"), or None when no recovery was
    needed.  Call before reading a layout that tolerates maintenance
    crashes; `compact_parquet` itself calls it first, so a re-run also
    heals."""
    if fsutil.exists(spark, path):
        return None
    tmps = sorted(fsutil.glob(spark, f"{fsutil.escape(path)}.__compact_*"))
    if tmps:
        fsutil.rename(spark, tmps[-1], path)
        return "compact"
    trashes = sorted(fsutil.glob(spark, f"{fsutil.escape(path)}.__trash_*"))
    if trashes:
        fsutil.rename(spark, trashes[-1], path)
        return "trash"
    return None


def compact_parquet(
    spark,
    path: str,
    partition_col: str | None = None,
    target_rows_per_file: int = 1_000_000,
    drop_trash_now: bool = False,
) -> dict:
    """Rewrite a (optionally partitioned) parquet dataset into ~target-sized
    files per partition.  Returns {"files_before": n, "files_after": m,
    "rows": r, "trash_swept": t}.

    File count per partition = ceil(partition_rows / target_rows_per_file),
    applied via a repartition on the partition column (each partition's data
    shuffles once; at 100 TB run this per-partition-subset instead of
    whole-table).  Row contents and the column contract are unchanged —
    callers like lsh_index_load / ivfpq_load read the compacted layout
    transparently.

    The displaced layout is parked under a trash name and deleted on the
    NEXT compaction of the same path (deferred cleanup — see the module
    docstring for the exact swap/visibility guarantees), unless
    `drop_trash_now` asserts there are no concurrent readers."""
    # deferred cleanup: trash from prior cycles has had a full compaction
    # interval for in-flight scans to drain
    from pyspark.sql import functions as F

    recover_swap(spark, path)  # heal a crashed prior swap before anything
    swept = sweep_trash(spark, path)
    # at most ONE in-flight copy may exist at any crash point, or a later
    # recover_swap could restore a STALE copy — clear orphans while live
    # is intact, before this run writes its own
    drop_compact_orphans(spark, path)
    before = len(fsutil.list_files(spark, path))
    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, -(-rows // target_rows_per_file))
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    if partition_col:
        # per-PARTITION-VALUE file sizing: hashing on the partition column
        # alone sends each value to exactly one task, so partitionBy would
        # emit ONE file per value however large — a salt bounded by
        # ceil(value_rows / target) splits hot values across tasks (the
        # per-value counts are one bounded agg: #values rows).  Sizing is
        # approximate where (value, salt) combos hash-collide into one
        # task; never worse than the unsalted single-file-per-value.
        per = {
            r[0]: max(1, -(-r["n"] // target_rows_per_file))
            for r in df.groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_files = sum(per.values())
        k_map = F.create_map(
            *[x for v, k in sorted(per.items()) for x in (F.lit(v), F.lit(k))]
        )
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            k_map[F.col(partition_col)],
        )
        writer = df.repartition(n_files, F.col(partition_col), salt)
    else:
        writer = df.repartition(n_files)
    w = writer.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)
    trash = f"{path}.__trash_{uuid.uuid4().hex[:8]}"
    fsutil.rename(spark, path, trash)
    fsutil.rename(spark, tmp, path)
    if drop_trash_now:
        fsutil.delete(spark, trash, recursive=True)
    return {
        "files_before": before,
        "files_after": len(fsutil.list_files(spark, path)),
        "rows": rows,
        "trash_swept": swept,
    }


def delete_by_key(
    spark,
    table_path: str,
    manifest_path: str,
    keys,
    col: str = "unique_id",
) -> dict:
    """Targeted delete (the GDPR / right-to-be-forgotten shape): remove
    every row whose `col` is in `keys`, REWRITING ONLY the data files
    whose manifest [min_v, max_v] range can contain one of the keys.
    Untouched files are neither read nor written — at 100 TB a delete of a
    handful of ids touches a handful of files out of ~10^6, which is the
    entire point of keeping the Iceberg-lite manifest.

    Returns {"files_total", "files_rewritten", "rows_deleted"}.  The
    manifest is rebuilt afterwards (full rebuild here; an incremental
    manifest would replace just the affected entries).  Same swap caveats
    as compact_parquet: new files land before old ones are removed, so a
    concurrent reader sees duplicates-or-old rather than missing data,
    and parquet immutability keeps already-open scans consistent.

    Crash safety: BEFORE any file moves, a journal
    (`<table>.__delete_journal_*.json`) records the WHOLE remaining plan —
    the pending (tmp file -> final del-* name) moves, the originals to
    remove, and the tmp dir — and is deleted only after all of it is done
    and the manifest rebuilt.  A crash at ANY point after the journal
    exists is therefore resumable by replaying the plan (moves are
    per-file renames with pre-assigned destination names, so replay is
    idempotent: src gone + dst present = that move already happened).
    Run `recover_pending_deletes` on startup to finish a crashed swap
    instead of serving duplicated rows against a stale manifest.  A crash
    BEFORE the journal write leaves only an orphaned tmp dir — no moves
    have happened, the table is untouched.

    File ops route through the Hadoop FileSystem API (fsutil), so this
    works unchanged on gs://abfss://s3a://hdfs:// table paths; the
    manifest's file entries are full URIs and are used as such."""
    import json

    from pyspark.sql import functions as F

    from persistor_spark.plans import layout

    # replay any CRASHED earlier delete first: planning a new delete over
    # a table with a pending journal would let the later replay move the
    # old tmp files in and RESURRECT rows this delete removes
    recover_pending_deletes(spark, table_path)
    keys = sorted(set(keys))
    rows = layout.load_manifest(spark, manifest_path)
    affected = [
        (f, n) for f, lo, hi, n in rows if any(lo <= k <= hi for k in keys)
    ]
    stats = {
        "files_total": len(rows),
        "files_rewritten": len(affected),
        "rows_deleted": 0,
    }
    if not affected:
        return stats
    paths = [f for f, _ in affected]
    kept = spark.read.parquet(*paths).filter(~F.col(col).isin(keys))
    tmp = f"{table_path.rstrip('/')}.__delete_{uuid.uuid4().hex[:8]}"
    # preserve the per-file sort the layout relies on for row-group pruning
    # the kept-row count rides the write job as an observation — re-reading
    # tmp just to count would be one more full job over the rewritten data
    from pyspark.sql import Observation

    obs = Observation()
    kept.repartitionByRange(len(paths), col).sortWithinPartitions(col).observe(
        obs, F.count(F.lit(1)).alias("n")
    ).write.mode("overwrite").parquet(tmp)
    stats["rows_deleted"] = sum(n for _, n in affected) - obs.get["n"]
    # journal the WHOLE remaining plan BEFORE any file moves: destination
    # names are assigned NOW so a crash anywhere past this point is
    # resumable by idempotent replay (recover_pending_deletes).  Journaling
    # only the removals would make recovery destructive for a crash in the
    # journal-written/moves-not-done window (it would delete the originals
    # while their replacements still sit in tmp).
    moves = [
        (nf, f"{table_path.rstrip('/')}/del-{uuid.uuid4().hex[:8]}-{nf.rsplit('/', 1)[1]}")
        for nf in fsutil.glob(spark, f"{fsutil.escape(tmp)}/part-*.parquet")
    ]
    journal = _journal_path(table_path)
    fsutil.write_text(
        spark,
        journal,
        json.dumps(
            {
                "tmp": tmp,
                "moves": moves,
                "remove": paths,
                "manifest": manifest_path,
                "col": col,
            }
        ),
    )
    _replay_delete_plan(spark, json.loads(fsutil.read_text(spark, journal)), table_path)
    fsutil.delete(spark, journal, recursive=False)
    return stats


def _replay_delete_plan(spark, j: dict, table_path: str) -> int:
    """Execute (or resume) a journaled delete swap: move the rewritten
    files in, drop the originals, drop the tmp dir, rebuild the manifest.
    Idempotent at per-file granularity — safe to replay after a crash at
    any step.  Returns the number of original files removed this call."""
    from persistor_spark.plans import layout

    for src, dst in j.get("moves", []):
        if fsutil.exists(spark, src):
            if fsutil.exists(spark, dst):
                # object-store rename = copy+delete; a crash can leave both
                fsutil.delete(spark, src, recursive=False)
            else:
                fsutil.rename(spark, src, dst)
    removed = 0
    for f in j["remove"]:
        if fsutil.delete(spark, f, recursive=False):
            removed += 1
    if j.get("tmp"):
        fsutil.delete(spark, j["tmp"], recursive=True)
    if j.get("moves"):
        # incremental: re-derive entries for ONLY the rewritten files
        # (idempotent under replay); the full rebuild would rescan the
        # whole table per delete — at 10^6 files that IS the delete cost
        layout.update_minmax_manifest(
            spark,
            j["manifest"],
            j["remove"],
            [dst for _, dst in j["moves"]],
            j["col"],
        )
    else:  # legacy journal without a move plan: full rebuild
        layout.write_minmax_manifest(spark, table_path, j["manifest"], j["col"])
    return removed


def _journal_path(table_path: str) -> str:
    return f"{table_path.rstrip('/')}.__delete_journal_{uuid.uuid4().hex[:8]}.json"


def recover_pending_deletes(spark, table_path: str) -> dict:
    """Finish any delete_by_key swap that crashed mid-flight: for each
    journal next to `table_path`, REPLAY its plan — complete the pending
    tmp -> del-* moves first (a crash may have happened before any or all
    of them), then remove the listed originals that still exist, drop the
    tmp dir, rebuild the manifest, and drop the journal.  Idempotent; call
    on startup before serving queries (cli.cmd_query / cmd_serve do).
    Returns {"journals", "files_removed"}."""
    import json

    stats = {"journals": 0, "files_removed": 0}
    pattern = f"{fsutil.escape(table_path.rstrip('/'))}.__delete_journal_*.json"
    for journal in sorted(fsutil.glob(spark, pattern)):
        j = json.loads(fsutil.read_text(spark, journal))
        stats["journals"] += 1
        stats["files_removed"] += _replay_delete_plan(spark, j, table_path)
        fsutil.delete(spark, journal, recursive=False)
    return stats
