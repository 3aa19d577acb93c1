"""Layout maintenance: compaction for append-heavy partitioned parquet.

The persisted index layouts here grow by appending one file per partition
per batch (`dedup.lsh_index_append`, `similarity.ivfpq_add_to_disk`, the
streaming ingest's per-trigger writes).  Appending is the right write path
— no rewrites in the hot loop — but after many cycles each partition holds
many small files and scan cost goes listing/open-bound.  `compact_parquet`
is the periodic fix: rewrite each partition's row set into ~target-sized
files, atomically.

Atomicity: the compacted copy is written to a sibling temp dir first, then
swapped in with two renames (old -> trash, new -> live) and the trash
removed.  A reader that grabbed the old path keeps its snapshot (parquet
files are immutable); a crash between the renames leaves either the old or
the new layout fully intact, never a mix.  On object stores, swap the
rename for the store's atomic-commit mechanism (or compact into a new
versioned prefix and flip a pointer — the Iceberg/Delta pattern this
hand-rolled layout approximates).
"""

from __future__ import annotations

import os
import shutil
import uuid


def compact_parquet(
    spark,
    path: str,
    partition_col: str | None = None,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Rewrite a (optionally partitioned) parquet dataset into ~target-sized
    files per partition.  Returns {"files_before": n, "files_after": m,
    "rows": r}.

    File count per partition = ceil(partition_rows / target_rows_per_file),
    applied via a repartition on the partition column (each partition's data
    shuffles once; at 100 TB run this per-partition-subset instead of
    whole-table).  Row contents and the column contract are unchanged —
    callers like lsh_index_load / ivfpq_load read the compacted layout
    transparently."""

    def _count_files(p):
        total = 0
        for _, _, files in os.walk(p):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    before = _count_files(path)
    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, -(-rows // target_rows_per_file))
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    writer = (
        df.repartition(n_files, partition_col) if partition_col else df.repartition(n_files)
    )
    w = writer.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)
    trash = f"{path}.__trash_{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    return {"files_before": before, "files_after": _count_files(path), "rows": rows}
