"""r15 probe: stream_ingest micro-batch shape — per-batch index file counts
and wall time, with and without AQE-on-cached-plan (the r14 32-core
regression: the cached fused-window plan materialized at shuffle.partitions
= cpus sliver partitions per batch, so the index sink wrote cpus files per
micro-batch and both sinks fanned out cpus tasks).

Usage: python tools/probe_r15_stream.py [cached_aqe: on|off] [cpus]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "on"
cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ["SPARK_GRAFT_CPUS"] = cpus

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark import fixtures  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402
from persistor_spark.streaming import ingest_stream  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = build_session(
    "probe-r15-stream",
    extra_conf={
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": (
            "true" if mode == "on" else "false"
        )
    },
)
print(
    "cached-plan AQE:",
    spark.conf.get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"),
    "cpus:", cpus,
    file=sys.stderr,
)

msgs = fixtures.load_messages(spark, SF_DIR)
work = tempfile.mkdtemp(prefix="probe-r15-")
src = f"{work}/src"
for i in range(4):
    msgs.filter(F.col("event_seq") % 4 == i).coalesce(1).write.mode("append").parquet(src)

sinks = ingest_stream.StreamSinks(
    blob_path=f"{work}/blobs",
    index_path=f"{work}/index",
    deadletter_path=f"{work}/dlq",
    checkpoint_path=f"{work}/ckpt",
)
cfg = fixtures.fixture_ingest_config()
stream = ingest_stream.file_stream(spark, src, max_files_per_trigger=1)
# warm run first (JIT/classload) into throwaway sinks
warm_sinks = ingest_stream.StreamSinks(
    blob_path=f"{work}/wblobs",
    index_path=f"{work}/windex",
    deadletter_path=f"{work}/wdlq",
    checkpoint_path=f"{work}/wckpt",
)
q, _ = ingest_stream.run_stream(
    ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
    cfg, warm_sinks, exactly_once_index=False, exactly_once_blobs=False,
)
q.awaitTermination(600)

t0 = time.time()
q, metrics = ingest_stream.run_stream(
    stream, cfg, sinks, exactly_once_index=False, exactly_once_blobs=False
)
q.awaitTermination(600)
elapsed = time.time() - t0

idx_files = [p for p in glob.glob(f"{sinks.index_path}/*.parquet")]
blob_files = glob.glob(f"{sinks.blob_path}/**/*.parquet", recursive=True)
print(
    f"mode={mode} cpus={cpus} batches={metrics.batches} "
    f"warm_elapsed={elapsed:.2f}s index_files={len(idx_files)} "
    f"blob_files={len(blob_files)} "
    f"files_per_batch={len(idx_files) / max(metrics.batches, 1):.1f}"
)
import shutil

shutil.rmtree(work, ignore_errors=True)
spark.stop()
