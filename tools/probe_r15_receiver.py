"""r15 probe: phase profile of the receiver_ingest line — where does each
pull/process/ack cycle spend its time?  (guide §1: measure first)

Usage: python tools/probe_r15_receiver.py [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

cpus = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ["SPARK_GRAFT_CPUS"] = cpus

import concurrent.futures as _cf  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark import fixtures  # noqa: E402
from persistor_spark.plans import ingest  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402
from persistor_spark.sources.file_subscription import (  # noqa: E402
    DEFAULT_MAX_OUTSTANDING_BYTES,
    FileSubscription,
    decode_pubsub,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = build_session("probe-r15-receiver")
work = tempfile.mkdtemp(prefix="probe-r15-rcv-")

msgs = fixtures.load_messages(spark, SF_DIR)
n_msgs = msgs.count()
batch = max(1, -(-n_msgs // 4))
sub = FileSubscription(
    f"{work}/sub",
    batch_size=batch,
    max_outstanding_messages=batch,
    max_outstanding_bytes=max(
        DEFAULT_MAX_OUTSTANDING_BYTES,
        msgs.agg(F.sum(F.octet_length("payload"))).first()[0] or 0,
    ),
)
sub.publish(msgs.select("payload", "attributes", "publish_time", "ordering_key"))

# warm cycle (same as bench)
warm = FileSubscription(f"{work}/warm", batch_size=16)
warm.publish(msgs.limit(16).select("payload", "attributes", "publish_time", "ordering_key"))
cfg = fixtures.fixture_ingest_config()
wb = warm.pull(spark)
if not wb.isEmpty():
    wres = ingest.run_batch(decode_pubsub(wb, "persistor-sub"), cfg, persist_intermediate=True)
    with _cf.ThreadPoolExecutor(max_workers=2) as pool:
        for f in [
            pool.submit(ingest.write_blobs, wres, f"{work}/wblobs"),
            pool.submit(ingest.write_index, wres, f"{work}/windex"),
        ]:
            f.result()
    wres.unpersist()
    warm.ack_df(wb)
    warm.prune_backlog(spark)
    warm.pull(spark).isEmpty()

blobs, index = f"{work}/blobs", f"{work}/index"
pulls = 0
phases = {"pull": [], "emptychk": [], "run_batch": [], "sinks": [], "ack": []}
t_total = time.time()
while True:
    t0 = time.time()
    b = sub.pull(spark)
    phases["pull"].append(time.time() - t0)
    t0 = time.time()
    empty = b.isEmpty()
    phases["emptychk"].append(time.time() - t0)
    if empty:
        break
    pulls += 1
    t0 = time.time()
    res = ingest.run_batch(
        decode_pubsub(b, "persistor-sub"),
        cfg,
        persist_intermediate=True,
        blob_name=F.concat(F.col("broker_id"), F.lit(f"-p{pulls}")),
    )
    phases["run_batch"].append(time.time() - t0)
    t0 = time.time()
    with _cf.ThreadPoolExecutor(max_workers=2) as pool:
        for f in [
            pool.submit(ingest.write_blobs, res, blobs),
            pool.submit(ingest.write_index, res, index),
        ]:
            f.result()
    res.unpersist()
    phases["sinks"].append(time.time() - t0)
    t0 = time.time()
    sub.ack_df(b)
    phases["ack"].append(time.time() - t0)
elapsed = time.time() - t_total
print(f"cpus={cpus} pulls={pulls} total={elapsed:.2f}s")
for k, v in phases.items():
    print(f"  {k:10s} sum={sum(v):6.2f}s  per={[round(x, 2) for x in v]}")
import shutil

shutil.rmtree(work, ignore_errors=True)
spark.stop()
