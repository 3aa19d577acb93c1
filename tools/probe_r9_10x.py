"""r9 probe #2: the receiver protocol at 10x backlog (~1M msgs — the sf1
scale VERDICT #3 asked for; no sf1 fixture exists, so the sf0.1 message set
is replicated 10x with distinct ids/publish times).  Measures pull and
ack_df cost as the acked store grows to ~1M ids: both must stay flat-ish
(cost tracks BATCH size + bounded store scans, not acked history)."""
import os, tempfile, time, sys
sys.path.insert(0, "/root/repo")
REPLICAS = int(os.environ.get("PROBE_REPLICAS", "10"))  # r10: 100 = the 10M-msg decade-2 run
import bench
from pyspark.sql import functions as F
from persistor_spark import fixtures
from persistor_spark.sources.file_subscription import FileSubscription

spark = bench.build_session("probe-10x")
spark.sparkContext.setLogLevel("ERROR")
base = fixtures.load_messages(spark, bench.SF_DIR).select(
    "payload", "attributes", "publish_time", "ordering_key"
)
n1 = base.count()
root = tempfile.mkdtemp(prefix="probe-10x-") + "/sub"
batch = n1  # 10 pulls of one-replica size each
sub = FileSubscription(root, batch_size=batch,
                       max_outstanding_messages=batch,
                       max_outstanding_bytes=10**12)
t0 = time.time()
for r in range(REPLICAS):
    # distinct publish times per replica keep delivery order deterministic
    sub.publish(base.withColumn(
        "publish_time", F.col("publish_time") + F.expr(f"INTERVAL {r} DAYS")))
print(f"published {n1*REPLICAS} msgs in {time.time()-t0:.1f}s")
hist = 0
print("acked_history pull_s ack_s")
while True:
    t0 = time.time(); b = sub.pull(spark)
    if b.isEmpty():
        break
    pull_s = time.time() - t0
    t0 = time.time(); sub.ack_df(b); ack_s = time.time() - t0
    print(f"{hist:>12} {pull_s:6.2f} {ack_s:6.2f}", flush=True)
    hist += batch
assert sub.stats()["acked"] == n1 * REPLICAS
print("done:", n1 * REPLICAS, "msgs acked")
spark.stop()
