"""r9 probe: ack cost vs acked-history size (r8 VERDICT #3 'Done =' row).

Pulls the sf0.1 backlog (600k msgs) in 12 lease-batched pulls of 50k and
times each ack_df as the acked store grows 0 -> 550k ids.  Flat per-ack
time = the settle path is history-independent (frame append + per-group
scalar aggregates), unlike the r8 JSON protocol whose save cost grew
linearly with acked history.
"""
import tempfile, time, sys
sys.path.insert(0, "/root/repo")
import bench
from persistor_spark import fixtures
from persistor_spark.sources.file_subscription import FileSubscription

spark = bench.build_session("probe-ack")
spark.sparkContext.setLogLevel("ERROR")
msgs = fixtures.load_messages(spark, bench.SF_DIR)
n = msgs.count()
batch = max(1, -(-n // 12))
root = tempfile.mkdtemp(prefix="probe-ack-") + "/sub"
sub = FileSubscription(root, batch_size=batch,
                       max_outstanding_messages=batch,
                       max_outstanding_bytes=10**12)
sub.publish(msgs.select("payload", "attributes", "publish_time", "ordering_key"))
hist = 0
print("acked_history pull_s ack_s")
while True:
    t0 = time.time(); b = sub.pull(spark)
    if b.isEmpty():
        break
    pull_s = time.time() - t0
    t0 = time.time(); sub.ack_df(b); ack_s = time.time() - t0
    print(f"{hist:>12} {pull_s:6.2f} {ack_s:6.2f}")
    hist += batch
assert sub.stats()["acked"] == n
print("total msgs:", n, "batch:", batch)
spark.stop()
