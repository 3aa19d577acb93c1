"""FileSubscription stand-in: S1/S2 receiver semantics EXECUTED.

Previously the Pub/Sub receiver (S1, receiver.go:31-58) and Service Bus
iterator (S2, receiver.go:61-76) were pinned by option-mapping tests only.
The FileSubscription executes the receiver-side contract — lease/ack/nack,
ack-deadline redelivery, flow-control budgets raised to batch bounds — and
the e2e test drives a REDELIVERED batch through decode_pubsub and the real
ingest merge to show the engine's exactly-once (E1) absorbs the broker's
at-least-once.
"""

from pyspark.sql import functions as F

from persistor_spark import fixtures
from persistor_spark.config import BatchSettings, IngestConfig
from persistor_spark.sources.file_subscription import (
    FileSubscription,
    decode_pubsub,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _publish_n(spark, sub, n=12):
    rows = [
        (f"payload-{i}", {"business_source_key": f"src{i % 3}", "event_type": "t"},)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "payload string, attributes map<string,string>"
    ).withColumn("publish_time", F.timestamp_seconds(F.lit(900) + F.length("payload")))
    return sub.publish(df)


def test_lease_ack_nack_and_deadline_redelivery(spark, tmp_path):
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=5, ack_deadline_s=10, clock=clock
    )
    assert _publish_n(spark, sub, 12) == 12

    b1 = [r["message_id"] for r in sub.pull(spark).collect()]
    assert len(b1) == 5
    # leased messages are NOT redelivered while the deadline holds
    b2 = [r["message_id"] for r in sub.pull(spark).collect()]
    assert len(b2) == 5 and not set(b1) & set(b2)

    sub.ack(b1)
    sub.nack(b2[:2])  # abandoned -> immediately deliverable again
    b3 = [r["message_id"] for r in sub.pull(spark).collect()]
    # the 2 remaining never-pulled + the 2 nacked; acked ones never return
    assert len(b3) == 4 and set(b2[:2]) <= set(b3) and not set(b1) & set(b3)

    # crash simulation: b3 never acked; before the deadline nothing is left
    assert sub.pull(spark).count() == 0
    clock.t += 11  # deadlines pass -> redelivery (at-least-once)
    b4 = [r["message_id"] for r in sub.pull(spark, 12).collect()]
    # everything unacked comes back: b3 plus the still-unacked tail of b2
    assert set(b4) == set(b3) | set(b2[2:])
    # delivery counters prove the redelivery happened
    deliveries = sub.stats()["deliveries"]
    assert all(deliveries[m] >= 2 for m in b3)


def test_flow_control_budgets(spark, tmp_path):
    clock = FakeClock()
    # outstanding cap 6 messages: a 5-batch pull then a 1-batch pull, then 0
    sub = FileSubscription(
        str(tmp_path / "s1"),
        batch_size=5,
        max_outstanding_messages=6,
        ack_deadline_s=100,
        clock=clock,
    )
    _publish_n(spark, sub, 12)
    assert sub.pull(spark).count() == 5
    assert sub.pull(spark).count() == 1  # budget = 6 - 5 leased
    assert sub.pull(spark).count() == 0  # budget exhausted
    sub.ack([r["message_id"] for r in sub.pull(spark, 0).collect()])  # no-op ack
    # byte budget: each payload ~9-10 bytes; cap at 25 bytes -> ~3 messages,
    # and the FIRST message always fits even if oversized
    sub2 = FileSubscription(
        str(tmp_path / "s2"),
        batch_size=10,
        max_outstanding_bytes=25,
        ack_deadline_s=100,
        clock=clock,
    )
    _publish_n(spark, sub2, 12)
    got = sub2.pull(spark).collect()
    assert 1 <= len(got) <= 3
    assert sum(r["size_bytes"] for r in got) <= 25 or len(got) == 1


def test_reference_settings_derivation():
    cfg = IngestConfig(batch=BatchSettings(batch_size=5000, batch_memory_bytes=2_000_000_000))
    s1 = FileSubscription.for_pubsub("/tmp/x", cfg)
    # receiver.go:38-44 — caps raised to at least the batch bounds
    assert s1.max_outstanding_messages == 5000
    assert s1.max_outstanding_bytes == 2_000_000_000
    cfg_small = IngestConfig(batch=BatchSettings(batch_size=10, batch_memory_bytes=1024))
    s2 = FileSubscription.for_pubsub("/tmp/x", cfg_small)
    # small batches do NOT lower the client defaults (only raises)
    assert s2.max_outstanding_messages == 1000
    assert s2.max_outstanding_bytes == 1_000_000_000
    sb = FileSubscription.for_servicebus("/tmp/x", cfg_small)
    assert sb.batch_size == 10


def test_servicebus_vocabulary_aliases(spark, tmp_path):
    sub = FileSubscription(str(tmp_path / "sb"), batch_size=3, clock=FakeClock())
    _publish_n(spark, sub, 3)
    ids = [r["message_id"] for r in sub.pull(spark).collect()]
    sub.complete(ids[:1])
    sub.abandon(ids[1:])
    redelivered = [r["message_id"] for r in sub.pull(spark).collect()]
    assert set(redelivered) == set(ids[1:])


def test_redelivered_batch_stays_exactly_once_through_ingest(spark, sf_dir, tmp_path):
    """The S1 loop end to end: broker at-least-once + engine idempotent
    MERGE (E1) = exactly-once index, with the redelivery made observable."""
    from persistor_spark.plans import ingest

    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=200, ack_deadline_s=10, clock=clock
    )
    msgs = fixtures.load_messages(spark, sf_dir).limit(60)
    # publish through the broker: payload + the attribute map it delivers
    sub.publish(
        msgs.select(
            "payload", "attributes", "publish_time", F.col("ordering_key")
        )
    )
    cfg = fixtures.fixture_ingest_config()
    index = str(tmp_path / "index")

    def consume_once():
        batch = sub.pull(spark)
        decoded = decode_pubsub(batch, "persistor-sub")
        # fixture clock column is ingestion_time; stand-in sets it at decode
        res = ingest.run_batch(decoded, cfg)
        ingest.write_index_merge(res, index)
        return [r["message_id"] for r in batch.select("message_id").collect()]

    first = consume_once()
    assert len(first) == 60
    # crash BEFORE ack: deadline expires, broker redelivers the whole batch
    clock.t += 11
    second = consume_once()
    assert set(second) == set(first)  # at-least-once, observably
    sub.ack(second)

    indexed = spark.read.parquet(index)
    assert indexed.count() == 60  # exactly-once despite double delivery
    assert indexed.select("unique_id").distinct().count() == 60
    assert sub.stats()["leased"] == 0 and sub.stats()["acked"] == 60

def test_ack_df_and_nack_df_scale_path(spark, tmp_path):
    """The de-drivered settle path (r8 VERDICT #3): ack/nack via DataFrame
    frames — no id list ever materialized — gives the same lease/budget
    accounting as the list path."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"),
        batch_size=5,
        max_outstanding_messages=5,
        ack_deadline_s=100,
        clock=clock,
    )
    _publish_n(spark, sub, 12)
    b1 = sub.pull(spark)
    assert b1.count() == 5
    # budget exhausted while the group is outstanding
    assert sub.pull(spark).count() == 0
    sub.ack_df(b1)
    assert sub.stats()["acked"] == 5 and sub.stats()["leased"] == 0

    b2 = sub.pull(spark)
    ids2 = [r["message_id"] for r in b2.collect()]
    sub.nack_df(b2.limit(2))
    # the 2 released ids are deliverable again AND freed the outstanding
    # budget (cap 5, 3 still leased -> pull of 2); earliest-first order
    # redelivers exactly the released pair
    b3 = sub.pull(spark, 12)
    ids3 = {r["message_id"] for r in b3.collect()}
    assert len(ids3) == 2 and ids3 <= set(ids2)
    sub.ack_df(b3)
    b4 = sub.pull(spark, 12)  # budget 2 again: the never-pulled tail
    ids4 = {r["message_id"] for r in b4.collect()}
    assert len(ids4) == 2 and not ids4 & (set(ids2) | ids3)
    sub.ack_df(b4)
    b2_rest = [m for m in ids2 if m not in ids3]
    sub.ack(b2_rest)  # list path composes with the frame path
    assert sub.stats()["acked"] == 12
    assert sub.pull(spark, 12).count() == 0


def test_pull_returns_tagged_snapshot_frame(spark, tmp_path):
    """r15 advisor pin: the fast-settle shortcut keys off a dynamic
    attribute (_fsub_lease) on the VERY object pull returns.  If pull ever
    wraps or recreates the returned DataFrame, the shortcut degrades
    SILENTLY to the generic matcher — this test makes that a test failure
    instead of a quiet perf regression."""
    import os

    sub = FileSubscription(str(tmp_path / "sub"), batch_size=4)
    _publish_n(spark, sub, 8)
    b = sub.pull(spark)
    tag = getattr(b, "_fsub_lease", None)
    assert tag is not None, "pull's returned object lost the fast-settle tag"
    root, gid, n, nbytes = tag
    assert root == str(tmp_path / "sub") and n == 4 and nbytes > 0
    # the tag names a lease frame that exists on disk (what fast-settle
    # adopts), and the returned frame is wire-schema shaped
    assert os.path.isdir(str(tmp_path / "sub" / "leases" / f"{gid}.parquet"))
    assert sorted(c for c in b.columns) == sorted(
        ["message_id", "data", "attributes", "publish_time", "ordering_key", "size_bytes"]
    )


def test_fast_settle_preconditions_and_fallbacks(spark, tmp_path):
    """r14 opt: a full-batch ack/nack of the EXACT object pull returned
    settles by adopting the lease frame's files (no Spark jobs).  The
    shortcut must (a) actually engage on the clean full-batch case,
    (b) fall back to the generic matcher after any partial settle of the
    group (the journal then holds rows of this group and 'matched = whole
    frame' is false), (c) never touch another subscription's state via a
    foreign tag, and (d) keep nack redelivery + double-settle idempotence
    identical to the generic path."""
    import os

    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"),
        batch_size=4,
        max_outstanding_messages=100,
        ack_deadline_s=100,
        clock=clock,
    )
    _publish_n(spark, sub, 12)

    def fast_frames(d):
        if not os.path.isdir(d):
            return set()
        return {f for f in os.listdir(d) if f.startswith("fast-")}

    rel = str(tmp_path / "sub" / "released")
    ack = str(tmp_path / "sub" / "acked")

    # (a) clean full-batch ack -> fast path engaged (adopted frame files
    # appear in both stores), accounting identical to the generic path
    b1 = sub.pull(spark)
    assert b1.count() == 4
    sub.ack_df(b1)
    assert fast_frames(rel) and fast_frames(ack)
    st = sub.stats()
    assert st["acked"] == 4 and st["leased"] == 0

    # (d) full-batch nack -> fast path; all 4 redeliverable, none acked
    b2 = sub.pull(spark)
    ids2 = {r["message_id"] for r in b2.collect()}
    n_rel_before = len(fast_frames(rel))
    sub.nack_df(b2)
    assert len(fast_frames(rel)) > n_rel_before
    st = sub.stats()
    assert st["acked"] == 4 and st["leased"] == 0
    b2b = sub.pull(spark)
    assert {r["message_id"] for r in b2b.collect()} == ids2

    # double ack of the same object: the second call finds the group gone
    # and falls back to the generic matcher, which matches nothing
    sub.ack_df(b2b)
    st = sub.stats()
    assert st["acked"] == 8 and st["leased"] == 0
    sub.ack_df(b2b)  # no-op
    st = sub.stats()
    assert st["acked"] == 8 and st["leased"] == 0

    # (b) partial settle first -> the full-object ack must NOT fast-path
    # (remaining id acked once; no double decrement; group closed)
    p2 = sub.pull(spark, 2)  # leases 2 of the 4 never-pulled ids
    assert p2.count() == 2
    b3 = sub.pull(spark, 12)  # the last 2 fresh ids
    ids3 = [r["message_id"] for r in b3.collect()]
    assert len(ids3) == 2
    sub.ack(ids3[:1])  # list-path partial settle decrements b3's group
    n_fast_ack = len(fast_frames(ack))
    sub.ack_df(b3)  # stale (n, bytes) tag -> generic matcher
    assert len(fast_frames(ack)) == n_fast_ack, "fast path ran on a stale tag"
    st = sub.stats()
    assert st["acked"] == 10 and st["leased"] == 2  # p2 still leased

    # (c) foreign tag: acking sub A's batch on sub B must not touch B's
    # groups (B journals the unknown ids into its acked store, exactly as
    # the generic path always did for foreign ids)
    sub_b = FileSubscription(
        str(tmp_path / "other"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub_b, 4)
    bb = sub_b.pull(spark)
    sub_b.ack_df(p2)  # foreign object: tag root mismatch -> generic path
    assert not fast_frames(str(tmp_path / "other" / "released"))
    stb = sub_b.stats()
    assert stb["leased"] == 4, "foreign tag decremented sub B's group"
    assert stb["acked"] == 2  # the 2 foreign ids, journaled but matching none
    sub_b.ack_df(bb)
    assert sub_b.stats()["acked"] == 6 and sub_b.stats()["leased"] == 0
    # p2 is still validly leased on A with an unchanged (n, bytes): the
    # fast path may engage; draining A proves nothing leaked
    sub.ack_df(p2)
    st = sub.stats()
    assert st["acked"] == 12 and st["leased"] == 0
    assert sub.pull(spark, 12).count() == 0


def test_racing_consumers_no_double_delivery(spark, tmp_path):
    """r8 VERDICT #6: concurrent pull/ack interleavings from racing
    consumer threads — the flock'd lease accounting must never lease one
    message to two consumers within a deadline window, and the final
    accounting must be dense (every message acked exactly, none lost)."""
    import threading

    sub = FileSubscription(
        str(tmp_path / "race"),
        batch_size=7,
        max_outstanding_messages=1000,
        ack_deadline_s=300.0,  # real clock; nothing expires mid-test
    )
    _publish_n(spark, sub, 60)

    got: list = []
    errors: list = []

    def consumer(k):
        try:
            while True:
                batch = sub.pull(spark)
                ids = [r["message_id"] for r in batch.collect()]
                if not ids:
                    return
                got.append((k, ids))
                if k == 0:
                    sub.ack(ids)          # list path
                else:
                    sub.ack_df(batch)     # frame path
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=consumer, args=(k,)) for k in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    all_ids = [m for _, ids in got for m in ids]
    # no double delivery within the lease window (nothing expired)
    assert len(all_ids) == len(set(all_ids)) == 60
    st = sub.stats()
    assert st["acked"] == 60 and st["leased"] == 0
    assert all(n == 1 for n in st["deliveries"].values())


def test_acked_store_compaction_preserves_protocol(spark, tmp_path):
    """r9: the acked store grows one parquet frame per ack; compact()
    rewrites it (maintenance.compact_parquet under the state flock) and
    the protocol is unchanged — acked messages stay retired, unacked ones
    still deliver, stats unchanged."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 12)
    for _ in range(2):  # two pull/ack cycles -> multiple acked frames
        b = sub.pull(spark)
        sub.ack_df(b)
    # a nack journals a released frame, so compact() covers both stores
    b_extra = sub.pull(spark)
    sub.nack_df(b_extra)
    before = sub.stats()
    assert before["acked"] == 8
    stats = sub.compact(spark)
    assert stats["acked"]["files_after"] <= stats["acked"]["files_before"]
    assert stats["released"]["files_after"] <= stats["released"]["files_before"]
    after = sub.stats()
    assert after["acked"] == 8 and after["deliveries"] == before["deliveries"]
    # acked ids stay excluded; the 4 never-pulled ids still deliver
    b3 = sub.pull(spark, 12)
    assert b3.count() == 4
    sub.ack_df(b3)
    assert sub.stats()["acked"] == 12
    assert sub.pull(spark, 12).count() == 0


def test_ack_of_releases_does_not_double_decrement_original_group(spark, tmp_path):
    """r9 review finding: a nacked id stays in its ORIGINAL group's
    immutable frame; settling it after re-lease must decrement only the
    NEW group (released ids are excluded from matching), or the original
    group is deleted early and its still-leased messages become
    redeliverable inside the deadline window."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"),
        batch_size=4,
        max_outstanding_messages=100,
        ack_deadline_s=100,
        clock=clock,
    )
    _publish_n(spark, sub, 6)
    g1 = sub.pull(spark)  # leases 4 (group g1)
    ids1 = [r["message_id"] for r in g1.collect()]
    sub.nack_df(g1.limit(2))  # 2 released from g1 -> deliverable
    assert sub.stats()["leased"] == 2
    g2 = sub.pull(spark)  # re-leases the 2 released + the 2 fresh (group g2)
    ids2 = {r["message_id"] for r in g2.collect()}
    assert len(ids2 & set(ids1)) == 2 and sub.stats()["leased"] == 6
    sub.ack_df(g2)  # must shrink ONLY g2 (-4), never g1's remaining 2
    st = sub.stats()
    assert st["acked"] == 4 and st["leased"] == 2
    # g1's two unacked messages are still under lease: no redelivery
    assert sub.pull(spark, 12).count() == 0
    clock.t += 101  # lease expiry -> they come back (at-least-once)
    back = {r["message_id"] for r in sub.pull(spark, 12).collect()}
    assert back == set(ids1) - ids2


def test_duplicate_settle_is_idempotent_both_paths(spark, tmp_path):
    """r9 advisor (high): every settle journals its matched rows, so
    settling the same id TWICE — duplicate ack, ack-then-nack, or the
    at-least-once flow acking both copies of a redelivered message — must
    match nothing the second time.  Pre-fix, a duplicate ack
    double-decremented its group's remaining (n, bytes), deleting the
    group early and making its still-leased messages re-pullable inside
    the deadline — the exact double-delivery window the lease exists to
    prevent."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 4)
    g1 = sub.pull(spark)
    ids1 = [r["message_id"] for r in g1.collect()]

    # list path: double-ack two ids = 4 settle hits pre-fix -> n 4-4=0,
    # group deleted, the 2 unacked ids leak back within the deadline
    sub.ack(ids1[:2])
    sub.ack(ids1[:2])
    assert sub.stats()["leased"] == 2
    assert sub.pull(spark, 12).count() == 0, "leased ids redelivered in deadline"

    # frame path: ack-then-nack of an acked id is a no-op (ack is final)
    sub.ack_df(spark.createDataFrame([(i,) for i in ids1[2:3]], "message_id string"))
    sub.nack_df(spark.createDataFrame([(i,) for i in ids1[2:3]], "message_id string"))
    st = sub.stats()
    assert st["acked"] == 3 and st["leased"] == 1
    # the acked-then-nacked id never returns; the one unacked id stays leased
    assert sub.pull(spark, 12).count() == 0
    clock.t += 101
    back = {r["message_id"] for r in sub.pull(spark, 12).collect()}
    assert back == {ids1[3]}


def test_redelivered_copy_double_ack(spark, tmp_path):
    """The normal at-least-once flow: lease expires, message redelivered,
    consumer acks BOTH copies (same message_id).  The second ack must not
    decrement the new group again."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=10, clock=clock
    )
    _publish_n(spark, sub, 4)
    b1 = sub.pull(spark)
    ids = [r["message_id"] for r in b1.collect()]
    clock.t += 11  # b1's lease expires un-acked
    b2 = sub.pull(spark)  # redelivery: same ids, new group
    assert {r["message_id"] for r in b2.collect()} == set(ids)
    sub.ack_df(b1.limit(4))  # first copy acked -> new group fully settled
    sub.ack_df(b2)           # second copy: every id already journaled
    st = sub.stats()
    assert st["acked"] == 4 and st["leased"] == 0
    assert sub.pull(spark, 12).count() == 0
    assert sub._load_state()["groups"] == {}


def test_prune_backlog_preserves_protocol(spark, tmp_path):
    """r9 VERDICT #1: prune_backlog rewrites the backlog minus acked rows
    and retires the acked store — acked ids stay retired (stats exact),
    unacked ids still deliver, leased ids stay leased, nacked ids stay
    redeliverable, and the settled journal shrinks to active groups."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"),
        batch_size=4,
        max_outstanding_messages=100,
        ack_deadline_s=100,
        clock=clock,
    )
    _publish_n(spark, sub, 12)
    b1 = sub.pull(spark)
    sub.ack_df(b1)                      # 4 acked
    b2 = sub.pull(spark)                # 4 leased
    ids2 = {r["message_id"] for r in b2.collect()}
    sub.nack_df(b2.limit(1))            # 1 released from the leased group

    out = sub.prune_backlog(spark)
    assert out["retired"] == 4 and out["backlog_rows"] == 8
    st = sub.stats()
    assert st["acked"] == 4 and st["leased"] == 3

    # acked ids never return; the nacked one + 4 never-pulled deliver now
    b3 = sub.pull(spark, 12)
    ids3 = {r["message_id"] for r in b3.collect()}
    assert len(ids3) == 5 and len(ids3 & ids2) == 1
    # the 3 still-leased survive the prune: redelivered only after expiry
    clock.t += 101
    back = {r["message_id"] for r in sub.pull(spark, 12).collect()}
    assert back == ids2 - ids3 | ids3  # b3's lease also expired -> all 8
    # a second prune with nothing acked since is a no-op
    assert sub.prune_backlog(spark)["retired"] == 0


def test_pull_auto_prunes_once_third_of_backlog_acked(spark, tmp_path):
    """pull triggers the prune itself (amortized O(1)/message): after
    enough acks the backlog parquet physically shrinks and the retired
    count moves into state — no orchestration needed."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=5, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 30)
    seen = set()
    for _ in range(6):
        b = sub.pull(spark)
        got = {r["message_id"] for r in b.collect()}
        assert not got & seen, "prune caused a double delivery"
        seen |= got
        sub.ack_df(b)
    assert len(seen) == 30 and sub.pull(spark, 30).count() == 0
    st = sub._load_state()
    assert st.get("acked_retired", 0) > 0, "auto-prune never fired"
    assert sub.stats()["acked"] == 30


def test_journal_prune_keeps_active_group_idempotency(spark, tmp_path):
    """r10: the journal-only prune drops rows of settled/expired groups
    but MUST keep active groups' rows — they are the settle-idempotency
    record.  Ack half a group, force the prune, duplicate-ack the same
    ids: still no double decrement; after the group fully settles the
    next prune empties the journal."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 4)
    b = sub.pull(spark)
    ids = [r["message_id"] for r in b.collect()]
    sub.ack_df(spark.createDataFrame([(i,) for i in ids[:2]], "message_id string"))
    st = sub._load_state()
    assert st["groups"] and st.get("journal_rows", 0) == 2

    sub.prune_backlog(spark)  # journal prune runs inside; group still active
    # duplicate ack of the already-settled ids: must match nothing
    sub.ack_df(spark.createDataFrame([(i,) for i in ids[:2]], "message_id string"))
    st = sub._load_state()
    assert sub.stats()["leased"] == 2, "journal prune lost the idempotency record"

    sub.ack_df(spark.createDataFrame([(i,) for i in ids[2:]], "message_id string"))
    out = sub.prune_backlog(spark)
    st = sub._load_state()
    assert st["groups"] == {} and st["journal_rows"] == 0
    assert sub.stats()["acked"] == 4 and sub.pull(spark, 12).count() == 0


def test_drained_prune_retires_backlog_without_rewrite(spark, tmp_path):
    """r14 opt: a prune on a fully-acked backlog retires the whole dir by
    rename (after a narrow emptiness probe) instead of rewriting zero
    rows — and the narrow probe keeps the shortcut SOUND when the acked
    count merely LOOKS like full coverage (list-path acks of ids that
    never hit this backlog)."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=6, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 6)
    b = sub.pull(spark)
    sub.ack_df(b)
    out = sub.prune_backlog(spark)
    assert out == {"backlog_rows": 0, "retired": 6}
    # the shortcut arm: no live backlog parquet remains at all
    assert not sub._has_parquet(sub._backlog_dir())
    assert sub._load_state().get("backlog_manifest") in ([], None)
    assert sub.pull(spark, 12).count() == 0
    assert sub.stats()["acked"] == 6

    # soundness arm: 2 live rows, 3 FOREIGN acks (never published here) —
    # acked_distinct (3) >= live rows (2), but the probe finds live rows,
    # so the prune must take the rewrite path and keep both deliverable
    _publish_n(spark, sub, 2)
    sub.ack(["ghost-a", "ghost-b", "ghost-c"])
    out = sub.prune_backlog(spark)
    assert out["backlog_rows"] == 2 and out["retired"] == 0
    assert sub._has_parquet(sub._backlog_dir())
    assert sub.pull(spark, 12).count() == 2


def test_double_nack_is_idempotent_and_redelivers_once(spark, tmp_path):
    """Nack-then-nack of the same id: the first nack journals the release
    and decrements; the second must match nothing — and the id is
    redelivered exactly once (not twice) on the next pull."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 4)
    b = sub.pull(spark)
    ids = [r["message_id"] for r in b.collect()]
    one = spark.createDataFrame([(ids[0],)], "message_id string")
    sub.nack_df(one)
    sub.nack_df(one)  # duplicate nack: pre-fix shape would decrement again
    assert sub.stats()["leased"] == 3
    back = [r["message_id"] for r in sub.pull(spark, 12).collect()]
    assert back == [ids[0]], f"expected exactly one redelivery, got {back}"


def test_publish_after_prune_continues_cleanly(spark, tmp_path):
    """Lifecycle across a prune: drain + prune empties the stores; later
    publishes keep monotone ids, the live-row counter restarts from the
    pruned state, and the full cycle stays exactly-once."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=6, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 6)
    b1 = sub.pull(spark)
    ids1 = {r["message_id"] for r in b1.collect()}
    sub.ack_df(b1)
    sub.prune_backlog(spark)
    st = sub._load_state()
    assert st["backlog_rows"] == 0 and st["next_id"] == 6

    _publish_n(spark, sub, 6)
    st = sub._load_state()
    assert st["backlog_rows"] == 6 and st["next_id"] == 12
    b2 = sub.pull(spark, 12)
    ids2 = {r["message_id"] for r in b2.collect()}
    assert len(ids2) == 6 and not ids2 & ids1, "pruned ids re-surfaced or ids reused"
    sub.ack_df(b2)
    assert sub.stats()["acked"] == 12
    assert sub.pull(spark, 12).count() == 0


def test_crashed_prune_swap_recovers_on_next_operation(spark, tmp_path):
    """r10: a prune swap is two renames; a crash in between leaves the
    live dir missing — for the backlog that breaks pull, for the settled
    journal it would re-open the double-decrement window.  Every flock'd
    entry point recovers first: the complete pruned copy (preferred) or
    the displaced original is renamed back in."""
    import os
    import shutil

    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 8)
    b1 = sub.pull(spark)
    ids1 = [r["message_id"] for r in b1.collect()]
    sub.ack(ids1[:2])  # journal now holds (g, 2 ids)

    # simulate the backlog window: pruned copy fully written, live renamed
    # away, crash before the rename-in
    backlog = sub._backlog_dir()
    shutil.copytree(backlog, f"{backlog}.__compact_simcrash")
    os.rename(backlog, f"{backlog}.__trash_simcrash")
    nxt = {r["message_id"] for r in sub.pull(spark, 12).collect()}
    assert len(nxt) == 4 and not nxt & set(ids1), "backlog swap not recovered"

    # simulate the journal window the same way; then a DUPLICATE ack of
    # the already-settled ids must still match nothing
    rel = sub._released_dir()
    shutil.copytree(rel, f"{rel}.__compact_simcrash2")
    os.rename(rel, f"{rel}.__trash_simcrash2")
    sub.ack_df(spark.createDataFrame([(i,) for i in ids1[:2]], "message_id string"))
    assert sub.stats()["leased"] == 6, "journal swap not recovered: double decrement"

    # ...and with only the displaced original left (no pruned copy), the
    # fallback restores it
    os.rename(rel, f"{rel}.__trash_simcrash3")
    sub.ack_df(spark.createDataFrame([(i,) for i in ids1[:2]], "message_id string"))
    assert sub.stats()["leased"] == 6


def test_crashed_journal_swap_recovers_on_list_settle(spark, tmp_path):
    """r10 advisor (medium): the LIST settle path (ack/nack/complete/
    abandon) must also recover a crashed journal-prune swap before it
    reads the journal.  Without recovery it sees an EMPTY journal — a
    duplicate ack re-matches the original group frame and double-
    decrements — and worse, its own makedirs(released/) recreates the
    live dir so the displaced history could never be restored again."""
    import os
    import shutil

    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 8)
    b1 = sub.pull(spark)
    ids1 = [r["message_id"] for r in b1.collect()]
    sub.ack(ids1[:2])  # journal holds the 2 settled ids

    rel = sub._released_dir()
    # crash window: pruned copy complete, live renamed away
    shutil.copytree(rel, f"{rel}.__compact_simcrash")
    os.rename(rel, f"{rel}.__trash_simcrash")
    sub.ack(ids1[:2])  # duplicate settle via the LIST path
    assert sub.stats()["leased"] == 2, "list-path journal swap not recovered"

    # fallback arm: only the displaced original remains
    os.rename(rel, f"{rel}.__trash_simcrash2")
    sub.nack(ids1[:2])  # duplicate settle (release arm) — must match nothing
    assert sub.stats()["leased"] == 2


def _publish_times(spark, sub, base, n):
    df = spark.createDataFrame(
        [(f"p{base}-{i}", base + i) for i in range(n)], "payload string, secs long"
    ).select("payload", F.timestamp_seconds(F.col("secs")).alias("publish_time"))
    return sub.publish(df)


def test_bulk_publish_sorts_out_of_band_before_first_pull(spark, tmp_path):
    """r11 (r10 verdict #4): a bulk publish that leaves a large unsorted
    backlog pays the delivery-order sort ITSELF, out-of-band, so the
    first consumer pull never absorbs the O(N log N) cliff.  The manifest
    must exist before any pull; delivery order and exactly-once still
    hold; and the geometric threshold means small follow-up publishes do
    NOT re-sort."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    sub.BACKLOG_ROWS_PER_FILE = 5
    _publish_times(spark, sub, 1000, 40)  # 40 >= 8*batch -> publish sorts
    st = sub._load_state()
    assert len(st.get("backlog_manifest", [])) >= 4, "publish did not sort"

    # small follow-up publish: appendix 4 < max(32, 44//3) -> NO re-sort
    # (the manifest row total must be unchanged = still the first sort's)
    _publish_times(spark, sub, 2000, 4)
    st2 = sub._load_state()
    assert sum(r for _, r in st2["backlog_manifest"]) == 40, "small append re-sorted"

    # drain: exactly-once, global (publish_time, message_id) order
    got = []
    while True:
        b = sub.pull(spark)
        ids = [r["message_id"] for r in b.orderBy("publish_time", "message_id").collect()]
        if not ids:
            break
        got.extend(ids)
        sub.ack_df(b)
    assert len(got) == 44 and len(set(got)) == 44
    assert got == [f"m{i:09d}" for i in range(44)]


def test_manifest_bounded_pull_preserves_global_delivery_order(spark, tmp_path):
    """r10: pull reads only a manifest prefix of the SORTED backlog plus
    the unsorted appendix.  Force many small sorted files (5 rows/file),
    then append messages with EARLIER publish times than the sorted
    region: the appendix must still win delivery order, every message
    must be delivered exactly once, and the whole drain must come out in
    global (publish_time, message_id) order — including across the
    mid-drain re-prune that rebuilds the manifest."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    sub.BACKLOG_ROWS_PER_FILE = 5
    _publish_times(spark, sub, 1000, 40)

    # r11: 40 >= 8*batch means PUBLISH already ran the delivery-order sort
    # out-of-band; the pull consumes the manifest it left behind
    b1 = sub.pull(spark)
    st = sub._load_state()
    assert len(st.get("backlog_manifest", [])) >= 4, "initial sort did not manifest"
    got = [r["message_id"] for r in b1.orderBy("publish_time", "message_id").collect()]
    sub.ack_df(b1)

    # appendix with EARLIER times than everything still live
    _publish_times(spark, sub, 500, 10)

    while True:
        b = sub.pull(spark)
        ids = [r["message_id"] for r in b.orderBy("publish_time", "message_id").collect()]
        if not ids:
            break
        got.extend(ids)
        sub.ack_df(b)

    assert len(got) == 50 and len(set(got)) == 50, "lost or duplicated deliveries"
    # expected global order: first batch ids 0-3 (already delivered), then
    # ALL appendix ids (earlier times), then the rest of batch 1 in order
    first40 = [f"m{i:09d}" for i in range(40)]
    appendix = [f"m{i:09d}" for i in range(40, 50)]
    expected = first40[:4] + appendix + first40[4:]
    assert got == expected, f"delivery order diverged: {got[:12]}..."
    st = sub._load_state()
    assert sub.stats()["acked"] == 50 and st["groups"] == {}


def test_stale_manifest_voids_itself_and_full_scan_still_correct(spark, tmp_path):
    """A manifest whose files no longer exist (the crashed-swap fallback
    restored the displaced ORIGINAL layout) must void itself: pull falls
    back to the full scan, delivers correctly, and drops the manifest."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_times(spark, sub, 1000, 8)
    with __import__("persistor_spark.sources._statelock", fromlist=["state_lock"]).state_lock(
        sub._state_path()
    ):
        st = sub._load_state()
        st["backlog_manifest"] = [["part-gone-a.parquet", 5], ["part-gone-b.parquet", 5]]
        sub._save_state(st)
    got = [r["message_id"] for r in sub.pull(spark).orderBy("message_id").collect()]
    assert got == [f"m{i:09d}" for i in range(4)]
    assert "backlog_manifest" not in sub._load_state(), "stale manifest survived"


import pytest

# two pinned seeds in CI; extend ad hoc with e.g.
#   SPARK_GRAFT_FUZZ_SEEDS=1,2,3 pytest -k randomized
_FUZZ_SEEDS = [0xC0FFEE, 20260816] + [
    int(x)
    for x in __import__("os").environ.get("SPARK_GRAFT_FUZZ_SEEDS", "").split(",")
    if x.strip()
]


@pytest.mark.parametrize("seed", _FUZZ_SEEDS)
def test_randomized_protocol_model_check(spark, tmp_path, seed):
    """Seeded model-based fuzz of the whole receiver protocol (the
    hand-scripted interleaving tests generalized): ~35 random operations
    — publish (strictly increasing publish times, so the model knows
    every future message_id a priori), pull, list-path ack/nack of random
    leased subsets (plus occasional double-acks), and clock ticks that
    expire leases — with EVERY pull checked against the model's exact
    expectation: the first min(batch, cap - outstanding) deliverable ids
    in global delivery order, where deliverable = published - acked -
    actively-leased (expiry strictly > now, mirroring _active_groups).
    The mid-fuzz backlog prunes, journal prunes, and publish-time sorts
    all fire naturally at these sizes and must not perturb the model.
    Ends with a full drain and exactly-once accounting."""
    import random

    rng = random.Random(seed)
    clock = FakeClock()
    BATCH, CAP, DEADLINE = 5, 12, 50.0
    sub = FileSubscription(
        str(tmp_path / "sub"),
        batch_size=BATCH,
        ack_deadline_s=DEADLINE,
        max_outstanding_messages=CAP,
        max_outstanding_bytes=10**12,
        clock=clock,
    )

    published = 0
    acked: set = set()
    leases: list = []  # [expiry, set(ids)] per pulled group

    def mid(i):
        return f"m{i:09d}"

    def live_sets():
        return [s for e, s in leases if e > clock.t]

    def outstanding():
        return sum(len(s) for s in live_sets())

    def deliverable():
        leased = set().union(*live_sets()) if live_sets() else set()
        return [
            mid(i)
            for i in range(published)
            if mid(i) not in acked and mid(i) not in leased
        ]

    def do_publish():
        nonlocal published
        k = rng.randint(2, 9)
        rows = [(f"p{published + j}", 1000.0 + published + j) for j in range(k)]
        df = spark.createDataFrame(rows, "payload string, secs double").select(
            "payload", F.timestamp_seconds(F.col("secs")).alias("publish_time")
        )
        assert sub.publish(df) == k
        published += k

    def do_pull():
        budget = min(BATCH, CAP - outstanding())
        want = deliverable()[: max(budget, 0)]
        got = [
            r["message_id"]
            for r in sub.pull(spark).orderBy("publish_time", "message_id").collect()
        ]
        assert got == want, f"t={clock.t}: pull returned {got}, model says {want}"
        if got:
            leases.append([clock.t + DEADLINE, set(got)])

    def do_ack():
        cands = [s for s in live_sets() if s]
        if not cands:
            return
        s = rng.choice(cands)
        ids = rng.sample(sorted(s), k=rng.randint(1, len(s)))
        if acked and rng.random() < 0.3:
            ids.append(rng.choice(sorted(acked)))  # idempotent double-ack
        if rng.random() < 0.3:  # the Spark frame path (_settle_df)
            sub.ack_df(
                spark.createDataFrame([(i,) for i in ids], "message_id string")
            )
        else:
            sub.ack(ids)
        for i in ids:
            acked.add(i)
            for ls in leases:
                ls[1].discard(i)

    def do_nack():
        cands = [s for s in live_sets() if s]
        if not cands:
            return
        s = rng.choice(cands)
        ids = rng.sample(sorted(s), k=rng.randint(1, len(s)))
        if rng.random() < 0.3:  # the Spark frame path (_settle_df)
            sub.nack_df(
                spark.createDataFrame([(i,) for i in ids], "message_id string")
            )
        else:
            sub.nack(ids)
        for i in ids:
            for ls in leases:
                ls[1].discard(i)

    def do_tick():
        clock.t += rng.choice([5.0, 20.0, 60.0])

    def do_crash():
        # simulate a prune swap crashed between its two renames: the
        # complete pruned copy exists, the live dir was renamed away.
        # _recover_swaps_locked must make this INVISIBLE to the protocol,
        # so the model needs no adjustment — that invariance is the test.
        import os
        import shutil

        target = rng.choice(["backlog", "released", "acked"])
        live = f"{sub.root}/{target}"
        if not os.path.isdir(live):
            return
        tag = f"{live}.__compact_sim{rng.randint(0, 10**6)}"
        shutil.copytree(live, tag)
        os.rename(live, f"{live}.__trash_sim{rng.randint(0, 10**6)}")

    do_publish()  # seed the backlog
    ops = [do_publish, do_pull, do_pull, do_ack, do_nack, do_tick, do_crash]
    for _ in range(35):
        rng.choice(ops)()

    # final drain: expire everything, then pull+ack to empty
    clock.t += DEADLINE + 1
    while True:
        budget = min(BATCH, CAP - outstanding())
        want = deliverable()[: max(budget, 0)]
        got = [
            r["message_id"]
            for r in sub.pull(spark).orderBy("publish_time", "message_id").collect()
        ]
        assert got == want
        if not got:
            break
        sub.ack(got)
        acked.update(got)
    assert acked == {mid(i) for i in range(published)}, "lost or phantom messages"
    assert sub.stats()["leased"] == 0
    assert sub.pull(spark).count() == 0


def test_publish_id_reservation_gap_is_harmless(spark, tmp_path):
    """r11 self-audit: publish RESERVES its id range (count + state save)
    BEFORE the backlog append, so a crash between the two leaves an id
    GAP — whereas the old order left rows on disk above an unsaved
    next_id, making the retry assign the same ids to new payloads
    (duplicate message_ids; one ack would retire two messages).
    Simulate the crashed-reserve state and prove the subscription keeps
    working: new ids skip the gap, and the drain is exactly-once."""
    clock = FakeClock()
    sub = FileSubscription(
        str(tmp_path / "sub"), batch_size=4, ack_deadline_s=100, clock=clock
    )
    _publish_n(spark, sub, 4)  # m0..m3 on disk

    # crashed publish: 3 ids reserved and saved, rows never landed
    st = sub._load_state()
    st["next_id"] += 3
    st["backlog_rows"] += 3
    sub._save_state(st)

    df = spark.createDataFrame(
        [(f"q{i}", 2000 + i) for i in range(5)], "payload string, secs long"
    ).select("payload", F.timestamp_seconds(F.col("secs")).alias("publish_time"))
    assert sub.publish(df) == 5  # m7..m11 — the gap m4..m6 never materializes

    got = []
    while True:
        b = sub.pull(spark, 12)
        ids = [r["message_id"] for r in b.collect()]
        if not ids:
            break
        got.extend(ids)
        sub.ack(ids)
    expected = {f"m{i:09d}" for i in (*range(4), *range(7, 12))}
    assert set(got) == expected and len(got) == 9, "gap ids surfaced or rows lost"
    assert sub.stats()["acked"] == 9 and sub.stats()["leased"] == 0
