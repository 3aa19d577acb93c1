"""The receiver protocol under REAL OS-process parallelism (r11 VERDICT
#3): two independent processes — each with its own Spark session and its
own FileSubscription handle — race pull/settle on ONE subscription with
injected lease expiries, nacks, and a SIGKILL mid-ack, and the final
accounting must still be exactly-once.  The d41 driver pin and the
handler_test.go:429-645 matrix run alternating handles in one process;
the flock protocol CLAIMS cross-process safety (state_lock is an OS
flock, kernel-released on death) — this is the test that executes that
claim instead of asserting it in prose.

Checks, from the workers' action logs (one jsonl row per pull/settle
with wall-clock times):

- exactly-once accounting: the union of delivered ids == the published
  id set; the backlog drains to empty; `stats()["acked"]` == published
  count up to the documented cross-prune duplicate-ack caveat (bounded
  by the observed duplicate-ack count — each backlog row retires
  exactly once however many times its id was delivered).
- redelivery legality (the observable slice of "global delivery
  order"): an id delivered twice must have had its first lease
  RELEASED in between — an explicit nack before the second pull, or
  the ack deadline elapsed, or the holder was SIGKILLed.  Two
  simultaneously-active leases on one id would show up here as a
  second delivery with no legal release.
- crash-safety: one worker SIGKILLs itself at a random point INSIDE
  `ack` (real kill -9, not an exception) — the kernel drops its flock,
  the next puller heals any half-written settle state
  (_recover_swaps_locked + the settle journal), and the invariants
  above still hold.
"""

import json
import os
import subprocess
import sys
import textwrap
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, random, signal, sys, threading, time

    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from persistor_spark.sources.file_subscription import FileSubscription

    root, out_path, seed, kill_mode = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4] == "kill"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"race-worker-{{seed}}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", out_path + ".wh")
        .getOrCreate()
    )
    sub = FileSubscription(root, batch_size=40, ack_deadline_s=3.0)
    rng = random.Random(seed)
    log = open(out_path, "a", buffering=1)
    seen_counts = {{}}
    empty_streak = 0
    killed_once = False
    while empty_streak < 6:
        t_req = time.time()  # BEFORE the pull: <= the lease start under
        # the flock, so deadline checks against it are conservative
        batch = sub.pull(spark)
        ids = sorted(r["message_id"] for r in batch.select("message_id").collect())
        now = time.time()
        if not ids:
            empty_streak += 1
            time.sleep(1.0)
            continue
        empty_streak = 0
        log.write(json.dumps({{"t": now, "t_req": t_req, "event": "pull", "ids": ids}}) + "\\n")
        for i in ids:
            seen_counts[i] = seen_counts.get(i, 0) + 1
        r = rng.random()
        # force-settle an id stuck in a crash-arm chain so the drain
        # terminates; probability makes a 5-chain ~1e-5 anyway
        forced = any(seen_counts[i] > 5 for i in ids)
        if kill_mode and not killed_once and rng.random() < 0.5:
            # real kill -9 at a random point INSIDE the settle
            killed_once = True
            log.write(json.dumps({{"t": time.time(), "event": "kill", "ids": ids}}) + "\\n")
            threading.Timer(rng.uniform(0.0, 0.4), lambda: os.kill(os.getpid(), signal.SIGKILL)).start()
            sub.ack(ids)
            # if the timer missed the window the ack completed: record it
            log.write(json.dumps({{"t": time.time(), "event": "ack", "ids": ids}}) + "\\n")
            continue
        if r < 0.15 and not forced:
            # crashed consumer: never settles; the lease must expire
            log.write(json.dumps({{"t": time.time(), "event": "drop", "ids": ids}}) + "\\n")
        elif r < 0.25 and not forced:
            sub.nack(ids)
            log.write(json.dumps({{"t": time.time(), "event": "nack", "ids": ids}}) + "\\n")
        else:
            sub.ack(ids)
            log.write(json.dumps({{"t": time.time(), "event": "ack", "ids": ids}}) + "\\n")
    log.close()
    spark.stop()
    """
)


def _run_workers(tmp_path, root, n_workers=2, kill_worker=False, timeout=600):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    procs, outs = [], []
    for w in range(n_workers):
        out = str(tmp_path / f"worker{w}.jsonl")
        outs.append(out)
        mode = "kill" if (kill_worker and w == 0) else "race"
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), root, out, str(1000 + w), mode],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    deadline = time.time() + timeout
    rcs = []
    for p in procs:
        p.wait(timeout=max(5, deadline - time.time()))
        rcs.append(p.returncode)
    events = []
    for out in outs:
        if os.path.exists(out):
            with open(out) as fh:
                events.extend(json.loads(line) for line in fh if line.strip())
    events.sort(key=lambda e: e["t"])
    return rcs, events


def _assert_redelivery_legal(events, deadline_s=3.0):
    """Every re-delivery of an id must follow a legal release of its
    previous lease: an explicit nack, a kill of the holder, or the ack
    deadline elapsing since the previous pull."""
    last_pull: dict = {}
    released_at: dict = {}
    for ev in events:
        if ev["event"] == "pull":
            for i in ev["ids"]:
                if i in last_pull:
                    # t_req is recorded BEFORE the previous pull, so it
                    # lower-bounds that lease's start: expiry-based
                    # redelivery must come >= deadline after it (bounded
                    # slack — the flock-to-log latency widens the legal
                    # window slightly, it never narrows it)
                    legal_expiry = ev["t"] >= last_pull[i] + deadline_s - 0.25
                    legal_release = released_at.get(i, -1) >= last_pull[i]
                    assert legal_expiry or legal_release, (
                        f"{i} redelivered at {ev['t']:.2f} while its "
                        f"{last_pull[i]:.2f} lease was still active"
                    )
                last_pull[i] = ev.get("t_req", ev["t"])
        elif ev["event"] in ("nack", "kill"):
            for i in ev["ids"]:
                released_at[i] = ev["t"]
        # an ack is a release too (a later redelivery of an acked id
        # would fail the delivered-set assertions, not this one)


def test_two_process_race_exactly_once(spark, tmp_path):
    from persistor_spark.sources.file_subscription import FileSubscription

    root = str(tmp_path / "sub")
    n = 1600
    msgs = spark.range(n).select(
        F.format_string("payload-%05d", F.col("id")).alias("payload"),
        F.timestamp_seconds(F.col("id")).alias("publish_time"),
    )
    pub = FileSubscription(root, batch_size=40, ack_deadline_s=3.0)
    pub.publish(msgs)

    rcs, events = _run_workers(tmp_path, root, n_workers=2)
    assert rcs == [0, 0], f"worker exit codes {rcs}"

    delivered = {i for ev in events if ev["event"] == "pull" for i in ev["ids"]}
    assert len(delivered) == n, "some published ids never delivered"
    # drained: nothing left to pull once every lease has settled/expired
    time.sleep(3.2)
    assert pub.pull(spark).limit(1).count() == 0
    stats = pub.stats()
    # each backlog row retires exactly once; an id ACKED more than once
    # ACROSS a prune boundary counts twice in the stats scalar (the
    # documented cross-prune caveat) — bound it by the observed
    # duplicate-ack count instead of asserting blind equality
    dup_acks = _duplicate_ack_count(events)
    assert n <= stats["acked"] <= n + dup_acks, (stats, dup_acks)
    _assert_redelivery_legal(events)


def _duplicate_ack_count(events, extra_acked_ids=()):
    from collections import Counter

    acks = Counter(i for ev in events if ev["event"] == "ack" for i in ev["ids"])
    acks.update(extra_acked_ids)
    # a SIGKILLed ack may have committed its journal without logging
    for ev in events:
        if ev["event"] == "kill":
            acks.update(ev["ids"])
    return sum(c - 1 for c in acks.values() if c > 1)


def test_two_process_race_with_sigkill_mid_ack(spark, tmp_path):
    from persistor_spark.sources.file_subscription import FileSubscription

    root = str(tmp_path / "sub")
    n = 1200
    msgs = spark.range(n).select(
        F.format_string("payload-%05d", F.col("id")).alias("payload"),
        F.timestamp_seconds(F.col("id")).alias("publish_time"),
    )
    pub = FileSubscription(root, batch_size=40, ack_deadline_s=3.0)
    pub.publish(msgs)

    rcs, events = _run_workers(tmp_path, root, n_workers=2, kill_worker=True)
    # worker 0 may exit -9 (killed) or 0 (timer missed the settle window)
    assert rcs[1] == 0 and rcs[0] in (0, -9), f"worker exit codes {rcs}"

    # the surviving worker drains what it can; the killed worker's
    # outstanding lease (if any) expires — finish the drain here
    time.sleep(3.2)
    drained = 0
    parent_acked = []
    while True:
        batch = pub.pull(spark)
        ids = [r["message_id"] for r in batch.select("message_id").collect()]
        if not ids:
            break
        pub.ack(ids)
        parent_acked.extend(ids)
        drained += len(ids)
    delivered = {i for ev in events if ev["event"] == "pull" for i in ev["ids"]}
    # ids the parent drained count as delivered too
    assert len(delivered) + drained >= n
    stats = pub.stats()
    dup_acks = _duplicate_ack_count(events, extra_acked_ids=parent_acked)
    assert n <= stats["acked"] <= n + dup_acks, (stats, dup_acks)
    assert pub.pull(spark).limit(1).count() == 0
    _assert_redelivery_legal(events)
