"""Plan-drift guard as a checked invariant (r8 VERDICT #5).

Every bench line's representative plan is digested (node histogram +
pushed-filter scan count + normalized text length) and compared against
the committed PLANS_DIGEST.json.  A silent Catalyst re-plan — the r7
double-shingle pushdown regression, a broadcast join degrading to SMJ, a
scan losing its pushed filters — reds this test at commit time instead of
surfacing as a bench regression rounds later.

On INTENDED plan changes: re-run `python tools/plan_digest.py --write`
and commit the new digests alongside the code change (the diff then shows
the plan delta explicitly, which is the point).
"""

import json
import os
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def digests(spark):
    # snapshot + restore BOTH the env var and the reloaded bench module
    # state in teardown (r9 advisor: the unrestored reload leaked sf0.001
    # state into any later test module importing bench — an
    # ordering-dependent cross-test hazard)
    import importlib

    import bench
    import plan_digest

    prev_env = os.environ.get("SPARK_GRAFT_SF_DIR")
    os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    importlib.reload(bench)  # pick up the sf0.001 SF_DIR for probe reads
    # other test modules cache fixture tables (.cache() on load_table
    # output); a structurally matching probe scan would then plan as
    # InMemoryTableScan — no PushedFilters, different text — and digest a
    # test-ordering artifact instead of the code's plan.  Probe against
    # the deployment shape: cold parquet scans.
    spark.catalog.clearCache()
    workdir = tempfile.mkdtemp(prefix="plan-digest-test-")
    ctx = bench.Ctx(spark, workdir)
    bench._probe_setup(ctx)
    out = {}
    try:
        for name, probe in bench.PLAN_PROBES.items():
            out[name] = (
                {"procedural": True}
                if probe is None
                else plan_digest.digest_df(probe(ctx))
            )
        yield out
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
        if prev_env is None:
            os.environ.pop("SPARK_GRAFT_SF_DIR", None)
        else:
            os.environ["SPARK_GRAFT_SF_DIR"] = prev_env
        importlib.reload(bench)


def test_probes_cover_every_bench_line(digests):
    import bench

    assert set(bench.PLAN_PROBES) == set(bench.QUERIES)


def test_no_unexplained_plan_drift(digests):
    import plan_digest

    with open(os.path.join(REPO, "PLANS_DIGEST.json")) as fh:
        committed = json.load(fh)
    problems = plan_digest.compare(digests, committed)
    assert not problems, "plan drift (tools/plan_digest.py --write if intended):\n" + "\n".join(problems)


def test_guard_fires_on_dropped_broadcast_hint(spark):
    """r9 VERDICT #7: prove the guard actually REDS on the canonical silent
    re-plan — a broadcast hint disappearing and the join degrading to
    sort-merge.  Digest the hinted plan as 'committed', the unhinted plan
    as 'current', and require compare() to flag it."""
    import plan_digest

    big = spark.range(100000).selectExpr("id", "id % 97 AS k")
    small = spark.range(50).selectExpr("id AS k", "id * 2 AS v")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pyspark.sql import functions as F

        hinted = big.join(F.broadcast(small), "k")
        unhinted = big.join(small, "k")
        committed = {"probe": plan_digest.digest_df(hinted)}
        current = {"probe": plan_digest.digest_df(unhinted)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    problems = plan_digest.compare(current, committed)
    assert problems, "dropping a broadcast() hint did not red the guard"
    assert any("node histogram" in p for p in problems)


def test_guard_fires_on_stage_reorder_with_same_histogram(spark):
    """The skeleton arm (r9 VERDICT #7: norm_len's ±25% could absorb a
    real re-plan): aggregate-then-join vs join-then-aggregate have the
    SAME signal-node multiset — only the ORDERED skeleton tells them
    apart, so this is exactly the drift class the histogram missed."""
    import plan_digest

    from pyspark.sql import functions as F

    big = spark.range(100000).selectExpr("id % 97 AS k", "id AS v")
    small = spark.range(50).selectExpr("id AS k", "id * 2 AS w")
    agg_then_join = (
        big.groupBy("k").agg(F.sum("v").alias("s")).join(F.broadcast(small), "k")
    )
    join_then_agg = (
        big.join(F.broadcast(small), "k").groupBy("k").agg(F.sum("v").alias("s"))
    )
    a = plan_digest.digest_df(agg_then_join)
    b = plan_digest.digest_df(join_then_agg)
    if a["nodes"] != b["nodes"]:
        import pytest

        pytest.skip("planner split the two shapes by histogram already")
    problems = plan_digest.compare({"probe": b}, {"probe": a})
    assert any("skeleton" in p for p in problems), (
        f"identical histograms but reordered stages did not red the guard: "
        f"{a['skeleton']} vs {b['skeleton']}"
    )
