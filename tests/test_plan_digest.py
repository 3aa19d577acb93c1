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
