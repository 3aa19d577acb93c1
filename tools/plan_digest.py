"""Physical-plan drift guard (r8 VERDICT #5): snapshot a NORMALIZED digest
of every bench line's representative plan into PLANS_DIGEST.json, and let
tests/test_plan_digest.py red the build when a plan silently changes shape.

The r7 regression (Catalyst pushing a filter through an alias and
re-evaluating the whole shingle pipeline per row) was caught by bench
numbers two rounds late; the digest catches that class at commit time —
the doubled expression shows up in the normalized plan text length, and
join-strategy / shuffle-count / scan-count changes show up in the node
histogram.

Digests are captured at sf0.001 (the fast gate scale) — broadcast
decisions from explicit hints are scale-independent; size-estimated
choices are pinned AT THAT SCALE, which is the contract the test checks.

Usage:
  python tools/plan_digest.py            # compare against PLANS_DIGEST.json
  python tools/plan_digest.py --write    # (re)write the committed digests
"""
import json
import os
import re
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

DIGEST_PATH = os.path.join(REPO, "PLANS_DIGEST.json")

# node names whose counts are the drift signal; everything else (Project /
# ColumnarToRow / WholeStageCodegen wrappers) varies cosmetically
SIGNAL_NODES = (
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "WindowGroupLimit",
    "Sort",
    "Scan",
    "Generate",
    "Expand",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "BatchEvalPython",
    "Union",
    "GlobalLimit",
)


def _normalize(txt: str) -> str:
    txt = re.sub(r"#\d+L?", "#", txt)
    txt = re.sub(r"\[plan_id=\d+\]", "", txt)
    txt = re.sub(r"file:[^,\]\s]+", "file:PATH", txt)
    txt = re.sub(r"InMemoryFileIndex\[[^\]]*\]", "InMemoryFileIndex[PATH]", txt)
    txt = re.sub(r"/tmp/[^,\]\s]+", "/tmp/PATH", txt)
    # folded current_timestamp() literals carry the capture wall-clock
    # with 0-6 fractional digits — norm_len flapped +-2 run to run on the
    # receiver plan until these were pinned (r12)
    txt = re.sub(r"\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?", "TS", txt)
    return txt


def digest_df(df) -> dict:
    txt = df._jdf.queryExecution().executedPlan().toString()
    norm = _normalize(txt)
    nodes: dict = {}
    skeleton: list = []
    for line in norm.splitlines():
        # tree/codegen prefixes: "+- *(3) Filter", ":  +- Scan parquet"
        m = re.match(r"[\s:+\-*()\d]*([A-Za-z][A-Za-z0-9]*)", line)
        if not m:
            continue
        name = m.group(1)
        if name in ("FileScan",):  # "FileScan parquet" == "Scan parquet"
            name = "Scan"
        for sig in SIGNAL_NODES:
            if name == sig or (sig == "Scan" and name.startswith("Scan")):
                nodes[sig] = nodes.get(sig, 0) + 1
                skeleton.append(sig)
                break
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", norm))
    return {
        "nodes": nodes,
        # the ORDERED signal-node sequence (r9 VERDICT #7): stage structure
        # — which side of which exchange each join/agg/scan sits on — so a
        # re-plan that keeps the histogram but moves work across a shuffle
        # boundary (agg pushed below/above a join, a swapped join order)
        # still reds the guard.  Exact-compared; norm_len stays as the
        # catch-all for same-shape expression blow-ups (the r7 regression).
        "skeleton": "|".join(skeleton),
        "norm_len": len(norm),
        "pushed_scans": pushed,
    }


def compute_digests() -> dict:
    import bench
    from persistor_spark.session import build_session

    spark = build_session("plan-digest")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="plan-digest-")
    ctx = bench.Ctx(spark, workdir)
    bench._probe_setup(ctx)
    out = {}
    for name, probe in bench.PLAN_PROBES.items():
        if probe is None:
            out[name] = {"procedural": True}
            continue
        out[name] = digest_df(probe(ctx))
    spark.stop()
    import shutil

    shutil.rmtree(workdir, ignore_errors=True)
    return out


def compare(current: dict, committed: dict, len_tol: float = 0.25):
    """Differences that count as drift: node-histogram changes (exact) and
    normalized plan text growing/shrinking beyond len_tol."""
    problems = []
    for name, got in current.items():
        want = committed.get(name)
        if want is None:
            problems.append(f"{name}: no committed digest (run --write)")
            continue
        if want.get("procedural") or got.get("procedural"):
            if want != got:
                problems.append(f"{name}: procedural flag changed")
            continue
        if got["nodes"] != want["nodes"]:
            problems.append(
                f"{name}: node histogram drifted {want['nodes']} -> {got['nodes']}"
            )
        elif got.get("skeleton") != want.get("skeleton"):
            # same multiset, different ORDER: work moved across a stage
            # boundary (elif: a histogram drift already implies this)
            problems.append(
                f"{name}: plan skeleton reordered "
                f"{want.get('skeleton')} -> {got.get('skeleton')}"
            )
        if got.get("pushed_scans") != want.get("pushed_scans"):
            problems.append(
                f"{name}: pushed-filter scan count drifted "
                f"{want.get('pushed_scans')} -> {got.get('pushed_scans')}"
            )
        lo, hi = want["norm_len"] * (1 - len_tol), want["norm_len"] * (1 + len_tol)
        if not (lo <= got["norm_len"] <= hi):
            problems.append(
                f"{name}: normalized plan length {want['norm_len']} -> "
                f"{got['norm_len']} (beyond {len_tol:.0%})"
            )
    for name in committed:
        if name not in current:
            problems.append(f"{name}: committed digest has no probe anymore")
    return problems


if __name__ == "__main__":
    cur = compute_digests()
    if "--write" in sys.argv:
        with open(DIGEST_PATH, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
        print(f"wrote {len(cur)} digests to {DIGEST_PATH}")
    else:
        with open(DIGEST_PATH) as fh:
            committed = json.load(fh)
        problems = compare(cur, committed)
        for p in problems:
            print("DRIFT", p)
        print(f"{len(problems)} drifts across {len(cur)} lines")
        sys.exit(1 if problems else 0)
