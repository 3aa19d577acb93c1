"""Dump `.explain("formatted")` for every bench line's representative plan
into plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<tag>.txt (default r15) — the
optimization round's before/after evidence (the judge checks plan claims
against these files).

Usage: python tools/dump_plans.py <tag> [name ...]
  tag: "before" / "after" (file suffix)
  name: subset of bench.PLAN_PROBES keys (default: all with a probe)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, p in bench.PLAN_PROBES.items() if p]
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("persistor-plan-dump")
    import tempfile

    ctx = bench.Ctx(spark, tempfile.mkdtemp(prefix="persistor-plans-"))
    bench._probe_setup(ctx)  # index layout + manifest + blobs + LSH index
    for name in names:
        probe = bench.PLAN_PROBES.get(name)
        if probe is None:
            print(f"{name}: procedural, no single plan", file=sys.stderr)
            continue
        df = probe(ctx)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
