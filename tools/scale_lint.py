"""Scale lint: machine-check the 100 TB discipline the per-round audit
greps by hand (r13 VERDICT: "I grepped all 34 .collect() sites ... the
only crossJoins are 1-row broadcast totals or the labeled pytest
oracle; all Python UDFs are Arrow-vectorized").  This tool turns that
audit into a gate:

  R1  no row-at-a-time Python UDFs in the engine (`F.udf(` / `@udf` /
      importing `udf` from pyspark.sql.functions) — Arrow-vectorized
      pandas_udf / mapInPandas / applyInPandas* only.
  R2  no `.toPandas()` in the engine (unbounded driver materialization;
      Arrow batches via mapInPandas keep memory per-task).
  R3  every `.collect()` carries an inline `# collect-ok: <reason>`
      on its line or within the 3 lines above, stating WHY the
      gathered set is bounded (scalar aggregate, <= #partitions rows,
      <= #files manifest, centroid/codebook set, API result page ...).
      cli.py and server.py are exempt: they ARE the client/serving
      surface — collecting the requested result page is their job.
  R4  every `crossJoin(` either broadcasts on the same expression line
      or carries `# crossjoin-ok: <reason>` within the 3 lines above
      (the one non-broadcast site is the labeled pytest-only recall
      oracle).

An unannotated new site fails the lint — boundedness must be argued at
the site, in the diff that introduces it, where review sees it.

Usage: python tools/scale_lint.py   (exit 0 = clean; prints violations)
Run from pytest via tests/test_scale_lint.py.
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE = os.path.join(REPO, "persistor_spark")

# client/serving surface: returning the caller's result page IS the op
COLLECT_EXEMPT = {"cli.py", "server.py"}

ANNOT_WINDOW = 3  # annotation may sit on the line or up to 3 lines above

ROW_UDF_PATTERNS = [
    re.compile(r"\bF\.udf\s*\("),
    re.compile(r"\bfunctions\.udf\s*\("),
    re.compile(r"^\s*@udf\b"),
    re.compile(r"from\s+pyspark\.sql\.functions\s+import\s+(.*\b)?udf\b"),
]


def _annotated(lines: list[str], i: int, tag: str) -> bool:
    lo = max(0, i - ANNOT_WINDOW)
    return any(tag in lines[j] for j in range(lo, i + 1))


def lint() -> list[str]:
    problems: list[str] = []
    for path in sorted(glob.glob(f"{ENGINE}/**/*.py", recursive=True)):
        rel = os.path.relpath(path, REPO)
        base = os.path.basename(path)
        lines = open(path).read().splitlines()
        in_doc = False
        for i, raw in enumerate(lines):
            # cheap docstring tracker: rule text inside docstrings (e.g.
            # a function documenting "no toPandas") must not trip the lint
            quotes = raw.count('"""') + raw.count("'''")
            code = raw.split("#", 1)[0] if not in_doc else ""
            if in_doc:
                if quotes % 2 == 1:
                    in_doc = False
                continue
            if quotes % 2 == 1:
                in_doc = True
                code = raw.split('"""')[0].split("'''")[0]
            loc = f"{rel}:{i + 1}"
            for pat in ROW_UDF_PATTERNS:
                if pat.search(code):
                    problems.append(f"{loc}: row-at-a-time UDF (R1): {raw.strip()[:80]}")
            if ".toPandas()" in code:
                problems.append(f"{loc}: .toPandas() in engine (R2): {raw.strip()[:80]}")
            if ".collect()" in code and base not in COLLECT_EXEMPT:
                if not _annotated(lines, i, "collect-ok:"):
                    problems.append(
                        f"{loc}: .collect() without 'collect-ok:' annotation (R3): "
                        f"{raw.strip()[:80]}"
                    )
            if "crossJoin(" in code:
                if "broadcast" not in code and not _annotated(lines, i, "crossjoin-ok:"):
                    problems.append(
                        f"{loc}: crossJoin without broadcast or 'crossjoin-ok:' (R4): "
                        f"{raw.strip()[:80]}"
                    )
    return problems


def main() -> int:
    problems = lint()
    for p in problems:
        print(p)
    print(f"{len(problems)} scale-lint violation(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
