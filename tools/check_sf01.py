"""Rotating sf0.1 mini-gate (r12 VERDICT #4): the full-registry sf0.1
sweep r12 ran once (~2 h) caught the only two SF-dependent behaviors in
the repo — institutionalize it as a ~25-query/round tier instead of a
one-off.  Selection is STALE-FIRST against a persistent ledger
(SF01_SWEEP.json: query -> last sf0.1-green round), the same policy as
the driver window: never-swept entries first, then oldest round, ties in
registry order.  Green rows update the ledger; failures never do, so a
red row stays at the head of the queue until fixed.

The ledger is seeded from the r12 full sweep (everything then registered
= round 12), with the 7 entries whose oracles were made SF-robust in r13
re-swept at their fix time, and entries registered after that sweep
(a158/a159, d48-d50) starting unswept.

Usage: python tools/check_sf01.py [n] [--round N] [--dry-run]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
LEDGER = os.path.join(REPO, "SF01_SWEEP.json")
SF_DIR = "/root/testdata/sf0.1"


def current_round() -> int:
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 1


def load_ledger() -> dict:
    with open(LEDGER) as fh:
        return json.load(fh)


def pick(ledger: dict, names: list, n: int) -> list:
    """Stale-first: never-swept (absent or 0) first, then lowest round,
    ties in registry order."""
    order = {name: i for i, name in enumerate(names)}
    return sorted(names, key=lambda q: (ledger.get(q, 0), order[q]))[:n]


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from persistor_spark.session import build_session
    from persistor_spark.sources.registry import TABLES

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check import check_one

    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 25
    rnd = (
        int(args[args.index("--round") + 1])
        if "--round" in args
        else current_round()
    )
    queries = entrymod.queries()
    names = list(queries)
    ledger = load_ledger()
    if "--names" in args:
        # explicit re-run (r14: refresh rows whose code changed after a
        # tranche captured them) — bypasses stale-first selection
        if args.index("--names") + 1 >= len(args):
            raise SystemExit("usage: check_sf01.py --names q1,q2,...")
        chosen = [
            q for q in args[args.index("--names") + 1].split(",") if q
        ]
        unknown = [q for q in chosen if q not in queries]
        assert not unknown, f"unknown query name(s): {unknown}"
    else:
        chosen = pick(ledger, names, n)
    print(f"sf0.1 tier round {rnd}: {len(chosen)} queries")
    for q in chosen:
        print(f"  {q} (last green r{ledger.get(q, 0)})")
    if "--dry-run" in args:
        return

    spark = build_session("sf01-tier")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    failed = []
    for q in chosen:
        line, bad, extra = check_one(q, queries[q], oracles, spark, SF_DIR, con)
        print(line, flush=True)
        for e in extra:
            print(e)
        if bad:
            failed.append(q)
        else:
            ledger[q] = rnd
            # atomic tmp+rename (the fsutil.write_text pattern): a kill
            # mid-dump must not truncate the ledger and wedge the tier
            tmp = LEDGER + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(ledger, fh, indent=0, sort_keys=True)
            os.replace(tmp, LEDGER)
    print(f"\n{len(failed)} failures  ({len(chosen)} run)")
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
