"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB,
compare row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402
from persistor_spark.sources.registry import TABLES  # noqa: E402


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, (bytes, bytearray)):
        # Spark BinaryType collects as bytearray, DuckDB BLOB as bytes —
        # str() of the two differs even for identical payloads
        return bytes(v).hex()
    return str(v)


def col_types(cols, rows):
    """Python type set per column (sorted by column name), ignoring None.

    The driver's hasher is type-sensitive in ways stringification is not
    (e.g. DuckDB HUGEINT vs Spark BIGINT both print the same digits), so
    local green must also require matching value types (r2 VERDICT #3)."""
    import decimal

    canon = {bool: "bool", int: "int", decimal.Decimal: "decimal",
             bytes: "bytes", bytearray: "bytes"}
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for i in order:
        seen = set()
        for r in rows:
            v = r[i]
            if v is None:
                continue
            seen.add(canon.get(type(v), type(v).__name__))
        out.append((cols[i], tuple(sorted(seen))))
    return out


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def check_one(name, fn, oracles, spark, sf_dir, con):
    """Run one query's Spark side + oracle + compare; returns (status_line,
    failed, extra_lines)."""
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = [f.name for f in sdf.schema.fields]
    except Exception as exc:  # noqa: BLE001
        return f"FAIL  {name}: spark error: {exc}", True, []
    if name not in oracles:
        return f"weak  {name}: rows={len(srows)} (no oracle)", False, []
    try:
        local = con.cursor()  # per-thread duckdb cursor, shared catalog
        res = local.sql(oracles[name])
        orows = res.fetchall()
        ocols = list(res.columns)
        otypes = [str(t) for t in res.types]
    except Exception as exc:  # noqa: BLE001
        return f"FAIL  {name}: duckdb error: {exc}", True, []
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rows {len(srows)} != {len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
    # HUGEINT/DECIMAL never exist on the Spark side; the driver's hasher
    # formats them differently even when str() agrees (r2 a29 red row)
    bad_types = [
        f"{c}:{t}"
        for c, t in zip(ocols, otypes)
        if t == "HUGEINT" or t.startswith("DECIMAL")
    ]
    if bad_types:
        problems.append(f"non-portable oracle types {bad_types}")
    st, ot = col_types(scols, srows), col_types(ocols, orows)
    if st != ot:
        problems.append(f"value types {st} != {ot}")
    sh = None
    if not problems:
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        if sh != oh:
            problems.append(f"hash {sh} != {oh}")
    dt = time.time() - t0
    if not problems:
        return (
            f"ok    {name}: rows={len(srows)} hash={sh}  ({dt:.1f}s)",
            False,
            [],
        )
    extra = []
    if len(srows) == len(orows) and sorted(scols) == sorted(ocols):
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sl = sorted("|".join(norm_cell(r[i]) for i in so) for r in srows)
        ol = sorted("|".join(norm_cell(r[i]) for i in oo) for r in orows)
        shown = 0
        for a, b in zip(sl, ol):
            if a != b:
                extra.append(f"      spark={a}\n      duck ={b}")
                shown += 1
                if shown >= 3:
                    break
    return f"FAIL  {name}: {'; '.join(problems)}  ({dt:.1f}s)", True, extra


def main():
    import os
    from concurrent.futures import ThreadPoolExecutor

    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in args if not a.startswith("/"))

    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd (or relative-path) argument must not become a silent
        # '0 failures (0 run)' false green
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    todo = [(n, fn) for n, fn in queries.items() if not only or n in only]

    # Spark actions are thread-safe and the scheduler interleaves concurrent
    # jobs across task slots; duckdb gets a cursor per thread.  Results are
    # printed in query order regardless of completion order, so output stays
    # diffable with sequential runs.  ORACLE_CHECK_JOBS=1 forces sequential.
    jobs = int(os.environ.get("ORACLE_CHECK_JOBS", "4"))
    failures = []
    if jobs <= 1:
        results = [check_one(n, fn, oracles, spark, sf_dir, con) for n, fn in todo]
    else:
        with ThreadPoolExecutor(max_workers=jobs) as pool:
            results = list(
                pool.map(
                    lambda item: check_one(item[0], item[1], oracles, spark, sf_dir, con),
                    todo,
                )
            )
    for (name, _), (line, failed, extra) in zip(todo, results):
        print(line)
        for e in extra:
            print(e)
        if failed:
            failures.append(name)

    n_run = len(todo)
    # a query can be both oracle-less AND failed (its fn raised) — count it
    # once, or the ok tally double-subtracts and can go negative
    n_weak = len([n for n, _ in todo if n not in oracles and n not in failures])
    print(
        f"\n{len(failures)} failures  "
        f"({n_run} run: {n_run - n_weak - len(failures)} ok, {n_weak} rows-only)"
    )
    if failures:
        print(f"failed: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
