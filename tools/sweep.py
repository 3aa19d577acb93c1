"""Spark-side perf sweep: execute EVERY __spark_entry__.queries() entry at
a given sf_dir (default sf0.1), timing only the Spark side (no DuckDB) —
the perf-regression radar that caught the r4 SimHash shuffle blow-up.

Usage: python tools/sweep.py [sf_dir]
Prints per-query seconds sorted slowest-first, then the total.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("sweep")
    # warm file listing + JVM
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    times = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            n = len(fn(spark, sf_dir).collect())
            times[name] = (time.time() - t0, n, "")
        except Exception as exc:  # noqa: BLE001
            times[name] = (time.time() - t0, -1, str(exc)[:120])
    for name, (dt, n, err) in sorted(times.items(), key=lambda kv: -kv[1][0]):
        flag = f"  ERROR {err}" if err else ""
        print(f"{dt:7.1f}s  {name}  rows={n}{flag}")
    total = sum(dt for dt, _, _ in times.values())
    errs = sum(1 for _, n, _ in times.values() if n < 0)
    print(f"TOTAL {total:.1f}s over {len(times)} queries, {errs} errors")
    spark.stop()


if __name__ == "__main__":
    main()
