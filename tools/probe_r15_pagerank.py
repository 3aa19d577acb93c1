"""r15 probe: interleaved A/B of the PageRank checkpoint cadence at the
session core count — r14 made the 3-round recurrence lazy (checkpoint every
4th round); the driver's 32-core bench read -11% while the builder's A/B
read +5%.  Re-adjudicate on THIS host at $SPARK_GRAFT_CPUS.

A = lazy (current code, checkpoint every 4th round)
B = per-round localCheckpoint (the r13 shape)

Usage: python tools/probe_r15_pagerank.py [rounds] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ["SPARK_GRAFT_CPUS"] = cpus

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark.analytics import graph  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402
from persistor_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = build_session("probe-r15-pagerank")


def pagerank_cadence(edges, iterations, cadence):
    """graph.pagerank with a parameterized checkpoint cadence (1 = the r13
    per-round shape; 4 = the current lazy shape).  Mirrors graph.pagerank
    exactly otherwise."""
    edges = edges.select("src", "dst").localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    n = deg.count()
    e = edges.join(F.broadcast(deg), "src").select("src", "dst", "deg")
    damping = 0.85
    base = (1.0 - damping) / n
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        r = F.broadcast(ranks)
        ranks = (
            e.join(r, e.src == r.node)
            .groupBy("dst")
            .agg((F.lit(base) + F.lit(damping) * F.sum(F.col("rank") / F.col("deg"))).alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
        )
        if (i + 1) % cadence == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


def one_run(cadence) -> tuple[float, float]:
    edges = graph.bipartite_interaction_edges(
        load_table(spark, SF_DIR, "orders"), load_table(spark, SF_DIR, "lineitem")
    )
    t0 = time.time()
    s = pagerank_cadence(edges, 3, cadence).agg(F.sum("rank")).collect()[0][0]
    return time.time() - t0, s


# warm-up both arms once
one_run(4)
one_run(1)
a, b = [], []
suma = sumb = None
for _ in range(rounds):
    ta, suma = one_run(4)
    tb, sumb = one_run(1)
    a.append(round(ta, 3))
    b.append(round(tb, 3))
print(f"cpus={cpus} lazy(c4)={a} min={min(a):.3f} med={sorted(a)[len(a)//2]:.3f}")
print(f"cpus={cpus} perround(c1)={b} min={min(b):.3f} med={sorted(b)[len(b)//2]:.3f}")
print(f"rank sums equal: {suma == sumb} ({suma!r} vs {sumb!r})")
spark.stop()
