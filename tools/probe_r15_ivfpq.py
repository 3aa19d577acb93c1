"""r15 probe: phase profile of ann_ivfpq_build — where do the ~4 s go?
(guide §1: measure first).  Phases: normalize checkpoint, kmeans iterations
(per-iteration), coarse assign checkpoint, pq_train iterations, encode+count.

Usage: python tools/probe_r15_ivfpq.py [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

cpus = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ["SPARK_GRAFT_CPUS"] = cpus

from pyspark.sql import functions as F  # noqa: E402

from persistor_spark.analytics import similarity as sim  # noqa: E402
from persistor_spark.session import build_session  # noqa: E402
from persistor_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = build_session("probe-r15-ivfpq")
embs = load_table(spark, SF_DIR, "embeddings")
n = embs.count()

# timer shims around the spots that launch jobs inside kmeans_train/pq_train
marks = []
_orig_collect = None


def timed_build():
    t0 = time.time()
    idx = sim.ivfpq_build(embs, n_centroids=16, n_vectors=n)
    t_build_lazy = time.time() - t0
    t0 = time.time()
    c = idx.cells.count()
    t_count = time.time() - t0
    return t_build_lazy, t_count, c


# bench line replica, repeated with per-phase collection via monkeypatched
# DataFrame.collect timing (captures every Lloyd collect + checkpoints)
from pyspark.sql import DataFrame  # noqa: E402

phase_log = []
_collect0 = DataFrame.collect
_lckpt0 = DataFrame.localCheckpoint


def collect_timed(self):
    t0 = time.time()
    out = _collect0(self)
    phase_log.append(("collect", round(time.time() - t0, 3)))
    return out


def lckpt_timed(self, eager=True):
    t0 = time.time()
    out = _lckpt0(self, eager)
    phase_log.append(("localCheckpoint", round(time.time() - t0, 3)))
    return out


DataFrame.collect = collect_timed
DataFrame.localCheckpoint = lckpt_timed

for rep in range(3):
    phase_log.clear()
    tb, tc, c = timed_build()
    print(f"rep{rep}: build(lazy)={tb:.2f}s cells.count={tc:.2f}s rows={c}")
    print("   phases:", phase_log)

DataFrame.collect = _collect0
DataFrame.localCheckpoint = _lckpt0
spark.stop()
