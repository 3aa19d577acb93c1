"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; `oracle_sql()` gives the DuckDB twin.
The persistor-model tables are derived deterministically from the driver's
`events` fixture (FIXTURES.md) by the REAL engine pipeline
(persistor_spark.plans.ingest) on the Spark side and by shared portable SQL
CTEs (persistor_spark.oracle) on the DuckDB side.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from persistor_spark import fixtures, oracle
from persistor_spark.functions import keys
from persistor_spark.operators.version_batching import version_column
from persistor_spark.plans import resubmit
from persistor_spark.plans.query import IndexQuery

# ---------------------------------------------------------------------------
# fixture pipeline cache: the D-series queries share one ingest per sf_dir
# (lock: harnesses may run queries from a thread pool — Spark actions are
# thread-safe, but the populate-once must not race)
# ---------------------------------------------------------------------------
import threading as _threading

_CACHE: dict = {}
_CACHE_LOCK = _threading.RLock()


def _tables(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    with _CACHE_LOCK:
        if key not in _CACHE:
            result = fixtures.run_fixture_ingest(spark, sf_dir)
            result.index_metadata = result.index_metadata.cache()
            result.blob_records = result.blob_records.cache()
            result.deadletter = result.deadletter.cache()
            _CACHE[key] = result
        return _CACHE[key]


def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fixtures.load_messages(spark, sf_dir)


def _iq(spark: SparkSession, sf_dir: str) -> IndexQuery:
    return IndexQuery(_tables(spark, sf_dir).index_metadata)


# ---------------------------------------------------------------------------
# driver entry points
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ingest -> index query -> resubmit position-align join
    on sf0.001 (SURVEY.md §3.1+§3.3 end to end)."""
    sf_dir = "/root/testdata/sf0.001"
    t = _tables(spark, sf_dir)
    iq = IndexQuery(t.index_metadata)
    meta = iq.query_df(
        [{"broker_id": "b0"}, {"ordering_key": "k5"}],
        attributes=[
            "unique_id",
            "ordering_key",
            "business_source_key",
            "business_object_key",
            "index_source_key",
            "location_key",
            "location_position",
        ],
    )
    records, _ = resubmit.resubmit(meta, t.blob_records)
    return records


# -- D1..D16 Spark implementations ------------------------------------------

def _d1(spark, sf_dir):
    return (
        _iq(spark, sf_dir)
        .get("b3_m000000123", ["unique_id", "broker_id", "location_key", "location_position"])
        .orderBy("unique_id")
    )


def _d2(spark, sf_dir):
    ids = ["b1_m000000001", "b2_m000000002", "b3_m000000003", "b0_m000000004"]
    return _iq(spark, sf_dir).get_all(ids, ["unique_id", "broker_id"]).orderBy("unique_id")


_D3_FROM = "2024-01-05T00:00:00Z"
_D3_TO = "2024-01-10T00:00:00Z"


def _d3(spark, sf_dir):
    from persistor_spark.functions.timestamps import parse_query_wire

    res = _iq(spark, sf_dir).get_interval(
        parse_query_wire(_D3_FROM).replace(tzinfo=None),
        parse_query_wire(_D3_TO).replace(tzinfo=None),
        "b1",
        limit=20,
        offset=40,
        attributes=["unique_id", "publish_time"],
    )
    return res.messages


def _d4(spark, sf_dir):
    from persistor_spark.functions.timestamps import parse_query_wire

    n = _iq(spark, sf_dir).get_interval_count(
        parse_query_wire(_D3_FROM).replace(tzinfo=None),
        parse_query_wire(_D3_TO).replace(tzinfo=None),
        "b1",
    )
    return spark.createDataFrame([(n,)], "total_count bigint")


def _d5(spark, sf_dir):
    flt = [
        {"broker_id": "b0", "ordering_key": "k4"},
        {"business_source_key": "src2", "publish_time": {"$gte": "2024-01-03T00:00:00Z"}},
    ]
    return _iq(spark, sf_dir).query_df(flt, ["unique_id"]).orderBy("unique_id")


def _d6(spark, sf_dir):
    return (
        _messages(spark, sf_dir)
        .select(
            keys.unique_id().alias("unique_id"),
            keys.index_source_key().alias("index_source_key"),
        )
        .orderBy("unique_id")
    )


def _d7(spark, sf_dir):
    return (
        _messages(spark, sf_dir)
        .groupBy(version_column("attr_version").alias("version"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("version")
    )


def _d8(spark, sf_dir):
    return (
        _messages(spark, sf_dir)
        .groupBy(
            F.year("ingestion_time").alias("y"),
            F.month("ingestion_time").alias("m"),
            F.dayofmonth("ingestion_time").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("y", "m", "d")
    )


def _d9(spark, sf_dir):
    t = _tables(spark, sf_dir)
    records = resubmit.align(t.index_metadata, t.blob_records)
    return records.select("unique_id", "payload").orderBy("unique_id")


def _ocf_blob_records(spark, sf_dir):
    """blob_records rebuilt through the LIVE Avro OCF path: write one OCF
    file per blob (persistorrecord schema, write_to_avro.go:34-74), read
    them back with the distributed binaryFile+mapInPandas scan.  Cached
    per (session, sf_dir) — shared by d19 and d39."""
    import tempfile

    from persistor_spark.formats import ocf_io

    t = _tables(spark, sf_dir)
    key = (id(spark), sf_dir, "ocf")
    with _CACHE_LOCK:
        if key not in _CACHE:
            import atexit
            import shutil

            base = tempfile.mkdtemp(prefix="persistor_ocf_")
            atexit.register(shutil.rmtree, base, ignore_errors=True)
            ocf_io.write_blobs_ocf(t, base)
            _CACHE[key] = base
        base = _CACHE[key]
    cfg = fixtures.fixture_ingest_config()
    return ocf_io.read_blob_records_ocf(spark, base, blob_base_url=cfg.storage.base_url)


def _d19(spark, sf_dir):
    """D9 semantics routed through the LIVE Avro OCF blob path, then
    position-align.  Same oracle as d9 — the format must be invisible."""
    t = _tables(spark, sf_dir)
    records = resubmit.align(t.index_metadata, _ocf_blob_records(spark, sf_dir))
    return records.select("unique_id", "payload").orderBy("unique_id")


def _d10(spark, sf_dir):
    t = _tables(spark, sf_dir)
    return resubmit.locations_touched(t.index_metadata).orderBy("location_key")


def _d11(spark, sf_dir):
    t = _tables(spark, sf_dir)
    return (
        t.index_metadata.groupBy("unique_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .orderBy("unique_id")
    )


def _d12(spark, sf_dir):
    msgs = _messages(spark, sf_dir).withColumn("unique_id", keys.unique_id())
    dl = _tables(spark, sf_dir).deadletter
    return (
        msgs.join(dl.select("unique_id"), "unique_id", "left_anti")
        .select("unique_id")
        .orderBy("unique_id")
    )


def _d13(spark, sf_dir):
    t = _tables(spark, sf_dir)
    return t.index_metadata.agg(
        F.count(F.lit(1)).alias("indexed"),
        F.count("location_position").alias("positioned"),
        F.countDistinct("location_key").alias("blobs"),
    )


def _d14(spark, sf_dir):
    from pyspark.sql import Window

    t = _tables(spark, sf_dir)
    w = Window.partitionBy("broker_id").orderBy("publish_time", "unique_id")
    return (
        t.index_metadata.filter(F.col("publish_time").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("broker_id", "unique_id")
        .orderBy("broker_id", "unique_id")
    )


def _d15(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


def _d16(spark, sf_dir):
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("n_name")
    )


def _d20_first_seen(spark, sf_dir):
    """Batch twin of the streaming dedup gate (windows.dedup_gate_rows):
    simulate at-least-once redelivery (every even-seq message re-arrives a
    minute later) and keep the FIRST delivery per broker key — the exact
    keep-policy the stateful gate applies continuously."""
    from persistor_spark.streaming import windows as sw

    msgs = _messages(spark, sf_dir)
    redelivered = msgs.filter(F.col("event_seq") % 2 == 0).withColumn(
        "ingestion_time", F.col("ingestion_time") + F.expr("INTERVAL 1 MINUTE")
    )
    kept = sw.first_seen_batch(msgs.unionByName(redelivered))
    return kept.select(
        F.concat_ws("_", "broker_id", "broker_msg_id").alias("unique_id"),
        "ingestion_time",
    ).orderBy("unique_id")


def _d23_integrity_audit(spark, sf_dir):
    """Index <-> blob integrity audit, the ops tool a persistor deployment
    runs after incidents: rows the index references that are missing from
    blob storage (dangling — lost payloads) and blob records with no index
    row (orphans — invisible to every query path).  Deterministic fault
    injection (every blob position % 97 == 5 dropped; every index row with
    msg number % 89 == 3 dropped) makes both directions non-empty.  Both
    directions are key-anti-joins: column-pruned scans, shuffle on the id
    key only — at 100 TB this audits in one pass per direction."""
    # the cached fixture ingest (the fault-injection filters are pure, so
    # re-running the whole pipeline per call bought nothing)
    res = _tables(spark, sf_dir)
    blobs = res.blob_records.filter(~(F.col("position") % 97 == 5))
    msgnum = F.substring("broker_msg_id", 2, 20).cast("long")
    idx = res.index_metadata.filter(~(msgnum % 89 == 3))
    dangling = idx.join(
        blobs.select("location_key", F.col("record_id").alias("unique_id")),
        ["location_key", "unique_id"],
        "left_anti",
    )
    orphans = blobs.join(
        idx.select(F.col("unique_id").alias("record_id")), "record_id", "left_anti"
    )
    def _count(name, df):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("check"), "n"
        )

    return (
        _count("index_rows", idx)
        .unionByName(_count("blob_records", blobs))
        .unionByName(_count("dangling_index", dangling))
        .unionByName(_count("orphan_blobs", orphans))
        .orderBy("check")
    )


#: per-session cache of the d22 fixture store, keyed by sf_dir — the store
#: is deterministic in the input, so repeated driver/gate runs reuse one
#: tempdir instead of leaking a fresh mkdtemp per run
_D22_STORES: dict = {}


def _d22_store(spark, sf_dir, orders):
    with _CACHE_LOCK:  # populate-once like every other cache here — an
        # unlocked check-then-act duplicates the store writes under the
        # harness's thread pool and orphans the losing tempdir
        return _d22_store_locked(spark, sf_dir, orders)


def _d22_store_locked(spark, sf_dir, orders):
    if sf_dir not in _D22_STORES:
        import tempfile

        from persistor_spark.sources import mongo_payloads as mp

        recs = orders.select(
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("id"),
            F.encode("o_orderpriority", "UTF-8").alias("data"),
            (F.col("o_orderkey") % 2).alias("par"),
        )
        import atexit
        import shutil

        root = tempfile.mkdtemp(prefix="mongostore_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        mp.write_collection(recs.filter("par = 0").select("id", "data"), root, "even")
        mp.write_collection(recs.filter("par = 1").select("id", "data"), root, "odd")
        _D22_STORES[sf_dir] = root
    return _D22_STORES[sf_dir]


def _d22_mongo_payload_fetch(spark, sf_dir):
    """S6 Mongo payload fetcher (mongo.go:100-162) through the driver
    contract: orders rows become two keyed 'collections' (split by orderkey
    parity, payload = o_orderpriority bytes), then a location list
    containing 50 hits, one missing id, and one malformed key fetches
    through the per-collection scan + (collection,id) join — errors route
    row-wise, the reference's per-key FindOne failures as data."""
    from persistor_spark.sources import mongo_payloads as mp
    from persistor_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    root = _d22_store(spark, sf_dir, orders)
    locs = (
        orders.select(F.col("o_orderkey").alias("k"))
        .orderBy("k")
        .limit(50)
        .select(
            F.concat(
                F.when(F.col("k") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
                F.lit("/o"),
                F.col("k").cast("string"),
            ).alias("location_key")
        )
        .unionByName(
            spark.createDataFrame(
                [("even/o999999999",), ("malformed",)], "location_key string"
            )
        )
    )
    out = mp.fetch_payloads(spark, root, locs)
    return out.select(
        "location_key",
        "collection",
        "msg_id",
        F.decode("data", "UTF-8").alias("payload"),
        "error_category",
    ).orderBy("location_key")


def _d21_salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation (operators/skew.py): the hot key
    spreads over `factor` reducers in phase 1; phase 2 shuffles only
    keys x factor rows.  Result must be IDENTICAL to the plain GROUP BY —
    which is exactly what the oracle checks."""
    from persistor_spark.operators import skew

    ev = _events(spark, sf_dir)
    out = skew.salted_agg(
        ev,
        ["event_type"],
        [F.count(F.lit(1)).alias("__n"), F.sum("value").alias("__s")],
        [
            F.sum("__n").alias("n"),
            F.round(F.sum("__s"), 2).alias("total"),
        ],
        factor=8,
        deterministic_col="event_id",
    )
    return out.orderBy("event_type")


def _e22_unpivot(spark, sf_dir):
    """Wide->long reshaping via DataFrame.unpivot (SQL UNPIVOT/melt), then a
    per-metric aggregate — the standard metrics-table normalization."""
    from persistor_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("metric")
    )


def _e23_ntile(spark, sf_dir):
    """Decile bucketing of customers by account balance within market
    segment (window ntile), rolled up to per-(segment, decile) stats."""
    from persistor_spark.sources.registry import load_table
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("c_mktsegment", "decile")
    )


# -- analytics extension (dedup / similarity / text) -------------------------

def _docs(spark, sf_dir):
    from persistor_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    from persistor_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "embeddings")


#: session-scoped cache of the materialized near-dup pair list / component
#: map, keyed by (application, sf_dir, threshold).  Seven audit queries
#: (a13/a26/a52/a68/a72/a79/a83) consume the SAME a2 exact-Jaccard pair
#: detection; in a gate or bench session the detection is paid once and the
#: audits read the checkpointed table.  Correctness is unchanged — the pair
#: list is a pure function of (corpus, threshold) — and a fresh session
#: (the driver running one query) just computes its own copy.
_PAIR_CACHE: dict = {}
_PAIR_LOCK = __import__("threading").Lock()
# separate lock: the CC fixpoint runs Spark jobs while held, and must not
# block threads that only need the (lazily built) pair frame
_COMP_LOCK = __import__("threading").Lock()


def _shared_pairs(spark, sf_dir, threshold=0.8):
    """The a2 exact n-gram Jaccard pair list, materialized once per session
    via an EAGER localCheckpoint (the first consumer pays the detection
    inside the lock; thread-pooled gate runs block on it instead of racing
    a lazy checkpoint and recomputing the lineage per concurrent job)."""
    key = ("pairs", spark.sparkContext.applicationId, sf_dir, threshold)
    with _PAIR_LOCK:
        if key not in _PAIR_CACHE:
            from persistor_spark.analytics import dedup

            pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold)
            _PAIR_CACHE[key] = pairs.localCheckpoint(eager=True)
        return _PAIR_CACHE[key]


def _shared_components(spark, sf_dir):
    """Near-dup connected components over the shared 0.8 pair list, also
    materialized once (a11/a44/a68/a79 all consume the same CC output)."""
    key = ("comp", spark.sparkContext.applicationId, sf_dir)
    pairs = _shared_pairs(spark, sf_dir, 0.8)
    with _COMP_LOCK:
        if key not in _PAIR_CACHE:
            from persistor_spark.analytics import dedup

            _PAIR_CACHE[key] = dedup.dedup_clusters(pairs).localCheckpoint(
                eager=True
            )
        return _PAIR_CACHE[key]


def _a_dedup_exact(spark, sf_dir):
    from persistor_spark.analytics import dedup

    return dedup.exact_groups(_docs(spark, sf_dir)).orderBy("keeper_id")


def _a_ngram_jaccard(spark, sf_dir):
    return _shared_pairs(spark, sf_dir, 0.8).orderBy("a", "b")


def _a_minhash_lsh(spark, sf_dir):
    from persistor_spark.analytics import dedup

    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), 0.8).orderBy("a", "b")


def _a_simhash(spark, sf_dir):
    """Banded SimHash pairs at distance <= 8 over 10 bands of a 60-bit
    md5-family hash.  max_distance(8) < n_bands(10) makes the banded plan
    PROVABLY equal to the brute-force Hamming filter, and the md5 hash
    computes identically in DuckDB — so the r2 rows-only check upgrades to
    a hash-verified oracle (the a19 pattern at a different band geometry)."""
    from persistor_spark.analytics import dedup

    return dedup.simhash_pairs(
        _docs(spark, sf_dir),
        max_distance=8,
        n_bands=10,
        bits=60,
        hash_fn=dedup.md5_hash64,
    ).orderBy("a", "b")


def _a21_cms_sketch(spark, sf_dir):
    """Count-min sketch of the corpus term frequencies (depth 4 x width 64,
    md5 hash family): the full counter grid, cell by cell — the bounded-size
    summary a 100 TB profiling pass ships instead of exact counts.  DuckDB
    recomputes every cell exactly."""
    from persistor_spark.analytics import sketches

    terms = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("term")
    )
    return sketches.count_min_sketch(terms, "term", depth=4, width=64).orderBy(
        "row", "bucket"
    )


def _a68_grouped_split(spark, sf_dir):
    """Leakage-SAFE train/val/test split: the split key is the doc's
    near-dup component (min-id), so every near-duplicate lands in the SAME
    split — the fix for the contamination a52 audits.  Singletons key on
    their own id; the assignment stays a pure hash function, so it is
    repartition/append-stable like a39."""
    from persistor_spark.analytics import sampling

    docs = _docs(spark, sf_dir)
    comp = _shared_components(spark, sf_dir)
    grouped = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("group_key")
    )
    out = sampling.assign_splits(
        grouped, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42, id_col="group_key"
    )
    return out.select("doc_id", "group_key", "split").orderBy("doc_id")


_BLOCKLIST = ("error", "null", "undefined", "lorem")


def _a79_cluster_size_dist(spark, sf_dir):
    """Near-dup cluster SIZE DISTRIBUTION: how many components of each size
    the corpus contains (singletons = docs untouched by any near-dup edge).
    The shape metric that distinguishes scattered pairwise dups from viral
    boilerplate blobs; two tiny aggs over the CC output."""
    docs = _docs(spark, sf_dir)
    comp = _shared_components(spark, sf_dir)
    grouped = docs.join(comp, "doc_id", "left").select(
        F.coalesce("cluster_id", F.col("doc_id")).alias("cid")
    )
    sizes = grouped.groupBy("cid").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("size")
    )


def _a80_token_spectrum(spark, sf_dir):
    """Token frequency-of-frequency spectrum (Zipf tail / hapax curve): for
    each occurrence count f, how many distinct tokens occur exactly f times
    — the curve BPE-vocab and min-count choices are read off.  Two
    vocab-bounded aggregations, capped at the 40 lowest frequencies (the
    decision region)."""
    docs = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        freq.groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .orderBy("f")
        .limit(40)
    )


def _a78_eval_overlap_severity(spark, sf_dir):
    """Eval-side contamination severity: for each eval doc (doc_id%7==0),
    the fraction of its distinct 5-grams that appear ANYWHERE in the
    training corpus — the 'is this benchmark burned' score deciding whether
    an eval set is still trustworthy (a20 lists the pairs; this aggregates
    the eval side).  Gram-keyed semi-join against the corpus's distinct
    gram set; cost tracks posting volume, never docs²."""
    from persistor_spark.analytics.dedup import shingles

    docs = _docs(spark, sf_dir)
    g = docs.select(
        "doc_id", F.explode(shingles("text", 5)).alias("g")
    )
    eval_g = g.filter(F.col("doc_id") % 7 == 0)
    corpus_g = g.filter(F.col("doc_id") % 7 != 0).select("g").distinct()
    matched = (
        eval_g.join(corpus_g, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    totals = eval_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(matched, "doc_id", "left")
        .select(
            F.col("doc_id").alias("eval_id"),
            "n_grams",
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.round(
                F.coalesce("n_matched", F.lit(0)) / F.col("n_grams"), 4
            ).alias("severity"),
        )
        .orderBy("eval_id")
    )


def _a76_blocklist_filter(spark, sf_dir):
    """Safety/blocklist filtering: per-doc count of blocklisted terms and
    the keep verdict (zero hits) — the wordlist gate every corpus runs
    before subtler filters.  One narrow array_intersect-style pass; the
    blocklist is a literal array (at scale: a broadcast set)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    bl = F.array(*[F.lit(w) for w in _BLOCKLIST])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(bl, F.lower(x))))
    # stage the interpreted HOF once (ARCHITECTURE §4b rule 5): referencing
    # `hits` in both n_blocked and keep re-ran the token-filter fold twice
    # per document
    return (
        docs.select("doc_id", hits.cast("long").alias("n_blocked"))
        .select("doc_id", "n_blocked", (F.col("n_blocked") == 0).alias("keep"))
        .orderBy("doc_id")
    )


def _a77_soft_quality_sample(spark, sf_dir):
    """Soft quality filtering (DCLM-style importance resampling): keep a doc
    iff hash_unit(seed, id) < quality_score — keep probability proportional
    to the score instead of a hard cutoff, preserving a calibrated tail of
    lower-quality data.  Pure hash + score expressions: deterministic,
    repartition/append-stable, zero shuffle."""
    from persistor_spark.analytics import text
    from persistor_spark.analytics.sampling import _hash_unit

    docs = _docs(spark, sf_dir)
    scored = docs.withColumn("score", text.quality_score("text"))
    kept = scored.filter(_hash_unit(F.col("doc_id"), 7) < F.col("score"))
    return kept.select("doc_id", "score").orderBy("doc_id")


def _a75_quality_calibration(spark, sf_dir):
    """Quality-score calibration: decile buckets of the heuristic score vs
    the Gopher keep-rate — does the cheap score actually rank quality?
    One pass computes both signals; the decile is ntile(10) over the
    rounded score (4 dp) with doc_id tiebreak, so bucket boundaries are
    representation-stable cross-engine.  The decile comes from
    `sampling.ntile_exact` — bit-identical to a global ntile window but
    computed as range-partition + literal prefix offsets + per-partition
    row_number, so the plan has NO single-partition WindowExec (the
    global-sort-on-one-executor hazard at 100 TB); the DuckDB oracle keeps
    plain ntile because the arithmetic rule is the same."""
    from persistor_spark.analytics import text
    from persistor_spark.analytics.sampling import ntile_exact

    flags = text.gopher_flags(_docs(spark, sf_dir)).withColumn(
        "score", text.quality_score("text")
    )
    bucketed = ntile_exact(
        flags.select("doc_id", "score", "keep"),
        10,
        [F.col("score").asc(), F.col("doc_id").asc()],
        out_col="decile",
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_score"),
            F.round(F.avg(F.col("keep").cast("double")), 4).alias("keep_rate"),
        )
        .orderBy("decile")
    )


def _e31_stats_functions(spark, sf_dir):
    """Statistical aggregate coverage: per-lang sample correlation,
    covariance, and stddev between token count and quality score (both
    engines use the n-1 sample definitions)."""
    from persistor_spark.analytics import text

    docs = _docs(spark, sf_dir).select(
        "lang",
        text.token_count("text").cast("double").alias("tc"),
        text.quality_score("text").alias("qs"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("tc", "qs"), 4).alias("corr_tc_qs"),
            F.round(F.covar_samp("tc", "qs"), 4).alias("covar_tc_qs"),
            F.round(F.stddev_samp("tc"), 4).alias("stddev_tc"),
        )
        .orderBy("lang")
    )


def _e32_anomaly_zscore(spark, sf_dir):
    """Monitoring composition: hourly event counts (gap-filled like e25) ->
    per-type mean/stddev -> z-scores -> |z| >= 2 anomalies.  The ingest
    anomaly detector a persistence pipeline runs over its own metrics; two
    bounded aggs over the hour grid, never the raw stream twice."""
    filled = _hourly_gap_filled(spark, sf_dir).withColumn(
        "n", F.col("n").cast("double")
    )
    stats = filled.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    return (
        filled.join(F.broadcast(stats), "event_type")
        .withColumn("zr", (F.col("n") - F.col("mu")) / F.col("sd"))
        # filter on the RAW z, round only for output — the oracle's order
        .filter(F.abs(F.col("zr")) >= 2)
        .select(
            "event_type",
            "hour",
            F.col("n").cast("long").alias("n"),
            F.round("zr", 4).alias("z"),
        )
        .orderBy("event_type", "hour")
    )


def _e30_rank_functions(spark, sf_dir):
    """percent_rank + cume_dist window coverage: order relative position of
    each order's totalprice within its priority class (top 40 orders per
    class by key for a bounded output)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
    return ranked.orderBy("o_orderpriority", "o_orderkey").limit(200)


def _a74_embedding_outliers(spark, sf_dir):
    """Embedding quality control: top-20 vectors FARTHEST from their own
    label's centroid (L2) — the mislabeled/noise detector run before
    training on an embedding corpus.  Centroids reduce to G x d rows; the
    per-vector distance is a narrow join against that tiny frame; the
    top-20 is a TakeOrdered on the rounded distance (4 dp, vec_id
    tiebreak) so cross-engine ordering is representation-stable."""
    embs = _embs(spark, sf_dir)
    per_dim = (
        embs.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v")
        )
        .groupBy("label", "i")
        .agg(F.avg("v").alias("m"))
    )
    flat = embs.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v"),
    )
    dist = (
        flat.join(per_dim, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sqrt(F.sum((F.col("v") - F.col("m")) * (F.col("v") - F.col("m")))), 4).alias("dist"))
    )
    return dist.orderBy(F.desc("dist"), "vec_id").limit(20)


def _a71_vocab_overlap(spark, sf_dir):
    """Pairwise source similarity by vocabulary: Jaccard over each source's
    DISTINCT token set, for source pairs sharing at least 10 tokens — the
    corpus-comparison matrix (which crawls duplicate each other's
    vocabulary).  Posting-list join on token keyed by the shared term, never
    a source x source cross product over raw text."""
    docs = _docs(spark, sf_dir)
    vocab = (
        docs.select(F.col("source"), F.explode(F.split("text", " ")).alias("t"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    nb = sizes.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .filter(F.col("inter") >= 10)
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "inter",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("vocab_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _a72_threshold_curve(spark, sf_dir):
    """Dedup threshold tuning curve: pair counts surviving each candidate
    threshold (0.7..0.9, step 0.05), from ONE pass over the exact-Jaccard pair list —
    how a pipeline picks its near-dup cutoff without re-running detection
    per candidate value."""
    pairs = _shared_pairs(spark, sf_dir, 0.7)
    aggs = [
        F.count(F.when(F.col("jaccard") >= t, 1)).alias(f"s{i}")
        for i, t in enumerate((0.7, 0.75, 0.8, 0.85, 0.9))
    ]
    row = pairs.agg(*aggs)
    stages = [
        F.struct(
            F.round(F.lit(t), 2).alias("threshold"), F.col(f"s{i}").alias("n_pairs")
        )
        for i, t in enumerate((0.7, 0.75, 0.8, 0.85, 0.9))
    ]
    return row.select(F.inline(F.array(*stages))).orderBy("threshold")


def _a69_filtered_ann(spark, sf_dir):
    """Metadata-filtered ANN (the FAISS IDSelector analogue): top-5 among
    the vec_id%3==0 subset only, with the selector applied BEFORE ADC
    scoring inside ivfpq_search.  On the clustered corpus the probed cells
    cover the filtered true top-5 (verified at both check SFs), so the
    filtered brute-force SQL is an exact oracle."""
    from persistor_spark.analytics import similarity

    embs = _cl_embs(spark, sf_dir)
    idx = _shared_ivfpq8(spark, sf_dir)
    q = embs.filter(F.col("vec_id") < 10)
    out = similarity.ivfpq_search(
        idx, q, k=5, nprobe=4, rerank_factor=24, id_filter=F.col("id") % 3 == 0
    )
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("query_id", "rank")


def _a67_cms_merge(spark, sf_dir):
    """Sketch mergeability — the property that makes CMS work distributed:
    per-partition sketches (even-id docs, odd-id docs) merged by counter
    addition MUST equal the sketch of the union, so the oracle is a21's
    whole-corpus grid.  At 100 TB this is the map-side-combine contract:
    every executor sketches its split, the reduce is a groupBy-sum of
    depth x width cells."""
    from persistor_spark.analytics import sketches

    docs = _docs(spark, sf_dir)

    def grid(part):
        terms = part.select(F.explode(F.split("text", " ")).alias("term"))
        return sketches.count_min_sketch(terms, "term", depth=4, width=64)

    merged = sketches.merge_sketches(
        grid(docs.filter(F.col("doc_id") % 2 == 0)),
        grid(docs.filter(F.col("doc_id") % 2 == 1)),
    )
    return merged.orderBy("row", "bucket")


def _a20_contamination(spark, sf_dir):
    """Benchmark decontamination: every 7th document plays the eval set;
    report corpus docs sharing any 5-gram with an eval doc (posting-list
    join, eval grams broadcast)."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    eval_df = docs.filter(F.col("doc_id") % 7 == 0)
    return dedup.ngram_contamination(corpus, eval_df, n=5).orderBy("corpus_id", "eval_id")


def _a19_simhash_md5(spark, sf_dir):
    """Oracle-checkable SimHash: md5-derived 60-bit hashes, 6 bands of 10
    bits, max_distance=5.  Because max_distance < n_bands the banded plan
    PROVABLY returns every qualifying pair, so the brute-force Hamming
    filter DuckDB runs is an exact oracle — upgrades SimHash from the
    rows-only a4 check to a hash-verified one (the banded equi-join plan is
    unchanged; only the hash source differs from production xxhash64)."""
    from persistor_spark.analytics import dedup

    return dedup.simhash_pairs(
        _docs(spark, sf_dir),
        max_distance=5,
        n_bands=6,
        bits=60,
        hash_fn=dedup.md5_hash64,
    ).orderBy("a", "b")


def _a18_winnowing_pairs(spark, sf_dir):
    """Winnowed-fingerprint overlap pairs (Schleimer et al./MOSS), using the
    oracle-portable md5 rolling hash so DuckDB reproduces the EXACT
    fingerprints — upgrades winnowing from pytest-only to hash-checked."""
    from persistor_spark.analytics import dedup

    return dedup.winnow_overlap_pairs(
        _docs(spark, sf_dir), min_shared=2, k=20, window=8, hash_fn=dedup.md5_hash64
    ).orderBy("a", "b")


def _a_embedding_topk(spark, sf_dir):
    from persistor_spark.analytics import similarity

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    out = similarity.brute_force_topk(embs, queries_df, k=5)
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("query_id", "rank")


def _cl_embs(spark, sf_dir):
    """Clustered variant of the embeddings fixture, derived IN the query
    (the a24-injection precedent): +10.0 on the label-th axis turns the
    near-orthogonal random fixture vectors into 10 tight label cones.  The
    raw fixture has no cluster structure (max inter-vector cos < 0.6), so
    cell-pruned ANN over it can only reach recall ~nprobe/C; the clustered
    corpus exercises the ACTUAL contract of IVF-family ops — probes find
    the cells where the neighbors live — and makes their candidate set
    provably cover the true top-k, so the brute-force SQL twin is an exact
    oracle.  The same arithmetic reproduces in DuckDB."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _CL_EMBS_LOCK:
        if key not in _CL_EMBS_CACHE:
            _CL_EMBS_CACHE[key] = (
                _embs(spark, sf_dir)
                .select(
                    "vec_id",
                    F.transform(
                        F.col("embedding").cast("array<double>"),
                        lambda x, i: x
                        + F.when(i == F.col("label"), F.lit(10.0)).otherwise(F.lit(0.0)),
                    ).alias("embedding"),
                )
                .localCheckpoint(eager=True)
            )
        return _CL_EMBS_CACHE[key]


#: session-scoped materialization of the clustered corpus: SEVEN ANN
#: queries (a7/a25/a32/a49/a55/a60/a69) start from this same derived
#: table, and the per-element clustering lambda is an interpreted
#: higher-order function — paying the parquet scan + HOF once per session
#: instead of once per query is the same amortization as _IVFPQ_CACHE,
#: with identical results by construction (it is the same rows).
_CL_EMBS_CACHE: dict = {}
_CL_EMBS_LOCK = __import__("threading").Lock()


def _a_lsh_topk(spark, sf_dir):
    # 32 tables x 3 planes: the union of tables covers the true top-5 at
    # fixture scale (verified vs brute force at sf0.001 AND sf0.01), so the
    # a5 brute-force SQL is an exact oracle; pytest pins recall at the
    # production 16x4 defaults
    from persistor_spark.analytics import similarity

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    out = similarity.cosine_lsh_topk(embs, queries_df, k=5, n_planes=3, n_tables=32)
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("query_id", "rank")


def _a_ivf_topk(spark, sf_dir):
    from persistor_spark.analytics import similarity

    embs = _cl_embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    # Lloyd-trained spherical coarse quantizer over the clustered corpus:
    # nprobe=4 of 16 cells covers the true top-5 (candidate superset
    # verified vs brute force at sf0.001 + sf0.01) -> brute-force SQL is an
    # exact oracle, upgrading the r2 rows-only check
    out = similarity.ivf_topk(
        embs, queries_df, k=5, n_centroids=16, kmeans_iter=2, nprobe=4
    )
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("query_id", "rank")


def _a_pq_topk(spark, sf_dir):
    from persistor_spark.analytics import similarity

    embs = _cl_embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    # PQ-ADC with exact cosine re-rank (Jegou et al. 2011): codes computed
    # scan-side, query LUT broadcast, O(m) table-lookup scoring.  On the
    # clustered corpus the rerank_factor=24 ADC shortlist covers the true
    # top-5 (verified both sfs) -> exact brute-force oracle
    out = similarity.pq_topk(
        embs, queries_df, k=5, m=16, ksub=16, kmeans_iter=2, rerank_factor=24
    )
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("query_id", "rank")


def _a_opq_topk(spark, sf_dir):
    from persistor_spark.analytics import similarity

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    # OPQ (Ge et al. 2013): learned orthonormal rotation + PQ-ADC + exact
    # re-rank.  Verdict is the d46 threshold form at every SF (r12
    # VERDICT #3): per-query recall@5 >= 0.2, mean >= 0.6 vs brute force
    # (measured: 1.0/1.0 at sf0.001 + sf0.01, min/mean 0.8/0.92 at
    # sf0.1); orthonormality + rotation-invariant rerank stay pinned by
    # pytest
    out = similarity.opq_topk(
        embs, queries_df, k=5, m=16, ksub=16, n_iter=2, rerank_factor=16
    )
    truth = similarity.brute_force_topk(embs, queries_df, k=5).select(
        "query_id", "vec_id"
    )
    return _ann_threshold_rows(out, truth, k=5, floor_each=0.2, floor_mean=0.6)


def _a_semdedup(spark, sf_dir):
    from persistor_spark.analytics import similarity

    # SemDeDup (Abbas et al. 2023) at the paper's high-threshold operating
    # point (0.95): near-dup pairs within k-means cells — n^2/C work.  The
    # fixture has no pairs above cos 0.6, so the query plants scaled copies
    # (x1.5 => cos exactly 1.0, provably same-cell: identical normalized
    # vectors get identical assignment scores) of vec_id < 25 — the a24
    # injection precedent.  Every qualifying pair is a planted one, so the
    # brute-force cos>=0.95 SQL over the augmented set is an exact oracle,
    # upgrading the r2 rows-only check; subset + capture properties at
    # lower thresholds stay pinned by pytest.
    embs = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # dup-id offset derived from the corpus (max+1), not a constant: a
    # constant 100000 collides with real vec_ids once a scale factor reaches
    # 100k vectors.  Bounded scalar collect (one MAX).
    offset = embs.agg(F.max("vec_id")).first()[0] + 1
    dups = embs.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + F.lit(offset)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    aug = embs.unionByName(dups)
    return similarity.semdedup_pairs(aug, 0.95, n_centroids=8).orderBy("a", "b")


#: session-scoped cache of the (quantizer, codebooks, encoded cells) IVF-PQ
#: artifact over the clustered corpus — a32, a55, and a69 probe the SAME
#: trained index (n_centroids=8 on _cl_embs), so training+encoding is paid
#: once per gate/bench session, exactly like a production deployment where
#: the index is built once and served to every search
_IVFPQ_CACHE: dict = {}
_IVFPQ_LOCK = __import__("threading").Lock()


def _shared_ivfpq8(spark, sf_dir):
    key = (spark.sparkContext.applicationId, sf_dir)
    with _IVFPQ_LOCK:
        if key not in _IVFPQ_CACHE:
            from persistor_spark.analytics import similarity

            _IVFPQ_CACHE[key] = similarity.ivfpq_build(
                _cl_embs(spark, sf_dir), n_centroids=8
            )
        return _IVFPQ_CACHE[key]


def _ann_threshold_rows(out, truth, k, floor_each, floor_mean):
    """Shared SF-robust ANN verdict shape (d46's pattern — r12 VERDICT #3):
    per-query recall@k of an approximate result vs Spark brute-force
    ground truth, asserted as THRESHOLD booleans the oracle can pin at
    ANY scale factor.  The previous exact-equality oracles held only
    while the probed cells covered the true top-k — the documented
    contract, which the r12 sf0.1 sweep showed breaking at a 10x corpus
    (a32: 17/50 rows, the true #3 neighbor in an unprobed cell).  A
    quality collapse (broken coarse assignment, corrupted codebooks,
    probes missing the neighborhood) still flips the booleans and breaks
    the hash; the exact result-count pins the output SHAPE."""
    hits = truth.join(
        out.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    per = (
        truth.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k_eff"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .join(
            out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results")),
            "query_id",
            "left",
        )
        .withColumn("recall", F.coalesce("n_hit", F.lit(0)) / F.col("k_eff"))
    )
    # per is query-count-sized; materialize it ONCE so the brute-force
    # truth + joins don't run twice (once for the mean, once when the
    # driver collects the returned rows — r13 review)
    per = per.localCheckpoint(eager=True)
    mean_recall = per.agg(F.avg("recall")).first()[0]
    return per.select(
        "query_id",
        F.lit(k).cast("int").alias("k"),
        F.col("n_results").cast("long").alias("n_results"),
        (F.col("recall") >= F.lit(float(floor_each))).alias("recall_ok"),
        F.lit(bool(mean_recall >= floor_mean)).alias("mean_ok"),
    ).orderBy("query_id")


def _a_ivfpq_topk(spark, sf_dir):
    from persistor_spark.analytics import similarity

    embs = _cl_embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    # FAISS-IVFPQ composition: coarse cells + residual PQ + ADC + exact
    # re-rank.  Verdict is the d46 threshold form at every SF (r12
    # VERDICT #3): per-query recall@5 >= 0.2 and mean >= 0.6 vs brute
    # force (measured: 1.0/1.0 at sf0.001 + sf0.01, min/mean 0.4/0.80 at
    # sf0.1 — deterministic per SF, seeded k-means; a collapsed index
    # scores ~0)
    out = similarity.ivfpq_search(
        _shared_ivfpq8(spark, sf_dir), queries_df, k=5, nprobe=4, rerank_factor=24
    )
    truth = similarity.brute_force_topk(embs, queries_df, k=5).select(
        "query_id", "vec_id"
    )
    return _ann_threshold_rows(out, truth, k=5, floor_each=0.2, floor_mean=0.6)


def _a_text_stats(spark, sf_dir):
    from persistor_spark.analytics import text

    return (
        text.with_text_stats(_docs(spark, sf_dir))
        .select(
            "doc_id",
            "token_count",
            "distinct_token_ratio",
            "stopword_ratio",
            "quality_score",
            "detected_lang",
            "fingerprint",
        )
        .orderBy("doc_id")
    )


def _a_langid_profile(spark, sf_dir):
    """Confusion profile: labeled lang x detected lang counts (the useful
    evaluation view of the detector, and non-degenerate on the fixture)."""
    from persistor_spark.analytics import text

    return (
        _docs(spark, sf_dir)
        .groupBy("lang", text.detect_language().alias("detected_lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "detected_lang")
    )


def _a_dedup_clusters(spark, sf_dir):
    return _shared_components(spark, sf_dir).orderBy("doc_id")


def _a_weighted_mix(spark, sf_dir):
    from persistor_spark.analytics import sampling

    # hash-threshold mixture sampling: membership is a pure function of
    # (seed, doc_id), so the DuckDB oracle reproduces the EXACT row set via
    # the portable md5 60-bit hash
    out = sampling.sample_mixture_hashed(
        _docs(spark, sf_dir), "source", {"src0": 2.0, "src1": 1.0}, seed=7
    )
    return out.select("doc_id", "source").orderBy("doc_id")


def _a_pack_sequences(spark, sf_dir):
    from persistor_spark.analytics import sampling, text

    docs = _docs(spark, sf_dir).select(
        "doc_id", text.token_count("text").cast("long").alias("n_tokens")
    )
    out = sampling.pack_sequences(docs, budget=1024, n_shards=4)
    return out.select(
        "doc_id", "n_tokens", "shard", "seq_id", "seq_offset", "spans"
    ).orderBy("doc_id")


def _a_quota_sample(spark, sf_dir):
    from persistor_spark.analytics import sampling

    # exact per-stratum quotas by deterministic hash rank — the oracle
    # reproduces the exact row set via the same md5 rank
    out = sampling.quota_sample(_docs(spark, sf_dir), "source", quota=10, seed=7)
    return out.select("doc_id", "source").orderBy("doc_id")


def _a_dup_spans(spark, sf_dir):
    from persistor_spark.analytics import dedup

    # ExactSubstr-style duplicated-substring coverage (Lee et al. 2022):
    # fraction of each doc's tokens inside a corpus-duplicated 8-gram
    return dedup.duplicate_span_stats(_docs(spark, sf_dir), gram_len=8).orderBy("doc_id")


def _a_lm_perplexity(spark, sf_dir):
    from persistor_spark.analytics import text

    # CCNet-style corpus-LM quality signal: unigram + add-one bigram NLL per
    # doc, counts trained on the same corpus (Wenzek et al. 2020 shape)
    return text.lm_perplexity_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def _a_cc_two_phase(spark, sf_dir):
    from persistor_spark.analytics import dedup

    # same pair graph as a11, resolved by alternating large-star/small-star
    # contraction (O(log^2 n) rounds) instead of min-label propagation;
    # component minima are algorithm-independent, so a26 shares a11's oracle
    pairs = _shared_pairs(spark, sf_dir, 0.8)
    return dedup.dedup_clusters_two_phase(pairs).orderBy("doc_id")


def _a_audio_features(spark, sf_dir):
    from persistor_spark.analytics import multimodal

    # REAL WAV decode path: header fields parsed from actual RIFF bytes;
    # the oracle recomputes them arithmetically (tone length is a pure
    # function of doc_id), pinning the encoder AND decoder
    media = multimodal.synthesize_media(spark, _docs(spark, sf_dir))
    feats = multimodal.extract_audio_features_real(media)
    return feats.select("media_id", "rate", "n_samples", "decoded_ms", "n_bytes").orderBy(
        "media_id"
    )


def _a_frame_samples(spark, sf_dir):
    from persistor_spark.analytics import multimodal

    # REAL AVI container decode: frame counts/timing parsed from actual
    # RIFF bytes; oracle recomputes them from doc_id arithmetic
    media = multimodal.synthesize_media(spark, _docs(spark, sf_dir))
    out = multimodal.sample_frames_real(media, every_ms=200)
    return out.select(
        "media_id", "n_frames", "fps", "frame_idx", "frame_ts_ms", "height", "width"
    ).orderBy("media_id", "frame_ts_ms")


def _a_multimodal_features(spark, sf_dir):
    from persistor_spark.analytics import multimodal

    media = multimodal.synthesize_media(spark, _docs(spark, sf_dir))
    feats = multimodal.extract_image_features(media)
    return feats.select("media_id", "width", "height", "n_bytes").orderBy("media_id")


# -- extended relational surface (SURVEY.md §2.2: categories the reference
# lacks but the engine exposes; D14-D16 pinned the basics, these pin the rest)

def _register(spark, sf_dir):
    from persistor_spark.sources.registry import register_all

    register_all(spark, sf_dir)


def _e_rollup(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
        .orderBy("prio", "status")
    )


def _e_cube(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.sum("o_totalprice").alias("rev"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.round("rev", 2).alias("rev"),
        )
        .orderBy("prio", "status")
    )


def _e_set_ops(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    big_spenders = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return building.intersect(big_spenders).orderBy("k")


def _e_semi_anti(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")
    return (
        with_orders.withColumn("has_orders", F.lit(True))
        .unionByName(without.withColumn("has_orders", F.lit(False)))
        .orderBy("c_custkey")
    )


def _e_window_lag(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
            F.round(F.sum("value").over(wsum), 2).alias("running"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("event_id")
    )


def _e_scalar_subquery(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders "
        "WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders) "
        "ORDER BY o_orderkey"
    )


def _e_string_funcs(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        part.select(
            "p_partkey",
            F.lower(F.col("p_brand")).alias("brand_lc"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.length("p_type").alias("type_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("bt"),
            F.when(F.col("p_size") >= 25, "large")
            .when(F.col("p_size") >= 10, "medium")
            .otherwise("small")
            .alias("size_class"),
        )
        .orderBy("p_partkey")
    )


def _e_tumbling_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("bucket", "event_type")
    )


def _e29_event_sequences(spark, sf_dir):
    """Ordered per-user event-sequence assembly (the session-to-training-
    example step): collect each user's events as (ts, event_id, type)
    structs, array_sort gives the deterministic chronological order
    (event_id breaks ts ties), emit the type sequence as one string.
    One groupBy shuffle; per-user arrays stay partition-local."""
    ev = _events(spark, sf_dir)
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.size("evs").cast("long").alias("n_events"),
            F.array_join(
                F.transform("evs", lambda s: s["event_type"]), ">"
            ).alias("sequence"),
        )
    )
    return seq.orderBy("user_id")


def _e27_event_funnel(spark, sf_dir):
    """Sequential event funnel (view -> click -> purchase): a user converts
    a stage only with an event strictly AFTER their first event of the
    previous stage.  Each stage is one filtered agg + one keyed join
    against the prior stage's (user, first_ts) — no window over the raw
    event stream."""
    ev = _events(spark, sf_dir)

    def stage(prev, etype):
        s = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col("t"))
        return s.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = stage(None, "view")
    c = stage(v.select("user_id", "t"), "click")
    p = stage(c.select("user_id", "t"), "purchase")
    counts = (
        v.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit(1)).withColumn("event_type", F.lit("view"))
        .unionByName(c.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit(2)).withColumn("event_type", F.lit("click")))
        .unionByName(p.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit(3)).withColumn("event_type", F.lit("purchase")))
    )
    return counts.select("stage", "event_type", F.col("n").alias("n_users")).orderBy("stage")


def _e28_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: cohort = a user's first active week (epoch
    weeks), retention(k) = share of the cohort active k weeks later
    (k <= 3).  Two bounded shuffles: distinct (user, week) activity and the
    (cohort, offset) rollup joined to broadcast cohort sizes."""
    ev = _events(spark, sf_dir)
    week = F.floor(F.unix_timestamp("ts") / 604800).cast("long")
    act = ev.select(F.col("user_id"), week.alias("w")).distinct()
    first = act.groupBy("user_id").agg(F.min("w").alias("w0"))
    joined = act.join(first, "user_id").withColumn("k", (F.col("w") - F.col("w0")).cast("int"))
    sizes = first.groupBy("w0").agg(F.count(F.lit(1)).alias("cohort_size"))
    ret = (
        joined.filter(F.col("k") <= 3)
        .groupBy("w0", "k")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "w0")
        .select(
            F.col("w0").alias("cohort_week"),
            F.col("k").alias("week_offset"),
            "n_active",
            "cohort_size",
            # UNROUNDED integer quotient (the e46 class): bit-identical in
            # both engines where round() splits on true halfway cases
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )
    return ret.orderBy("cohort_week", "week_offset")


def _e26_array_agg(spark, sf_dir):
    """Ordered array aggregation: per nation, the sorted supplier roster
    (collect_list -> array_sort -> array_join; emitted as a joined string
    so the cross-engine hash stays representation-stable)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        nation.join(supplier, nation.n_nationkey == supplier.s_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


def _hourly_gap_filled(spark, sf_dir):
    """Shared gap-filled hourly series (e25 IS this; e32 z-scores it): per
    event type, hourly counts with MISSING buckets generated (sequence over
    each type's min..max hour) and zero-filled.  One sequence-explode grid
    + one (type, hour)-keyed left join — duplicating this block in both
    queries let the two definitions of 'an hour bucket' drift."""
    ev = _events(spark, sf_dir)
    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    counts = (
        ev.groupBy(F.col("event_type"), hour.alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spans = counts.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"), F.lit(3600))).alias("hour"),
    )
    return grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


def _e25_gap_fill(spark, sf_dir):
    """Time-series gap filling: per-type hourly counts with MISSING hour
    buckets generated (sequence over each type's min..max hour) and
    zero-filled — the densification step before rolling metrics.  The
    bucket generation is an explode of a per-group sequence (no cross
    join against a calendar table); the fill is one left join keyed by
    (type, hour)."""
    return _hourly_gap_filled(spark, sf_dir).orderBy("event_type", "hour")


def _e21_interval_join(spark, sf_dir):
    """View->purchase attribution: purchases by the same user within 10
    minutes of a view (streaming.windows.interval_join — the SAME operator
    runs as a watermarked stream-stream join; batch mode makes it
    oracle-checkable)."""
    from persistor_spark.streaming import windows as sw

    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("uid"), F.col("ts").alias("vts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), F.col("user_id").alias("uid"), F.col("ts").alias("bts")
    )
    return (
        sw.interval_join(views, buys, "uid", "vts", "bts", max_delay="10 minutes")
        .select("view_id", "buy_id")
        .orderBy("view_id", "buy_id")
    )


def _e20_time_range_rolling(spark, sf_dir):
    """RANGE-frame rolling aggregate over event time: per user, the sum and
    count of events in the trailing 1 hour (inclusive) at each event — the
    time-based frame (rangeBetween on epoch seconds) as opposed to the
    ROWS frames e5 pins.  Scale: one shuffle on user_id, frames evaluated
    per partition."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    # unix_timestamp, not cast("long"): the events fixture carries
    # TIMESTAMP_NTZ, which Spark refuses to cast directly to BIGINT
    # (the e8 pattern; r2 VERDICT "What's wrong" #1)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
            F.round(F.sum("value").over(w), 2).alias("sum_trailing_1h"),
        )
        .orderBy("user_id", "event_id")
    )


def _e19_sliding_window(spark, sf_dir):
    """Sliding event-time windows (1h window, 15min slide — each event lands
    in 4 overlapping windows) via F.window, the same construct the streaming
    path uses with a watermark (streaming/windows.py sliding_throughput).
    Oracle: every event replicated to its window/slide = 4 window starts."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.unix_timestamp("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
        .orderBy("window_start", "event_type")
    )


def _events(spark, sf_dir):
    from persistor_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "events")


def _sessionized(spark, sf_dir):
    """THE session definition (shared by e9 and e60 — e60's docstring says
    'e9's sessions', so they must literally be the same expression): new
    session when the same user's gap exceeds 30 minutes; lag + conditional
    cumulative sum.  Returns events + (new_session, session_id).

    Cumulative sum over an explicit ROWS frame on the SAME (ts, event_id)
    order as the lag window — the oracle mirrors this exactly (r1 red row
    was an ORDER BY event_id-only oracle diverging whenever a user's
    event_id order differs from ts order).  unix_timestamp, not
    cast("long"): TIMESTAMP_NTZ fixtures reject a direct BIGINT cast (the
    e8 pattern; r2 VERDICT "What's wrong" #1)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epoch = F.unix_timestamp("ts")
    return ev.withColumn(
        "new_session",
        (epoch - F.lag(epoch).over(w) > 1800).cast("int"),
    ).withColumn("session_id", F.sum(F.coalesce("new_session", F.lit(1))).over(w_sum))


def _e9_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (batch twin of
    streaming.windows.session_windows) — see _sessionized."""
    flagged = _sessionized(spark, sf_dir)
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("user_id", "session_id")
    )


def _e10_join_topk(spark, sf_dir):
    """TPC-H Q3-style: 3-way join, filter, agg, top-10 (pins join reordering
    + partial agg + limit pushdown on a sorted agg)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def _e11_asof_join(spark, sf_dir):
    """Backward as-of join: each event enriched with the most recent order
    (same key mod-10 bucket) at or before the event time."""
    from persistor_spark.operators import asof

    ev = _events(spark, sf_dir).select(
        "event_id",
        (F.col("user_id") % 10).cast("int").alias("k"),
        "ts",
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            (F.col("o_custkey") % 10).cast("int").alias("k"),
            "o_orderdate",
            "o_orderkey",
        )
        # dedup per (k, time): as-of needs one right row per timestamp to be
        # deterministic; keep max orderkey (same rule in the oracle)
        .groupBy("k", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof.asof_join(ev, orders, key="k", left_time="ts", right_time="o_orderdate")
    return out.select("event_id", "k", "o_orderdate", "o_orderkey").orderBy("event_id")


def _e24_asof_tolerance(spark, sf_dir):
    """e11 with tolerance_seconds=30d: pins the tolerance branch the driver
    never exercised (the branch that held the latent TIMESTAMP_NTZ cast —
    events.ts IS TIMESTAMP_NTZ here, so a cast('long') regression throws)."""
    from persistor_spark.operators import asof

    ev = _events(spark, sf_dir).select(
        "event_id",
        (F.col("user_id") % 10).cast("int").alias("k"),
        "ts",
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            (F.col("o_custkey") % 10).cast("int").alias("k"),
            "o_orderdate",
            "o_orderkey",
        )
        .groupBy("k", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof.asof_join(
        ev,
        orders,
        key="k",
        left_time="ts",
        right_time="o_orderdate",
        tolerance_seconds=30 * 86400,
    )
    return out.select("event_id", "k", "o_orderdate", "o_orderkey").orderBy("event_id")


def _a15_incremental_dedup(spark, sf_dir):
    """Continuous-ingestion dedup: odd-id docs (the 'arriving batch') probed
    against the even-id corpus band table; exact-verified cross pairs."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    band_table = dedup.build_band_table(old)
    return (
        dedup.incremental_dup_pairs(new, band_table, 0.8)
        .orderBy("new_id", "old_id")
    )


def _a66_snapshot_diff(spark, sf_dir):
    """Dataset-version diff derived in the query: snapshot B drops every
    11th doc, rewrites every 13th, and appends 5 synthetic docs; the diff
    must label each id added/removed/changed/unchanged."""
    from persistor_spark.analytics import profiling

    docs = _docs(spark, sf_dir)
    kept = docs.filter(F.col("doc_id") % 11 != 0)
    new_snap = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.lit("edited "), F.col("text"))
        ).otherwise(F.col("text")),
    ).unionByName(
        spark.range(5).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.concat(F.lit("brand new doc "), F.col("id")).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synthetic").alias("source"),
            F.lit(0).cast("long").alias("n_chars"),
        )
    )
    return profiling.snapshot_diff(docs, new_snap)


def _a65_lsh_persist(spark, sf_dir):
    """a15 through a SAVED + LOADED LSH index: the even-id corpus band table
    round-trips band-partitioned parquet before the odd-id batch probes it —
    proving the on-disk posting layout returns identical pairs (the dedup
    twin of a55's index persistence)."""
    import tempfile

    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    # populate-once + exit cleanup (one persisted index per session, like
    # _a55_ivfpq_persist — previously every call leaked a fresh mkdtemp)
    key = (id(spark), sf_dir, "lsh_idx")
    with _CACHE_LOCK:
        if key not in _CACHE:
            import atexit
            import shutil

            path = tempfile.mkdtemp(prefix="lsh_idx_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
            dedup.lsh_index_save(dedup.build_band_table(old), path)
            _CACHE[key] = path
        path = _CACHE[key]
    loaded = dedup.lsh_index_load(spark, path)
    return dedup.incremental_dup_pairs(new, loaded, 0.8).orderBy("new_id", "old_id")


def _e18_null_safe_join(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): messages
    self-joined on business_source_key where NULL matches NULL — counts per
    key pair bucket.  Regular equality would drop all NULL-key rows."""
    m = _messages(spark, sf_dir).select(
        "broker_id", "business_source_key", "event_seq"
    )
    a = m.filter(F.col("event_seq") % 97 == 0).alias("a")
    b = m.filter(F.col("event_seq") % 97 == 13).alias("b")
    joined = a.join(
        b,
        F.col("a.business_source_key").eqNullSafe(F.col("b.business_source_key")),
        "inner",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("a.business_source_key"), F.lit("NULL")).alias("key")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("key")
    )


def _e17_term_heavy_hitters(spark, sf_dir):
    """Corpus heavy hitters: top-20 terms by document frequency (the exact
    baseline a count-min/heavy-hitter sketch approximates at 100 TB)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("term"))
        .limit(20)
    )


def _a22_repetition(spark, sf_dir):
    """Gopher duplicate n-gram fraction (Rae et al. 2021 §A1.1): per-doc
    repetition signal at n=2 and n=3.  Pure per-row JVM array expressions —
    zero data shuffle beyond the presentation sort; at 100 TB this is a
    narrow map over the scan.

    Two plan choices, both measured at sf0.1 (r7): the staged helper
    evaluates tokens/grams once per row (5x over the expression form, which
    gets no CSE in an interpreted HOF Project), and the sort runs BEFORE the
    expensive projection — a global sort ABOVE it would range-sample the
    projected child and evaluate the whole gram build twice (18.8 s -> 3.6 s
    cold together)."""
    from persistor_spark.analytics import text

    return text.with_duplicate_ngram_fractions(
        _docs(spark, sf_dir).orderBy("doc_id"),
        "text",
        (2, 3),
        round_digits=4,
    ).select("doc_id", "dup_2gram", "dup_3gram")


def _a23_quality_rules(spark, sf_dir):
    """Gopher-style rule gate: per-doc boolean rule flags + keep conjunction
    (the cheap pre-filter before model scoring in a curation pipeline)."""
    from persistor_spark.analytics import text

    return (
        text.gopher_flags(_docs(spark, sf_dir))
        .select(
            "doc_id",
            "flag_words",
            "flag_mean_len",
            "flag_symbols",
            "flag_stopwords",
            "flag_repetition",
            "keep",
        )
        .orderBy("doc_id")
    )


def _a24_pii_scrub(spark, sf_dir):
    """PII detect + redact (emails / phones / IPv4).  The fixture corpus is
    synthetic word-salad with no PII, so the query deterministically injects
    PII spans keyed on doc_id (same injection in the oracle) — what's under
    test is the detection/redaction machinery, not the fixture content.
    Narrow per-row JVM regex — zero shuffle at any scale."""
    from persistor_spark.analytics import pii

    d = _docs(spark, sf_dir).withColumn(
        "aug",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" reach user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.lit(" from 10.0.0."), (F.col("doc_id") % 250).cast("string")),
            ).otherwise(F.lit("")),
        ),
    )
    return (
        pii.with_pii(d, "aug")
        .select("doc_id", "n_emails", "n_phones", "n_ips", "has_pii", "redacted")
        .orderBy("doc_id")
    )


def _a17_bpe_tokens(spark, sf_dir):
    from persistor_spark.analytics import text

    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            text.token_count().alias("ws_tokens"),
            text.bpe_token_count().alias("bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def _a16_label_centroids(spark, sf_dir):
    """Element-wise vector aggregation: per-label centroid (mean vector) and
    its norm — the reduce shape of embedding-pipeline statistics (posexplode
    -> per-dimension mean -> recombine), all built-ins."""
    embs = _embs(spark, sf_dir)
    per_dim = (
        embs.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v")
        )
        .groupBy("label", "i")
        .agg(F.avg("v").alias("m"))
    )
    return (
        per_dim.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4).alias("centroid_norm"))
        .join(
            embs.groupBy("label").agg(F.count(F.lit(1)).alias("n")),
            "label",
        )
        .select("label", "n", "centroid_norm")
        .orderBy("label")
    )


_BM25_QUERY = ["spark", "join", "filter"]


def _a14_bm25_topk(spark, sf_dir):
    from persistor_spark.analytics import search

    idx = search.build_index(_docs(spark, sf_dir))
    out = search.search(idx, _BM25_QUERY, k=10)
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("rank")


def _e13_grouping_sets(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT coalesce(o_orderpriority, 'ALL') AS prio, "
        "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n "
        "FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) "
        "ORDER BY prio, status"
    )


def _e14_except(spark, sf_dir):
    """Customers who never appear as an event user (EXCEPT ALL surface)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ev = _events(spark, sf_dir)
    all_cust = c.select(F.col("c_custkey").alias("k"))
    active = ev.select(F.col("user_id").alias("k"))
    return all_cust.exceptAll(active.distinct()).orderBy("k")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _e15_pivot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy((F.col("user_id") % 5).cast("int").alias("user_bucket"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
        .orderBy("user_bucket")
    )


def _e16_correlated_exists(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT s_suppkey, s_name FROM supplier s "
        "WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = s.s_nationkey "
        "  AND c.c_acctbal > 9000) "
        "ORDER BY s_suppkey"
    )


def _e12_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (the batch twin of the
    reference's q50/90/99 latency summaries, metrics.go:58-81)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def _a12_embedding_pairs(spark, sf_dir):
    from persistor_spark.analytics import dedup

    return dedup.embedding_dup_pairs_lsh(_embs(spark, sf_dir), 0.4).orderBy("a", "b")


def _a13_curation_pipeline(spark, sf_dir):
    """Composite training-data curation pass: quality gate -> near-dup
    removal (cluster representatives) -> per-source profile."""
    from persistor_spark.analytics import dedup, text

    docs = _docs(spark, sf_dir)
    scored = text.with_text_stats(docs)
    gated = scored.filter(F.col("quality_score") >= 0.6)
    # pairwise Jaccard depends only on the two docs, so pairs-within-the-
    # gated-subset == the shared full-corpus pair list restricted to gated
    # endpoints — the detection is paid once per session, the gate is two
    # broadcast-able semi-joins
    ids = gated.select("doc_id")
    pairs = (
        _shared_pairs(spark, sf_dir, 0.8)
        .join(ids.withColumnRenamed("doc_id", "a"), "a", "semi")
        .join(ids.withColumnRenamed("doc_id", "b"), "b", "semi")
    )
    clusters = dedup.dedup_clusters(pairs)
    kept = dedup.keep_cluster_representatives(gated, clusters)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("token_count"), 4).alias("avg_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


def _d17(spark, sf_dir):
    from persistor_spark.functions import sizes

    return (
        _messages(spark, sf_dir)
        .select(
            keys.unique_id().alias("unique_id"),
            sizes.message_size().alias("size_bytes"),
        )
        .orderBy("unique_id")
    )


def _d18(spark, sf_dir):
    from persistor_spark.functions import timestamps as ts

    m = _messages(spark, sf_dir).withColumn("wire", ts.format_wire("ingestion_time"))
    return (
        m.select(
            keys.unique_id().alias("unique_id"),
            "wire",
            (ts.parse_wire("wire") == F.col("ingestion_time")).alias("roundtrip_ok"),
        )
        .orderBy("unique_id")
    )


def _a37_chunking(spark, sf_dir):
    """Context-window chunking: 64-token chunks every 48 tokens (16-token
    overlap) — the retrieval/pretraining preprocessing explode.  Narrow
    per-row expression, zero shuffle."""
    from persistor_spark.analytics import text

    return text.chunk_documents(_docs(spark, sf_dir), 64, 48).orderBy(
        "doc_id", "chunk_id"
    )


def _a38_pmi(spark, sf_dir):
    """Top-50 adjacent-pair collocations by PMI (phrase mining / tokenizer
    merge candidates); deterministic (round(pmi,4) DESC, w1, w2) order."""
    from persistor_spark.analytics import text

    return text.pmi_bigrams(_docs(spark, sf_dir), min_count=3, k=50)


def _a39_splits(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by md5-hash
    interval — stable under repartition/rerun/append; oracle reproduces the
    exact row→split map via the portable md5 arithmetic."""
    from persistor_spark.analytics import sampling

    out = sampling.assign_splits(
        _docs(spark, sf_dir), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
    )
    return out.select("doc_id", "split").orderBy("doc_id")


def _a40_tfidf(spark, sf_dir):
    """Per-doc top-3 TF-IDF terms (sklearn-smoothed idf): doc-term count
    shuffle + vocab-bounded df agg broadcast back + bounded per-doc window.
    Deterministic tie-break by term string."""
    from persistor_spark.analytics import text

    return text.tfidf_top_terms(_docs(spark, sf_dir), top_n=3).orderBy("doc_id", "rank")


def _a41_source_rollup(spark, sf_dir):
    """Domain-level curation rollup (the C4/RefinedWeb keep/drop-by-source
    signal): one shuffle keyed by source."""
    from persistor_spark.analytics import text

    return text.source_quality_rollup(_docs(spark, sf_dir)).orderBy("source")


def _a42_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization (FAISS SQ8 analogue) with max
    reconstruction error — narrow JVM expressions, zero shuffle.

    Driver shape (r7): the library returns `codes` as array<int>; the driver
    harness canonicalizes via pandas sort_values, which cannot order list
    cells — so the ENTRY serializes codes to a comma-joined string (integers
    format identically in Spark and DuckDB, so this is exact)."""
    from persistor_spark.analytics import similarity

    q = similarity.quantize_int8(_embs(spark, sf_dir))
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias("codes_csv"),
        "max_abs_err",
    ).orderBy("vec_id")


def _a43_norm_fingerprint(spark, sf_dir):
    """Canonical-text md5 fingerprints (normalized exact-dedup / train-test
    contamination key) — narrow projection, zero shuffle."""
    from persistor_spark.analytics import text

    return text.normalization_fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")


def _a44_cluster_reps(spark, sf_dir):
    """Canonical-doc selection: near-dup components -> one representative
    per cluster (max n_chars, ties to lowest id) via a map-side-combinable
    max(struct) agg — the keep/drop policy step after clustering."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    clusters = _shared_components(spark, sf_dir)
    return dedup.select_representatives(docs, clusters).orderBy("cluster_id")


def _a45_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss projection 64 -> 16 dims: narrow per-row map
    over a folded literal matrix, zero shuffle, zero Python.

    Driver shape (r7): the library returns `proj` as array<double>; the
    driver's pandas canonicalizer cannot sort list cells, so the ENTRY
    posexplodes into scalar (vec_id, dim, proj) rows — doubles go through
    the harness's %.6f float normalization, same as every other query."""
    from persistor_spark.analytics import similarity

    projected = similarity.random_projection(
        _embs(spark, sf_dir), in_dim=64, out_dim=16, seed=7
    )
    return projected.select(
        "vec_id", F.posexplode("proj").alias("dim", "proj")
    ).orderBy("vec_id", "dim")


def _a46_dup_rate_by_source(spark, sf_dir):
    """Per-source exact-dup rate (global first-writer-wins, charged to the
    later copy's source): fingerprint-window + source rollup."""
    from persistor_spark.analytics import dedup

    return dedup.dup_rate_by_source(_docs(spark, sf_dir))


def _a47_temperature_mix(spark, sf_dir):
    """UniMax/mT5-style temperature mixture weights per source (alpha=0.3)
    with effective-epochs over-sampling diagnostic — corpus-size-independent
    aggregate."""
    from persistor_spark.analytics import sampling

    return sampling.temperature_mixture_weights(_docs(spark, sf_dir), alpha=0.3)


def _a48_shard_assign(spark, sf_dir):
    """Deterministic global shuffle + sharding (md5 hash order, per-shard
    rank) — the reproducible shuffle-before-training step."""
    from persistor_spark.analytics import sampling

    return sampling.shard_assignments(_docs(spark, sf_dir), n_shards=8, seed=7).orderBy(
        "doc_id"
    )


def _a49_ann_recall(spark, sf_dir):
    """ANN quality evaluation: recall@5 of a deliberately WEAK sign-LSH
    configuration (2 tables x 6 planes — too selective for full recall)
    against exact brute force.  The tuning harness every ANN deployment
    needs; the production configs (a6) are separately proven recall=1."""
    from persistor_spark.analytics import similarity

    embs = _embs(spark, sf_dir)
    q = embs.filter(F.col("vec_id") < 10)
    approx = similarity.cosine_lsh_topk(
        embs, q, k=5, n_planes=6, n_tables=2, seed=7
    )
    truth = similarity.brute_force_topk(embs, q, k=5)
    return similarity.topk_recall(approx, truth)


def _ann_recall_oracle() -> str:
    """DuckDB twin of a49: the SAME seeded hyperplanes as literal DOUBLE[]s
    (list_dot_product sign bits -> bucket ids), same candidate rule (same
    bucket in either table), same rounded-cosine rank, then recall vs the
    exact top-5."""
    from persistor_spark.analytics.similarity import _hyperplanes

    tables = [_hyperplanes(64, 6, 7 + 1000 * t) for t in range(2)]

    def bucket(col: str, planes) -> str:
        terms = [
            f"(CASE WHEN list_dot_product({col}, {json.dumps(p)}::DOUBLE[]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        ]
        return " + ".join(terms)

    cos = (
        "round(list_dot_product(qv, emb) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(emb, emb))), 4)"
    )
    return (
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
        f"b AS (SELECT vec_id, emb, {bucket('emb', tables[0])} AS b0, "
        f"  {bucket('emb', tables[1])} AS b1 FROM v), "
        "q AS (SELECT vec_id AS qid, emb AS qv, b0 AS qb0, b1 AS qb1 FROM b WHERE vec_id < 10), "
        "cand AS (SELECT DISTINCT q.qid, q.qv, b.vec_id, b.emb FROM q "
        "  JOIN b ON (b.b0 = q.qb0 OR b.b1 = q.qb1) AND b.vec_id <> q.qid), "
        f"s AS (SELECT qid AS query_id, vec_id, {cos} AS cos FROM cand), "
        "ap AS (SELECT query_id, vec_id FROM (SELECT *, "
        "  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s) "
        "  WHERE rk <= 5), "
        "tr AS (SELECT query_id, vec_id FROM (SELECT q.qid AS query_id, v.vec_id, "
        f"  {cos.replace('qv, emb', 'q.qv, v.emb').replace('qv, qv', 'q.qv, q.qv').replace('emb, emb', 'v.emb, v.emb')} AS cos, "
        "  row_number() OVER (PARTITION BY q.qid ORDER BY "
        f"  {cos.replace('qv, emb', 'q.qv, v.emb').replace('qv, qv', 'q.qv, q.qv').replace('emb, emb', 'v.emb, v.emb')} DESC, v.vec_id) AS rk "
        "  FROM q CROSS JOIN v WHERE v.vec_id <> q.qid) WHERE rk <= 5), "
        "h AS (SELECT tr.query_id, count(ap.vec_id) AS n_hits FROM tr "
        "  LEFT JOIN ap ON tr.query_id = ap.query_id AND tr.vec_id = ap.vec_id "
        "  GROUP BY tr.query_id) "
        "SELECT query_id, n_hits, round(n_hits::DOUBLE / 5, 4) AS recall "
        "FROM h ORDER BY query_id"
    )


def _a50_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 top-20 and exact-cosine top-20 fused by
    reciprocal-rank fusion (1/(60+rank), Cormack et al.) — the standard
    lexical+dense combination; fusion is a join of two bounded lists, so
    corpus scale only touches the ranking stages."""
    from persistor_spark.analytics import search, similarity

    idx = search.build_index(_docs(spark, sf_dir))
    bm = search.search(idx, _BM25_QUERY, k=20)
    ann = similarity.brute_force_topk(
        _embs(spark, sf_dir), _embs(spark, sf_dir).filter(F.col("vec_id") == 0), k=20
    )
    fused = search.rrf_fuse(
        [bm.select("id", "rank"), ann.select(F.col("vec_id").alias("id"), "rank")],
        k=10,
    )
    return fused.withColumn("rank", F.col("rank").cast("long")).orderBy("rank")


def _a51_vocab_coverage(spark, sf_dir):
    """Zipf head of the vocabulary with per-term and cumulative token share
    — the vocab-size/coverage curve; one vocab-bounded count shuffle, then
    a window over only the top-30 survivors."""
    from persistor_spark.analytics import text

    return text.vocab_coverage(_docs(spark, sf_dir), top_n=30).orderBy("rank")


def _a52_split_leakage(spark, sf_dir):
    """Train/val/test contamination audit: near-dup (Jaccard >= 0.8) pairs
    counted by the split pair their endpoints landed in — cross-split rows
    are evaluation leakage.  Reuses the a2 pair detection and the a39
    split map; the audit itself is two id-keyed joins + a 6-key groupBy."""
    from persistor_spark.analytics import dedup, sampling

    docs = _docs(spark, sf_dir)
    pairs = _shared_pairs(spark, sf_dir, 0.8)
    splits = sampling.assign_splits(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
    )
    return dedup.split_leakage(pairs, splits.select("doc_id", "split"))


def _a53_dup_substrings(spark, sf_dir):
    """Maximal duplicated-substring spans per doc (ExactSubstr-style
    output): corpus-duplicated 8-grams merged into maximal token intervals
    by per-doc gaps-and-islands — the span list a substring-dedup pass
    would cut."""
    from persistor_spark.analytics import dedup

    return dedup.duplicate_substring_intervals(
        _docs(spark, sf_dir), gram_len=8, min_count=2
    )


def _a81_exactsubstr_clean(spark, sf_dir):
    """ExactSubstr REMOVAL (the output Lee et al. 2022 actually ships):
    every maximal duplicated-substring span (a53's intervals) cut out of
    its document, surviving tokens reassembled in order.  One doc-keyed
    join + pure JVM array expressions — no Python, no per-token shuffle."""
    from persistor_spark.analytics import dedup

    return dedup.remove_duplicate_substrings(
        _docs(spark, sf_dir), gram_len=8, min_count=2
    )


def _a82_token_budget(spark, sf_dir):
    """Token-budget corpus selection: documents taken highest-quality-first
    until a 20k-token budget fills — the step that turns a scored pool into
    an actual training mix.  The global cumsum is two-level (range partition
    + literal prefix offsets + per-partition window), never a
    single-partition window."""
    from persistor_spark.analytics import sampling, text

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        text.quality_score("text").alias("score"),
        text.token_count("text").alias("n_tokens"),
    )
    return sampling.select_token_budget(docs, budget_tokens=20000)


def _a83_source_dup_matrix(spark, sf_dir):
    """Cross-source duplication matrix: near-dup (Jaccard >= 0.8) pair
    counts by canonical source pair — which feeds copy from which; reuses
    the a2 pair detection and the split_leakage join shape."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    pairs = _shared_pairs(spark, sf_dir, 0.8)
    return dedup.source_dup_matrix(pairs, docs.select("doc_id", "source"))


def _a84_novelty(spark, sf_dir):
    """Per-document novelty: fraction of each doc's distinct 8-grams not
    seen in any earlier doc (by id order) — the marginal-information curve
    of an ordered corpus.  Gram-keyed min-owner agg + self-join; shuffles
    track posting lists, never the corpus."""
    from persistor_spark.analytics import dedup

    return dedup.novelty_fraction(_docs(spark, sf_dir), gram_len=8)


def _a85_length_histogram(spark, sf_dir):
    """Per-source document-length histogram in log2 buckets (the dataset-
    report staple: length distribution shape per source).  One aggregation
    over one scan, output bounded by sources x ~64 buckets; bucket
    boundaries are powers of two, where IEEE log2 is exact in both engines,
    so floor() can't flip cross-engine."""
    docs = _docs(spark, sf_dir)
    b = F.floor(F.log2(F.col("n_chars"))).cast("long")
    return (
        docs.filter(F.col("n_chars") > 0)
        .groupBy(F.col("source"), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"))
        .withColumn("bucket_lo", F.pow(F.lit(2.0), F.col("bucket")).cast("long"))
        .select("source", "bucket", "bucket_lo", "n_docs", "min_chars", "max_chars")
        .orderBy("source", "bucket")
    )


def _a86_type_token_stats(spark, sf_dir):
    """Per-source vocabulary richness (Heaps-law inputs): total tokens,
    distinct tokens, and the type-token ratio — the cheap lexical-diversity
    read on each feed.  One explode + one agg; distinct is per-source
    vocab-bounded."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("t"))
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("t").alias("n_types"),
        )
        .withColumn(
            # UNROUNDED integer quotient (the e46 class)
            "ttr", F.col("n_types").cast("double") / F.col("n_tokens")
        )
        .orderBy("source")
    )


def _a87_split_balance(spark, sf_dir):
    """Split balance audit: after the a39 hash split, per-split doc count,
    token volume, and mean quality score — did the split skew size or
    quality?  Reuses assign_splits + the a75 score; one join + one agg."""
    from persistor_spark.analytics import sampling, text

    docs = _docs(spark, sf_dir)
    splits = sampling.assign_splits(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
    )
    scored = docs.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        text.quality_score("text").alias("score"),
    )
    return (
        scored.join(splits.select("doc_id", "split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("split")
    )


def _a88_dup_gram_report(spark, sf_dir):
    """Duplicated-passage provenance: the top-20 corpus-duplicated 8-grams
    by document frequency, with how many docs and distinct sources carry
    each — the review queue a53/a81's span cutting is justified by.
    One posting agg + TakeOrdered; ties broken on the gram string so the
    top-k is total-order deterministic."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    # the shared shingle helper (a78/a92/a110 use it too) — an inline copy
    # of its body here would silently diverge if the gram definition moves
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(dedup.shingles("text", 8)).alias("g"),
    )
    return (
        grams.groupBy("g")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("g"))
        .limit(20)
    )


def _a89_removal_impact(spark, sf_dir):
    """ExactSubstr removal impact by source: what fraction of each feed's
    tokens the a81 pass would cut — the per-source cost/benefit sheet for
    turning span removal on.  Composes remove_duplicate_substrings with a
    doc-keyed source join + one agg."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    cleaned = dedup.remove_duplicate_substrings(docs, gram_len=8)
    return (
        cleaned.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_removed").alias("n_removed"),
            F.count(F.when(F.col("n_removed") > 0, 1)).alias("n_docs_touched"),
            # UNROUNDED: exact integer sums make the quotient bit-identical
            # in both engines, while round() splits them on true decimal
            # halfway cases — integer denominators make those common, not
            # freak (r13 VERDICT #2, the e46 diagnosis)
            (
                F.sum("n_removed").cast("double") / F.sum("n_tokens")
            ).alias("removed_frac"),
        )
        .orderBy("source")
    )


def _a90_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility by source: BPE-ish subword count over whitespace
    word count — the metric that says how expensive each feed is per word
    under the target tokenizer (fertility ~1 = cheap English-like text,
    high = digits/punctuation-heavy).  Pure JVM expressions, one agg."""
    from persistor_spark.analytics import text

    docs = _docs(spark, sf_dir)
    per = docs.select(
        "source",
        text.token_count("text").alias("ws"),
        text.bpe_token_count("text").alias("bpe"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            # UNROUNDED integer-sum quotient: bit-identical in both engines,
            # where round() is halfway-split-prone (r13 VERDICT #2 / e46)
            (F.sum("bpe").cast("double") / F.sum("ws")).alias("fertility"),
        )
        .orderBy("source")
    )


def _a91_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-term sketch + mergeability (the a67 contract
    for distinct counts): per-half register tables (even-/odd-id docs)
    merged by register-wise MAX must equal the whole-corpus sketch, so the
    whole-corpus SQL rebuild is an exact oracle.  Shuffle bounded by 2^p
    registers regardless of corpus size; rho is computed with integer/
    string ops only (bin()), so both engines agree bit for bit."""
    from persistor_spark.analytics import sketches

    docs = _docs(spark, sf_dir)

    def regs(part):
        terms = part.select(F.explode(F.split("text", " ")).alias("term"))
        return sketches.hll_registers(terms, "term", p=8)

    merged = sketches.hll_merge(
        regs(docs.filter(F.col("doc_id") % 2 == 0)),
        regs(docs.filter(F.col("doc_id") % 2 == 1)),
    )
    return merged.select(
        "register", F.col("max_rho").cast("int").alias("max_rho")
    ).orderBy("register")


def _a92_bloom_decontaminate(spark, sf_dir):
    """Bloom-prefiltered decontamination: the a20 eval-overlap check with a
    broadcastable m-bit Bloom filter of the eval set's 5-grams in front —
    at 100 TB the filter (<= m bits) ships to executors instead of the eval
    gram table, and only maybe-hits reach the exact verify join.  Output:
    per corpus doc, gram count, Bloom maybe-hits, and the flag at >= 10%
    hit fraction.  False positives only (never negatives), and the hash
    family is md5-portable, so the SQL twin rebuilds the SAME filter."""
    from persistor_spark.analytics import dedup, sketches

    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id", F.explode(dedup.shingles("text", 5)).alias("gram")
    )
    bits = sketches.bloom_bits(
        grams.filter(F.col("doc_id") % 7 == 0).select("gram").distinct(),
        "gram",
        m_bits=4096,
        k=4,
    )
    corpus = grams.filter(F.col("doc_id") % 7 != 0)
    probed = sketches.bloom_probe(
        corpus.select("gram").distinct(), bits, "gram", m_bits=4096, k=4
    )
    per_doc = (
        corpus.join(probed, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("maybe_member"), 1)).alias("n_maybe_hits"),
        )
        .withColumn(
            "flagged", (F.col("n_maybe_hits") / F.col("n_grams")) >= 0.1
        )
    )
    return per_doc.orderBy("doc_id")


def _a93_containment(spark, sf_dir):
    """Directional near-superset pairs: shingle containment |A∩B|/|A| >=
    0.9 with a != b — the doc-inside-doc case symmetric Jaccard misses when
    the container is much larger.  Same posting-list join shape as a2.

    This entry runs UNCAPPED (max_doc_freq=None) because the oracle is the
    exact answer and the fixture has no hot shingles.  In production, set
    `max_doc_freq` (the a2-style hot-shingle cap; start around 1000): one
    boilerplate shingle shared by f documents contributes f² candidate
    rows, so an uncapped run on a crawl with headers/footers is quadratic
    in the hottest posting list.  Dropping shingles with df > cap can only
    LOWER a pair's measured containment (|A∩B| shrinks, |A| doesn't), so
    the capped result is a subset of the exact one — a recall/cost knob,
    never false positives.  ARCHITECTURE §6 records the measured blow-up."""
    from persistor_spark.analytics import dedup

    return dedup.containment_pairs(_docs(spark, sf_dir), 0.9).orderBy("a", "b")


def _e33_scd2(spark, sf_dir):
    """SCD-2 history build: per user, collapse the event stream into
    type-change intervals (valid_from/valid_to, open current row, version
    number) — the warehouse pattern for reconstructing state-as-of from an
    append-only log.  One window partition per user; no global sort."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("int").alias("version"),
        )
        .orderBy("user_id", "version")
    )


def _e34_band_join(spark, sf_dir):
    """Band join (|x - y| <= eps) WITHOUT a cross join: bucket acctbal by
    eps, explode each row into its {b-1, b, b+1} candidate buckets, equi-
    join on (nation, bucket), exact-filter the band — candidate volume
    tracks bucket occupancy, never n².  Output: per customer, how many
    same-nation customers sit within 1.00 of their balance."""
    from persistor_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    eps = 1.0
    # eps == 1.0 makes the bucket an exact decimal floor — no float
    # division anywhere, so bucket assignment can never disagree with the
    # exact band filter at the boundary
    bucket = F.floor(F.col("c_acctbal")).cast("long")
    left = cust.withColumn(
        "__b", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    )
    right = cust.select(
        F.col("c_nationkey").alias("r_nat"),
        bucket.alias("__b"),
        F.col("c_custkey").alias("r_key"),
        F.col("c_acctbal").alias("r_bal"),
    )
    pairs = left.join(
        right,
        (left["c_nationkey"] == right["r_nat"])
        & (left["__b"] == right["__b"])
        & (left["c_custkey"] != right["r_key"])
        & (F.abs(left["c_acctbal"] - right["r_bal"]) <= eps),
    )
    counts = pairs.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n_close"))
    return (
        cust.select("c_custkey")
        .join(counts, "c_custkey", "left")
        .select(
            "c_custkey", F.coalesce("n_close", F.lit(0)).cast("long").alias("n_close")
        )
        .orderBy("c_custkey")
    )


def _a94_power_iteration(spark, sf_dir):
    """Top principal axis of the embedding matrix (uncentered PCA /
    anisotropy direction) by 3 power-iteration rounds on X^T X — computed
    as one projection + one d-expression agg per round, never
    materializing the d x d Gram matrix; driver state is d floats.  The
    per-round rounding (sums to 4dp, direction to 6dp) pins every round's
    state bit-identically across engines, so the unrolled SQL twin is an
    exact oracle."""
    from persistor_spark.analytics import similarity

    v = similarity.power_iteration_direction(_embs(spark, sf_dir), iterations=3)
    return spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(v)], "dim int, weight double"
    )


def _power_iteration_oracle(iterations: int = 3, dim: int = 64) -> str:
    """DuckDB twin of a94: the same rounds unrolled as CTE chains, rounding
    at the same two points per round."""
    import math

    w0 = round(1.0 / math.sqrt(dim), 6)
    sql = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), ",
        f"x AS (SELECT vec_id, t.i, emb[t.i] AS val FROM e, generate_series(1, {dim}) AS t(i)), ",
        f"v0 AS (SELECT t.i, {w0!r} AS w FROM generate_series(1, {dim}) AS t(i)), ",
    ]
    for k in range(1, iterations + 1):
        sql.append(
            f"s{k} AS (SELECT x.vec_id, sum(x.val * v.w) AS s "
            f"  FROM x JOIN v{k - 1} v USING (i) GROUP BY x.vec_id), "
            f"u{k} AS (SELECT x.i, round(sum(x.val * s{k}.s), 4) AS su "
            f"  FROM x JOIN s{k} USING (vec_id) GROUP BY x.i), "
            f"n{k} AS (SELECT sqrt(sum(su * su)) AS nrm FROM u{k}), "
            f"v{k} AS (SELECT i, round(su / (SELECT nrm FROM n{k}), 6) AS w FROM u{k}), "
        )
    body = "".join(sql).rstrip().rstrip(",")
    return f"{body} SELECT i::INT AS dim, w AS weight FROM v{iterations} ORDER BY dim"


def _a54_boilerplate(spark, sf_dir):
    """Per-source boilerplate load: fraction of each doc's distinct
    3-grams appearing in >= 20% of its source's docs (CCNet/RefinedWeb
    domain-relative boilerplate heuristic)."""
    from persistor_spark.analytics import text

    return text.boilerplate_stats(
        _docs(spark, sf_dir), n=3, min_doc_frac=0.2
    ).orderBy("doc_id")


def _a55_ivfpq_persist(spark, sf_dir):
    """The a32 IVF-PQ search THROUGH a persisted index: build -> save to a
    parquet layout (cells partitioned by cid = on-disk inverted lists,
    probes prune partitions) -> load -> search.  Two SF-robust claims
    (r12 VERDICT #3): (1) `same_as_mem` — the saved+loaded index returns
    the IDENTICAL top-k to the in-memory index it was saved from, exact
    at any SF by construction (both sides run the same approximation);
    (2) the d46 recall-threshold form vs brute force (measured: 1.0/1.0
    at sf0.001 + sf0.01, min/mean 0.4/0.80 at sf0.1)."""
    import atexit
    import shutil
    import tempfile

    from persistor_spark.analytics import similarity

    embs = _cl_embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    idx = _shared_ivfpq8(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivfpq_idx_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    similarity.ivfpq_save(idx, path)
    loaded = similarity.ivfpq_load(spark, path)
    out = similarity.ivfpq_search(loaded, queries_df, k=5, nprobe=4, rerank_factor=24)
    out_mem = similarity.ivfpq_search(idx, queries_df, k=5, nprobe=4, rerank_factor=24)
    cols = ["query_id", "vec_id", "rank"]
    same = (
        out.select(*cols).exceptAll(out_mem.select(*cols)).count() == 0
        and out_mem.select(*cols).exceptAll(out.select(*cols)).count() == 0
    )
    truth = similarity.brute_force_topk(embs, queries_df, k=5).select(
        "query_id", "vec_id"
    )
    return _ann_threshold_rows(
        out, truth, k=5, floor_each=0.2, floor_mean=0.6
    ).withColumn("same_as_mem", F.lit(bool(same)))


def _a56_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank over the symmetric customer<->supplier
    interaction graph (distinct purchase relationships from orders x
    lineitem).  The iterative-join shape beyond connected components: each
    round is one shuffle join + one agg; the degree-joined edge table is
    checkpointed once.  Oracle: the same three iterations unrolled as
    DuckDB CTEs."""
    from persistor_spark.analytics import graph
    from persistor_spark.sources.registry import load_table

    edges = graph.bipartite_interaction_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    return graph.pagerank(edges, iterations=3)


def _a57_centroid_drift(spark, sf_dir):
    """Embedding-distribution drift: pairwise cosine between label centroids.
    Corpus reduces to G x d rows before the pairwise stage — the cross-
    source distribution audit at any scale."""
    from persistor_spark.analytics import similarity

    return similarity.centroid_drift(_embs(spark, sf_dir))


def _a58_skew_profile(spark, sf_dir):
    """Join/agg key-skew profile of lineitem.l_partkey: hottest keys +
    distribution stats in two shuffles — the measurement behind the
    salting/broadcast decisions (d21's skew-salted agg is the cure; this is
    the diagnosis)."""
    from persistor_spark.analytics import profiling
    from persistor_spark.sources.registry import load_table

    return profiling.key_skew_profile(
        load_table(spark, sf_dir, "lineitem"), "l_partkey", top_n=10
    )


def _a63_temperature_sample(spark, sf_dir):
    """Materialized temperature mixture: per-source targets from the a47
    weights (6-dp-rounded before the floor so pow() ULPs can't flip a
    count), drawn by per-source md5 rank.  total_n=173 exercises uneven
    allocation."""
    from persistor_spark.analytics import sampling

    out = sampling.temperature_sample(_docs(spark, sf_dir), total_n=173, alpha=0.3)
    return out.withColumn("sample_rank", F.col("sample_rank").cast("long")).orderBy(
        "doc_id"
    )


def _a64_decontaminate(spark, sf_dir):
    """Benchmark-decontamination REMOVAL: the a20 flag set applied as a
    broadcast anti-join, returning the clean corpus."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    clean = dedup.decontaminate(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        n=5,
    )
    return clean.select("doc_id", "source", "n_chars").orderBy("doc_id")


def _a61_unigram_kl(spark, sf_dir):
    """Distribution-shift audit: per-source KL(P_source || P_corpus) over
    unigram token distributions.  Corpus support is a superset of every
    source's, so no smoothing; shuffles are vocab-bounded."""
    from persistor_spark.analytics import text

    return text.unigram_kl_by_source(_docs(spark, sf_dir))


def _a62_dataset_card(spark, sf_dir):
    """One-row dataset-card rollup: doc/source/lang counts, exact-dup rate
    via distinct fingerprints, token volume, quality-gate pass rate — one
    aggregation over one scan."""
    from persistor_spark.analytics import profiling

    return profiling.dataset_card(_docs(spark, sf_dir))


def _a60_ivfpq_add(spark, sf_dir):
    """Incremental index maintenance (FAISS add()): train on the even-id
    half of the clustered corpus, append the odd-id half with the FROZEN
    quantizer/codebooks, search the union.  Verdict is the d46 threshold
    form at every SF (r12 VERDICT #3): recall@5 vs FULL-corpus brute
    force — every true neighbor reachable only through the added half
    counts, so a broken add() (dropped rows, unfrozen codebooks, wrong
    cell routing) collapses recall.  Measured: 1.0/1.0 at sf0.001 +
    sf0.01, min/mean 0.2/0.74 at sf0.1 (floors 0.2/0.5)."""
    from persistor_spark.analytics import similarity

    embs = _cl_embs(spark, sf_dir)
    idx = similarity.ivfpq_build(embs.filter(F.col("vec_id") % 2 == 0), n_centroids=8)
    idx = similarity.ivfpq_add(idx, embs.filter(F.col("vec_id") % 2 == 1))
    q = embs.filter(F.col("vec_id") < 10)
    out = similarity.ivfpq_search(idx, q, k=5, nprobe=4, rerank_factor=24)
    truth = similarity.brute_force_topk(embs, q, k=5).select("query_id", "vec_id")
    return _ann_threshold_rows(out, truth, k=5, floor_each=0.2, floor_mean=0.5)


def _a59_quality_funnel(spark, sf_dir):
    """Cumulative Gopher-rule funnel: per-stage entered/survivors/drop-rate
    from ONE aggregation pass (all cumulative conjunctions counted in a
    single agg, rows inlined from the one result row)."""
    from persistor_spark.analytics import text

    return text.quality_funnel(_docs(spark, sf_dir))


def _e35_equidepth_histogram(spark, sf_dir):
    """Global equi-depth (equal-height) histogram of order totals: 20
    buckets of equal row count with per-bucket bounds — the optimizer-
    statistics / data-profiling staple.  Bucketing is `sampling.
    ntile_exact` (bit-identical to a global ntile(20) window) so the plan
    is the two-level range-partition + literal-offsets shape with NO
    single-partition sort; the oracle keeps plain window ntile."""
    from persistor_spark.analytics.sampling import ntile_exact
    from persistor_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = ntile_exact(
        o, 20, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()], out_col="bucket"
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def _a95_source_entropy(spark, sf_dir):
    """Per-source token-distribution Shannon entropy (plus vocab size and
    token volume) — the corpus-diversity read on each feed: low entropy =
    templated/repetitive source, high = diverse.  H = log2(N) -
    sum(c*log2 c)/N over per-source term counts, so the shuffles are
    (source, term)- then source-keyed — bounded by vocab, never corpus² —
    and the entropy algebra avoids per-row p*log p underflow."""
    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    cnt = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("s"),
    )
    return per.select(
        "source",
        "vocab",
        F.col("n").alias("n_tokens"),
        F.round(F.log2("n") - F.col("s") / F.col("n"), 4).alias("entropy_bits"),
    ).orderBy("source")


def _a96_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirtakis A-Res): top-100 docs by key ln(u)/w with w = token count —
    sample-proportional-to-size selection for token-budget-aware corpus
    subsetting.  u is the engine-shared md5 hash-unit (seed 9), the key
    rounds to 8 dp with doc_id tiebreak so the cut line is representation-
    stable cross-engine; selection is a global top-k (TakeOrdered — no
    single-partition sort)."""
    from persistor_spark.analytics import text
    from persistor_spark.analytics.sampling import _hash_unit

    docs = _docs(spark, sf_dir).select(
        "doc_id", text.token_count("text").cast("double").alias("w")
    )
    key = F.round(F.log(_hash_unit(F.col("doc_id"), 9)) / F.col("w"), 8)
    return (
        docs.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(100)
        .select("doc_id", F.col("w").cast("long").alias("n_tokens"), "key")
    )


def _a97_sparse_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine near-dup pairs (threshold 0.5): the lexical-
    weighted similarity join complementing dense ANN and set Jaccard.
    Posting-list shape throughout; terms in more than half the corpus are
    dropped (near-zero idf anyway), which bounds the hot-list quadratic —
    the cap compares df*2 <= N in exact integers, so both engines drop
    the same terms."""
    from persistor_spark.analytics import similarity

    return similarity.tfidf_cosine_pairs(
        _docs(spark, sf_dir), 0.5
    ).orderBy("a", "b")


def _e36_graph_bfs(spark, sf_dir):
    """Multi-source BFS to depth 3 over the customer<->supplier purchase
    graph: minimum hop distance from the seed customers (c_custkey <= 3)
    — the reachability/impact query.  Frontier-expansion joins with
    visited anti-join pruning, rounds bounded by depth; oracle is the
    bounded recursive CTE with UNION dedup."""
    from persistor_spark.analytics import graph
    from persistor_spark.sources.registry import load_table

    edges = graph.bipartite_interaction_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"))
    )
    return graph.bfs_distances(edges, seeds, max_depth=3).orderBy("node")


def _d24_targeted_delete(spark, sf_dir):
    """Targeted delete (GDPR shape) against the persisted sorted-file +
    min/max-manifest index layout: build the d1-style layout in a tempdir,
    delete three unique_ids via `maintenance.delete_by_key` — which
    consults the manifest and REWRITES ONLY the files whose [min,max]
    range can contain a key — and return the surviving index.  At 10^6
    files a handful-of-ids delete touches a handful of files; the oracle
    is the plain anti-join semantics the rewrite must preserve."""
    import atexit
    import shutil
    import tempfile

    from persistor_spark.plans import layout, maintenance

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="del_layout_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table, mf = f"{root}/index", f"{root}/manifest"
    (
        t.index_metadata.repartitionByRange(8, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.mode("overwrite")
        .parquet(table)
    )
    layout.write_minmax_manifest(spark, table, mf)
    victims = ["b0_m000000004", "b1_m000000001", "b3_m000000123"]
    maintenance.delete_by_key(spark, table, mf, victims)
    return (
        spark.read.parquet(table)
        .select("unique_id", "broker_id", "location_key")
        .orderBy("unique_id")
    )


def _e37_mad_outliers(spark, sf_dir):
    """Robust per-source outlier profile: exact median and median absolute
    deviation of token counts, plus the count of docs beyond 3 MAD — the
    monitoring-grade length-anomaly read (median/MAD survive the heavy
    tails that wreck mean/stddev).  Exact interpolated percentiles on both
    engines; medians of integers land on .0/.5 so every comparison is
    float-exact.  Two grouped aggs + one broadcastable S-row join — no
    corpus-wide sort.  Production note: Spark's exact `percentile`
    buffers each group's values in the agg state, so at 100 TB swap it
    for `percentile_approx` (t-digest state, bounded memory) and accept
    the approximation — the oracle here pins the exact variant."""
    from persistor_spark.analytics import text

    docs = _docs(spark, sf_dir).select(
        "source", text.token_count("text").cast("double").alias("tc")
    )
    med = docs.groupBy("source").agg(F.expr("percentile(tc, 0.5)").alias("med"))
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("tc") - F.col("med"))
    )
    return (
        dev.groupBy("source")
        .agg(
            F.min("med").alias("median_tc"),
            F.expr("percentile(adev, 0.5)").alias("mad_tc"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .join(
            dev.groupBy("source")
            .agg(F.expr("percentile(adev, 0.5)").alias("__mad"))
            .join(dev, "source")
            .filter(F.col("adev") > 3 * F.col("__mad"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_outliers")),
            "source",
            "left",
        )
        .select(
            "source",
            "median_tc",
            "mad_tc",
            "n_docs",
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
        .orderBy("source")
    )


def _e37b_approx_percentile(spark, sf_dir):
    """The PRODUCTION twin of e37 (r6 VERDICT #5 — previously a docstring
    pointer): per-source median / MAD via `percentile_approx` (t-digest /
    Greenwald-Khanna state, BOUNDED memory per agg group), which is what a
    100 TB deployment must run instead of e37's exact `percentile` (whose
    agg state buffers every group value).

    Oracle shape (tolerance-banded): an approximate answer can't be
    hash-pinned value-for-value, so the TOLERANCE CHECK runs Spark-side —
    for each group the query counts the empirical rank of the returned
    approx median/MAD and emits whether it sits within the GK rank-error
    bound (1/accuracy, plus slack for ties).  DuckDB pins the group keys,
    exact doc counts, and the guaranteed all-true outcome.  A broken
    percentile_approx (rank error beyond its contract) flips a boolean and
    fails the hash."""
    from persistor_spark.analytics import text

    acc, tol = 1000, 0.002  # GK rank error <= 1/acc; 2x slack
    docs = _docs(spark, sf_dir).select(
        "source", text.token_count("text").cast("double").alias("tc")
    )
    med = docs.groupBy("source").agg(
        F.percentile_approx("tc", 0.5, acc).alias("med_a"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("tc") - F.col("med_a"))
    )
    mad = dev.groupBy("source").agg(
        F.percentile_approx("adev", 0.5, acc).alias("mad_a")
    )
    # empirical rank of the approx statistic inside its own group: the
    # returned value is a real data point, so rank-below / rank-at-or-below
    # bracket the mass; within tolerance iff the 0.5 target falls in
    # [frac_lt - tol, frac_le + tol]
    checked = (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            (F.sum((F.col("tc") < F.col("med_a")).cast("long"))
             / F.count(F.lit(1))).alias("med_lt"),
            (F.sum((F.col("tc") <= F.col("med_a")).cast("long"))
             / F.count(F.lit(1))).alias("med_le"),
            (F.sum((F.col("adev") < F.col("mad_a")).cast("long"))
             / F.count(F.lit(1))).alias("mad_lt"),
            (F.sum((F.col("adev") <= F.col("mad_a")).cast("long"))
             / F.count(F.lit(1))).alias("mad_le"),
        )
    )
    within = lambda lt, le: (  # noqa: E731
        (F.col(lt) - F.lit(tol) <= F.lit(0.5)) & (F.lit(0.5) <= F.col(le) + F.lit(tol))
    )
    return checked.select(
        "source",
        "n_docs",
        within("med_lt", "med_le").alias("median_within_tol"),
        within("mad_lt", "mad_le").alias("mad_within_tol"),
    ).orderBy("source")


def _a98_zipf_slope(spark, sf_dir):
    """Zipf-law fit per source: least-squares slope of ln(freq) on
    ln(rank) over the top-100 terms — natural text sits near -1, templated
    or synthetic feeds drift off it.  The ranking window runs on the
    vocab-bounded count table (partitioned by source), and the fit is the
    built-in regr_slope aggregate — cost tracks vocab, never the corpus."""
    from pyspark.sql import Window

    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    cnt = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("t").asc())
    top = cnt.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 100)
    return (
        top.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.regr_slope(F.log("c"), F.log("rank")), 4).alias("zipf_slope"),
        )
        .orderBy("source")
    )


def _a99_triangle_count(spark, sf_dir):
    """Per-document triangle participation in the near-dup graph (Jaccard
    >= 0.7): the clustering-structure audit — triangles mean dup CLUSTERS,
    bare edges mean pairwise coincidences.  Ordered-edge triangle join
    (a < b < c, two hash joins over the pair list, never the corpus);
    reuses the session-shared a2 pair detection."""
    pairs = _shared_pairs(spark, sf_dir, 0.7).select("a", "b")
    p2 = pairs.select(F.col("a").alias("p2a"), F.col("b").alias("p2b"))
    p3 = pairs.select(F.col("a").alias("p3a"), F.col("b").alias("p3b"))
    tri = (
        pairs.join(p2, F.col("b") == F.col("p2a"))
        .join(p3, (F.col("a") == F.col("p3a")) & (F.col("p2b") == F.col("p3b")))
        .select("a", "b", F.col("p2b").alias("c"))
    )
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
    return (
        nodes.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("doc_id")
    )


def _e38_datetime_suite(spark, sf_dir):
    """Date/time function coverage over order dates — the same calendar
    arithmetic the blob-naming masks run (T4's year/month/day path
    building): per month, order count, first/last date, month-end, and
    the day span.  One month-keyed agg; output bounded by the calendar."""
    from persistor_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("d"), "o_orderkey"
    )
    return (
        o.groupBy(F.to_date(F.date_trunc("month", F.col("d"))).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("d").alias("first_order"),
            F.max("d").alias("last_order"),
            F.date_diff(F.max("d"), F.min("d")).alias("span_days"),
        )
        .withColumn("month_end", F.last_day(F.col("month")))
        .withColumn("quarter", F.quarter("month"))
        .select(
            "month", "quarter", "month_end", "n_orders", "first_order",
            "last_order", "span_days",
        )
        .orderBy("month")
    )


def _e39_json_extract(spark, sf_dir):
    """JSON extraction over the events props column — the engine-side
    analogue of the reference's strict JSON metadata decode (T7,
    indexer/transform.go): pull $.k out of every event's JSON payload,
    validate it parsed, and profile per event type.  get_json_object is a
    narrow per-row expression; the agg is type-bounded."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_parsed"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def _a100_epoch_upsample(spark, sf_dir):
    """Epoch-based upsampling (the data-mixing step that repeats
    under-represented sources): each source gets 1-3 epochs from a
    deterministic md5 bucket, and every doc materializes one row per
    epoch via a sequence explode — narrow fan-out, no shuffle until the
    consumer.  Returns the materialized (doc_id, source, epoch) plan."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    epochs = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 2), 16, 10).cast("long") % 3 + 1
    )
    return (
        docs.withColumn("n_epochs", epochs)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("n_epochs"))))
        .select("doc_id", "source", F.col("epoch").cast("int").alias("epoch"))
        .orderBy("doc_id", "epoch")
    )


def _e40_array_functions(spark, sf_dir):
    """Higher-order array function coverage over the embedding vectors:
    per vector, L2 norm via F.aggregate, element min/max/mean, and the
    positive-element count via F.filter — all narrow per-row expressions
    that pipeline with the scan (the building blocks the ANN family
    composes)."""
    v = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    l2 = F.sqrt(
        F.aggregate("e", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # `+ 0.0` after every round: IEEE -0.0 formats as "-0.000000" in the
    # driver's hasher while comparing == 0.0, so a tiny negative mean that
    # rounds to zero would hash-differ cross-engine; adding +0.0 maps -0.0
    # to +0.0 identically in both engines
    return v.select(
        "vec_id",
        (F.round(l2, 4) + F.lit(0.0)).alias("l2_norm"),
        (F.round(F.array_min("e"), 4) + F.lit(0.0)).alias("min_v"),
        (F.round(F.array_max("e"), 4) + F.lit(0.0)).alias("max_v"),
        (
            F.round(F.aggregate("e", F.lit(0.0), lambda a, x: a + x) / F.size("e"), 4)
            + F.lit(0.0)
        ).alias("mean_v"),
        F.size(F.filter("e", lambda x: x > 0)).alias("n_pos"),
    ).orderBy("vec_id")


def _a101_k_anonymity(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers (lang, source, log2 length
    bucket): equivalence classes with fewer than k=5 members are
    re-identification risks a privacy-aware corpus release must suppress
    or generalize.  One grouped count + a bounded class-level agg — the
    privacy twin of the a85 histogram."""
    docs = _docs(spark, sf_dir)
    b = F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)))).cast("long")
    classes = docs.groupBy(
        "lang", "source", b.alias("len_bucket")
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.withColumn("at_risk", F.col("class_size") < 5)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("at_risk"), 1).otherwise(0)).alias("n_risky_classes"),
            F.sum(F.when(F.col("at_risk"), F.col("class_size")).otherwise(0)).alias(
                "n_risky_docs"
            ),
            F.min("class_size").alias("min_class_size"),
        )
        .orderBy("lang")
    )


def _e41_upsert_merge(spark, sf_dir):
    """Upsert / MERGE semantics (last-writer-wins by key): the even-id
    half of the index is the base table, rows with msg number % 3 == 0
    arrive as updates with a bumped confirmation flag; the merge keeps
    exactly one row per unique_id preferring the update — the Delta MERGE
    shape as a full-outer coalesce, one key-partitioned join, no sort."""
    t = _tables(spark, sf_dir)
    msgnum = F.substring("broker_msg_id", 2, 20).cast("long")
    base = t.index_metadata.filter(msgnum % 2 == 0).select(
        "unique_id", "broker_id", F.col("confirmation_flag").alias("flag")
    )
    updates = t.index_metadata.filter(msgnum % 3 == 0).select(
        "unique_id", "broker_id", F.lit(True).alias("flag")
    )
    merged = base.alias("b").join(updates.alias("u"), "unique_id", "full_outer").select(
        "unique_id",
        F.coalesce(F.col("u.broker_id"), F.col("b.broker_id")).alias("broker_id"),
        F.coalesce(F.col("u.flag"), F.col("b.flag")).alias("flag"),
        F.col("u.unique_id").isNotNull().alias("updated"),
    )
    return merged.orderBy("unique_id")


def _e42_revenue_share(spark, sf_dir):
    """Contribution analysis (ratio-to-report): per-nation revenue share
    of its region and rank within region, from one customer x orders join
    + region-partitioned windows — the percent-of-total reporting shape.
    Windows partition by region (bounded groups), never globally.

    SF-robust form (r13 VERDICT #2, the e46 halfway-case diagnosis):
    revenue sums in exact DECIMAL(18,2) (o_totalprice is cents-valued,
    the cast is exact) and the region denominator is the DECIMAL sum
    over the window — so both operands of the share division are
    bit-identical doubles in each engine and the UNROUNDED quotient is
    too, while round() would split the engines on true decimal halfway
    cases."""
    from pyspark.sql import Window

    from persistor_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.sum(_dec_exact(F.col("o_totalprice"), "decimal(18,2)")).alias(
                "rev_dec"
            )
        )
    )
    w = Window.partitionBy("n_regionkey")
    wr = Window.partitionBy("n_regionkey").orderBy(
        F.col("rev_dec").desc(), F.col("n_name").asc()
    )
    return (
        rev.withColumn(
            "share",
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double"),
        )
        .withColumn("rank_in_region", F.row_number().over(wr))
        .select(
            "n_regionkey",
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "share",
            "rank_in_region",
        )
        .orderBy("n_regionkey", "n_name")
    )


def _a102_term_churn(spark, sf_dir):
    """Vocabulary churn between corpus halves (even vs odd doc ids as
    snapshot stand-ins): per-term frequency delta, top-30 movers by
    absolute change with deterministic tiebreak — the drift detector for
    a feed's language shifting between crawls.  Vocab-bounded counts,
    one full-outer term join, TakeOrdered head."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("even"),
        F.explode(F.split("text", " ")).alias("t"),
    )
    old = toks.filter("even").groupBy("t").agg(F.count(F.lit(1)).alias("c_old"))
    new = toks.filter(~F.col("even")).groupBy("t").agg(
        F.count(F.lit(1)).alias("c_new")
    )
    return (
        old.join(new, "t", "full_outer")
        .select(
            "t",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
        .withColumn("delta", F.col("c_new") - F.col("c_old"))
        .orderBy(F.abs("delta").desc(), F.col("t").asc())
        .limit(30)
    )


def _e43_rolling_distinct(spark, sf_dir):
    """Trailing 7-day distinct users per day — the rolling-retention /
    active-user metric that resists plain windowing because DISTINCT
    doesn't decompose over frames.  Exact contribution form: each
    (day, user) row fans out to the <=7 grid days it contributes to
    (narrow sequence explode), one distinct + one count shuffle — no
    range join, no BroadcastNestedLoop, cost tracks days x daily actives."""
    ev = _events(spark, sf_dir)
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "gday"
        ),
        "user_id",
    ).distinct()
    days = du.select(F.col("day").alias("gday")).distinct()
    return (
        contrib.join(days, "gday")
        .groupBy("gday")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .orderBy("gday")
    )


def _d25_replay_estimate(spark, sf_dir):
    """Resubmit dry-run estimate: before running a replay, how many
    messages, how many blob fetches, and how many payload bytes will this
    filter touch?  One metadata filter + one id-keyed join + one agg —
    the ops pre-flight a real resubmitter UI shows before the expensive
    fetch fan-out."""
    t = _tables(spark, sf_dir)
    meta = t.index_metadata.filter(F.col("broker_id") == "b1")
    joined = meta.join(
        t.blob_records.select(F.col("record_id").alias("unique_id"), "payload"),
        "unique_id",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.count_distinct("location_key").alias("n_blobs"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
    )


def _d26_blob_skew_report(spark, sf_dir):
    """Blob-layout skew report: per-blob record/byte stats rolled into one
    row (min/max/avg records, max-over-avg skew factor) — the write-path
    health check that catches a hot version key producing one giant blob.
    Two bounded aggs (per-blob, then scalar)."""
    t = _tables(spark, sf_dir)
    per = t.blob_records.groupBy("location_key").agg(
        F.count(F.lit(1)).alias("n_recs"),
        F.sum(F.octet_length("payload")).alias("n_bytes"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.min("n_recs").alias("min_recs"),
        F.max("n_recs").alias("max_recs"),
        # UNROUNDED: avg-of-integers = exact-sum/count, so both it and the
        # max/avg quotient are bit-identical doubles (the e46 class)
        F.avg("n_recs").alias("avg_recs"),
        F.max("n_bytes").alias("max_bytes"),
        (F.max("n_recs") / F.avg("n_recs")).alias("skew_factor"),
    )


def _a103_dup_pair_qa_sample(spark, sf_dir):
    """Deterministic QA sample of near-dup pairs: 20 pairs drawn by the
    engine-shared md5 hash-unit over the pair key, with 40-char snippets
    of both sides — the human-review queue every dedup rollout feeds.
    Reuses the session-shared pair list; the sample is a bounded
    TakeOrdered, snippets attach via two id-keyed joins."""
    from persistor_spark.analytics.sampling import _hash_unit

    pairs = _shared_pairs(spark, sf_dir, 0.8).select("a", "b", "jaccard")
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.substring("text", 1, 40).alias("snippet")
    )
    key = F.round(
        _hash_unit(F.concat_ws("_", F.col("a"), F.col("b")), 7), 8
    )
    return (
        pairs.withColumn("qa_key", key)
        .orderBy(F.col("qa_key").asc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
        .join(docs.select(F.col("doc_id").alias("a"), F.col("snippet").alias("snippet_a")), "a")
        .join(docs.select(F.col("doc_id").alias("b"), F.col("snippet").alias("snippet_b")), "b")
        .select("a", "b", "jaccard", "qa_key", "snippet_a", "snippet_b")
        .orderBy("qa_key", "a", "b")
    )


def _a104_reshard_moves(spark, sf_dir):
    """Consistent-hash resharding audit: when the shard count changes
    8 -> 10, which documents move?  The (old_shard, new_shard) move
    matrix with counts — the data-migration cost estimate before a
    repartition of a 100 TB corpus.  Narrow md5 maps + one bounded
    (8 x 10) agg."""
    docs = _docs(spark, sf_dir).select("doc_id")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("s_"), F.col("doc_id"))), 1, 15), 16, 10).cast(
        "long"
    )
    return (
        docs.withColumn("shard_old", (h % 8).cast("int"))
        .withColumn("shard_new", (h % 10).cast("int"))
        .groupBy("shard_old", "shard_new")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("moved", F.col("shard_old") != F.col("shard_new"))
        .orderBy("shard_old", "shard_new")
    )


def _d27_table_checksum(spark, sf_dir):
    """Order-insensitive per-broker table checksum: XOR + SUM + COUNT of a
    60-bit md5 row digest over the canonical index projection — the
    replication/migration verification primitive (two stores agree iff
    their checksums agree, no row shipping).  One map + one bounded agg;
    commutative combiners, so the same number at any partitioning."""
    t = _tables(spark, sf_dir)
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", "unique_id", "broker_id", "location_key",
                    F.coalesce(F.col("location_position").cast("string"), F.lit("")),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        t.index_metadata.select("broker_id", digest.alias("d"))
        # sum the digest MOD 1e9+7: the raw 60-bit digests overflow an
        # ANSI long sum within ~10^4 rows; the xor (overflow-free,
        # commutative) is the primary checksum, the modular sum is the
        # secondary.  At extreme row counts re-mod the partial sums.
        .withColumn("d", F.col("d") % F.lit(1000000007))
        .groupBy("broker_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("d").alias("sum_digest"),
            # bit_xor is a true partial aggregate (map-side combinable) —
            # never a collect_list
            F.bit_xor("d").alias("xor_digest"),
        )
        .orderBy("broker_id")
    )


def _a105_lang_purity(spark, sf_dir):
    """Per-source language purity: how monolingual is each feed?  Detected-
    language count, majority language (deterministic tiebreak), and the
    majority share — the mixed-language-feed detector a multilingual
    curation run uses to route sources to per-language pipelines.  One
    (source, lang)-bounded agg + one source-bounded rollup."""
    from pyspark.sql import Window

    from persistor_spark.analytics import text

    docs = _docs(spark, sf_dir).select(
        "source", text.detect_language("text").alias("det")
    )
    counts = docs.groupBy("source", "det").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("det").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.when(F.col("rn") == 1, F.col("det"))).alias("majority_lang"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("majority_n"),
        )
        .withColumn(
        # UNROUNDED integer quotient (the e46 class)
        "purity", F.col("majority_n").cast("double") / F.col("n_docs")
    )
        .select("source", "n_docs", "n_langs", "majority_lang", "purity")
        .orderBy("source")
    )


def _e44_user_mode(spark, sf_dir):
    """Per-user modal event type with deterministic tie-break (most
    frequent; ties to the lexically first type) — mode as a
    max-over-struct aggregate, one user-keyed shuffle, no window."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    # mode = the (c, type) pair maximal by count then REVERSED lexical
    # order, so the lexically-first type wins ties under max(); encode the
    # tiebreak by negating nothing — use min over (-c, event_type)
    return (
        counts.groupBy("user_id")
        .agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("event_type").alias("t")))
            .alias("m")
        )
        .select(
            "user_id",
            F.col("m.t").alias("modal_type"),
            (-F.col("m.nc")).cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


def _a106_transitivity_gap(spark, sf_dir):
    """Transitivity-gap audit of the near-dup graph: open wedges a-b-c
    (edges a-b and b-c, no a-c) counted per hinge node b, with the node's
    closure rate — how far the 0.8-Jaccard relation is from an
    equivalence relation, i.e. how much damage single-link clustering can
    do.  Two pair-list joins (wedges) + one semi-join (closures); never
    touches the corpus.  Scale note: wedge volume is sum_h deg(h)^2, so a
    hub document (a near-dup of thousands) dominates — in production cap
    the neighbor list per hinge (top-k by similarity) before the wedge
    join, the same hot-key discipline as a93's max_doc_freq; uncapped
    here because the oracle is exact and the fixture has no hubs."""
    pairs = _shared_pairs(spark, sf_dir, 0.8).select("a", "b")
    # undirected adjacency
    adj = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # wedges centered at `h`: neighbors x < y of h
    nb = adj.select(F.col("a").alias("h"), F.col("b").alias("n"))
    wedges = (
        nb.select("h", F.col("n").alias("x"))
        .join(nb.select(F.col("h").alias("h"), F.col("n").alias("y")), "h")
        .filter(F.col("x") < F.col("y"))
    )
    closed = wedges.join(
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_semi"
    ).groupBy("h").agg(F.count(F.lit(1)).alias("n_closed"))
    total = wedges.groupBy("h").agg(F.count(F.lit(1)).alias("n_wedges"))
    return (
        total.join(closed, "h", "left")
        .select(
            F.col("h").alias("doc_id"),
            "n_wedges",
            F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
            F.round(
                F.coalesce("n_closed", F.lit(0)) / F.col("n_wedges"), 4
            ).alias("closure_rate"),
        )
        .orderBy("doc_id")
    )


def _a107_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup (Hernandez-Stolfo merge/purge): sort on
    the text's 20-char prefix, compare each doc to its 10 successors,
    keep Jaccard >= 0.5.  Candidate volume is EXACTLY n*w independent of
    key skew — the deterministic-cost complement to LSH (a3), at the
    recall cost of prefix-distant dups.  Global ranks via the two-level
    range-partition primitive (no SinglePartition window); candidates are
    a rank-block equi-join."""
    from persistor_spark.analytics import dedup

    return dedup.sorted_neighborhood_pairs(
        _docs(spark, sf_dir), window=10, threshold=0.5
    ).orderBy("a", "b")


def _a108_basket_rules(spark, sf_dir):
    """Market-basket association rules over order baskets: item pairs
    co-bought in >= 3 orders with support / directional confidence /
    lift — the a-priori pairwise stage.  Basket-keyed self-join bounded
    by basket size (never corpus-quadratic), map-side-combinable counts,
    broadcast item marginals."""
    from persistor_spark.analytics import profiling
    from persistor_spark.sources.registry import load_table

    return profiling.market_basket_rules(
        load_table(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_pair_count=3,
    ).orderBy("p1", "p2")


def _a109_edit_distance_join(spark, sf_dir):
    """Levenshtein-bounded fuzzy self-join: typo-level duplicate
    prefixes (40 chars, distance <= 8) found via (first-token, length
    band) blocking — candidates are a pure equi-join (band probe is a
    3-way explode, not a range predicate), exact edit distance only on
    candidates.  Word-order-sensitive where shingle Jaccard is not."""
    from persistor_spark.analytics import dedup

    return dedup.edit_distance_pairs(
        _docs(spark, sf_dir), max_dist=8
    ).orderBy("a", "b")


def _e45_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the event stream: P(next
    type | type) from consecutive per-user events (ts, event_id total
    order).  One per-user-partitioned lead window + one (from, to)
    bounded agg + broadcast row marginals — the session-behavior model
    behind funnel (e27) and next-event prediction."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            # UNROUNDED integer quotient (the e46 class)
            (F.col("n").cast("double") / F.col("tot")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


def _dec_exact(col, dectype: str):
    """Cast to exact decimal, FAILING LOUDLY on overflow: Spark in
    non-ANSI mode returns silent NULL when a value exceeds the decimal's
    integral capacity (DuckDB errors), so a larger-SF fixture overflowing
    e.g. decimal(12,6)'s |x| < 10^6 bound would otherwise surface as a
    confusing NULL-row oracle mismatch (r13 ADVICE).  The guard is a
    per-row JVM-side branch — no extra job, and the non-overflow output
    is exactly the bare cast the exactness proofs reason about."""
    c = col.cast(dectype)
    return F.when(
        col.isNotNull() & c.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"decimal overflow casting to {dectype}: "),
                col.cast("string"),
            )
        ).cast(dectype),
    ).otherwise(c)


def _e46_time_weighted_avg(spark, sf_dir):
    """Per-user time-weighted average event value: each value holds until
    the user's next event; weight = whole seconds held (integer in both
    engines: floor-epoch difference).  The irregular-sampling average
    (billing meters, position marks) a plain AVG mis-states.  One lead
    window per user + one user-keyed agg.

    SF-robust summation (r12 VERDICT #2): the weighted sum runs in exact
    DECIMAL so shuffle/summation ORDER cannot flip the 4th rounded digit
    (the r12 sf0.1 sweep caught a 1-in-1500-row last-digit flip from
    float summation order).  `value` is a 2-dp double fixture column, so
    decimal(12,6) casts are exact; decimal(12,6) x decimal(12,0) =
    decimal(25,6) multiplies and their sums are exact in BOTH engines;
    only the final division runs in float, on identical inputs.  The
    averages are emitted UNROUNDED: engines disagree on true decimal
    halfway cases (diagnosed at sf0.01: plain_avg = 4005.54/80 =
    50.069250 exactly — Spark's round() sees the shortest repr and
    rounds up, DuckDB rounds the binary double down), while identical
    input doubles make the raw quotient bit-identical everywhere."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = (
        ev.withColumn("nxt", F.lead("ts").over(w))
        .filter(F.col("nxt").isNotNull())
        .withColumn(
            "dt", (F.unix_timestamp("nxt") - F.unix_timestamp("ts")).cast("long")
        )
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("held_seconds"),
            (
                F.sum(
                    _dec_exact(F.col("value"), "decimal(12,6)")
                    * _dec_exact(F.col("dt"), "decimal(12,0)")
                ).cast("double")
                / F.sum("dt")
            ).alias("twa_value"),
            (
                F.sum(_dec_exact(F.col("value"), "decimal(12,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("plain_avg"),
        )
        .orderBy("user_id")
    )


def _a110_heaps_curve(spark, sf_dir):
    """Vocabulary-growth (Heaps-law) curve: corpus split into 10 equal
    doc-count buckets in doc_id order; each distinct 3-gram shingle is
    charged to the bucket where it FIRST appears; per-bucket new grams +
    running total.  The curve data-mixing reads to see whether more of a
    source still buys new content.  Bucket assignment via `ntile_exact`
    (no SinglePartition); first-owner = min(doc_id) per gram (map-side
    combinable); the running total is a triangular self-join of the
    10-row bucket aggregate (bounded by bucket count squared, never the
    corpus — no global window, so no SinglePartition anywhere)."""
    from persistor_spark.analytics import dedup
    from persistor_spark.analytics.sampling import ntile_exact

    docs = _docs(spark, sf_dir)
    buckets = ntile_exact(docs.select("doc_id"), 10, ["doc_id"], "bucket")
    grams = docs.select(
        "doc_id", F.explode(dedup.shingles("text", 3)).alias("gram")
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    new_per = (
        first.join(
            buckets.select(F.col("doc_id").alias("first_doc"), "bucket"), "first_doc"
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_grams"))
    )
    n_docs = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    per = (
        n_docs.join(new_per, "bucket", "left")
        .withColumn("new_grams", F.coalesce("new_grams", F.lit(0).cast("long")))
    )
    prior = per.select(F.col("bucket").alias("b2"), F.col("new_grams").alias("g2"))
    return (
        per.join(F.broadcast(prior), F.col("b2") <= F.col("bucket"))
        .groupBy("bucket", "n_docs", "new_grams")
        .agg(F.sum("g2").alias("cum_grams"))
        .select("bucket", "n_docs", "new_grams", "cum_grams")
        .orderBy("bucket")
    )


def _a111_skipgram_cooccurrence(spark, sf_dir):
    """Skip-gram co-occurrence counts (word2vec/GloVe first stage): top 30
    unordered token pairs co-occurring within 3 positions.  The window
    join is an EQUI-join — each position explodes to its 3 target
    offsets and joins (doc_id, pos) exactly, never a per-doc range
    predicate — so fan-out is exactly 3n and Catalyst plans a hash
    join.  Output bounded by TakeOrdered."""
    docs = _docs(spark, sf_dir)
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    lefts = pos.select(
        "doc_id",
        F.col("w").alias("wa"),
        F.explode(
            F.array(F.col("pos") + 1, F.col("pos") + 2, F.col("pos") + 3)
        ).alias("tpos"),
    )
    rights = pos.select("doc_id", F.col("pos").alias("tpos"), F.col("w").alias("wb"))
    return (
        lefts.join(rights, ["doc_id", "tpos"])
        .groupBy(
            F.least("wa", "wb").alias("w1"), F.greatest("wa", "wb").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(30)
    )


def _a112_term_burstiness(spark, sf_dir):
    """Church-Gale term burstiness: variance-to-mean ratio of per-doc
    term counts (zeros included via exact integer sums over all N docs).
    Bursty terms concentrate in few docs (content words); VMR ~ 1 means
    Poisson scatter (function words) — the signal behind stopword-list
    induction and TF-IDF sanity checks.  All inputs are exact integer
    aggregates (sum c, sum c^2, df), so the double expression is
    order-independent and cross-engine stable."""
    docs = _docs(spark, sf_dir)
    n_docs = float(docs.count())
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = tf.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    nn = F.lit(n_docs)
    mean = F.col("sc") / nn
    vmr = (F.col("sc2") / nn - mean * mean) / mean
    return (
        stats.filter(F.col("df") >= 20)
        .select(
            F.col("w").alias("term"),
            "df",
            F.col("sc").alias("total_n"),
            F.round(vmr, 4).alias("vmr"),
        )
        .orderBy(F.col("vmr").desc(), "term")
        .limit(30)
    )


def _e47_weekly_churn(spark, sf_dir):
    """Weekly active users, retained (also active the following week) and
    churned, per ISO week — the product-health counterpart of cohort
    retention (e28).  Distinct (week, user) grid + one self-join shifted
    by 7 days; weeks without a successor week in the data are excluded
    (their churn is right-censored, not real)."""
    ev = _events(spark, sf_dir)
    wu = ev.select(
        F.date_trunc("week", F.col("ts")).alias("week"), "user_id"
    ).distinct()
    # the same grid shifted back one week: membership = "active next week"
    nxt = wu.select(
        (F.col("week") - F.expr("INTERVAL 7 DAYS")).alias("week"), "user_id"
    )
    weeks = wu.select("week").distinct()
    observable = weeks.join(nxt.select("week").distinct(), "week", "left_semi")
    base = wu.join(F.broadcast(observable), "week", "left_semi")
    active = base.groupBy("week").agg(F.count(F.lit(1)).alias("active"))
    retained = (
        base.join(nxt, ["week", "user_id"], "left_semi")
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    return (
        active.join(retained, "week", "left")
        .withColumn("retained", F.coalesce("retained", F.lit(0)))
        .select(
            "week",
            "active",
            "retained",
            (F.col("active") - F.col("retained")).alias("churned"),
            F.round(
                (F.col("active") - F.col("retained")) / F.col("active"), 4
            ).alias("churn_rate"),
        )
        .orderBy("week")
    )


def _d28_storage_tiering(spark, sf_dir):
    """Storage lifecycle plan: blobs classified hot / warm / cold by age
    of their NEWEST record relative to the table's max ingestion time
    (no wall clock — deterministic), with per-tier blob / message / byte
    totals.  The pre-flight for a tiering policy (hot on SSD, cold to
    archive class): one bounded agg per blob + a broadcast scalar + a
    3-row rollup."""
    t = _tables(spark, sf_dir)
    max_t = t.index_metadata.agg(F.max("ingestion_time")).collect()[0][0]
    blob_age = t.index_metadata.groupBy("location_key").agg(
        F.max("ingestion_time").alias("newest"),
        F.count(F.lit(1)).alias("n_msgs"),
    )
    blob_bytes = t.blob_records.groupBy("location_key").agg(
        F.sum(F.octet_length("payload")).alias("n_bytes")
    )
    age_days = F.datediff(F.lit(max_t), F.col("newest"))
    tier = (
        F.when(age_days <= 7, F.lit("1_hot"))
        .when(age_days <= 21, F.lit("2_warm"))
        .otherwise(F.lit("3_cold"))
    )
    return (
        blob_age.join(blob_bytes, "location_key")
        .withColumn("tier", tier)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_msgs").alias("n_messages"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("tier")
    )


def _a113_histogram_quantiles(spark, sf_dir):
    """Quantile estimates from a 128-bin mergeable histogram sketch of
    o_totalprice, with the exact interpolated percentile and the sketch
    error alongside — percentiles WITHOUT a global sort (the sketch
    answer to percentile_approx, and the quantile member of the
    CMS/HLL/Bloom family: bin grids are additive, so per-partition /
    per-day grids merge by summation).  Shuffle bounded by n_bins
    forever; the cumulative table is a triangular join of the 128-row
    grid; exact percentile is one reduce for the error column."""
    from persistor_spark.analytics import sketches
    from persistor_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    LO, HI, NB = 0.0, 500000.0, 128
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    bins = sketches.histogram_sketch(orders, "o_totalprice", LO, HI, NB)
    est = sketches.histogram_quantiles(bins, qs, LO, HI, NB)
    qarr = "array(" + ", ".join(f"{q}D" for q in qs) + ")"
    exact = orders.select(
        F.posexplode(F.expr(f"percentile(o_totalprice, {qarr})")).alias(
            "pos", "exact_raw"
        )
    ).select(
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("pos") + 1).alias("q"),
        "exact_raw",
    )
    return (
        est.join(exact, "q")
        .select(
            "q",
            "est",
            F.round("exact_raw", 4).alias("exact"),
            F.round(F.col("est") - F.col("exact_raw"), 4).alias("err"),
        )
        .orderBy("q")
    )


def _a114_mutual_information(spark, sf_dir):
    """Source-language dependency table: pointwise mutual information and
    MI contribution per (source, lang) cell — does source identity
    predict language (route sources to per-language pipelines) or are
    they independent?  All inputs are exact integer counts (joint +
    two broadcast marginals + one scalar), so the log2 arithmetic is
    deterministic cross-engine."""
    docs = _docs(spark, sf_dir)
    n_total = docs.count()
    joint = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    ms = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    ml = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    pmi = F.log2(
        (F.col("n") * F.lit(n_total)) / (F.col("n_s") * F.col("n_l"))
    )
    return (
        joint.join(F.broadcast(ms), "source")
        .join(F.broadcast(ml), "lang")
        .select(
            "source",
            "lang",
            "n",
            # UNROUNDED (the e46 class): the log argument is a quotient of
            # exact integer products, so pmi and the mi product are
            # bit-identical doubles in both engines
            pmi.alias("pmi"),
            ((F.col("n") / F.lit(float(n_total))) * pmi).alias(
                "mi_contrib"
            ),
        )
        .orderBy("source", "lang")
    )


def _a115_chao1_richness(spark, sf_dir):
    """Chao1 species-richness estimate of each source's 3-gram vocabulary:
    observed grams V plus the f1/f2 (singleton/doubleton incidence)
    correction V + f1(f1-1)/(2(f2+1)) — how much unseen vocabulary more
    crawling of this source would surface, the ecology estimator behind
    'is this source exhausted'.  Gram incidence = docs-containing counts
    (map-side combinable); per-source rollup is source-bounded; the
    estimator is exact-integer in, single double expression out."""
    from persistor_spark.analytics import dedup

    docs = _docs(spark, sf_dir)
    inc = (
        docs.select(
            "source", "doc_id", F.explode(dedup.shingles("text", 3)).alias("gram")
        )
        .groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    chao = F.col("v") + (F.col("f1") * (F.col("f1") - 1)) / (
        F.lit(2.0) * (F.col("f2") + 1)
    )
    return (
        inc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("v"),
            F.count(F.when(F.col("df") == 1, 1)).alias("f1"),
            F.count(F.when(F.col("df") == 2, 1)).alias("f2"),
        )
        .select("source", "v", "f1", "f2", F.round(chao, 2).alias("chao1"))
        .orderBy("source")
    )


def _d29_ingest_heatmap(spark, sf_dir):
    """Write-load heatmap: index rows per (ISO day-of-week, hour) of
    ingestion time with each cell's share of total — the capacity-planning
    view of when the brokers actually deliver (and the input to choosing
    the blob-mask time granularity, T4).  One 168-cell-bounded agg + a
    scalar; ISO dow derived portably (Spark dayofweek is Sunday=1, so
    ((dow+5)%7)+1 == DuckDB isodow)."""
    t = _tables(spark, sf_dir)
    n_total = t.index_metadata.count()
    return (
        t.index_metadata.select(
            (((F.dayofweek("ingestion_time") + 5) % 7) + 1).alias("iso_dow"),
            F.hour("ingestion_time").alias("hh"),
        )
        .groupBy("iso_dow", "hh")
        .agg(F.count(F.lit(1)).alias("n"))
        # UNROUNDED integer quotient (the e46 class)
        .withColumn("share", F.col("n") / F.lit(float(n_total)))
        .orderBy("iso_dow", "hh")
    )


def _d30_zorder_layout(spark, sf_dir):
    """Z-order (Morton) clustering audit: lineitem keyed by the MSB-
    aligned interleave of (l_partkey, l_suppkey), cut into 32 equal-count
    z-runs (the file boundaries `layout.write_zordered` would produce),
    with each run's min/max envelope on BOTH dimensions — the zone-map
    evidence that one layout serves range predicates on either key
    (Delta OPTIMIZE ZORDER analogue; single-column sort bounds only its
    own column).  Pure integer bit arithmetic (cross-engine exact);
    bucketing via ntile_exact (no SinglePartition); pruning effect
    pytest-pinned in test_layout.py."""
    from persistor_spark.analytics.sampling import ntile_exact
    from persistor_spark.plans import layout
    from persistor_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    z = li.withColumn("z", layout.zorder_code("l_partkey", "l_suppkey", 16, 10))
    b = ntile_exact(z, 32, ["z", "l_orderkey", "l_linenumber"], "bucket")
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("bucket")
    )


def _e48_longest_streak(spark, sf_dir):
    """Longest consecutive-day activity streak per user (gaps-and-islands
    on the distinct user-day grid: island id = day minus row_number days,
    constant within a run).  Per-user windows only — partition-bounded,
    no global sort; the engagement metric behind 'daily streak' features."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    du = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (
        du.withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("len").alias("active_days"),
        )
        .orderBy("user_id")
    )


def _a116_bpe_merge_pairs(spark, sf_dir):
    """First BPE merge iteration (Sennrich 2016): frequency of every
    adjacent character pair inside corpus tokens — the statistic a
    tokenizer trainer maximizes at each merge step.  One narrow double
    explode (token positions are array expressions, no Python) + one
    pair-keyed agg bounded by the character-bigram alphabet; top 30 via
    TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN length(w) >= 2 THEN "
                    "  transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) "
                    "ELSE CAST(array() AS ARRAY<STRING>) END"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


def _e49_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth per nation: the lag-window BI
    staple.  Revenue is summed in exact DECIMAL(18,2) (o_totalprice is a
    cents-valued double, so the cast is exact) and only then cast to
    double — summation ORDER cannot perturb it, so the growth ratio sees
    bit-identical inputs in both engines at any SF (r12 VERDICT #2: the
    previous round(sum(double),2) was a knife-edge under shuffle-order
    jitter).  First month's growth is NULL by definition.
    Nation-partitioned windows only."""
    from pyspark.sql import Window

    from persistor_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(
            F.sum(_dec_exact(F.col("o_totalprice"), "decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("nation").orderBy("month")
    prev = F.lag("revenue").over(w)
    # growth is emitted UNROUNDED: the inputs are bit-identical doubles in
    # both engines (exact decimal revenue sums), so the raw quotient is
    # too — while round() implementations disagree on true decimal
    # halfway cases (the e46 diagnosis)
    return rev.select(
        "nation",
        "month",
        "revenue",
        ((F.col("revenue") - prev) / prev).alias("mom_growth"),
    ).orderBy("nation", "month")


def _a117_kmv_intersection(spark, sf_dir):
    """KMV (bottom-k theta) sketch estimates over per-source vocabularies:
    distinct-count per source plus pairwise union / Jaccard / intersection
    estimates for the first four sources — the set-operation sketch HLL
    registers cannot answer (persistor's index-profiling analogue of
    "how much does src_a's vocabulary overlap src_b's" at 100 TB, where
    the exact distinct-join is the thing you must avoid).  Sketch build is
    a distinct-hash groupBy + TWO-LEVEL bottom-k (no partition ever sorts
    a source's full hash set); all pair math runs on the <= k-row
    sketches, never the corpus."""
    from persistor_spark.analytics import sketches

    srcs = ["src0", "src1", "src2", "src3"]
    toks = (
        _docs(spark, sf_dir)
        .filter(F.col("source").isin(srcs))
        .select("source", F.explode(F.split("text", " ")).alias("w"))
    )
    sk = sketches.kmv_sketch(toks, "w", k=64, group_col="source")
    est = sketches.kmv_estimate(sk, k=64)
    pairs = sketches.kmv_pair_estimates(sk, k=64)
    return (
        pairs.join(
            est.select(F.col("g").alias("a"), F.col("est_distinct").alias("est_a")),
            "a",
        )
        .join(
            est.select(F.col("g").alias("b"), F.col("est_distinct").alias("est_b")),
            "b",
        )
        .select(
            "a", "b", "est_a", "est_b", "est_union", "est_jaccard",
            "est_intersection",
        )
        .orderBy("a", "b")
    )


def _a118_two_stage_rerank(spark, sf_dir):
    """Two-stage retrieval: BM25 recall (top-50 candidates) then exact
    TF-IDF-cosine re-ranking of ONLY those candidates — the classic
    cheap-recall / expensive-precision funnel every production search and
    RAG pipeline runs.  Stage 2's cost is bounded by the candidate list:
    candidates broadcast into the posting-list join, norms aggregate over
    candidate rows only, the query vector is a 3-row broadcast.  Scale
    shape: stage 1 touches only the query terms' posting lists, stage 2
    only the 50 winners' postings — the corpus is never rescanned."""
    from pyspark.sql import Window

    from persistor_spark.analytics import search

    docs = _docs(spark, sf_dir)
    idx = search.build_index(docs)
    cands = search.search(idx, _BM25_QUERY, k=50).select(
        "id", F.col("score").alias("bm25")
    )
    n = idx.n_docs
    dfreq = idx.postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        idx.postings.join(dfreq, "term")
        .withColumn("w", F.col("tf") * F.log(F.lit(float(n)) / F.col("df")))
        .select("id", "term", "w")
    )
    cw = w.join(F.broadcast(cands.select("id")), "id")
    norms = cw.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    qw = dfreq.filter(F.col("term").isin(_BM25_QUERY)).select(
        "term", F.log(F.lit(float(n)) / F.col("df")).alias("qw")
    )
    qn = qw.agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qn"))
    dots = (
        cw.join(F.broadcast(qw), "term")
        .groupBy("id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    rer = (
        cands.join(dots, "id")
        .join(norms, "id")
        .crossJoin(F.broadcast(qn))
        .select(
            "id",
            "bm25",
            F.round(F.col("dot") / (F.col("nrm") * F.col("qn")), 4).alias("cosine"),
        )
    )
    order = [F.col("cosine").desc(), F.col("id").asc()]
    top = rer.orderBy(*order).limit(10)
    w10 = Window.partitionBy(F.pmod(F.col("id"), F.lit(1))).orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w10).cast("long"))
        .select("id", "bm25", "cosine", "rank")
        .orderBy("rank")
    )


def _e50_ewma_smoothing(spark, sf_dir):
    """Per-event-type EWMA of the daily mean value (decay 0.8, trailing
    14-day support): the time-series smoothing primitive behind every
    ingest-rate / latency trend line.  EWMA's recursion doesn't decompose
    over window frames, so this uses the e43 contribution form — each
    daily point fans out to the <= 14 grid days it contributes to with
    weight 0.8^lag (narrow sequence explode), then ONE agg; gap days
    contribute nothing and the weight sum renormalizes.  No range join,
    no per-type global sort; cost tracks types x days x 14.  Daily means
    are rounded to 6 decimals BEFORE weighting so both engines smooth
    identical inputs."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    contrib = daily.select(
        "event_type",
        "v",
        F.col("day").alias("src_day"),
        F.explode(F.sequence(F.lit(0), F.lit(13))).alias("k"),
    ).select(
        "event_type",
        F.date_add(F.col("src_day"), F.col("k")).alias("day"),
        (F.col("v") * F.pow(F.lit(0.8), F.col("k"))).alias("wv"),
        F.pow(F.lit(0.8), F.col("k")).alias("wt"),
    )
    sm = contrib.groupBy("event_type", "day").agg(
        F.sum("wv").alias("swv"), F.sum("wt").alias("swt")
    )
    return (
        daily.join(sm, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            "v",
            F.round(F.col("swv") / F.col("swt"), 4).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


def _a119_nucleus_vocab(spark, sf_dir):
    """Nucleus (top-p, p=0.9) vocabulary per source: the smallest
    frequency-ranked token prefix covering 90% of the source's token
    mass — the LLM-sampling statistic repurposed as a corpus-diversity
    audit (a flat source needs many tokens to reach 90%, a templated one
    very few).  Per-source ranked windows only (partition = one source's
    VOCABULARY, bounded by the token domain, never the corpus); the 90%
    cut compares 10*cum_prev < 9*total in exact integers so the boundary
    token is the same in both engines."""
    from pyspark.sql import Window

    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    ws = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("w"))
    wt = Window.partitionBy("source")
    ranked = cnt.select(
        "source",
        "c",
        F.sum("c").over(ws).alias("cum"),
        F.sum("c").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("vocab_size"),
    )
    nucleus = ranked.filter((F.col("cum") - F.col("c")) * 10 < F.col("total") * 9)
    return (
        nucleus.groupBy("source")
        .agg(
            F.max("vocab_size").alias("vocab_size"),
            F.count(F.lit(1)).alias("nucleus_size"),
            # UNROUNDED integer-sum quotient: bit-identical in both engines,
            # where round() is halfway-split-prone (r13 VERDICT #2 / e46)
            (F.sum("c").cast("double") / F.max("total")).alias("nucleus_share"),
        )
        .orderBy("source")
    )


def _a120_quantile_normalize(spark, sf_dir):
    """Quantile normalization of doc lengths across sources: each
    (source, n_chars) value maps to the GLOBAL value at the same CDF
    position — the cross-source score-calibration transform (quantile
    transform / microarray quantile normalization) that makes per-source
    quality thresholds comparable.  Exact CDF matching, no interpolation
    ambiguity: v_norm = min global v' with cdf_g(v') >= cdf_s(v), and the
    CDF comparison is cross-multiplied to exact integers (cum_g * n_s >=
    cum_s * n_g) so engines cannot disagree at a quantile boundary.
    Scale shape: both CDFs live on DISTINCT-VALUE tables (bounded by the
    value domain, not the corpus); the global cumsum is the triangular
    broadcast self-join (no partitionless window), the match is a
    broadcast inequality join of two value-domain tables."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    n_g = docs.count()
    src = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    ws = Window.partitionBy("source").orderBy("v")
    wt = Window.partitionBy("source")
    src_cdf = src.select(
        "source",
        "v",
        "c",
        F.sum("c").over(ws).alias("cum_s"),
        F.sum("c").over(wt).alias("n_s"),
    )
    g = docs.groupBy(F.col("n_chars").alias("gv")).agg(
        F.count(F.lit(1)).alias("gc")
    )
    g2 = g.select(F.col("gv").alias("gv2"), F.col("gc").alias("gc2"))
    g_cdf = (
        g.join(F.broadcast(g2), F.col("gv2") <= F.col("gv"))
        .groupBy("gv")
        .agg(F.sum("gc2").alias("cum_g"))
    )
    matched = src_cdf.join(
        F.broadcast(g_cdf),
        F.col("cum_g") * F.col("n_s") >= F.col("cum_s") * F.lit(n_g),
    )
    return (
        matched.groupBy("source", "v", "c", "cum_s", "n_s")
        .agg(F.min("gv").alias("v_norm"))
        .select(
            "source",
            "v",
            "c",
            # UNROUNDED integer quotient (the e46 class)
            (F.col("cum_s").cast("double") / F.col("n_s")).alias("cdf"),
            "v_norm",
        )
        .orderBy("source", "v")
    )


def _a121_entity_resolution(spark, sf_dir):
    """Blocked entity-resolution scoring (Fellegi–Sunter shape) over
    customers: block on (nation, market segment) — the cheap equi-join
    that bounds the candidate quadratic — then score each in-block pair
    with weighted field agreements (0.7 * name edit-similarity + 0.3 *
    balance closeness) and keep the top-50 match candidates.  The
    record-linkage primitive behind every dedup-people/merge-accounts
    pipeline.  Scale shape: candidate volume is sum of block-size^2, so
    block keys must stay selective — the engineered worst case (ALL 15k
    sf0.1 customers in ONE block = 112M pairs) measured 341 s purely
    pair-volume-bound (tools/probe_r6b.py).  r7: the hot-block cap is now
    ENFORCED via dedup.blocked_candidate_pairs(max_block_size=2000) —
    oversized blocks sub-block by id rank, bounding per-key candidates at
    ~n*cap/2.  The cap never bites at test SFs (largest (nation, segment)
    block is ~120 customers at sf0.1), so the full-quadratic SQL oracle
    stays exact; scoring is pure expressions, the top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    from persistor_spark.analytics import dedup
    from persistor_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").alias("cid"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    pairs = dedup.blocked_candidate_pairs(
        c, ["nk", "seg"], id_col="cid", max_block_size=2000
    ).select(
        "nk", "seg",
        F.col("cid_a").alias("a"), F.col("name_a"), F.col("bal_a"),
        F.col("cid_b").alias("b"), F.col("name_b"), F.col("bal_b"),
    )
    name_sim = F.lit(1.0) - F.levenshtein("name_a", "name_b") / F.greatest(
        F.length("name_a"), F.length("name_b")
    )
    bal_sim = F.lit(1.0) - F.least(
        F.abs(F.col("bal_a") - F.col("bal_b")) / F.lit(10000.0), F.lit(1.0)
    )
    scored = pairs.select(
        "nk",
        "seg",
        "a",
        "b",
        F.round(F.lit(0.7) * name_sim + F.lit(0.3) * bal_sim, 4).alias("score"),
    )
    order = [F.col("score").desc(), F.col("a").asc(), F.col("b").asc()]
    top = scored.orderBy(*order).limit(50)
    w = Window.partitionBy(F.pmod(F.col("a"), F.lit(1))).orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "nk", "seg", "a", "b", "score")
        .orderBy("rank")
    )


def _a122_ols_sufficient_stats(spark, sf_dir):
    """Per-source 2-feature OLS (n_chars ~ word_count + distinct_words)
    solved in CLOSED FORM from sufficient statistics: ONE aggregation
    pass collects the ten exact-integer sums (n, Σx, Σy, Σz, Σx², Σy²,
    Σxy, Σxz, Σyz, Σz²), then the normal equations' 2x2 inverse runs as
    plain per-group expressions — the distributed-regression pattern
    (no driver loop, no per-row Python, no iterative solver) that scales
    to any corpus because model fitting costs exactly one map-side-
    combinable agg.  All covariance math derives from exact integer
    sums, so both engines compute identical doubles."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    feats = docs.select(
        "source",
        F.size(toks).cast("long").alias("x"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
        F.col("n_chars").cast("long").alias("z"),
    )
    s = feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / nd
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / nd
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / nd
    cxz = F.col("sxz") - F.col("sx") * F.col("sz") / nd
    cyz = F.col("syz") - F.col("sy") * F.col("sz") / nd
    czz = F.col("szz") - F.col("sz") * F.col("sz") / nd
    det = cxx * cyy - cxy * cxy
    b1 = (cyy * cxz - cxy * cyz) / det
    b2 = (cxx * cyz - cxy * cxz) / det
    icept = F.col("sz") / nd - b1 * F.col("sx") / nd - b2 * F.col("sy") / nd
    r2 = (b1 * cxz + b2 * cyz) / czz
    return s.select(
        "source",
        "n",
        F.round(b1, 6).alias("b_words"),
        F.round(b2, 6).alias("b_distinct"),
        F.round(icept, 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("source")


def _d31_compaction_plan(spark, sf_dir):
    """Compaction PLANNING (the step before d-series compaction runs):
    bin-pack each partition directory's blobs into target-size rewrite
    groups with first-fit-decreasing — blobs ordered by size descending,
    running cumulative sum, bin = the 8 KiB boundary the blob's prefix
    sum crosses.  Output is the work list a compactor executes (one
    rewrite task per (dir, bin)).  Per-directory windows only (partition
    = one directory's file list, bounded by files-per-partition, never
    the record count); all math is exact integers."""
    from pyspark.sql import Window

    target = 8192
    t = _tables(spark, sf_dir)
    per = t.blob_records.groupBy("location_key").agg(
        F.sum(F.octet_length("payload")).alias("bytes")
    )
    per = per.withColumn("dir", F.regexp_replace("location_key", "/[^/]*$", ""))
    w = Window.partitionBy("dir").orderBy(F.col("bytes").desc(), "location_key")
    cum = F.sum("bytes").over(w)
    binned = per.select(
        "dir",
        "bytes",
        F.floor((cum - F.col("bytes")) / F.lit(float(target))).alias("bin"),
    )
    return (
        binned.groupBy("dir", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("bin_bytes"),
        )
        .orderBy("dir", "bin")
    )


def _e51_map_functions(spark, sf_dir):
    """MAP-typed column surface: per user bucket, build an event_type ->
    count map with map_from_entries(sorted entries), total it with the
    higher-order `aggregate` over map_values, keep only entries carrying
    >= 10% of the bucket's events via `map_filter` (the lambda captures
    the outer total column), then explode back to rows.  The integer
    share compare (v * 10 >= total) makes the filter boundary exact in
    both engines; the oracle states the same result relationally (maps
    are the Spark-side representation under audit, not the semantics)."""
    ev = _events(spark, sf_dir)
    per = ev.groupBy(
        (F.col("user_id") % 10).cast("long").alias("user_bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    m = per.groupBy("user_bucket").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    totaled = m.select(
        "user_bucket",
        "m",
        F.size("m").alias("n_types"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("total"),
    )
    kept = totaled.select(
        "user_bucket",
        "n_types",
        "total",
        F.explode(
            F.map_filter("m", lambda k, v: v * 10 >= F.col("total"))
        ).alias("event_type", "n"),
    )
    return kept.select(
        "user_bucket", "n_types", "total", "event_type", "n"
    ).orderBy("user_bucket", "event_type")


def _a123_ams_f2(spark, sf_dir):
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996) over
    the token stream: F2 = Σ f_t² — the self-join-size statistic a
    planner uses to cost a term-keyed join — estimated with 16 ±1-sign
    counters instead of the full term histogram.  Each estimator r keeps
    Z_r = Σ_occurrences sign_r(term) (ONE 16-key agg, map-side
    combinable, state = 16 longs no matter the corpus); E[Z_r²] = F2.
    Signs come from the md5-derived hash family's parity, so both
    engines draw identical signs.  Output compares the sketch mean
    against exact F2 (one term-keyed agg, the thing the sketch avoids
    shipping at 100 TB)."""
    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("w")
    )
    from persistor_spark.analytics.dedup import md5_hash64

    signs = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    (
                        F.pmod(
                            md5_hash64(F.concat(F.lit(f"ams{r}:"), F.col("w"))),
                            F.lit(2),
                        )
                        * 2
                        - 1
                    ).cast("long").alias("s"),
                )
                for r in range(16)
            ])
        ).alias("rs")
    ).select(F.col("rs.r").alias("r"), F.col("rs.s").alias("s"))
    z = signs.groupBy("r").agg(F.sum("s").alias("z"))
    # UNROUNDED (the e46 class): z and z² are exact integers, so the
    # 16-row avg and the est/exact quotient are bit-identical doubles
    est = z.agg(
        F.avg(F.col("z") * F.col("z")).alias("f2_est"),
        F.count(F.lit(1)).alias("n_estimators"),
    )
    exact = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2_exact"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "n_estimators",
            "f2_exact",
            "f2_est",
            (F.col("f2_est") / F.col("f2_exact")).alias("ratio"),
        )
    )


def _a124_image_dhash_pairs(spark, sf_dir):
    """Multimodal near-dup detection: perceptual dHash over REAL decoded
    BMP pixels (Arrow-batched mapInPandas decode, the a10 pipeline) +
    SimHash-style 9-band LSH join + Hamming verify — the image analogue
    of the text dedup family.  The oracle recomputes the hash
    ANALYTICALLY from the procedural pixel formula (same closed-form-twin
    contract as a10/a35/a36: the Spark side must decode real bytes to
    reach the same 63-bit value).  Candidate volume tracks 7-bit band
    occupancy, never image-pairs²."""
    from persistor_spark.analytics import multimodal

    media = multimodal.synthesize_media(spark, _docs(spark, sf_dir))
    # the hash table feeds BOTH band-join sides; without the barrier the
    # Arrow BMP decode runs twice (A/B at sf0.1: 12.0 s -> 5.6 s warm,
    # hash-identical) — the r6 two-consumer-recompute rule
    hashes = multimodal.image_dhash(media).localCheckpoint()
    return multimodal.dhash_near_pairs(hashes, max_hamming=20, k=10).select(
        "a", "b", F.col("hamming").cast("long").alias("hamming")
    )


def _e52_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped min-cost supplier: for each low-key part, the
    supplier whose best observed line price is the part's minimum —
    the correlated-aggregate join pattern (offer table -> per-part min ->
    equality join back, ties broken by supplier key).  All comparisons
    are exact MINs of raw doubles (no float summation), so engines
    cannot disagree; the per-part reduction is two shuffles on p_partkey,
    broadcast-joined to the bounded winner set."""
    from pyspark.sql import Window

    from persistor_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 200)
    supp = load_table(spark, sf_dir, "supplier")
    offers = li.groupBy(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).agg(F.min("l_extendedprice").alias("price"))
    best = offers.groupBy(F.col("p").alias("bp")).agg(
        F.min("price").alias("best_price")
    )
    winners = offers.join(
        F.broadcast(best),
        (F.col("p") == F.col("bp")) & (F.col("price") == F.col("best_price")),
    ).select("p", "s", "best_price")
    w = Window.partitionBy("p").orderBy("s")
    first = winners.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        first.join(supp, first.s == supp.s_suppkey)
        .select(
            F.col("p").alias("p_partkey"),
            F.col("s").alias("s_suppkey"),
            "s_name",
            F.round("best_price", 2).alias("best_price"),
        )
        .orderBy("p_partkey")
    )


def _e53_pareto_abc(spark, sf_dir):
    """Pareto / ABC revenue classification: rank customers by revenue,
    classify the prefix carrying 80% of total revenue as A, the next
    15% as B, the tail as C — the inventory-analysis staple.  Revenue is
    quantized to EXACT integer cents per ORDER ROW before any summation
    (round(price*100) is the same integer in both engines because the
    inputs are identical doubles within 1e-9 of an integer), so every
    cumulative value and class boundary compares exact integers.  The
    global running sum uses the two-level prefix-sum primitive
    (`sampling.global_cumsum`) — range partition + literal offsets —
    never a single-partition window."""
    from persistor_spark.analytics.sampling import global_cumsum
    from persistor_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked, total = global_cumsum(
        rev, "cents", [F.col("cents").desc(), F.col("cust").asc()], "cum"
    )
    classed = ranked.withColumn(
        "class",
        F.when(F.col("cum") * 5 <= F.lit(total) * 4, "A")
        .when(F.col("cum") * 20 <= F.lit(total) * 19, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("class_cents"),
        )
        .select(
            "class",
            "n_customers",
            "class_cents",
            # UNROUNDED exact-integer quotient (the e46 class)
            (F.col("class_cents") / F.lit(float(total))).alias("share"),
        )
        .orderBy("class")
    )


def _d32_column_drift(spark, sf_dir):
    """Column-statistics drift between the early (< 1998) and late order
    epochs: per-column count / nulls / min / max / mean side by side with
    the mean delta — the batch-over-batch data-quality gate that catches
    an upstream break before the bad data lands.  One scan, one bounded
    agg (columns x 2 keys) via `profiling.column_stats_drift`."""
    from persistor_spark.analytics.profiling import column_stats_drift
    from persistor_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "half",
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), "a").otherwise(
            "b"
        ),
    )
    return column_stats_drift(
        orders, "half", ["o_custkey", "o_orderkey", "o_totalprice"]
    )


def _a125_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from the first three customers over the
    customer<->supplier purchase graph: restart mass returns to the seed
    set, so ranks measure importance RELATIVE to those seeds (related-
    entity discovery / contamination spread from flagged nodes) — the
    localized counterpart of global a56.  Same per-round shape: broadcast
    node-bounded ranks, one agg shuffle per round; mass stays inside the
    seeds' 3-hop neighborhood."""
    from persistor_spark.analytics import graph
    from persistor_spark.sources.registry import load_table

    edges = graph.bipartite_interaction_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"))
    )
    return graph.personalized_pagerank(edges, seeds, iterations=3)


def _a126_coverage_selection(spark, sf_dir):
    """Greedy maximum-coverage corpus selection (the submodular
    diverse-subset primitive): 5 rounds, each picking the document whose
    shingle set covers the most NOT-YET-COVERED 2-gram shingles — the
    facility-location greedy with the classic (1-1/e) guarantee, used to
    seed diverse eval/train subsets.  Per round: one posting-shaped
    anti-join (covered shingles removed), one doc-keyed count, one
    TakeOrdered(1); the uncovered table shrinks monotonically and rounds
    are a constant, so the plan is K bounded shuffles — no all-pairs
    anything.  Driver state is just the 5 picks."""
    from persistor_spark.analytics.dedup import shingles

    s = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(shingles("text", 2)).alias("sh"))
        .localCheckpoint()
    )
    remaining = s
    picks, covered_total = [], 0
    for rnd in range(1, 6):
        rows = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("doc_id").asc())
            .limit(1)
            .collect()
        )
        if not rows:
            # degenerate corpus: everything already covered (probe-pinned
            # worst case — an all-identical corpus ends after round 1)
            break
        top = rows[0]
        covered_total += top["n"]
        picks.append((rnd, top["doc_id"], top["n"], covered_total))
        newly = s.filter(F.col("doc_id") == top["doc_id"]).select("sh")
        remaining = (
            remaining.filter(F.col("doc_id") != top["doc_id"])
            .join(newly, "sh", "left_anti")
            .localCheckpoint()
        )
    return spark.createDataFrame(
        picks, "round long, doc_id long, new_shingles long, covered_total long"
    ).orderBy("round")


def _e54_sequence_gaps(spark, sf_dir):
    """Top-20 longest gaps in the l_orderkey sequence (order keys that
    never produced a line item): gap starts are keys whose successor is
    absent, gap ends are keys whose predecessor is absent — BOTH found
    with equi-anti-joins (never an inequality join or a global lead/lag
    sort), then aligned i-th to i-th via `global_row_number` (two-level
    rank, no single-partition window).  The sequence-integrity /
    referential-completeness check every ingest audit runs."""
    from persistor_spark.analytics.sampling import global_row_number
    from persistor_spark.sources.registry import load_table

    keys = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"))
        .distinct()
        .localCheckpoint()
    )
    bounds = keys.agg(F.min("k").alias("mn"), F.max("k").alias("mx")).collect()[0]
    starts = (
        keys.join(
            keys.select(F.col("k").alias("k2")),
            F.col("k") + 1 == F.col("k2"),
            "left_anti",
        )
        .filter(F.col("k") < bounds["mx"])
        .select((F.col("k") + 1).alias("gap_start"))
    )
    ends = keys.join(
        keys.select(F.col("k").alias("k2")), F.col("k") - 1 == F.col("k2"), "left_anti"
    ).filter(F.col("k") > bounds["mn"]).select((F.col("k") - 1).alias("gap_end"))
    rs, _ = global_row_number(starts, [F.col("gap_start").asc()], "rn")
    re_, _ = global_row_number(ends, [F.col("gap_end").asc()], "rn")
    gaps = rs.join(re_, "rn").select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )
    from pyspark.sql import Window

    order = [F.col("gap_len").desc(), F.col("gap_start").asc()]
    top = gaps.orderBy(*order).limit(20)
    w = Window.partitionBy(F.pmod(F.col("gap_start"), F.lit(1))).orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "gap_start", "gap_end", "gap_len")
        .orderBy("rank")
    )


def _d33_zonemap_audit(spark, sf_dir):
    """Zone-map effectiveness audit for the d30 Z-ordered layout: given an
    SF-RELATIVE box predicate ([10%, 20%] of each key's domain — at sf0.01
    that is l_partkey in [2000,4000] x l_suppkey in [16,32]), how many of
    the 32 z-run buckets survive min/max pruning,
    how many rows those buckets scan, and the read amplification vs the
    rows that actually match — the quantified version of the d30/bench
    zone-map claim (scan cost tracks surviving buckets, not the table).
    Same exact integer bit arithmetic and ntile_exact bucketing as d30."""
    from persistor_spark.analytics.sampling import ntile_exact
    from persistor_spark.plans import layout
    from persistor_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    # SF-relative box: [10%, 20%] of each key domain, exact integer div
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).collect()[0]
    lo_p, hi_p = mx["mp"] // 10, mx["mp"] // 5
    lo_s, hi_s = mx["ms"] // 10, mx["ms"] // 5
    z = li.withColumn("z", layout.zorder_code("l_partkey", "l_suppkey", 16, 10))
    b = ntile_exact(z, 32, ["z", "l_orderkey", "l_linenumber"], "bucket")
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )
    hit = (
        (F.col("min_part") <= hi_p)
        & (F.col("max_part") >= lo_p)
        & (F.col("min_supp") <= hi_s)
        & (F.col("max_supp") >= lo_s)
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("total_buckets"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("touched_buckets"),
        F.sum(F.when(hit, F.col("n")).otherwise(0)).alias("rows_scanned"),
    )
    matched = li.filter(
        F.col("l_partkey").between(lo_p, hi_p)
        & F.col("l_suppkey").between(lo_s, hi_s)
    ).agg(F.count(F.lit(1)).alias("rows_matched"))
    return stats.crossJoin(F.broadcast(matched)).select(
        "total_buckets",
        "touched_buckets",
        "rows_scanned",
        "rows_matched",
        # UNROUNDED integer quotient (the e46 class)
        (F.col("rows_scanned").cast("double") / F.col("rows_matched")).alias(
            "amplification"
        ),
    )


def _a127_hard_negatives(spark, sf_dir):
    """Contrastive-pair mining (anchors = vec_id < 10): per anchor the
    most-similar same-label positive and most-similar different-label
    hard negative with the margin — the triplet-builder behind embedding
    fine-tunes.  Exact a5-shape baseline (broadcast anchors, one dot per
    pair); the LSH/IVF candidate join substitutes at scale."""
    from persistor_spark.analytics import similarity

    embs = _embs(spark, sf_dir)
    anchors = embs.filter(F.col("vec_id") < 10)
    return similarity.hard_negative_mining(embs, anchors)


def _a128_lang_confusion(spark, sf_dir):
    """Declared-vs-detected language confusion matrix: per (declared,
    detected) cell the doc count and the share of the declared row — the
    labeling-quality eval every multilingual curation run publishes
    (where does the metadata disagree with the content?).  Two bounded
    aggs (cells <= langs², rows-per-lang window)."""
    from pyspark.sql import Window

    from persistor_spark.analytics import text

    docs = _docs(spark, sf_dir).select(
        "lang", text.detect_language("text").alias("det")
    )
    cells = docs.groupBy("lang", "det").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "det",
        "n",
        # UNROUNDED integer quotient (the e46 class)
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("row_share"),
        F.when(F.col("lang") == F.col("det"), 1).otherwise(0).cast("long").alias(
            "agree"
        ),
    ).orderBy("lang", "det")


def _a129_minhash_calibration(spark, sf_dir):
    """MinHash estimator calibration: for every true near-dup pair (the
    session-shared a2 exact-Jaccard list), the 32-permutation MinHash
    ESTIMATE (matching signature components / 32) next to the exact
    Jaccard and the error — the sketch-audit that tells you whether your
    banding thresholds are honest before you trust them at 100 TB.
    Signatures use the md5-derived permutation family (hash p||':'||sh),
    so both engines draw identical minima; signature build is one
    (doc, perm)-keyed MIN agg — map-side combinable, 32 keys per doc."""
    from persistor_spark.analytics.dedup import md5_hash64, shingles

    n_perm = 32
    pairs = _shared_pairs(spark, sf_dir, 0.8).select("a", "b", "jaccard")
    # SAME k=3 shingle sets the shared pair list scored — the estimate
    # must approximate the jaccard of the sets it actually sketches
    sh = _docs(spark, sf_dir).select(
        "doc_id", F.explode(shingles("text", 3)).alias("sh")
    )
    hp = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("p"),
        "sh",
    ).select(
        "doc_id",
        "p",
        md5_hash64(
            F.concat(F.col("p").cast("string"), F.lit(":"), F.col("sh"))
        ).alias("h"),
    )
    sig = hp.groupBy("doc_id", "p").agg(F.min("h").alias("h"))
    sa = sig.select(F.col("doc_id").alias("a"), "p", F.col("h").alias("ha"))
    sb = sig.select(F.col("doc_id").alias("b"), "p", F.col("h").alias("hb"))
    est = (
        pairs.join(sa, "a")
        .join(sb, ["b", "p"])
        .groupBy("a", "b", "jaccard")
        .agg(
            F.round(
                F.sum(F.when(F.col("ha") == F.col("hb"), 1).otherwise(0))
                / F.lit(float(n_perm)),
                4,
            ).alias("minhash_est")
        )
    )
    return est.select(
        "a",
        "b",
        "jaccard",
        "minhash_est",
        F.round(F.col("minhash_est") - F.col("jaccard"), 4).alias("err"),
    ).orderBy("a", "b")


def _d34_ingest_lag(spark, sf_dir):
    """Per-broker distribution of BLOB ingest windows (max ingestion_time
    - min publish_time inside each blob, seconds): blobs / min / max /
    mean / exact p50/p90/p99 — the batch-exact twin of the latency
    quantiles the reference exports as Prometheus summaries
    (metrics.go:58-81), lifted to the blob granularity where the spread
    actually lives (per-record lag is a constant by fixture
    construction).  Two bounded aggs: per-blob min/max (map-side
    combinable), then a broker-keyed percentile rollup.  NTZ timestamps
    go through a timestamp cast before the epoch-seconds cast; the
    difference cancels any zone interpretation."""
    t = _tables(spark, sf_dir)
    per_blob = (
        t.index_metadata.filter(F.col("publish_time").isNotNull())
        .groupBy("broker_id", "location_key")
        .agg(
            (
                F.max(F.col("ingestion_time").cast("timestamp").cast("double"))
                - F.min(F.col("publish_time").cast("timestamp").cast("double"))
            ).alias("window_s")
        )
    )
    return (
        per_blob.groupBy("broker_id")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.round(F.min("window_s"), 4).alias("min_s"),
            F.round(F.max("window_s"), 4).alias("max_s"),
            F.round(F.avg("window_s"), 4).alias("avg_s"),
            F.round(F.expr("percentile(window_s, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(window_s, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(window_s, 0.99)"), 4).alias("p99"),
        )
        .orderBy("broker_id")
    )


def _e55_rolling_correlation(spark, sf_dir):
    """Trailing-14-day Pearson correlation between daily click and
    purchase counts — the rolling cross-metric health signal.  Pearson
    doesn't decompose over window frames, so this reuses the e43/e50
    contribution form: each day's (x, y) fans out to the <= 14 grid days
    it supports, ONE agg collects the five sufficient sums — all EXACT
    integers (daily counts), so r's closed form computes identical
    doubles in both engines.  Days with < 2 observations or zero
    variance yield NULL r by definition."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "y"
        ),
    )
    contrib = daily.select(
        F.col("day").alias("src_day"),
        "x",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(13))).alias("k"),
    ).select(
        F.date_add(F.col("src_day"), F.col("k")).alias("day"), "x", "y"
    )
    sums = contrib.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # UNROUNDED (the e46 class): num/varx/vary are exact integers, so the
    # quotient against the sqrt of their exact product is bit-identical
    r = F.when(
        (F.col("n") >= 2) & (varx > 0) & (vary > 0),
        num / F.sqrt(varx.cast("double") * vary.cast("double")),
    )
    return (
        sums.join(daily.select("day"), "day")
        .select("day", "n", F.col("sx").alias("clicks_14d"),
                F.col("sy").alias("purchases_14d"), r.alias("r"))
        .orderBy("day")
    )


def _a130_waterfill_mixture(spark, sf_dir):
    """Token-budget waterfilling: allocate an 80%-of-corpus token budget
    across sources at a uniform fair share, letting sources whose supply
    caps out keep their cap and redistributing the freed budget among the
    rest — the mixture-solver step between "target weights" (a28/a47)
    and "what the corpus can actually supply".  Three unrolled
    redistribution rounds (enough for fixture-scale cap spreads; the
    fixpoint is monotone), every quantity an exact integer (floor DIV),
    source table bounded — each round is a broadcast join of 20-row
    frames, never a corpus shuffle."""
    caps = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " ")).cast("long")).alias("cap"))
    )
    tot = caps.agg(
        F.sum("cap").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    budget, n = (tot["t"] * 4) // 5, tot["n"]
    fair1 = budget // n
    r1 = caps.withColumn(
        "fixed1", F.when(F.col("cap") <= F.lit(fair1), F.col("cap"))
    )
    a1 = r1.agg(
        F.sum(F.when(F.col("fixed1").isNull(), 1).otherwise(0)).alias("n2"),
        (F.lit(budget) - F.coalesce(F.sum("fixed1"), F.lit(0))).alias("b2"),
    ).collect()[0]
    fair2 = (a1["b2"] // a1["n2"]) if a1["n2"] else 0
    r2 = r1.withColumn(
        "fixed2",
        F.when(
            F.col("fixed1").isNull() & (F.col("cap") <= F.lit(fair2)),
            F.col("cap"),
        ),
    )
    a2 = r2.agg(
        F.sum(
            F.when(F.col("fixed1").isNull() & F.col("fixed2").isNull(), 1).otherwise(0)
        ).alias("n3"),
        (
            F.lit(budget)
            - F.coalesce(F.sum("fixed1"), F.lit(0))
            - F.coalesce(F.sum("fixed2"), F.lit(0))
        ).alias("b3"),
    ).collect()[0]
    fair3 = (a2["b3"] // a2["n3"]) if a2["n3"] else 0
    alloc = F.coalesce(
        F.col("fixed1"), F.col("fixed2"), F.least(F.col("cap"), F.lit(fair3))
    )
    return (
        r2.select(
            "source",
            "cap",
            alloc.alias("alloc"),
            (alloc == F.col("cap")).cast("long").alias("capped"),
        )
        .orderBy("source")
    )


def _a131_label_dispersion(spark, sf_dir):
    """Intra-label embedding dispersion: the EXACT mean pairwise cosine
    within each label from ONE aggregation — for unit vectors,
    sum_{i!=j} cos(v_i,v_j) = ||Σv̂||² - n, so mean pairwise cosine =
    (||Σv̂||² - n) / (n(n-1)) with no pairwise join at any scale (the
    compactness twin of a57's inter-label centroid similarity; low
    dispersion = a tight, near-duplicate label).  Normalization cost is
    one narrow map; the agg is d-bounded per label.

    SF-robust summation (r12 VERDICT #2): both cross-row sums (per-dim
    component sum, then the sum of squared dims) run in exact DECIMAL so
    shuffle order cannot flip the 4th rounded digit; the per-row unit
    components are order-defined array folds identical in both engines,
    and only they stay float.  decimal(20,14) bounds |x| <= 1 summed over
    n rows; decimal(26,12) bounds s^2 <= n^2 summed over d dims."""
    from persistor_spark.analytics.similarity import norm

    embs = _embs(spark, sf_dir).select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = embs.select(
        "label", "v", (F.lit(1.0) / norm(F.col("v"))).alias("inv")
    ).localCheckpoint()
    unit = nrm.select(
        "label", F.transform("v", lambda x: x * F.col("inv")).alias("u")
    )
    flat = unit.select(
        "label", F.posexplode("u").alias("i", "x")
    )
    dims = flat.groupBy("label", "i").agg(
        F.sum(_dec_exact(F.col("x"), "decimal(20,14)")).cast("double").alias("s")
    )
    per = dims.groupBy("label").agg(
        F.sum(_dec_exact(F.col("s") * F.col("s"), "decimal(26,12)"))
        .cast("double")
        .alias("sq")
    )
    cnt = embs.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return (
        per.join(cnt, "label")
        .select(
            "label",
            "n",
            # unrounded: identical exact-decimal sq in both engines makes
            # the quotient bit-identical, while round() implementations
            # disagree on true halfway cases (the e46 diagnosis)
            (
                (F.col("sq") - F.col("n")) / (F.col("n") * (F.col("n") - 1))
            ).alias("mean_pairwise_cos"),
        )
        .orderBy("label")
    )


def _e57_chi_square(spark, sf_dir):
    """Chi-square independence test for event_type x user-bucket: the
    contingency table, expected counts under independence, and the chi²
    statistic with degrees of freedom — the categorical-drift test a
    data-quality monitor runs between segments.  Observed counts are
    exact integers; expected = row_total * col_total / grand_total
    computes identical doubles in both engines.  Three bounded aggs
    (cells, margins, one scalar)."""
    ev = _events(spark, sf_dir)
    cells = ev.groupBy(
        (F.col("user_id") % 5).cast("long").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("bucket").agg(F.sum("o").alias("row_n"))
    cols_ = cells.groupBy("event_type").agg(F.sum("o").alias("col_n"))
    grand = ev.count()
    joined = cells.join(F.broadcast(rows_), "bucket").join(
        F.broadcast(cols_), "event_type"
    )
    e = F.col("row_n") * F.col("col_n") / F.lit(float(grand))
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    # chi2 sums per-cell FLOAT contributions, so two hazards could split
    # the engines: float summation ORDER (non-associative) and round()'s
    # halfway behavior (the e46 diagnosis).  Fixed-point form removes
    # both: each bit-identical contrib maps to an exact integer
    # floor(contrib*1e9 + 0.5) — identical arithmetic in both engines —
    # the BIGINT sum is order-free, and the final /1e9 is one float op on
    # identical inputs.  Bound: contrib*1e9 must stay < 2^53; cell counts
    # are <= events/5, so contrib <= ~1e6 even at sf10 -> 1e15 < 9.0e15.
    chi2_fixed = F.floor(contrib * F.lit(1e9) + F.lit(0.5)).cast("long")
    stats = joined.agg(
        (F.sum(chi2_fixed).cast("double") / F.lit(1e9)).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("bucket").alias("n_rows"),
        F.count_distinct("event_type").alias("n_cols"),
    )
    return stats.select(
        "chi2",
        "n_cells",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
        F.lit(grand).alias("grand_n"),
    )


def _a132_benford_audit(spark, sf_dir):
    """Benford first-significant-digit audit of order totals: observed
    digit shares vs Benford's log10(1 + 1/d) expectation with the
    per-digit deviation — the fraud/corruption forensic every financial
    data-quality pass runs.  First digit extracted with pure integer/log
    arithmetic on identical doubles; one 9-key agg."""
    from persistor_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    x = F.col("o_totalprice")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("long")
    n = orders.count()
    obs = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("o")
    )
    share = F.col("o") / F.lit(float(n))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return obs.select(
        "digit",
        "o",
        F.round(share, 4).alias("obs_share"),
        F.round(benford, 4).alias("benford_share"),
        F.round(share - benford, 4).alias("deviation"),
    ).orderBy("digit")


def _d35_ingest_forecast(spark, sf_dir):
    """Per-broker ingest-volume trend + 7-day forecast: OLS slope and
    intercept of daily payload bytes over the day index (regr_slope /
    regr_intercept — one agg pass, the sufficient-stats pattern), then
    the linear forecast for horizon day +7 — the capacity-planning
    deliverable an ops dashboard shows.  Day indexes are exact integers
    (datediff from each broker's first day); bytes are exact integer
    sums."""
    t = _tables(spark, sf_dir)
    daily = t.index_metadata.join(
        t.blob_records.select(
            F.col("record_id").alias("unique_id"), F.octet_length("payload").alias("b")
        ),
        "unique_id",
    ).groupBy(
        "broker_id", F.to_date("ingestion_time").alias("day")
    ).agg(F.sum("b").alias("bytes"))
    first = daily.groupBy("broker_id").agg(F.min("day").alias("d0"))
    idx = daily.join(F.broadcast(first), "broker_id").select(
        "broker_id",
        F.datediff(F.col("day"), F.col("d0")).cast("double").alias("di"),
        F.col("bytes").cast("double").alias("y"),
    )
    # ONE agg pass: keep the raw regression terms and derive the forecast
    # in the projection — a second groupBy just for forecast_7d re-executed
    # the whole index x blob daily-rollup subtree and joined it back
    fit = idx.groupBy("broker_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("regr_slope(y, di)").alias("_s"),
        F.expr("regr_intercept(y, di)").alias("_i"),
        F.max("di").alias("_last_di"),
    )
    return (
        fit.select(
            "broker_id",
            "n_days",
            F.round("_s", 4).alias("slope"),
            F.round("_i", 4).alias("intercept"),
            F.round(F.col("_i") + F.col("_s") * (F.col("_last_di") + 7), 4).alias(
                "forecast_7d"
            ),
        )
        .orderBy("broker_id")
    )


def _e58_time_to_convert(spark, sf_dir):
    """Signup -> first-purchase conversion latency distribution: per user
    the first signup and the first purchase AFTER it (min-filter joins,
    never a row-wise scan), then exact p25/p50/p75/p90 and the conversion
    rate — the funnel-latency metric behind every growth dashboard.
    Two user-keyed min-aggs + one join; percentile state is scalar."""
    ev = _events(spark, sf_dir)
    signup = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(F.col("ts").cast("timestamp").cast("double")).alias("t_signup")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").cast("double").alias("t_p")
    )
    conv = (
        signup.join(purch, "user_id")
        .filter(F.col("t_p") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min(F.col("t_p") - F.col("t_signup")).alias("lat_s"))
    )
    n_signup = signup.count()
    return conv.agg(
        F.lit(n_signup).alias("n_signups"),
        F.count(F.lit(1)).alias("n_converted"),
        # UNROUNDED integer quotient (the e46 class); the percentiles keep
        # their rounding — interpolated values over integer seconds are
        # already engine-identical, the round is display-scale only
        (F.count(F.lit(1)) / F.lit(float(n_signup))).alias(
            "conversion_rate"
        ),
        F.round(F.expr("percentile(lat_s, 0.25)"), 4).alias("p25_s"),
        F.round(F.expr("percentile(lat_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(lat_s, 0.75)"), 4).alias("p75_s"),
        F.round(F.expr("percentile(lat_s, 0.9)"), 4).alias("p90_s"),
    )


def _d36_consistent_hashing(spark, sf_dir):
    """Consistent-hashing ring rebalance audit: assign every index key to
    its next-clockwise virtual node (4 nodes x 8 vnodes, md5 ring
    positions), add a 5th node, and measure what fraction of keys move —
    the ~1/(N+1) guarantee that makes consistent hashing the resharding
    story at 100 TB (a104's mod-N sharding moves ~N/(N+1)).  The ring is
    a tiny broadcast table; assignment is min-over-successors on an
    inequality join against <= 40 rows, wrap handled by a global-min
    fallback — the corpus shuffles once per assignment, never all-pairs."""
    from persistor_spark.analytics.dedup import md5_hash64

    t = _tables(spark, sf_dir)
    keys = t.index_metadata.select(
        "unique_id", md5_hash64(F.col("unique_id")).alias("h")
    )

    def ring(n_nodes):
        rows = []
        for node in range(n_nodes):
            for v in range(8):
                rows.append((f"n{node}", f"n{node}#v{v}"))
        df = spark.createDataFrame(rows, "node string, vnode string")
        return df.select("node", md5_hash64(F.col("vnode")).alias("pos"))

    def assign(ring_df, out):
        r = F.broadcast(ring_df)
        # successor = min ring position >= key hash; wrap to global min
        succ = (
            keys.join(r, F.col("pos") >= F.col("h"), "left")
            .groupBy("unique_id", "h")
            .agg(F.min(F.struct("pos", "node")).alias("s"))
        )
        wrap = ring_df.agg(F.min(F.struct("pos", "node")).alias("w"))
        return succ.crossJoin(F.broadcast(wrap)).select(
            "unique_id",
            F.coalesce(F.col("s.node"), F.col("w.node")).alias(out),
        )
    a4 = assign(ring(4), "node4")
    a5 = assign(ring(5), "node5")
    both = a4.join(a5, "unique_id")
    return both.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.when(F.col("node4") != F.col("node5"), 1).otherwise(0)
        ).alias("moved"),
        F.round(
            F.sum(F.when(F.col("node4") != F.col("node5"), 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("moved_frac"),
    )


def _e59_forward_fill(spark, sf_dir):
    """Forward fill (last-observation-carried-forward) of a gappy sensor
    column: values blanked on a deterministic rule, then refilled with
    last_value(IGNORE NULLS) over per-user time order — the imputation
    primitive every time-series feature pipeline needs.  Per-user windows
    only; the fill marker survives so the oracle can pin which cells
    were imputed.  Summed per user to keep output bounded."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    gappy = ev.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.when(F.col("event_id") % 7 != 3, F.round("value", 4)).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = gappy.select(
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("ff"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_gaps"),
            F.sum(
                F.when(F.col("v").isNull() & F.col("ff").isNotNull(), 1).otherwise(0)
            ).alias("n_filled"),
            # exact-DECIMAL sum (the e46 pattern): ff values are 2-dp
            # fixture doubles, so decimal(12,6) casts are exact in both
            # engines, the sum is order-free, and the UNROUNDED double is
            # bit-identical — round(sum(double),4) was both summation-
            # order- and halfway-split-prone (r13 VERDICT #2)
            F.sum(_dec_exact(F.col("ff"), "decimal(12,6)"))
            .cast("double")
            .alias("sum_filled_series"),
        )
        .orderBy("user_id")
    )


def _d37_position_density(spark, sf_dir):
    """Blob position-density invariant: inside every blob the positions
    the writer assigned must be EXACTLY 1..n (dense, duplicate-free) or
    all-NULL for single-record blobs — the replay-ordering contract the
    resubmitter depends on (R6's position-align join is only correct if
    this holds).  One blob-keyed agg comparing count / distinct-count /
    min / max; violations surface per blob, the summary row asserts
    none."""
    t = _tables(spark, sf_dir)
    per = t.blob_records.groupBy("location_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("position").alias("n_pos"),
        F.count_distinct("position").alias("n_distinct"),
        F.min("position").alias("mn"),
        F.max("position").alias("mx"),
    )
    ok = (
        ((F.col("n_pos") == 0) & (F.col("n") == 1))
        | (
            (F.col("n_pos") == F.col("n"))
            & (F.col("n_distinct") == F.col("n"))
            & (F.col("mn") == 1)
            & (F.col("mx") == F.col("n"))
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(F.when(ok, 0).otherwise(1)).alias("violations"),
        F.sum(F.when(F.col("n_pos") == 0, 1).otherwise(0)).alias(
            "single_record_blobs"
        ),
        F.max("mx").alias("max_position"),
    )


def _a133_davies_bouldin(spark, sf_dir):
    """Davies–Bouldin clustering quality over the embedding labels: per
    label the scatter sigma = sqrt(E||v||² - ||c||²) and DB_i = max over
    j != i of (sigma_i + sigma_j) / ||c_i - c_j|| — the
    cluster-separation score that needs NO pairwise point join: one
    d-bounded agg yields centroids and scatters, the pairwise stage runs
    on the LABELS x d table (bounded by the label count), completing the
    clustering-eval family (a57 inter-centroid similarity, a131
    intra-label dispersion)."""
    embs = _embs(spark, sf_dir).select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    flat = embs.select("label", F.posexplode("v").alias("i", "x"))
    dims = flat.groupBy("label", "i").agg(
        F.avg("x").alias("c"), F.avg(F.col("x") * F.col("x")).alias("xx")
    )
    per = dims.groupBy("label").agg(
        F.sqrt(F.sum(F.col("xx")) - F.sum(F.col("c") * F.col("c"))).alias(
            "sigma"
        )
    )
    a = dims.select(F.col("label").alias("la"), "i", F.col("c").alias("ca"))
    b = dims.select(F.col("label").alias("lb"), "i", F.col("c").alias("cb"))
    dist = (
        a.join(b, ["i"])
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            ).alias("d")
        )
    )
    sa = per.select(F.col("label").alias("la"), F.col("sigma").alias("siga"))
    sb = per.select(F.col("label").alias("lb"), F.col("sigma").alias("sigb"))
    ratio = (
        dist.join(sa, "la")
        .join(sb, "lb")
        .select(
            "la", ((F.col("siga") + F.col("sigb")) / F.col("d")).alias("r")
        )
    )
    return (
        ratio.groupBy(F.col("la").alias("label"))
        .agg(F.round(F.max("r"), 4).alias("db_index"))
        .join(
            per.select(
                "label", F.round("sigma", 4).alias("sigma")
            ),
            "label",
        )
        .select("label", "sigma", "db_index")
        .orderBy("label")
    )


def _a134_ols_pandas(spark, sf_dir):
    """a122's per-source OLS re-executed through the Arrow path: one
    applyInPandas per source computes the IDENTICAL closed form from the
    IDENTICAL exact-integer sufficient sums in numpy float64 — the
    grouped-map UDF surface pinned against the same DuckDB oracle as the
    pure-SQL twin, proving the two execution paths agree bit-for-bit
    after rounding.  At scale the grouped-map shuffle is keyed by
    source; per-group state is ten floats."""
    import pandas as pd

    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    feats = docs.select(
        "source",
        F.size(toks).cast("long").alias("x"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
        F.col("n_chars").cast("long").alias("z"),
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        n = np.float64(len(pdf))
        x = pdf["x"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        z = pdf["z"].to_numpy(np.int64)
        sx, sy, sz = (
            np.float64(int(x.sum())),
            np.float64(int(y.sum())),
            np.float64(int(z.sum())),
        )
        sxx = np.float64(int((x * x).sum()))
        syy = np.float64(int((y * y).sum()))
        sxy = np.float64(int((x * y).sum()))
        sxz = np.float64(int((x * z).sum()))
        syz = np.float64(int((y * z).sum()))
        szz = np.float64(int((z * z).sum()))
        cxx, cyy = sxx - sx * sx / n, syy - sy * sy / n
        cxy = sxy - sx * sy / n
        cxz, cyz = sxz - sx * sz / n, syz - sy * sz / n
        czz = szz - sz * sz / n
        det = cxx * cyy - cxy * cxy
        b1 = (cyy * cxz - cxy * cyz) / det
        b2 = (cxx * cyz - cxy * cxz) / det
        icept = sz / n - b1 * sx / n - b2 * sy / n
        r2 = (b1 * cxz + b2 * cyz) / czz
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n": [len(pdf)],
                "b_words": [round(float(b1), 6)],
                "b_distinct": [round(float(b2), 6)],
                "intercept": [round(float(icept), 4)],
                "r2": [round(float(r2), 6)],
            }
        )

    return (
        feats.groupBy("source")
        .applyInPandas(
            fit,
            "source string, n long, b_words double, b_distinct double, "
            "intercept double, r2 double",
        )
        .orderBy("source")
    )


def _e60_max_concurrency(spark, sf_dir):
    """Peak concurrent sessions via the sweep line: e9's 30-minute-gap
    sessions become (+1 at start, -1 at end) points, the globally ordered
    running sum is the live-session count, its max is the capacity
    answer.  Ends sort before starts at the same instant (touching
    sessions don't overlap).  The global ordered cumsum is the two-level
    `sampling.global_cumsum` — range partition + literal offsets, exact
    integers, no single-partition window; sessionization itself is
    user-partitioned windows (_sessionized — shared with e9 so the two
    queries cannot disagree about what a session is)."""
    from persistor_spark.analytics.sampling import global_cumsum

    epoch = F.unix_timestamp("ts")
    flagged = _sessionized(spark, sf_dir)
    sess = flagged.groupBy("user_id", "session_id").agg(
        F.min(epoch).alias("t0"), F.max(epoch).alias("t1")
    )
    n_sessions = sess.count()
    points = sess.select(
        F.col("t0").alias("t"), F.lit(1).cast("long").alias("d"),
        "user_id", "session_id",
    ).unionByName(
        sess.select(
            F.col("t1").alias("t"), F.lit(-1).cast("long").alias("d"),
            "user_id", "session_id",
        )
    )
    swept, _total = global_cumsum(
        points,
        "d",
        [F.col("t").asc(), F.col("d").asc(), F.col("user_id").asc(),
         F.col("session_id").asc()],
        "live",
    )
    peak = swept.agg(F.max("live").alias("mx")).collect()[0]["mx"]
    first = swept.filter(F.col("live") == peak).agg(
        F.min("t").alias("t_first_peak")
    )
    return first.select(
        F.lit(n_sessions).alias("n_sessions"),
        F.lit(peak).alias("max_concurrent"),
        "t_first_peak",
    )


def _a135_matryoshka_quality(spark, sf_dir):
    """Matryoshka truncation quality: for prefix dims 8/16/32, the mean
    cosine between each full embedding and its truncated prefix — which
    for a zero-padded prefix is exactly sqrt(prefix energy / total
    energy) — the audit that decides how small a serving index can go
    before recall collapses (MRL).  Pure per-row expressions (two
    bounded folds per dim choice), one label-keyed agg; no joins at any
    scale."""
    embs = _embs(spark, sf_dir).select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    total = F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)
    cols = [F.count(F.lit(1)).alias("n")]
    for d in (8, 16, 32):
        part = F.aggregate(
            F.slice(F.col("v"), 1, d), F.lit(0.0), lambda a, x: a + x * x
        )
        cols.append(
            F.round(F.avg(F.sqrt(part / total)), 4).alias(f"mean_cos_d{d}")
        )
    return embs.groupBy("label").agg(*cols).orderBy("label")


def _a136_curriculum_interleave(spark, sf_dir):
    """Curriculum training order with stratified interleave: rank docs
    inside each source by difficulty (ascending n_chars — easy first),
    then emit in (rank, source) order so every source appears once per
    round-robin pass — the training-order scheduler that prevents one
    source from front-loading an epoch.  Per-source ranked windows
    (partition = one source) + a global TakeOrdered head; output bounded
    to the first 60 schedule slots."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("pass_rank")
    )
    order = [F.col("pass_rank").asc(), F.col("source").asc()]
    top = ranked.orderBy(*order).limit(60)
    ws = Window.partitionBy(F.pmod(F.col("doc_id"), F.lit(1))).orderBy(*order)
    return (
        top.withColumn("slot", F.row_number().over(ws).cast("long"))
        .select("slot", "source", "doc_id", "n_chars", "pass_rank")
        .orderBy("slot")
    )


def _e61_fk_integrity(spark, sf_dir):
    """Schema-wide referential-integrity audit: one row per foreign-key
    edge with child row count, orphan count (children whose parent key is
    absent — a left anti join per edge), and the orphan rate — the
    relational counterpart of d23's index<->blob audit.  Every probe is a
    key-only anti-join (column-pruned scans, broadcastable parent key
    sets when dims are small)."""
    from persistor_spark.sources.registry import load_table

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem"]
    }
    edges = [
        ("orders.o_custkey -> customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey"),
        ("lineitem.l_orderkey -> orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey"),
        ("lineitem.l_partkey -> part", t["lineitem"], "l_partkey",
         t["part"], "p_partkey"),
        ("lineitem.l_suppkey -> supplier", t["lineitem"], "l_suppkey",
         t["supplier"], "s_suppkey"),
        ("customer.c_nationkey -> nation", t["customer"], "c_nationkey",
         t["nation"], "n_nationkey"),
        ("nation.n_regionkey -> region", t["nation"], "n_regionkey",
         t["region"], "r_regionkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in edges:
        n_child = child.count()
        orphans = child.select(F.col(ck).alias("k")).join(
            parent.select(F.col(pk).alias("k")), "k", "left_anti"
        ).count()
        parts.append((name, n_child, orphans))
    out = spark.createDataFrame(
        parts, "fk_edge string, n_child long, n_orphans long"
    )
    return out.select(
        "fk_edge",
        "n_child",
        "n_orphans",
        # UNROUNDED integer quotient (the e46 class)
        (F.col("n_orphans").cast("double") / F.col("n_child")).alias(
            "orphan_rate"
        ),
    ).orderBy("fk_edge")


def _a137_rolling_distinct_sketch(spark, sf_dir):
    """Trailing-7-day distinct users ESTIMATED from mergeable daily KMV
    sketches — the sketch answer to e43's exact rolling distinct (at
    100 TB the exact version re-touches every (day, user) row per grid
    day; the sketch version keeps k=64 hashes PER DAY and unions 7 tiny
    sketches per window).  Daily sketch = bottom-k of user-id hashes
    (one day-keyed MIN-k agg); the window union fans each day's k rows
    to <= 7 grid days (e43's contribution form) and re-takes bottom-k —
    exact bottom-k-of-union semantics, the KMV merge property.  Output
    joins the exact count for the honesty column (relative error)."""
    from pyspark.sql import Window

    from persistor_spark.analytics.dedup import md5_hash64
    from persistor_spark.analytics.sketches import _kmv_est

    k = 64
    ev = _events(spark, sf_dir)
    dh = (
        ev.select(
            F.to_date("ts").alias("day"), md5_hash64(F.col("user_id").cast("string")).alias("h")
        )
        .groupBy("day", "h")
        .agg(F.lit(1))
        .select("day", "h")
    )
    wd = Window.partitionBy("day").orderBy("h")
    daily_sk = (
        dh.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    contrib = (
        daily_sk.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
                "gday"
            ),
            "h",
        )
        .groupBy("gday", "h")
        .agg(F.lit(1))
        .select("gday", "h")
    )
    wg = Window.partitionBy("gday").orderBy("h")
    union_sk = (
        contrib.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    est = union_sk.groupBy("gday").agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")
    ).select(
        "gday", F.round(_kmv_est(F.col("n"), F.col("hk"), k), 4).alias("est_users_7d")
    )
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    exact = (
        du.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
                "gday"
            ),
            "user_id",
        )
        .distinct()
        .join(du.select(F.col("day").alias("gday")).distinct(), "gday")
        .groupBy("gday")
        .agg(F.count_distinct("user_id").alias("users_7d"))
    )
    return (
        est.join(exact, "gday")
        .select(
            "gday",
            "users_7d",
            "est_users_7d",
            F.round(
                (F.col("est_users_7d") - F.col("users_7d")) / F.col("users_7d"), 4
            ).alias("rel_err"),
        )
        .orderBy("gday")
    )


def _a138_kcore_peel(spark, sf_dir):
    """k-core peeling over the purchase graph (k = integer mean degree
    + 1, so the threshold scales with the graph): four rounds of
    remove-nodes-below-k / restrict-edges-to-survivors, reporting nodes
    and directed edges remaining per round — the dense-subgraph
    extraction behind spam-cluster and power-user detection.  Each round
    is one degree agg + two semi-joins, edge table localCheckpointed per
    round (the CC/BFS flat-plan pattern); rounds are a constant, so the
    plan never grows."""
    from persistor_spark.analytics import graph
    from persistor_spark.sources.registry import load_table

    edges = graph.bipartite_interaction_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    d0 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tot = d0.agg(F.sum("deg").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    k = tot["s"] // tot["n"] + 1
    rows = []
    cur = edges
    for rnd in range(1, 5):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        cur = (
            cur.join(keep.select(F.col("node").alias("src")), "src", "left_semi")
            .join(keep.select(F.col("node").alias("dst")), "dst", "left_semi")
            .localCheckpoint()
        )
        rows.append((rnd, keep.count(), cur.count()))
    return spark.createDataFrame(
        rows, "round long, n_nodes long, n_edges long"
    ).select("round", "n_nodes", "n_edges", F.lit(int(k)).alias("k")).orderBy(
        "round"
    )


def _a139_length_bucket_waste(spark, sf_dir):
    """Sequence-length bucketing efficiency: assign each doc to its
    next-power-of-two token-length bucket and compare padding waste
    against padding everything to the global max — the batching decision
    (bucketed batches cut pad FLOPs) quantified per bucket plus the
    summary row.  Bucket cap is exact integer bit math (2^ceil(log2 n)
    via the shift loop both engines express as POW on exact ints after a
    floor-log2); one bounded agg, key space = log2(max_len) buckets."""
    docs = _docs(spark, sf_dir)
    n = F.size(F.split("text", " ")).cast("long")
    # next power of two >= n (n >= 1): 2^ceil(log2(n)) with exact-integer
    # comparisons — pow/log floats only pick the EXPONENT, and a final
    # integer compare repairs any boundary rounding
    exp = F.ceil(F.log2(n.cast("double"))).cast("long")
    cap0 = F.pow(F.lit(2.0), exp.cast("double")).cast("long")
    cap = F.when(cap0 < n, cap0 * 2).when(
        (cap0 >= n * 2) & (n > 0), cap0 / F.lit(2)
    ).otherwise(cap0).cast("long")
    lens = docs.select(n.alias("len"), cap.alias("cap"))
    mx = lens.agg(F.max("len").alias("m")).collect()[0]["m"]
    per = lens.groupBy("cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len").alias("tokens"),
        F.sum(F.col("cap") - F.col("len")).alias("pad_bucketed"),
        F.sum(F.lit(mx) - F.col("len")).alias("pad_global"),
    )
    return per.select(
        "cap",
        "n_docs",
        "tokens",
        "pad_bucketed",
        "pad_global",
        F.round(
            F.col("pad_bucketed") / (F.col("tokens") + F.col("pad_bucketed")), 4
        ).alias("bucketed_waste_frac"),
        F.round(
            F.col("pad_global") / (F.col("tokens") + F.col("pad_global")), 4
        ).alias("global_waste_frac"),
    ).orderBy("cap")


# ---------------------------------------------------------------------------
# r9 growth: the composed curation pipeline as ONE pinned chain, plus the
# windowed stream-quality analytics family (streaming/windows.py +
# analytics/profiling.py) — r8 VERDICT #2's named next surface
# ---------------------------------------------------------------------------


def _day_bucket(col="ts"):
    """Epoch-aligned 1-day tumbling bucket as BIGINT seconds — the oracle-
    portable face of F.window(ts, '1 day') under the UTC session."""
    return (F.floor(F.unix_timestamp(col) / 86400) * 86400).cast("long")


def _a140_curation_e2e(spark, sf_dir):
    """The WHOLE training-data curation pipeline as one pinned chain
    (r8 VERDICT #2: not stage-by-stage): quality gate (a13's scoring) ->
    near-dup removal (shared 0.8 Jaccard pairs -> CC representatives) ->
    eval-set decontamination (a20's 5-gram posting join, doc_id%7==0 as
    the held-out eval stand-in) -> sequence packing (a29's 1024-token
    budget over 4 hash shards) -> split assignment (a39's hash intervals)
    -> per-(split, source) corpus card.  Every stage is the same audited
    scale shape as its stand-alone pin; what this adds is the COMPOSITION
    — each stage consumes the previous one's survivors, so a bug that
    only shows in interaction (gate narrowing the pair set, dedup
    changing pack offsets) breaks the hash."""
    from persistor_spark.analytics import dedup, sampling, text

    docs = _docs(spark, sf_dir)
    scored = text.with_text_stats(docs)
    gated = scored.filter(F.col("quality_score") >= 0.6)
    ids = gated.select("doc_id")
    pairs = (
        _shared_pairs(spark, sf_dir, 0.8)
        .join(ids.withColumnRenamed("doc_id", "a"), "a", "semi")
        .join(ids.withColumnRenamed("doc_id", "b"), "b", "semi")
    )
    clusters = dedup.dedup_clusters(pairs)
    kept = dedup.keep_cluster_representatives(gated, clusters)
    eval_df = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = kept.filter(F.col("doc_id") % 7 != 0)
    clean = dedup.decontaminate(corpus, eval_df)
    packed = sampling.pack_sequences(
        clean.select("doc_id", "source", "quality_score", "token_count"),
        1024,
        n_shards=4,
        token_col="token_count",
    )
    split = sampling.assign_splits(
        packed, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
    )
    return (
        split.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").cast("long").alias("n_tokens"),
            F.sum("spans").cast("long").alias("total_spans"),
            # order-independent mean: quality is round(.,4), so summing the
            # exact x10000 integers dodges the float-sum-order knife edge
            # (0.82915 rounded either way depending on accumulation order)
            F.round(
                F.sum(F.round(F.col("quality_score") * 10000).cast("long"))
                / (F.count(F.lit(1)) * 10000.0),
                4,
            ).alias("avg_quality"),
        )
        .orderBy("split", "source")
    )


def _a141_windowed_dup_rate(spark, sf_dir):
    """Per-day duplicate rate over the (user, event_type) dedup key — the
    monitoring face of the dedup gate (streaming/windows.py
    windowed_dup_rate; chained window-keyed aggs, batch mode pinned)."""
    from persistor_spark.streaming import windows

    out = windows.windowed_dup_rate(
        _events(spark, sf_dir), "1 day", ("user_id", "event_type"), "ts"
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "n_rows",
        "n_keys",
        "dup_rate",
    ).orderBy("bucket")


def _a142_window_category_drift(spark, sf_dir):
    """Per-day event-mix drift: total-variation distance vs the previous
    window's event_type distribution (windows.windowed_category_drift —
    tumbling regularity turns 'previous' into an equi-join, no ordered
    pass over the aggregate).  First window reports NULL."""
    from persistor_spark.streaming import windows

    out = windows.windowed_category_drift(
        _events(spark, sf_dir), "1 day", "event_type", "ts"
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "tv_drift",
    ).orderBy("bucket")


def _a143_quality_psi(spark, sf_dir):
    """Population-stability-index drift of document length per source vs
    the whole-corpus reference deciles (profiling.psi_by_group): the
    scorecard-style 'did this feed's distribution move' alarm.  Edges are
    ONE exact-percentile row; both probability tables are
    (sources x 10)-bounded."""
    from persistor_spark.analytics import profiling

    return profiling.psi_by_group(_docs(spark, sf_dir), "n_chars", "source")


def _a144_ks_event_value(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance of the `value` metric for
    every event-type pair (profiling.ks_two_sample_pairs): tie-safe ECDFs
    at grouped support points, one ordered cumsum per pair — work tracks
    pairs x distinct values, never rows^2."""
    from persistor_spark.analytics import profiling

    return profiling.ks_two_sample_pairs(_events(spark, sf_dir), "value", "event_type")


def _a145_late_arrivals(spark, sf_dir):
    """Per-day late-arrival rate under a 1-hour watermark with arrival
    order = event_id (windows.late_arrival_stats): exactly the rows
    withWatermark('ts', '1 hour') would drop — the sizing diagnostic run
    BEFORE deploying a watermark."""
    from persistor_spark.streaming import windows

    out = windows.late_arrival_stats(
        _events(spark, sf_dir), "1 hour", "1 day", "ts", "event_id"
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "n_rows",
        "n_late",
        "late_rate",
    ).orderBy("bucket")


def _a146_window_percentiles(spark, sf_dir):
    """Per-day exact p50/p90/p99 of the event value (windows.
    windowed_percentiles) — the event-time twin of the E4 per-batch
    metrics; exact percentile keeps DuckDB quantile_cont parity."""
    from persistor_spark.streaming import windows

    out = windows.windowed_percentiles(_events(spark, sf_dir), "value", "1 day", "ts")
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "n",
        "p50",
        "p90",
        "p99",
    ).orderBy("bucket")


def _a147_new_key_rate(spark, sf_dir):
    """Per-day first-seen (new-user) rate: streaming_first_seen aggregated
    to window grain (windows.window_new_key_rate) — the novelty monitor
    for an arriving feed.  Key-bounded and window-bounded shuffles only."""
    from persistor_spark.streaming import windows

    out = windows.window_new_key_rate(
        _events(spark, sf_dir), "user_id", "1 day", "ts", "event_id"
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "n_rows",
        "n_keys",
        "n_new",
        "new_key_rate",
    ).orderBy("bucket")


def _a148_window_anomaly(spark, sf_dir):
    """Per-day anomaly z-score of total event value against the TRAILING
    7-window baseline (windows.windowed_trailing_anomaly) — e32's monitor
    made online: no future leakage, so each window's score is final the
    moment it closes.  Windows with <2 predecessors report NULL."""
    from persistor_spark.streaming import windows

    out = windows.windowed_trailing_anomaly(
        _events(spark, sf_dir), "value", "1 day", "ts", trailing=7
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "total",
        "trailing_z",
    ).orderBy("bucket")


def _a149_windowed_hll_users(spark, sf_dir):
    """Per-day HyperLogLog register tables for distinct users
    (sketches.hll_registers_grouped): the mergeable distinct-count
    monitor a stream ships per window — |windows| x 2^p rows regardless
    of volume, and the a91 integer-exact rho keeps the SQL rebuild an
    exact oracle."""
    from persistor_spark.analytics import sketches

    ev = _events(spark, sf_dir).select(
        _day_bucket("ts").alias("bucket"), "user_id"
    )
    return (
        sketches.hll_registers_grouped(ev, "user_id", ["bucket"], p=8)
        .orderBy("bucket", "register")
    )


def _a150_dup_lineage(spark, sf_dir):
    """Dedup survivorship lineage: for every REMOVED near-dup doc, the
    representative that kept its place plus the cross-source flag — the QA
    handoff artifact behind a11's clusters (review queues ask 'what did we
    drop and what stands in for it', not 'what are the components').
    Component map is the session-shared CC output; two broadcastable
    id-keyed joins attach the sources."""
    cl = _shared_components(spark, sf_dir).filter(
        F.col("doc_id") != F.col("cluster_id")
    )
    docs = _docs(spark, sf_dir)
    removed = docs.select(
        F.col("doc_id"), F.col("source").alias("removed_source")
    )
    kept = docs.select(
        F.col("doc_id").alias("cluster_id"), F.col("source").alias("kept_source")
    )
    return (
        cl.join(removed, "doc_id")
        .join(kept, "cluster_id")
        .select(
            F.col("doc_id").alias("removed_id"),
            F.col("cluster_id").alias("kept_id"),
            "removed_source",
            "kept_source",
            (F.col("removed_source") == F.col("kept_source")).alias("same_source"),
        )
        .orderBy("removed_id")
    )


def _a151_window_funnel(spark, sf_dir):
    """Daily conversion funnel (e27 made windowed): per day and user, the
    first view / first click AFTER that view / first purchase AFTER that
    click, aggregated to per-window funnel counts + rates — the funnel a
    stream monitor emits per closed window.  One (window, user) agg with
    conditional mins, then one window-bounded agg."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy(
        _day_bucket("ts").alias("bucket"), F.col("user_id")
    ).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    # coalesce the NULL-propagating comparisons to False: a bucket whose
    # viewed users never click would otherwise sum an all-NULL clicked
    # column to NULL while the oracle's CASE...ELSE 0 sums to 0 (r9 review)
    clicked = F.col("v").isNotNull() & F.coalesce(
        F.col("c") > F.col("v"), F.lit(False)
    )
    flags = per_user.select(
        "bucket",
        F.col("v").isNotNull().cast("long").alias("viewed"),
        clicked.cast("long").alias("clicked"),
        (clicked & F.coalesce(F.col("p") > F.col("c"), F.lit(False)))
        .cast("long")
        .alias("purchased"),
    )
    return (
        flags.groupBy("bucket")
        .agg(
            F.sum("viewed").cast("long").alias("n_view_users"),
            F.sum("clicked").cast("long").alias("n_clicked"),
            F.sum("purchased").cast("long").alias("n_purchased"),
        )
        .filter(F.col("n_view_users") > 0)
        .withColumn(
            # UNROUNDED integer quotients (the e46 class)
            "click_rate",
            F.col("n_clicked").cast("double") / F.col("n_view_users"),
        )
        .withColumn(
            "purchase_rate",
            F.col("n_purchased").cast("double") / F.col("n_view_users"),
        )
        .orderBy("bucket")
    )


def _a152_session_stats(spark, sf_dir):
    """Daily session-quality rollup: 30-minute-gap sessions per user (the
    e9 sessionize logic), then per DAY of session start: session count,
    mean events per session, mean duration — the engagement trend a
    session_window stream feeds.  Per-user windows are user-bounded; the
    day rollup is window-bounded."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "dur_s"
        ),
    )
    return (
        per_sess.groupBy(_day_bucket("start_ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.round(F.avg("dur_s"), 4).alias("avg_duration_s"),
            F.max("n_events").cast("long").alias("max_events"),
        )
        .orderBy("bucket")
    )


def _a153_watermark_curve(spark, sf_dir):
    """The watermark sizing curve (windows.watermark_sizing_curve): late
    rate at four candidate delays in ONE pass over the arrival-ordered
    stream — run this, pick the smallest acceptable delay, deploy it as
    withWatermark.  a145 reports the chosen delay's per-window detail;
    this picks the delay."""
    from persistor_spark.streaming import windows

    return windows.watermark_sizing_curve(
        _events(spark, sf_dir),
        ("10 minutes", "30 minutes", "1 hour", "2 hours"),
        "ts",
        "event_id",
    ).orderBy("delay_seconds")


def _a154_attribution_rate(spark, sf_dir):
    """Daily view->purchase attribution (e21's interval join aggregated to
    window grain): fraction of each day's view events with a same-user
    purchase within 10 minutes — the windowed KPI face of the
    stream-stream interval join.  The range join is user-keyed; per-view
    dedup (any purchase counts once) is a (view)-keyed agg."""
    ev = _events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    att = (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 10 MINUTES")),
            "left",
        )
        .groupBy("view_id", "vts")
        .agg(F.max(F.col("pts").isNotNull().cast("long")).alias("attributed"))
    )
    return (
        att.groupBy(_day_bucket("vts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.sum("attributed").cast("long").alias("n_attributed"),
        )
        .withColumn(
            # UNROUNDED integer quotient (the e46 class)
            "attribution_rate",
            F.col("n_attributed").cast("double") / F.col("n_views"),
        )
        .orderBy("bucket")
    )


def _stream_events_source(spark, sf_dir):
    """The events fixture as a STREAMING source.  Declaring ts as
    TIMESTAMP_NTZ makes the file source itself truncate the parquet
    TIMESTAMP(NANOS) to us — verified byte-identical to the batch
    loader's integer-div conversion (sources/registry.py), so the
    streaming twins hash-match the DuckDB oracle.  Watermarks reject NTZ,
    so ts is cast to TIMESTAMP after the read — the session timezone is
    pinned UTC (session.py), making the cast epoch-preserving."""
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        # the [t] glob makes the single fixture FILE stream-readable: the
        # file source requires a directory basePath, and a glob resolves
        # basePath to the parent dir instead of the file itself
        .parquet(f"{sf_dir}/events.parque[t]")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _stream_sink(spark, sf_dir, tag: str) -> str:
    """One cached temp sink root per (session, sf_dir, tag): the streaming
    pins run their query ONCE and every later call reads the sink (the
    d19 OCF cache pattern — checkpoint reuse makes re-running a no-op
    anyway, this just skips the no-op query)."""
    key = (id(spark), sf_dir, f"stream-{tag}")
    with _CACHE_LOCK:
        if key not in _CACHE:
            import atexit
            import shutil
            import tempfile

            base = tempfile.mkdtemp(prefix=f"persistor_stream_{tag}_")
            atexit.register(shutil.rmtree, base, ignore_errors=True)
            _CACHE[key] = base
        return _CACHE[key]


def _a155_drift_stream(spark, sf_dir):
    """a142's drift monitor STREAMING-EXECUTED (r9 VERDICT #4 pinned on
    the driver record): run_category_counts_stream sinks the closed
    per-(day, event_type) counts as a real availableNow query over a
    parquet file stream; category_drift_from_counts composes the sink
    through the same _drift_from_counts tail as the batch twin.  The
    oracle is a142's SQL restricted to closed windows (window end <=
    max(ts) - the 2h watermark) — the streaming result must equal the
    batch computation on every window the watermark closed."""
    from persistor_spark.streaming import windows

    base = _stream_sink(spark, sf_dir, "drift")
    out, ckpt = f"{base}/counts", f"{base}/ckpt"
    # done-marker, not isdir(out): a query that failed mid-run leaves a
    # partial sink a bare existence check would silently serve
    if not os.path.exists(f"{base}/done"):
        q = windows.run_category_counts_stream(
            spark,
            None,
            out,
            ckpt,
            window="1 day",
            cat_col="event_type",
            time_col="ts",
            watermark="2 hours",
            source_df=_stream_events_source(spark, sf_dir),
        )
        # awaitTermination returns False on TIMEOUT without raising (r10
        # advisor): marking done then would permanently serve a partial
        # sink.  availableNow over the sf0.01 fixture finishes in seconds;
        # 600 s only trips if the query genuinely hung.
        if not q.awaitTermination(600):
            raise TimeoutError("a155 drift stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    drift = windows.category_drift_from_counts(spark, out, "1 day")
    return drift.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "tv_drift",
    ).orderBy("bucket")


def _a156_new_key_stream(spark, sf_dir):
    """a147's novelty monitor STREAMING-EXECUTED: the chained totals
    aggregation plus the applyInPandasWithState first-occurrence ledger
    run as availableNow queries (run_new_key_rate_stream);
    new_key_rate_from_sinks joins the two sinks back into the batch
    twin's columns.  Oracle = a147's SQL on closed windows only."""
    from persistor_spark.streaming import windows

    base = _stream_sink(spark, sf_dir, "newkey")
    tot, led = f"{base}/totals", f"{base}/ledger"
    if not os.path.exists(f"{base}/done"):
        qt, ql = windows.run_new_key_rate_stream(
            spark,
            None,
            tot,
            led,
            f"{base}/ck_tot",
            f"{base}/ck_led",
            key_col="user_id",
            window="1 day",
            time_col="ts",
            tiebreak_col="event_id",
            watermark="2 hours",
            source_df=_stream_events_source(spark, sf_dir),
        )
        # see a155: False = timeout, and a timed-out query must not be
        # marked done (its partial sink would be served forever)
        if not qt.awaitTermination(600):
            raise TimeoutError("a156 totals stream did not finish in 600s")
        if not ql.awaitTermination(600):
            raise TimeoutError("a156 ledger stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    out = windows.new_key_rate_from_sinks(spark, tot, led, "1 day")
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket"),
        "n_rows",
        "n_keys",
        "n_new",
        "new_key_rate",
    ).orderBy("bucket")


def _a157_dup_rate_stream(spark, sf_dir):
    """a141's dup-rate monitor STREAMING-EXECUTED in the driver gate (the
    r9 runner, now pinned the way a155/a156 pin the r10 runners): the
    chained stateful aggregation runs as an availableNow query with a
    parquet sink; the sink rows ARE the result.  Oracle = a141's SQL on
    closed windows — with this, all three run_*_stream runners have
    driver-record streaming executions, not just pytest ones."""
    from persistor_spark.streaming import windows

    base = _stream_sink(spark, sf_dir, "duprate")
    out, ckpt = f"{base}/rates", f"{base}/ckpt"
    if not os.path.exists(f"{base}/done"):
        q = windows.run_dup_rate_stream(
            spark,
            None,
            out,
            ckpt,
            window="1 day",
            key_cols=("user_id", "event_type"),
            time_col="ts",
            watermark="2 hours",
            source_df=_stream_events_source(spark, sf_dir),
        )
        # see a155: False = timeout; never mark a hung query's sink done
        if not q.awaitTermination(600):
            raise TimeoutError("a157 dup-rate stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    return (
        spark.read.parquet(out)
        .select(
            F.unix_timestamp("window_start").cast("long").alias("bucket"),
            "n_rows",
            "n_keys",
            "dup_rate",
        )
        .orderBy("bucket")
    )


def _d39_resubmit_e2e_ocf(spark, sf_dir):
    """d38's composed resubmit chain with the blob side routed through the
    LIVE Avro OCF path (d19's write-OCF-then-distributed-scan cache) —
    the d9-vs-d19 format-invariance pin lifted to the WHOLE pipeline:
    same oracle as d38, so a format-induced difference anywhere in
    query -> prune -> align -> order -> manifest breaks the hash."""
    from persistor_spark.plans import resubmit

    t = _tables(spark, sf_dir)
    blobs = _ocf_blob_records(spark, sf_dir)
    flt = [
        {"business_source_key": "src1"},
        {"business_source_key": "src2", "ordering_key": "k3"},
    ]
    ids = _iq(spark, sf_dir).query_df(flt, ["unique_id"])
    meta = t.index_metadata.join(F.broadcast(ids), "unique_id", "left_semi")
    ordered = resubmit.with_publish_order(resubmit.align(meta, blobs))
    return (
        ordered.groupBy("ordering_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(F.length("payload")).cast("long").alias("n_bytes"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("publish_seq", "unique_id"))
                    ),
                    lambda x: x["unique_id"],
                ),
                ",",
            ).alias("uid_chain"),
        )
        .orderBy("ordering_key")
    )


def _d38_resubmit_e2e(spark, sf_dir):
    """The WHOLE resubmit pipeline as one pinned chain (r9 VERDICT #6 —
    the R-side mirror of a140's composed curation pin, matching
    resubmitter_test.go:52-1045's whole-pipeline assertions): replay
    request through the REAL query surface (Q5 OR-of-ANDs -> unique_id
    page, R1-R3) -> broadcast semi-join prune of the metadata (Q2's
    IN-list shape) -> position-align blob join incl. the NULL-position
    single-record arm (R6) -> per-ordering-key publish sequence (R7) ->
    per-key publish manifest whose uid_chain string pins the EXACT
    publish order (R9's accounting face).  A bug that only shows in
    interaction — the query page narrowing the join, the join reordering
    the sequence — breaks the hash."""
    from persistor_spark.plans import resubmit

    t = _tables(spark, sf_dir)
    flt = [
        {"business_source_key": "src1"},
        {"business_source_key": "src2", "ordering_key": "k3"},
    ]
    ids = _iq(spark, sf_dir).query_df(flt, ["unique_id"])
    meta = t.index_metadata.join(F.broadcast(ids), "unique_id", "left_semi")
    records = resubmit.align(meta, t.blob_records)
    ordered = resubmit.with_publish_order(records)
    return (
        ordered.groupBy("ordering_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(F.length("payload")).cast("long").alias("n_bytes"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("publish_seq", "unique_id"))
                    ),
                    lambda x: x["unique_id"],
                ),
                ",",
            ).alias("uid_chain"),
        )
        .orderBy("ordering_key")
    )


def _d40_lifecycle_e2e(spark, sf_dir):
    """The FULL §3.1+§3.3 lifecycle as ONE driver hash (r10 VERDICT #6a):
    messages -> STREAMING ingest (4 deterministic micro-batches through
    run_stream's foreachBatch handler, exactly-once merge sinks, the same
    ~1.2% failure injection) -> index + blob parquet sinks -> the REAL
    query surface over the STREAMED index (Q5 OR-of-ANDs page) -> d38's
    whole resubmit chain over the STREAMED blobs.  The oracle rebuilds
    the batch-scoped location keys (blob name carries `-b<batch_id>`,
    positions restart per batch — run_stream's documented blob-identity
    contract) in portable SQL, so the hash pins BOTH that the streaming
    ingest derives exactly the prescribed index/blob tables AND that the
    composed chain holds over them.  Micro-batch identity is pinned by
    chunking on event_seq % 4 with strictly increasing file mtimes
    (availableNow + maxFilesPerTrigger=1 processes files in mtime order,
    so batch_id == chunk index)."""
    import time as _time

    from persistor_spark.plans import resubmit
    from persistor_spark.streaming import ingest_stream

    base = _stream_sink(spark, sf_dir, "lifecycle")
    blob_p, idx_p = f"{base}/blobs", f"{base}/index"
    if not os.path.exists(f"{base}/done"):
        src = f"{base}/src"
        msgs = fixtures.load_messages(spark, sf_dir)
        seen: set = set()
        t0 = _time.time()
        for i in range(4):
            (
                msgs.filter(F.col("event_seq") % 4 == i)
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in seen:
                    os.utime(f"{src}/{f}", (t0 - 400 + i * 100,) * 2)
                    seen.add(f)
        sinks = ingest_stream.StreamSinks(
            blob_path=blob_p,
            index_path=idx_p,
            deadletter_path=f"{base}/dlq",
            checkpoint_path=f"{base}/ckpt",
        )
        q, _ = ingest_stream.run_stream(
            ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
            fixtures.fixture_ingest_config(),
            sinks,
            failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
        )
        # False = timeout: never mark a hung query's partial sinks done
        if not q.awaitTermination(600):
            raise TimeoutError("d40 ingest stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    idx = spark.read.parquet(idx_p)
    blobs = spark.read.parquet(blob_p)
    flt = [
        {"business_source_key": "src1"},
        {"business_source_key": "src2", "ordering_key": "k3"},
    ]
    ids = IndexQuery(idx).query_df(flt, ["unique_id"])
    meta = idx.join(F.broadcast(ids), "unique_id", "left_semi")
    ordered = resubmit.with_publish_order(resubmit.align(meta, blobs))
    return (
        ordered.groupBy("ordering_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(F.length("payload")).cast("long").alias("n_bytes"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("publish_seq", "unique_id"))
                    ),
                    lambda x: x["unique_id"],
                ),
                ",",
            ).alias("uid_chain"),
        )
        .orderBy("ordering_key")
    )


def _d41_multi_consumer(spark, sf_dir):
    """TWO racing consumers drain ONE subscription with an injected lease
    expiry, oracle-pinned to exactly-once accounting (r10 VERDICT #6b —
    the handler_test.go:429-645 redelivery matrix at the protocol level,
    on the driver record instead of pytest).  Consumer A leases the first
    batch and crashes (never settles); the deadline passes; consumer B —
    a SECOND FileSubscription handle on the same subscription root —
    drains everything.  Deterministic: publish_time := event_seq seconds
    makes publish order, message_ids, and delivery order pure SQL, so the
    oracle states the full accounting — every message delivered, the
    crashed batch (the first BATCH ids in delivery order) delivered
    exactly twice, everything else exactly once."""
    from persistor_spark.sources.file_subscription import FileSubscription

    BATCH = 1000
    base = _stream_sink(spark, sf_dir, "multiconsumer")
    out = f"{base}/result"
    if not os.path.exists(f"{base}/done"):
        now = [1_000.0]
        mk = lambda: FileSubscription(  # noqa: E731
            f"{base}/sub",
            batch_size=BATCH,
            ack_deadline_s=60,
            max_outstanding_messages=10**9,
            max_outstanding_bytes=10**15,
            clock=lambda: now[0],
        )
        consumer_a, consumer_b = mk(), mk()
        msgs = fixtures.load_messages(spark, sf_dir).select(
            "payload",
            F.timestamp_seconds(F.col("event_seq")).alias("publish_time"),
        )
        consumer_a.publish(msgs)
        delivered = [consumer_a.pull(spark).select("message_id", "data")]
        now[0] += 120.0  # A crashed; its lease expires
        # A (recovered) and B ALTERNATE pulls mid-drain: the lease flock
        # means each pull takes the next batch in delivery order no matter
        # which handle issued it, so the accounting oracle is identical —
        # but the interleaving exercises two handles mutating one
        # subscription's state concurrently
        drainers = [consumer_b, consumer_a]
        i = 0
        while True:
            consumer = drainers[i % 2]
            i += 1
            batch = consumer.pull(spark)
            if batch.limit(1).count() == 0:
                break
            delivered.append(batch.select("message_id", "data"))
            consumer.ack_df(batch)
        acc = delivered[0]
        for d in delivered[1:]:
            acc = acc.unionByName(d)
        (
            acc.groupBy("message_id", F.col("data").cast("string").alias("payload"))
            .agg(F.count(F.lit(1)).cast("long").alias("deliveries"))
            .write.mode("overwrite")
            .parquet(out)
        )
        open(f"{base}/done", "w").close()
    return (
        spark.read.parquet(out)
        .select("message_id", "payload", "deliveries")
        .orderBy("message_id")
    )


def _d42_dedup_gate_stream(spark, sf_dir):
    """The stateful dedup GATE (windows.dedup_gate_rows fused into
    run_stream via dedup_gate=True) EXECUTED on the driver record — the
    last applyInPandasWithState operator that had only pytest coverage.
    Three micro-batches (maxFilesPerTrigger=1, mtime-pinned): the first
    half of the messages, then the SAME half redelivered with
    ingestion_time +2 min (the broker at-least-once arm,
    handler_test.go:429-645), then the second half.  Both merge writers
    are OFF (exactly_once_index/blobs=False), so the gate alone stands
    between the redelivery and the index sink; the oracle is the batch
    prologue's index_metadata on the non-location columns — one row per
    key, with the FIRST delivery's timestamps (a leaked duplicate would
    shift ingestion_time by +2 min and break the hash, not just the
    row count)."""
    import time as _time

    from persistor_spark.streaming import ingest_stream

    base = _stream_sink(spark, sf_dir, "dedupgate")
    idx_p = f"{base}/index"
    if not os.path.exists(f"{base}/done"):
        src = f"{base}/src"
        msgs = fixtures.load_messages(spark, sf_dir)
        half = msgs.filter(F.col("event_seq") % 2 == 0)
        redelivered = half.withColumn(
            "ingestion_time", F.col("ingestion_time") + F.expr("INTERVAL 2 MINUTES")
        )
        rest = msgs.filter(F.col("event_seq") % 2 == 1)
        seen: set = set()
        t0 = _time.time()
        for i, chunk in enumerate((half, redelivered, rest)):
            chunk.coalesce(1).write.mode("append").parquet(src)
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in seen:
                    os.utime(f"{src}/{f}", (t0 - 400 + i * 100,) * 2)
                    seen.add(f)
        sinks = ingest_stream.StreamSinks(
            blob_path=f"{base}/blobs",
            index_path=idx_p,
            deadletter_path=f"{base}/dlq",
            checkpoint_path=f"{base}/ckpt",
        )
        q, _ = ingest_stream.run_stream(
            ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
            fixtures.fixture_ingest_config(),
            sinks,
            failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
            exactly_once_index=False,
            exactly_once_blobs=False,
            dedup_gate=True,
            # wide watermark = the gate's state-retention horizon must
            # cover the fixture's full 30-day event-time span, or batch 3
            # would drop genuinely-new old-timestamp rows as late
            dedup_gate_watermark="720 hours",
        )
        if not q.awaitTermination(600):
            raise TimeoutError("d42 dedup-gate stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    return (
        spark.read.parquet(idx_p)
        .select(
            "unique_id",
            "business_source_key",
            "business_object_key",
            "index_source_key",
            "ordering_key",
            "publish_time",
            "ingestion_time",
            "indexer_ingestion_time",
        )
        .orderBy("unique_id")
    )


def _d43_restart_recovery(spark, sf_dir):
    """E1's exactly-once-ACROSS-RESTART claim as ONE driver hash (r11
    VERDICT #4; SURVEY §7.3 Hard #1): the d40 streaming ingest — 4
    deterministic micro-batches (event_seq % 4 chunks, mtime-pinned,
    maxFilesPerTrigger=1) — but driven through `run_stream_supervised`
    with a fault injector that CRASHES the query between the blob write
    and the index write of batches 1 and 3 (blob merge committed,
    checkpoint commit never reached).  The supervisor restarts from the
    SAME checkpoint; Spark replays each uncommitted batch under its
    original batch_id, and the exactly-once MERGE sinks absorb the
    replay (ingest.py merge writers; handler.go's partial-batch ack
    analogue).  d40 pins the happy path; this pins the crash path: the
    oracle is the batch prologue's index on the non-location columns —
    a duplicated OR dropped row from any replayed batch breaks the
    hash, and the in-code asserts pin that both crashes actually fired
    and the blob table carries no duplicate (location, record) rows."""
    import time as _time

    from persistor_spark.streaming import ingest_stream

    base = _stream_sink(spark, sf_dir, "restart")
    blob_p, idx_p = f"{base}/blobs", f"{base}/index"
    if not os.path.exists(f"{base}/done"):
        src = f"{base}/src"
        msgs = fixtures.load_messages(spark, sf_dir)
        seen: set = set()
        t0 = _time.time()
        for i in range(4):
            (
                msgs.filter(F.col("event_seq") % 4 == i)
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in seen:
                    os.utime(f"{src}/{f}", (t0 - 400 + i * 100,) * 2)
                    seen.add(f)
        sinks = ingest_stream.StreamSinks(
            blob_path=blob_p,
            index_path=idx_p,
            deadletter_path=f"{base}/dlq",
            checkpoint_path=f"{base}/ckpt",
        )
        crashed = {1: False, 3: False}

        def injector(batch_id):
            if crashed.get(batch_id) is False:
                crashed[batch_id] = True
                raise RuntimeError(f"injected crash mid-batch {batch_id}")

        ingest_stream.run_stream_supervised(
            lambda: ingest_stream.file_stream(spark, src, max_files_per_trigger=1),
            fixtures.fixture_ingest_config(),
            sinks,
            failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
            fault_injector=injector,
        )
        assert all(crashed.values()), f"injected crashes did not fire: {crashed}"
        open(f"{base}/done", "w").close()
    blobs = spark.read.parquet(blob_p)
    dup_blobs = (
        blobs.groupBy("location_key", "record_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_blobs == 0, f"{dup_blobs} duplicated blob rows after replay"
    return (
        spark.read.parquet(idx_p)
        .select(
            "unique_id",
            "business_source_key",
            "business_object_key",
            "index_source_key",
            "ordering_key",
            "publish_time",
            "ingestion_time",
            "indexer_ingestion_time",
        )
        .orderBy("unique_id")
    )


def _d44_incremental_compaction(spark, sf_dir):
    """`maintenance.compact_small_files` — the INCREMENTAL maintenance
    path for the 100 TB story (r11 VERDICT #5: compact_parquet is an
    honest full rewrite; a 100 TB table cannot rewrite itself per cycle)
    — preserves table contents while touching ONLY the small-file
    appendix.  Layout: index_metadata partitioned by broker_id, a
    compacted base (one file per broker, ~4/5 of the rows) plus four
    small appends; the threshold is derived strictly below the smallest
    base file so "small" captures exactly the appendix.  In-code asserts
    pin the incremental claim (every base file keeps its exact name —
    never read, never rewritten; >= 1 directory merged); the returned
    DataFrame pins content preservation against the plain prologue
    index."""
    import atexit
    import glob as _glob
    import shutil
    import tempfile

    from persistor_spark.plans import maintenance

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="smallcompact_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    path = f"{root}/index"
    # base = 16/20 of the rows (one compacted file per broker, ~16x any
    # append file), appendix = four 1/20 appends — the size gap makes the
    # "strictly below the smallest base file" threshold meaningful at
    # every SF (at sf0.001 a 1/5 base file is append-sized)
    idx = t.index_metadata.withColumn("__slice", F.crc32("unique_id") % 20)
    (
        idx.filter(F.col("__slice") < 16)
        .drop("__slice")
        .repartition("broker_id")
        .write.partitionBy("broker_id")
        .parquet(path)
    )
    base_files = set(_glob.glob(f"{path}/broker_id=*/part-*.parquet"))
    for i in range(16, 20):
        (
            idx.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("append")
            .partitionBy("broker_id")
            .parquet(path)
        )
    thresh = min(os.path.getsize(f) for f in base_files)
    stats = maintenance.compact_small_files(
        spark, path, partition_col="broker_id", small_file_bytes=thresh
    )
    assert stats["dirs"] >= 1, f"nothing merged: {stats}"
    assert stats["files_after"] < stats["files_before"], stats
    after = set(_glob.glob(f"{path}/broker_id=*/part-*.parquet"))
    assert base_files <= after, "a compacted base file was rewritten"
    return (
        spark.read.parquet(path)
        .select("unique_id", "broker_id", "location_key")
        .orderBy("unique_id")
    )


def _a158_dedup_ingest_stream(spark, sf_dir):
    """`run_incremental_dedup_stream` EXECUTED on the driver record (with
    a159, the last two foreachBatch streaming runners that had only
    pytest coverage — the same gap class d42/a155-157 closed for their
    operators).  The even half of the corpus is the persisted LSH index;
    the odd half arrives as THREE mtime-pinned micro-batches (doc_id % 6
    == 1 / 3 / 5, batch_id == chunk index under maxFilesPerTrigger=1).
    Each batch probes the index for cross near-dup pairs and THEN appends
    its own sketch — so batch 2's probes see batches 0/1's odds too.  The
    oracle restates the full emission rule row for row: pair (new, old)
    lands at new's batch iff old is an even OR an odd from a strictly
    EARLIER batch (same-batch odd pairs are never emitted — the index
    gains the batch only after its probe), with a15's exact-verify
    jaccard >= 0.8 and rounding."""
    import json as _json
    import time as _time

    from persistor_spark.analytics import dedup
    from persistor_spark.streaming import windows as sw

    base = _stream_sink(spark, sf_dir, "dedupingest")
    out = f"{base}/pairs"
    if not os.path.exists(f"{base}/done"):
        docs = _docs(spark, sf_dir)
        dedup.lsh_index_save(
            dedup.build_band_table(docs.filter(F.col("doc_id") % 2 == 0)),
            f"{base}/lsh",
        )
        src = f"{base}/src"
        os.makedirs(src, exist_ok=True)
        t0 = _time.time()
        for i, residue in enumerate((1, 3, 5)):
            rows = (
                docs.filter(F.col("doc_id") % 6 == residue)
                .select("doc_id", "text")
                .collect()
            )
            path = f"{src}/b{i}.json"
            with open(path, "w") as fh:
                for r in rows:
                    fh.write(
                        _json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                        + "\n"
                    )
            os.utime(path, (t0 - 400 + i * 100,) * 2)
        q = sw.run_incremental_dedup_stream(
            spark, src, f"{base}/lsh", out, f"{base}/ckpt", threshold=0.8
        )
        if not q.awaitTermination(600):
            raise TimeoutError("a158 dedup-ingest stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    return (
        spark.read.parquet(out)
        .select("new_id", "old_id", "jaccard", "batch_id")
        .orderBy("new_id", "old_id")
    )


def _a159_ann_ingest_stream(spark, sf_dir):
    """`run_ann_ingest_stream` EXECUTED on the driver record (a158's ANN
    twin): the a60 construction — train IVF-PQ on the even half of the
    clustered corpus, persist it — but the odd half arrives as THREE
    mtime-pinned micro-batches that each encode against the FROZEN
    quantizer/codebooks and parquet-append into the cid-partitioned
    inverted lists (FAISS add semantics, no retrain).  SF-robust verdict
    (r12 VERDICT #3, the a60 exactness class): (1) `same_as_batch_add` —
    the search over the reloaded streamed-into index equals the one-shot
    in-memory ivfpq_add EXACTLY at any SF (per-vector encoding against
    frozen codebooks is batching-invariant); (2) the d46 recall-threshold
    form vs full-corpus brute force (a60's floors 0.2/0.5)."""
    import json as _json
    import time as _time

    from persistor_spark.analytics import similarity
    from persistor_spark.streaming import windows as sw

    base = _stream_sink(spark, sf_dir, "annstream")
    path = f"{base}/ivfpq"
    if not os.path.exists(f"{base}/done"):
        embs = _cl_embs(spark, sf_dir)
        idx = similarity.ivfpq_build(
            embs.filter(F.col("vec_id") % 2 == 0), n_centroids=8
        )
        similarity.ivfpq_save(idx, path)
        src = f"{base}/src"
        os.makedirs(src, exist_ok=True)
        t0 = _time.time()
        for i, residue in enumerate((1, 3, 5)):
            rows = embs.filter(F.col("vec_id") % 6 == residue).collect()
            p = f"{src}/b{i}.json"
            with open(p, "w") as fh:
                for r in rows:
                    fh.write(
                        _json.dumps(
                            {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                        )
                        + "\n"
                    )
            os.utime(p, (t0 - 400 + i * 100,) * 2)
        q = sw.run_ann_ingest_stream(spark, src, path, f"{base}/ckpt")
        if not q.awaitTermination(600):
            raise TimeoutError("a159 ann-ingest stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    from persistor_spark.analytics import similarity

    loaded = similarity.ivfpq_load(spark, path)
    embs = _cl_embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 10)
    out = similarity.ivfpq_search(loaded, queries_df, k=5, nprobe=4, rerank_factor=24)
    mem = similarity.ivfpq_add(
        similarity.ivfpq_build(embs.filter(F.col("vec_id") % 2 == 0), n_centroids=8),
        embs.filter(F.col("vec_id") % 2 == 1),
    )
    out_mem = similarity.ivfpq_search(mem, queries_df, k=5, nprobe=4, rerank_factor=24)
    cols = ["query_id", "vec_id", "rank"]
    same = (
        out.select(*cols).exceptAll(out_mem.select(*cols)).count() == 0
        and out_mem.select(*cols).exceptAll(out.select(*cols)).count() == 0
    )
    truth = similarity.brute_force_topk(embs, queries_df, k=5).select(
        "query_id", "vec_id"
    )
    return _ann_threshold_rows(
        out, truth, k=5, floor_each=0.2, floor_mean=0.5
    ).withColumn("same_as_batch_add", F.lit(bool(same)))


def _d47_compact_manifest_lookup(spark, sf_dir):
    """The maintenance COMPOSITION the 100 TB serving story needs: a
    manifest-tracked index layout (d1's sorted files + Iceberg-lite
    min/max manifest) accumulates small appends, `compact_small_files`
    merges the appendix WHILE incrementally replacing exactly the merged
    files' manifest entries (r12 — without this every pruned scan after
    a compaction points at removed files), and the d24-style point
    lookups then run through the UPDATED manifest.  In-code asserts pin
    that the manifest holds no stale file entry, covers every live file,
    and that each probe pruned to at most 2 data files; the returned
    rows pin lookup correctness against the plain prologue index."""
    import atexit
    import shutil
    import tempfile

    from persistor_spark.plans import fsutil, layout, maintenance

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cmpmf_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table, mf = f"{root}/index", f"{root}/manifest"
    idx = t.index_metadata.withColumn("__slice", F.crc32("unique_id") % 20)
    (
        idx.filter(F.col("__slice") < 16)
        .drop("__slice")
        .repartitionByRange(4, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    for i in range(16, 20):
        (
            idx.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )
    layout.write_minmax_manifest(spark, table, mf)
    sizes = dict(fsutil.list_files_with_size(spark, table))
    thresh = (max(sizes.values()) + min(sizes.values())) // 2
    stats = maintenance.compact_small_files(
        spark, table, small_file_bytes=thresh, manifest_path=mf
    )
    assert stats["files_small"] >= 4, stats
    rows = layout.load_manifest(spark, mf)
    assert all(fsutil.exists(spark, f) for f, *_ in rows), "stale manifest entry"
    assert len(rows) == len(fsutil.list_files_with_size(spark, table)), (
        "manifest does not cover the live file set"
    )
    probes = ["b0_m000000004", "b1_m000000001", "b3_m000000123"]
    out = None
    for probe in probes:
        touched = [f for f, lo, hi, _ in rows if lo <= probe <= hi]
        assert len(touched) <= 2, f"{probe} pruned to {len(touched)} files"
        got = layout.manifest_pruned_scan_cached(spark, table, rows, [probe]).select(
            "unique_id", "broker_id", "location_key"
        )
        out = got if out is None else out.unionByName(got)
    return out.orderBy("unique_id")


_D48_WORKER = '''
import json, os, sys, time

# repo root arrives as argv[7] (derived from THIS checkout's __file__ by
# the spawner) — a hardcoded /root/repo would silently import
# persistor_spark from the wrong tree in a worktree/A-B checkout
# (r13 ADVICE; tools/probe_r13_drift.py itself runs pinned worktrees)
sys.path.insert(0, sys.argv[7])
from pyspark.sql import functions as F

from persistor_spark import fixtures
from persistor_spark.plans import ingest
from persistor_spark.session import build_session

sf_dir, table, lock, ready, go, out = sys.argv[1:7]
spark = build_session("d48-writer-a", master="local[4]", shuffle_partitions=4)
msgs = fixtures.load_messages(spark, sf_dir)
mine = msgs.filter(F.col("event_seq") % 2 == 0)
open(ready, "w").close()
t0 = time.time()
while not os.path.exists(go):
    if time.time() - t0 > 300:
        raise TimeoutError("writer A never saw the go marker")
    time.sleep(0.05)
appended = []
for c in range(4):
    chunk = mine.filter(F.floor((F.col("event_seq") % 8) / 2) == c)
    result = ingest.run_batch(
        chunk, fixtures.fixture_ingest_config(),
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    appended.append(ingest.write_index_merge(result, table, lock_path=lock))
with open(out, "w") as fh:
    json.dump({"appended": appended}, fh)
spark.stop()
'''


def _d48_concurrent_writers(spark, sf_dir):
    """TWO OS-PROCESS WRITERS merge-append into ONE index table
    CONCURRENTLY (r12 VERDICT #8a: d41/test_receiver_multiprocess pin
    racing CONSUMERS; nothing pinned racing WRITERS through the
    flock+merge path).  Writer A is a second Spark process (own JVM, own
    session — the receiver_test.go:!race shape); writer B is this
    session.  Each ingests its half of the fixture stream in 4
    run_batch -> write_index_merge chunks under the SHARED advisory
    flock (ingest.write_index_merge lock_path — the plain-parquet
    analogue of a Delta transaction log), and the halves OVERLAP on
    event_seq % 10 == 0: the same messages delivered to BOTH writers,
    the partition-reassignment redelivery of a broker rebalance.  A
    file barrier releases both writers together, so the chunk merges
    genuinely interleave.  Deterministic at any interleaving: the
    locked merge dedups on unique_id, so the final table is the exact
    fixture index; in-code asserts pin single-delivery (no unique_id
    appears twice) and that BOTH writers appended rows; the oracle is
    the batch prologue's index on the non-location columns (d43's
    shape)."""
    import subprocess
    import sys as _sys
    import time as _time

    from persistor_spark.plans import ingest

    base = _stream_sink(spark, sf_dir, "concwriters")
    table = f"{base}/index"
    if not os.path.exists(f"{base}/done"):
        lock = f"{base}/writers"
        ready, go, out_json = f"{base}/ready", f"{base}/go", f"{base}/a.json"
        script, log_path = f"{base}/worker_a.py", f"{base}/a.log"
        # a RERUN in the same session (first attempt failed after some
        # appends but before the done marker) legitimately appends 0 rows
        # to the already-populated table — only a FRESH table owes the
        # "both writers appended" assert
        fresh_table = not os.path.exists(table)
        with open(script, "w") as fh:
            fh.write(_D48_WORKER)
        # child output goes to a FILE, never a pipe: the child JVM logs
        # freely, and a filled 64 KiB pipe would block writer A's console
        # appender WHILE IT HOLDS THE FLOCK — deadlocking writer B here
        log_fh = open(log_path, "w")
        repo_root = os.path.dirname(os.path.abspath(__file__))
        proc = subprocess.Popen(
            [
                _sys.executable,
                script,
                sf_dir,
                table,
                lock,
                ready,
                go,
                out_json,
                repo_root,
            ],
            stdout=log_fh,
            stderr=subprocess.STDOUT,
            text=True,
        )
        try:
            t0 = _time.time()
            while not os.path.exists(ready):
                if proc.poll() is not None or _time.time() - t0 > 300:
                    raise RuntimeError(
                        "writer A died before ready: "
                        + open(log_path).read()[-2000:]
                    )
                _time.sleep(0.1)
            open(go, "w").close()  # barrier: both writers start together
            msgs = fixtures.load_messages(spark, sf_dir)
            mine = msgs.filter(
                (F.col("event_seq") % 2 == 1) | (F.col("event_seq") % 10 == 0)
            )
            appended_b = []
            for c in range(4):
                chunk = mine.filter(F.floor((F.col("event_seq") % 8) / 2) == c)
                result = ingest.run_batch(
                    chunk,
                    fixtures.fixture_ingest_config(),
                    failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
                )
                appended_b.append(
                    ingest.write_index_merge(result, table, lock_path=lock)
                )
            proc.wait(timeout=600)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"writer A failed: {open(log_path).read()[-2000:]}"
                )
        finally:
            if proc.poll() is None:
                proc.kill()
            log_fh.close()
        import json as _json

        appended_a = _json.load(open(out_json))["appended"]
        if fresh_table:
            assert sum(appended_a) > 0, f"writer A appended nothing: {appended_a}"
            assert sum(appended_b) > 0, f"writer B appended nothing: {appended_b}"
        open(f"{base}/done", "w").close()
    idx = spark.read.parquet(table)
    dups = idx.groupBy("unique_id").count().filter(F.col("count") > 1).count()
    assert dups == 0, f"{dups} unique_ids delivered twice across writers"
    return (
        idx.select(
            "unique_id",
            "business_source_key",
            "business_object_key",
            "index_source_key",
            "ordering_key",
            "publish_time",
            "ingestion_time",
            "indexer_ingestion_time",
        )
        .orderBy("unique_id")
    )


def _d49_schema_evolution(spark, sf_dir):
    """INDEX SCHEMA EVOLUTION in place (r12 VERDICT #8b): a 100 TB index
    cannot be rewritten to gain a column, so old and new footers must
    reconcile in ONE scan.  The even half of the stream is ingested and
    persisted under the v1 schema; the pipeline then evolves (the index
    gains `index_schema_version`) and the odd half appends under v2.
    The read side is a single mergeSchema parquet scan: v1 rows surface
    the new column as NULL, v2 rows carry their literal — and predicates
    on the evolved column treat absent as NULL (the in-code asserts pin
    both directions: IS NULL selects exactly the v1 rows, = 2 exactly
    the v2 rows).  Oracle: the prologue's pos CTE with the same
    event_seq split.  At scale this is footer-level schema merge only —
    no data file is rewritten, which the base-file inode assert pins."""
    import atexit
    import glob as _glob
    import shutil
    import tempfile

    from persistor_spark.plans import ingest

    root = tempfile.mkdtemp(prefix="schemaevo_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table = f"{root}/index"
    msgs = fixtures.load_messages(spark, sf_dir)
    cols = [
        "unique_id",
        "business_source_key",
        "business_object_key",
        "index_source_key",
        "ordering_key",
        "publish_time",
        "ingestion_time",
    ]
    v1 = ingest.run_batch(
        msgs.filter(F.col("event_seq") % 2 == 0),
        fixtures.fixture_ingest_config(),
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    v1.index_metadata.select(*cols).write.parquet(table)
    v1_files = {
        f: os.stat(f).st_ino for f in _glob.glob(f"{table}/part-*.parquet")
    }
    v2 = ingest.run_batch(
        msgs.filter(F.col("event_seq") % 2 == 1),
        fixtures.fixture_ingest_config(),
        failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
    )
    (
        v2.index_metadata.select(*cols)
        .withColumn("index_schema_version", F.lit(2).cast("int"))
        .write.mode("append")
        .parquet(table)
    )
    evolved = spark.read.option("mergeSchema", "true").parquet(table)
    assert "index_schema_version" in evolved.columns
    # evolution is footer-only: every v1 data file survives byte-for-byte
    assert all(
        os.path.exists(f) and os.stat(f).st_ino == ino
        for f, ino in v1_files.items()
    ), "schema evolution rewrote a v1 file"
    n_v1 = evolved.filter(F.col("index_schema_version").isNull()).count()
    n_v2 = evolved.filter(F.col("index_schema_version") == 2).count()
    assert n_v1 == v1.index_metadata.count(), "IS NULL must select the v1 rows"
    assert n_v2 == v2.index_metadata.count(), "= 2 must select the v2 rows"
    return evolved.select(*cols, "index_schema_version").orderBy("unique_id")


def _d50_compact_under_reader(spark, sf_dir):
    """COMPACTION UNDER A CONCURRENT READER (r12 VERDICT #8c): a serving
    layer holds the min/max manifest RESIDENT across lookups (the d47
    composition's documented pattern) while `compact_small_files` swaps
    the appendix underneath it — readers hold no lock.  The pin realizes
    the race deterministically: (1) the reader loads the manifest and
    serves a pre-compaction lookup; (2) the compaction merges the small
    files, incrementally replacing their manifest entries and REMOVING
    the originals; (3) the reader re-uses its now-STALE resident rows —
    `layout.manifest_lookup_resilient` detects the vanished file,
    reloads the manifest once, and serves the identical rows (correct
    BECAUSE the swap's phase order keeps the on-disk manifest pointing
    only at live files at every instant).  In-code asserts pin that the
    probes' files really were swapped (the stale path actually fired),
    that the healed rows equal the pre-compaction rows, and that the
    heal handed back a fresh manifest.  Probes are ids whose
    crc32 % 20 slice lands in the small-file appendix by construction.
    Oracle: the prologue index rows for the probed ids."""
    import atexit
    import shutil
    import tempfile

    from persistor_spark.plans import fsutil, layout, maintenance

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cmpreader_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table, mf = f"{root}/index", f"{root}/manifest"
    idx = t.index_metadata.withColumn("__slice", F.crc32("unique_id") % 20)
    (
        idx.filter(F.col("__slice") < 16)
        .drop("__slice")
        .repartitionByRange(4, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    for i in range(16, 20):
        (
            idx.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )
    layout.write_minmax_manifest(spark, table, mf)
    probes = ["b0_m000000008", "b1_m000000025", "b2_m000000006"]
    cols = ["unique_id", "broker_id", "location_key"]
    # (1) reader comes up: resident manifest + a served lookup
    resident = layout.load_manifest(spark, mf)
    before, healed = layout.manifest_lookup_resilient(
        spark, table, resident, probes, mf
    )
    assert healed is None, "pre-compaction lookup must not need the heal"
    before_rows = sorted(map(tuple, before.select(*cols).collect()))
    assert len(before_rows) == len(probes), before_rows
    # (2) maintenance swaps the appendix under the resident manifest
    sizes = dict(fsutil.list_files_with_size(spark, table))
    thresh = (max(sizes.values()) + min(sizes.values())) // 2
    stats = maintenance.compact_small_files(
        spark, table, small_file_bytes=thresh, manifest_path=mf
    )
    assert stats["files_small"] >= 4, stats
    # the probes' resident entries now point at removed files — the race
    # the resilient lookup exists for (probes sit in appendix slices)
    stale_files = {
        f for f, lo, hi, _ in resident if any(lo <= p <= hi for p in probes)
    }
    assert any(not fsutil.exists(spark, f) for f in stale_files), (
        "expected at least one probed file to be swapped away"
    )
    # (3) the reader's next lookup through the STALE rows heals and serves
    after, fresh = layout.manifest_lookup_resilient(
        spark, table, resident, probes, mf
    )
    assert fresh is not None, "stale lookup must have fired the heal"
    assert all(fsutil.exists(spark, f) for f, *_ in fresh), "fresh manifest stale"
    after_rows = sorted(map(tuple, after.select(*cols).collect()))
    assert after_rows == before_rows, "healed lookup changed the served rows"
    return after.select(*cols).orderBy("unique_id")


def _d51_compact_delete_race(spark, sf_dir):
    """CONCURRENT MAINTENANCE OPS on ONE table (r13 VERDICT #7a: d44/d24
    each ran solo; the flock serialized recovery but nothing pinned two
    maintenance DRIVERS racing): `compact_small_files` and
    `delete_by_key` are released simultaneously from two driver threads
    against the SAME table + manifest.  Both ops now hold the table's
    maintenance flock for their WHOLE body (recovery -> plan -> tmp
    write -> journal -> swap), so any interleaving serializes into one
    of two orders — and BOTH orders converge to the same state: table =
    original rows minus the victims, manifest pointing only at live
    files, no journal left behind.  (Without whole-op locking the race
    is real: delete plans against manifest entries compaction is about
    to remove, then scans deleted files.)  flock conflicts across fds,
    so two threads of one process exclude each other exactly like two
    processes (sources/_statelock.py).  LOCAL-FS contract: on object
    stores the guard is a documented no-op and single-maintenance-
    process (or a table-format transaction log, ARCHITECTURE §7) is
    what serializes — this pin exercises the local mechanism.  In-code asserts pin that both
    ops did real work (>= 2 small files merged; exactly the victim rows
    deleted), that no maintenance journal survives, and that every
    manifest entry resolves to a live file.  Oracle: the prologue index
    minus the victims (d24's shape).  Reference: the reference has no
    maintenance story at all (persistor writes immutable blobs); this
    pins the invariant our Iceberg-lite layout adds."""
    import atexit
    import shutil
    import tempfile
    import threading

    from persistor_spark.plans import fsutil, layout, maintenance

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cmpdelrace_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table, mf = f"{root}/index", f"{root}/manifest"
    # d50's layout: a range-partitioned base + 4 small appendix files
    idx = t.index_metadata.withColumn("__slice", F.crc32("unique_id") % 20)
    (
        idx.filter(F.col("__slice") < 16)
        .drop("__slice")
        .repartitionByRange(4, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    for i in range(16, 20):
        (
            idx.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )
    layout.write_minmax_manifest(spark, table, mf)
    victims = ["b0_m000000004", "b1_m000000025", "b3_m000000123"]
    n_before = spark.read.parquet(table).count()
    sizes = dict(fsutil.list_files_with_size(spark, table))
    thresh = (max(sizes.values()) + min(sizes.values())) // 2
    barrier = threading.Barrier(2)
    results: dict = {}
    errors: list = []

    def run_compact():
        try:
            barrier.wait(timeout=60)
            results["compact"] = maintenance.compact_small_files(
                spark, table, small_file_bytes=thresh, manifest_path=mf
            )
        except Exception as e:  # surfaced below — a swallowed thread error
            errors.append(e)  # would fake a green pin

    def run_delete():
        try:
            barrier.wait(timeout=60)
            results["delete"] = maintenance.delete_by_key(
                spark, table, mf, victims
            )
        except Exception as e:
            errors.append(e)

    th = [threading.Thread(target=run_compact), threading.Thread(target=run_delete)]
    for x in th:
        x.start()
    for x in th:
        x.join(timeout=600)
    assert not errors, f"concurrent maintenance raised: {errors!r}"
    assert results["compact"]["files_small"] >= 2, results["compact"]
    assert results["delete"]["rows_deleted"] == len(victims), results["delete"]
    # converged state: no journals, live manifest, exact surviving rows
    leftovers = fsutil.glob(
        spark, f"{fsutil.escape(table)}.__*journal_*.json"
    )
    assert not leftovers, f"maintenance journal survived the race: {leftovers}"
    for f, _lo, _hi, _n in layout.load_manifest(spark, mf):
        assert fsutil.exists(spark, f), f"manifest points at dead file {f}"
    out = spark.read.parquet(table)
    assert out.count() == n_before - len(victims)
    return out.select("unique_id", "broker_id", "location_key").orderBy(
        "unique_id"
    )


def _d54_delete_under_reader(spark, sf_dir):
    """TARGETED DELETE UNDER A CONCURRENT READER — the last cell of the
    maintenance-vs-reader matrix (d50 = compaction/reader, d52 =
    compaction/resubmit, d51 = compaction/delete; nothing pinned a
    RESIDENT-manifest reader racing `delete_by_key`): the reader serves a
    lookup for ids that SURVIVE the delete, the delete rewrites their
    files anyway (victims share files with the probes, so the kept rows
    move to fresh del-* names), and the reader's next lookup through the
    now-STALE resident rows heals with one manifest reload and serves the
    IDENTICAL rows — sound for exactly the d50 reason: the journaled
    replay swaps the manifest BEFORE removing originals, so the on-disk
    manifest points only at live files at every instant.  Probes are
    sort-adjacent to the victims so they share range-partitioned files;
    the heal-fired assert requires at least one probed file to vanish.
    Oracle: the prologue index rows for the probes (untouched by the
    delete)."""
    import atexit
    import shutil
    import tempfile

    from persistor_spark.plans import fsutil, layout, maintenance

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="delreader_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table, mf = f"{root}/index", f"{root}/manifest"
    (
        t.index_metadata.repartitionByRange(8, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    layout.write_minmax_manifest(spark, table, mf)
    victims = ["b0_m000000004", "b1_m000000025", "b3_m000000123"]
    probes = ["b0_m000000008", "b1_m000000021", "b3_m000000119"]
    cols = ["unique_id", "broker_id", "location_key"]
    # (1) reader comes up: resident manifest + a served lookup
    resident = layout.load_manifest(spark, mf)
    before, healed = layout.manifest_lookup_resilient(
        spark, table, resident, probes, mf
    )
    assert healed is None, "pre-delete lookup must not need the heal"
    before_rows = sorted(map(tuple, before.select(*cols).collect()))
    assert len(before_rows) == len(probes), before_rows
    # (2) the delete rewrites the probes' files under the resident manifest
    stats = maintenance.delete_by_key(spark, table, mf, victims)
    assert stats["rows_deleted"] == len(victims), stats
    stale_files = {
        f for f, lo, hi, _ in resident if any(lo <= p <= hi for p in probes)
    }
    assert any(not fsutil.exists(spark, f) for f in stale_files), (
        "expected at least one probed file to be rewritten away"
    )
    # (3) the reader's next lookup through the STALE rows heals and serves
    after, fresh = layout.manifest_lookup_resilient(
        spark, table, resident, probes, mf
    )
    assert fresh is not None, "stale lookup must have fired the heal"
    after_rows = sorted(map(tuple, after.select(*cols).collect()))
    assert after_rows == before_rows, "healed lookup changed the served rows"
    return after.select(*cols).orderBy("unique_id")


def _d52_resubmit_under_compaction(spark, sf_dir):
    """RESUBMIT UNDER COMPACTION (r13 VERDICT #7b: d50 covers a point
    lookup only; the R6 position-align join is the other manifest-
    holding reader): a resubmit pipeline resolves its replay ids through
    a RESIDENT manifest (layout.manifest_lookup_resilient), joins the
    fetched metadata to the blob store position-aligned (resubmit.align),
    and serves packaged records — while `compact_small_files` swaps the
    index appendix between two replays.  The second replay's resident
    rows are stale (their files were merged away); the resilient lookup
    heals with ONE manifest reload and the align join must produce the
    IDENTICAL publishable records, because parquet immutability +
    move-manifest-remove phase order keep every instant readable.
    In-code asserts pin that the probed files really were swapped (the
    heal actually fired) and that pre/post packaged records are equal.
    Oracle: the d9 metadata-blob join restricted to the replay ids.
    Reference: resubmitter_job.go:257-455 (the pipeline being served);
    the maintenance race is the layout's addition."""
    import atexit
    import shutil
    import tempfile

    from persistor_spark.plans import fsutil, layout, maintenance, resubmit

    t = _tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="resubcmp_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table, mf = f"{root}/index", f"{root}/manifest"
    idx = t.index_metadata.withColumn("__slice", F.crc32("unique_id") % 20)
    (
        idx.filter(F.col("__slice") < 16)
        .drop("__slice")
        .repartitionByRange(4, "unique_id")
        .sortWithinPartitions("unique_id")
        .write.parquet(table)
    )
    for i in range(16, 20):
        (
            idx.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )
    layout.write_minmax_manifest(spark, table, mf)
    replay = ["b0_m000000008", "b1_m000000025", "b2_m000000006"]
    out_cols = ["unique_id", "ordering_key", "payload"]
    # (1) reader comes up: resident manifest, replay #1 end-to-end
    resident = layout.load_manifest(spark, mf)
    meta1, healed = layout.manifest_lookup_resilient(
        spark, table, resident, replay, mf
    )
    assert healed is None, "pre-compaction replay must not need the heal"
    rec1 = resubmit.align(meta1, t.blob_records, broadcast_metadata=True)
    rows1 = sorted(map(tuple, rec1.select(*out_cols).collect()))
    assert len(rows1) == len(replay), rows1
    # (2) maintenance swaps the appendix under the resident manifest
    sizes = dict(fsutil.list_files_with_size(spark, table))
    thresh = (max(sizes.values()) + min(sizes.values())) // 2
    stats = maintenance.compact_small_files(
        spark, table, small_file_bytes=thresh, manifest_path=mf
    )
    assert stats["files_small"] >= 4, stats
    stale_files = {
        f for f, lo, hi, _ in resident if any(lo <= p <= hi for p in replay)
    }
    assert any(not fsutil.exists(spark, f) for f in stale_files), (
        "expected at least one probed file to be swapped away"
    )
    # (3) replay #2 through the STALE resident manifest: heal, re-join,
    #     serve the identical records
    meta2, fresh = layout.manifest_lookup_resilient(
        spark, table, resident, replay, mf
    )
    assert fresh is not None, "stale replay must have fired the heal"
    rec2 = resubmit.align(meta2, t.blob_records, broadcast_metadata=True)
    rows2 = sorted(map(tuple, rec2.select(*out_cols).collect()))
    assert rows2 == rows1, "healed replay changed the packaged records"
    return rec2.select(*out_cols).orderBy("unique_id")


def _d53_stream_schema_evolution(spark, sf_dir):
    """SCHEMA EVOLUTION UNDER A LIVE STREAM (r13 VERDICT #7c: d49 is
    batch-only): the d40/d43 streaming ingest appends v1-schema index
    rows micro-batch by micro-batch; BETWEEN its two availableNow runs
    (same checkpoint — the d43 restart seam, which at 100 TB is where a
    deploy lands) a side writer appends a v2 batch carrying the new
    `index_schema_version` column; the stream then RESUMES writing v1
    rows against the now-wider table.  A single mergeSchema read
    reconciles all three layers: stream-v1 and resumed-v1 rows surface
    the evolved column as NULL, the side batch carries its literal —
    and no pre-existing data file is rewritten by the evolution or the
    resume (inode asserts, d49's claim under streaming append).
    In-code asserts pin the NULL/value split row-exactly; the oracle is
    the batch prologue's index with the v2 slice marked.  Reference:
    indexer's Mongo store is schemaless (mongo.go upserts maps);
    parquet-side evolution is the Spark-native equivalent this engine
    must prove."""
    import glob as _glob
    import time as _time

    from persistor_spark.streaming import ingest_stream

    base = _stream_sink(spark, sf_dir, "schemaevo")
    blob_p, idx_p = f"{base}/blobs", f"{base}/index"
    cols = [
        "unique_id",
        "business_source_key",
        "business_object_key",
        "index_source_key",
        "ordering_key",
        "publish_time",
        "ingestion_time",
    ]
    if not os.path.exists(f"{base}/done"):
        src = f"{base}/src"
        msgs = fixtures.load_messages(spark, sf_dir)
        seen: set = set()
        t0 = _time.time()
        # v2 side batch = the event_seq % 4 == 3 slice, NEVER given to the
        # stream; chunks 0-2 flow through the stream as v1
        for i in range(3):
            (
                msgs.filter(F.col("event_seq") % 4 == i)
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in seen:
                    os.utime(f"{src}/{f}", (t0 - 400 + i * 100,) * 2)
                    seen.add(f)
        sinks = ingest_stream.StreamSinks(
            blob_path=blob_p,
            index_path=idx_p,
            deadletter_path=f"{base}/dlq",
            checkpoint_path=f"{base}/ckpt",
        )

        def run_v1():
            ingest_stream.run_stream_supervised(
                lambda: ingest_stream.file_stream(
                    spark, src, max_files_per_trigger=1
                ),
                fixtures.fixture_ingest_config(),
                sinks,
                failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
            )

        run_v1()  # stream run #1: chunks 0-2 land as v1
        files_v1 = {
            f: os.stat(f).st_ino
            for f in _glob.glob(f"{idx_p}/**/*.parquet", recursive=True)
        }
        assert files_v1, "stream run #1 wrote no index files"
        # the v2 column lands from a side writer while the stream is at
        # its restart seam
        from persistor_spark.plans import ingest as _ingest

        v2 = _ingest.run_batch(
            msgs.filter(F.col("event_seq") % 4 == 3),
            fixtures.fixture_ingest_config(),
            failure=F.expr(fixtures.DEADLETTER_PRED_SQL),
        )
        # cast to the STREAM table's exact column types: the streaming
        # writer emits TIMESTAMP where the batch path emits
        # TIMESTAMP_NTZ, and parquet schema merge refuses to reconcile
        # the two — evolution must widen columns, never flip their type
        live_types = {
            f.name: f.dataType for f in spark.read.parquet(idx_p).schema.fields
        }
        (
            v2.index_metadata.select(
                *[F.col(c).cast(live_types[c]).alias(c) for c in cols]
            )
            .withColumn("index_schema_version", F.lit(2).cast("int"))
            .write.mode("append")
            .parquet(idx_p)
        )
        # stream run #2: one more v1 chunk (a re-split of chunk 0 ids is
        # already absorbed by the checkpoint; feed a genuinely new file —
        # re-deliver chunk 1 rows as a NEW source file to exercise the
        # dedup merge against the widened table, then a fresh tail)
        (
            msgs.filter(F.col("event_seq") % 4 == 1)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(f"{src}/{f}", (t0 - 50,) * 2)
                seen.add(f)
        run_v1()
        # evolution + resume are append-only: every run-#1 file survives
        # byte-for-byte (footer merge, never a rewrite).  The done
        # marker lands only AFTER this assert — written earlier, a red
        # first run would self-heal to green on the next invocation in
        # the same gate process (the entries run multiple passes)
        assert all(
            os.path.exists(f) and os.stat(f).st_ino == ino
            for f, ino in files_v1.items()
        ), "schema evolution under the stream rewrote a v1 file"
        open(f"{base}/done", "w").close()
    evolved = spark.read.option("mergeSchema", "true").parquet(idx_p)
    assert "index_schema_version" in evolved.columns
    n_v1 = evolved.filter(F.col("index_schema_version").isNull()).count()
    n_v2 = evolved.filter(F.col("index_schema_version") == 2).count()
    total = evolved.count()
    assert n_v1 + n_v2 == total, "evolved column must be NULL xor 2"
    assert n_v2 > 0 and n_v1 > 0, (n_v1, n_v2)
    return evolved.select(*cols, "index_schema_version").orderBy("unique_id")


def _d45_watermark_policy(spark, sf_dir):
    """The late-data ADMISSION policy as one driver hash (r11 VERDICT
    #7a — the streaming semantic d40/d42/d43 do not pin): three
    mtime-pinned micro-batches through the PRODUCTION windowed runner
    (windows.run_category_counts_stream, 1-hour windows, 45-minute
    watermark).  Batch 0 carries the early 60% of events minus a
    withheld slice (event_id % 7 == 0); batch 1 the 60-90% band; batch
    2 the late tail PLUS the withheld early rows.  The measured (and
    here pinned) Spark admission rule is EVICTION-BASED, one batch more
    lenient than the naive watermark filter: a row is dropped iff its
    window was already evicted at the end of an earlier batch, and
    eviction at the end of batch i uses the watermark in effect DURING
    batch i — max event time over batches <= i-1, minus the delay.  So
    batch-2's withheld early rows are admitted iff their window end
    outlives max(batch-0 event time) - 45 min (both arms realized:
    most are dropped, the ones near the batch-0 frontier admitted),
    and availableNow's final no-data batch applies the last watermark,
    emitting exactly the windows whose end <= global max - 45 min over
    admitted rows.  The oracle restates that admitted set row for row;
    one leaked drop or dropped admit breaks the hash.  Event times are
    truncated to whole seconds at staging so both engines evaluate
    identical integer boundary arithmetic."""
    import time as _time

    from persistor_spark.streaming import windows as sw

    base = _stream_sink(spark, sf_dir, "watermark")
    out = f"{base}/counts"
    if not os.path.exists(f"{base}/done"):
        src = f"{base}/src"
        ev = _events(spark, sf_dir).select(
            "event_id",
            "user_id",
            "event_type",
            F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts"),
        )
        lo, hi = ev.agg(
            F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
        ).first()
        t_lo = lo + (hi - lo) * 6 // 10
        t_hi = lo + (hi - lo) * 9 // 10
        es = F.unix_timestamp("ts")
        chunks = [
            ev.filter((es <= t_lo) & (F.col("event_id") % 7 != 0)),
            ev.filter((es > t_lo) & (es <= t_hi)),
            ev.filter(
                (es > t_hi) | ((es <= t_lo) & (F.col("event_id") % 7 == 0))
            ),
        ]
        seen: set = set()
        t0 = _time.time()
        for i, chunk in enumerate(chunks):
            chunk.coalesce(1).write.mode("append").parquet(src)
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in seen:
                    os.utime(f"{src}/{f}", (t0 - 400 + i * 100,) * 2)
                    seen.add(f)
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sw.run_category_counts_stream(
            spark,
            src,
            out,
            f"{base}/ckpt",
            window="1 hour",
            watermark="45 minutes",
            source_df=stream,
        )
        if not q.awaitTermination(600):
            raise TimeoutError("d45 watermark stream did not finish in 600s")
        open(f"{base}/done", "w").close()
    return (
        spark.read.parquet(out)
        .select(
            F.unix_timestamp("ws").cast("long").alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("window_start", "event_type")
    )


def _d46_ann_recall(spark, sf_dir):
    """IVF-PQ retrieval QUALITY on the driver record (r11 VERDICT #7b):
    recall@10 of ivfpq_search (nprobe=6 of 16 cells) against brute-force
    cosine ground truth for the first 20 query vectors.  The exact
    recall value depends on the k-means layout, so the driver-stable
    claim is the THRESHOLD (e37b's pattern — the check runs Spark-side,
    the oracle pins the keys and the guaranteed outcome): every query's
    recall@10 >= 0.1 and the mean across queries >= 0.5 (measured r12:
    min/mean 0.4/0.635 at sf0.001, 0.5/0.73 at sf0.01, 0.2/0.60 at
    sf0.1 — deterministic per SF, seeded k-means; a collapsed index
    scores ~0, so the loose floor still discriminates sharply).  An
    index quality collapse —
    broken coarse assignment, corrupted codebooks, a probe that stops
    covering the true neighborhood — flips booleans and breaks the
    hash; shape-only pins (a55/a60) would still pass."""
    from persistor_spark.analytics import similarity

    embs = _embs(spark, sf_dir)
    q = embs.filter(F.col("vec_id") < 20)
    n = embs.count()
    idx = similarity.ivfpq_build(embs, n_centroids=16, n_vectors=n)
    idx.cells = idx.cells.localCheckpoint()
    truth = similarity.brute_force_topk(embs, q, k=10).select("query_id", "vec_id")
    approx = similarity.ivfpq_search(idx, q, k=10, nprobe=6).select(
        "query_id", "vec_id"
    )
    hits = truth.join(approx, ["query_id", "vec_id"], "left_semi")
    per = (
        truth.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k_eff"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .withColumn(
            "recall", F.coalesce("n_hit", F.lit(0)) / F.col("k_eff")
        )
    )
    mean_recall = per.agg(F.avg("recall")).first()[0]
    return per.select(
        F.col("query_id").alias("vec_id"),
        F.lit(10).cast("int").alias("k"),
        (F.col("recall") >= 0.1).alias("recall_ok"),
        F.lit(bool(mean_recall >= 0.5)).alias("mean_ok"),
    ).orderBy("vec_id")


# Queries whose code changed this round (or are new this round): they claim
# the head of the driver window ahead of the never-checked backlog.  UPDATE
# EVERY ROUND — tests/test_rotation_window.py enforces that every other
# window slot holds a query with no green driver row yet, until that
# backlog is exhausted (r6 VERDICT #7: the rotation policy as a checked
# invariant, not prose).
ROTATION_HEAD = [
    # r15 engine-path-changed (optimization round — no query's COMPUTATION
    # changed, but these routes exercise the round's engine edits most
    # directly): the k-means/PQ train loops moved to constant-shape Arrow
    # UDFs (a33 pins exact all-pairs cosine, the bit-parity-riskiest row;
    # a159 runs ANN build under streaming), the streaming ingest now skips
    # the per-batch cache under a deterministic clock (d40/d42/d43 +
    # a158 drive run_stream end-to-end), and the receiver path (d41)
    # consumes the pull/settle machinery the round probed.
    "a33_semdedup",
    "a158_dedup_ingest_stream",
    "a159_ann_ingest_stream",
    "d40_lifecycle_e2e",
    "d41_multi_consumer",
    "d42_dedup_gate_stream",
    "d43_restart_recovery",
]

# r15 driver window: ROTATION_HEAD + the 43 stalest rows (latest driver
# green = r9; 46 such rows exist — a151/a152/a153, three of the many
# same-family stream-window analytics, wait one more window so a8/a9/d22
# keep path diversity in this one).  The never-green backlog is empty
# (all 272 registry rows have at least one green driver row), so per the
# rotation policy the remaining slots go to the oldest-green rows —
# after this round the staleness floor rises from r9 toward r10 (r14
# VERDICT #8).
R15_WINDOW = ROTATION_HEAD + [
    "a10_multimodal_features",
    "a11_dedup_clusters",
    "a13_curation_pipeline",
    "a140_curation_e2e",
    "a141_windowed_dup_rate",
    "a143_quality_psi",
    "a145_late_arrivals",
    "a146_window_percentiles",
    "a147_new_key_rate",
    "a148_window_anomaly",
    "a149_windowed_hll_users",
    "a14_bm25_topk",
    "a150_dup_lineage",
    "a154_attribution_rate",
    "a16_label_centroids",
    "a17_bpe_tokens",
    "a18_winnowing_pairs",
    "a20_contamination",
    "a21_cms_sketch",
    "a22_repetition",
    "a23_quality_rules",
    "a24_pii_scrub",
    "a27_lm_perplexity",
    "a28_weighted_mix",
    "a29_pack_sequences",
    "a30_dup_spans",
    "a31_quota_sample",
    "a35_audio_features",
    "a36_frame_samples",
    "a37_chunking",
    "a38_pmi_bigrams",
    "a39_split_assign",
    "a44_cluster_reps",
    "a49_ann_recall",
    "a4_simhash_pairs",
    "a50_hybrid_rrf",
    "a52_split_leakage",
    "a53_dup_substrings",
    "a56_pagerank",
    "a5_embedding_topk",
    "a8_text_stats",
    "a9_langid_profile",
    "d22_mongo_payload_fetch",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict ORDER is deliberate: the driver verifies the FIRST 50 entries.

    r15 ROTATION (r14 VERDICT #8 — keep rotating so the staleness floor
    rises): the window is `R15_WINDOW` — the 7 engine-path-changed rows
    (this optimization round changed no query's computation; see
    ROTATION_HEAD's comment) followed by 43 of the 46 rows whose latest
    driver green is r9, the oldest in the registry.  Rather than physically
    reordering this dict every round, the full registry literal below keeps
    the r14 layout and the return re-keys it with the window first —
    identical name -> callable mapping, window-first iteration order.
    Every row below the window is driver-green at least once AND
    re-verified by tools/check.py (full-registry gate) plus pytest every
    round; tests/test_rotation_window.py enforces the rotation policy as a
    checked invariant.

    Verify the actual window before round end with:
      python -c "import __spark_entry__ as e; print(list(e.queries())[:50])"
    """
    q = _registry_r14_order()
    return {
        "a33_semdedup": q["a33_semdedup"],
        "a158_dedup_ingest_stream": q["a158_dedup_ingest_stream"],
        "a159_ann_ingest_stream": q["a159_ann_ingest_stream"],
        "d40_lifecycle_e2e": q["d40_lifecycle_e2e"],
        "d41_multi_consumer": q["d41_multi_consumer"],
        "d42_dedup_gate_stream": q["d42_dedup_gate_stream"],
        "d43_restart_recovery": q["d43_restart_recovery"],
        "a10_multimodal_features": q["a10_multimodal_features"],
        "a11_dedup_clusters": q["a11_dedup_clusters"],
        "a13_curation_pipeline": q["a13_curation_pipeline"],
        "a140_curation_e2e": q["a140_curation_e2e"],
        "a141_windowed_dup_rate": q["a141_windowed_dup_rate"],
        "a143_quality_psi": q["a143_quality_psi"],
        "a145_late_arrivals": q["a145_late_arrivals"],
        "a146_window_percentiles": q["a146_window_percentiles"],
        "a147_new_key_rate": q["a147_new_key_rate"],
        "a148_window_anomaly": q["a148_window_anomaly"],
        "a149_windowed_hll_users": q["a149_windowed_hll_users"],
        "a14_bm25_topk": q["a14_bm25_topk"],
        "a150_dup_lineage": q["a150_dup_lineage"],
        "a154_attribution_rate": q["a154_attribution_rate"],
        "a16_label_centroids": q["a16_label_centroids"],
        "a17_bpe_tokens": q["a17_bpe_tokens"],
        "a18_winnowing_pairs": q["a18_winnowing_pairs"],
        "a20_contamination": q["a20_contamination"],
        "a21_cms_sketch": q["a21_cms_sketch"],
        "a22_repetition": q["a22_repetition"],
        "a23_quality_rules": q["a23_quality_rules"],
        "a24_pii_scrub": q["a24_pii_scrub"],
        "a27_lm_perplexity": q["a27_lm_perplexity"],
        "a28_weighted_mix": q["a28_weighted_mix"],
        "a29_pack_sequences": q["a29_pack_sequences"],
        "a30_dup_spans": q["a30_dup_spans"],
        "a31_quota_sample": q["a31_quota_sample"],
        "a35_audio_features": q["a35_audio_features"],
        "a36_frame_samples": q["a36_frame_samples"],
        "a37_chunking": q["a37_chunking"],
        "a38_pmi_bigrams": q["a38_pmi_bigrams"],
        "a39_split_assign": q["a39_split_assign"],
        "a44_cluster_reps": q["a44_cluster_reps"],
        "a49_ann_recall": q["a49_ann_recall"],
        "a4_simhash_pairs": q["a4_simhash_pairs"],
        "a50_hybrid_rrf": q["a50_hybrid_rrf"],
        "a52_split_leakage": q["a52_split_leakage"],
        "a53_dup_substrings": q["a53_dup_substrings"],
        "a56_pagerank": q["a56_pagerank"],
        "a5_embedding_topk": q["a5_embedding_topk"],
        "a8_text_stats": q["a8_text_stats"],
        "a9_langid_profile": q["a9_langid_profile"],
        "d22_mongo_payload_fetch": q["d22_mongo_payload_fetch"],
        # ---- driver window ends here (50) ---- below: the rest of the
        # registry in its r14 physical order (name -> callable mapping
        # identical; only iteration order differs)
        **{k: v for k, v in q.items() if k not in R15_WINDOW},
    }


def _registry_r14_order() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full registry in its r14 physical layout (see queries() for the
    r15 window re-keying; the section comments below describe the r14
    window and are kept as history of that round's rotation)."""
    return {
        # ==== r14 DRIVER WINDOW (positions 1-50) ====
        # -- (1) NEW r14 pins: concurrent compaction-vs-delete on one
        #        table under the whole-op maintenance flock (d51), the
        #        R6 resubmit join racing a compaction through the
        #        resilient manifest heal (d52), schema evolution landing
        #        at a live stream's restart seam (d53) --
        "d51_compact_delete_race": _d51_compact_delete_race,
        "d52_resubmit_under_compaction": _d52_resubmit_under_compaction,
        "d53_stream_schema_evolution": _d53_stream_schema_evolution,
        "d54_delete_under_reader": _d54_delete_under_reader,
        # -- (2) changed this round (r13 VERDICT #2 + ADVICE): the six
        #        round-of-ratio oracles converted to engine-identical
        #        unrounded/fixed-point form, the three exact-decimal
        #        entries now overflow-guarded (_dec_exact), and d48's
        #        worker spawned with a parameterized repo root --
        "e42_revenue_share": _e42_revenue_share,
        "a89_removal_impact": _a89_removal_impact,
        "a90_tokenizer_fertility": _a90_tokenizer_fertility,
        "a119_nucleus_vocab": _a119_nucleus_vocab,
        "e57_chi_square": _e57_chi_square,
        "e59_forward_fill": _e59_forward_fill,
        "e46_time_weighted_avg": _e46_time_weighted_avg,
        "e49_mom_growth": _e49_mom_growth,
        "a131_label_dispersion": _a131_label_dispersion,
        # -- (3) ALL 37 remaining r8-era rows (r13 VERDICT #1) — after
        #        this round no driver row is older than r9 --
        "d1_point_lookup": _d1,
        "d2_in_list": _d2,
        "d3_interval_page": _d3,
        "d4_interval_count": _d4,
        "d5_or_of_ands": _d5,
        "d6_key_derivation": _d6,
        "d7_version_partition": _d7,
        "d8_time_partition": _d8,
        "d9_position_align_join": _d9,
        "d10_group_by_location": _d10,
        "d11_unique_invariant": _d11,
        "d12_deadletter_antijoin": _d12,
        "d13_lineage_counts": _d13,
        "d14_window_topk": _d14,
        "d15_orders_agg": _d15,
        "d16_customer_nation_join": _d16,
        "d17_message_size": _d17,
        "d18_wire_timestamps": _d18,
        "d19_ocf_roundtrip": _d19,
        "d20_first_seen": _d20_first_seen,
        "d21_salted_agg": _d21_salted_agg,
        "e1_rollup": _e_rollup,
        "e2_cube": _e_cube,
        "e3_set_ops": _e_set_ops,
        "e4_semi_anti_join": _e_semi_anti,
        "e5_window_lag_lead_frames": _e_window_lag,
        "e6_scalar_subquery": _e_scalar_subquery,
        "e7_string_funcs": _e_string_funcs,
        "a1_dedup_exact": _a_dedup_exact,
        "a2_ngram_jaccard_pairs": _a_ngram_jaccard,
        "a3_minhash_lsh_pairs": _a_minhash_lsh,
        "a128_lang_confusion": _a128_lang_confusion,
        "a130_waterfill_mixture": _a130_waterfill_mixture,
        "a132_benford_audit": _a132_benford_audit,
        "a135_matryoshka_quality": _a135_matryoshka_quality,
        "a136_curriculum_interleave": _a136_curriculum_interleave,
        "a139_length_bucket_waste": _a139_length_bucket_waste,
        # ---- r14's window boundary sat here; the r15 window lives in
        # queries()' literal return (see its marker) -- below: driver-green
        # at least once, re-verified by the full local gate every round --
        # (d48's only r14 change is the worker repo-root argv — demoted
        #  from the window to make room for the d54 matrix pin; the argv
        #  path is exercised by every full-gate d48 run at all three SFs)
        "d48_concurrent_writers": _d48_concurrent_writers,
        "d49_schema_evolution": _d49_schema_evolution,
        "d50_compact_under_reader": _d50_compact_under_reader,
        "a32_ivfpq_topk": _a_ivfpq_topk,
        "a34_opq_topk": _a_opq_topk,
        "a55_ivfpq_persist": _a55_ivfpq_persist,
        "a60_ivfpq_add": _a60_ivfpq_add,
        "a159_ann_ingest_stream": _a159_ann_ingest_stream,
        "d44_incremental_compaction": _d44_incremental_compaction,
        "d47_compact_manifest_lookup": _d47_compact_manifest_lookup,
        "d24_targeted_delete": _d24_targeted_delete,
        "a15_incremental_dedup": _a15_incremental_dedup,
        "a65_lsh_persist": _a65_lsh_persist,
        "e52_min_cost_supplier": _e52_min_cost_supplier,
        "e53_pareto_abc": _e53_pareto_abc,
        "e54_sequence_gaps": _e54_sequence_gaps,
        "e55_rolling_correlation": _e55_rolling_correlation,
        "e58_time_to_convert": _e58_time_to_convert,
        "e60_max_concurrency": _e60_max_concurrency,
        "e61_fk_integrity": _e61_fk_integrity,
        "a105_lang_purity": _a105_lang_purity,
        "a106_transitivity_gap": _a106_transitivity_gap,
        "a107_sorted_neighborhood": _a107_sorted_neighborhood,
        "a108_basket_rules": _a108_basket_rules,
        "a109_edit_distance_join": _a109_edit_distance_join,
        "a110_heaps_curve": _a110_heaps_curve,
        "a111_skipgram_cooccurrence": _a111_skipgram_cooccurrence,
        "a112_term_burstiness": _a112_term_burstiness,
        "a117_kmv_intersection": _a117_kmv_intersection,
        "a124_image_dhash_pairs": _a124_image_dhash_pairs,
        "a129_minhash_calibration": _a129_minhash_calibration,
        "a133_davies_bouldin": _a133_davies_bouldin,
        "a134_ols_pandas": _a134_ols_pandas,
        "a137_rolling_distinct_sketch": _a137_rolling_distinct_sketch,
        "a138_kcore_peel": _a138_kcore_peel,
        "a114_mutual_information": _a114_mutual_information,
        "a115_chao1_richness": _a115_chao1_richness,
        "a116_bpe_merge_pairs": _a116_bpe_merge_pairs,
        "a118_two_stage_rerank": _a118_two_stage_rerank,
        "a120_quantile_normalize": _a120_quantile_normalize,
        "a122_ols_sufficient_stats": _a122_ols_sufficient_stats,
        "a123_ams_f2": _a123_ams_f2,
        "a126_coverage_selection": _a126_coverage_selection,
        "a127_hard_negatives": _a127_hard_negatives,
        "d43_restart_recovery": _d43_restart_recovery,
        "d45_watermark_policy": _d45_watermark_policy,
        "d46_ann_recall": _d46_ann_recall,
        "a158_dedup_ingest_stream": _a158_dedup_ingest_stream,
        "d25_replay_estimate": _d25_replay_estimate,
        "d26_blob_skew_report": _d26_blob_skew_report,
        "e33_scd2": _e33_scd2,
        "e34_band_join": _e34_band_join,
        "e35_equidepth_histogram": _e35_equidepth_histogram,
        "e36_graph_bfs": _e36_graph_bfs,
        "e37_mad_outliers": _e37_mad_outliers,
        "e38_datetime_suite": _e38_datetime_suite,
        "e39_json_extract": _e39_json_extract,
        "e40_array_functions": _e40_array_functions,
        "e41_upsert_merge": _e41_upsert_merge,
        "e43_rolling_distinct": _e43_rolling_distinct,
        "a42_int8_quantize": _a42_int8_quantize,
        "a45_random_projection": _a45_random_projection,
        "a121_entity_resolution": _a121_entity_resolution,
        "a113_histogram_quantiles": _a113_histogram_quantiles,
        "a125_personalized_pagerank": _a125_personalized_pagerank,
        "e37b_approx_percentile": _e37b_approx_percentile,
        "d27_table_checksum": _d27_table_checksum,
        "d28_storage_tiering": _d28_storage_tiering,
        "d29_ingest_heatmap": _d29_ingest_heatmap,
        "d30_zorder_layout": _d30_zorder_layout,
        "d31_compaction_plan": _d31_compaction_plan,
        "d32_column_drift": _d32_column_drift,
        "d33_zonemap_audit": _d33_zonemap_audit,
        "d34_ingest_lag": _d34_ingest_lag,
        "d35_ingest_forecast": _d35_ingest_forecast,
        "d36_consistent_hashing": _d36_consistent_hashing,
        "d37_position_density": _d37_position_density,
        "e44_user_mode": _e44_user_mode,
        "e45_markov_transitions": _e45_markov_transitions,
        "e47_weekly_churn": _e47_weekly_churn,
        "e48_longest_streak": _e48_longest_streak,
        "e50_ewma_smoothing": _e50_ewma_smoothing,
        "e51_map_functions": _e51_map_functions,
        "d40_lifecycle_e2e": _d40_lifecycle_e2e,
        "d41_multi_consumer": _d41_multi_consumer,
        "d42_dedup_gate_stream": _d42_dedup_gate_stream,
        "a155_drift_stream": _a155_drift_stream,
        "a156_new_key_stream": _a156_new_key_stream,
        "a157_dup_rate_stream": _a157_dup_rate_stream,
        "e24_asof_tolerance": _e24_asof_tolerance,
        "e25_gap_fill": _e25_gap_fill,
        "e26_array_agg": _e26_array_agg,
        "e27_event_funnel": _e27_event_funnel,
        "e28_cohort_retention": _e28_cohort_retention,
        "e29_event_sequences": _e29_event_sequences,
        "e30_rank_functions": _e30_rank_functions,
        "e31_stats_functions": _e31_stats_functions,
        "e32_anomaly_zscore": _e32_anomaly_zscore,
        "a83_source_dup_matrix": _a83_source_dup_matrix,
        "a84_novelty": _a84_novelty,
        "a100_epoch_upsample": _a100_epoch_upsample,
        "a101_k_anonymity": _a101_k_anonymity,
        "a102_term_churn": _a102_term_churn,
        "a103_dup_pair_qa_sample": _a103_dup_pair_qa_sample,
        "a104_reshard_moves": _a104_reshard_moves,
        "a25_pq_topk": _a_pq_topk,
        "a40_tfidf_topterms": _a40_tfidf,
        "a41_source_rollup": _a41_source_rollup,
        "a43_norm_fingerprint": _a43_norm_fingerprint,
        "a46_dup_rate_by_source": _a46_dup_rate_by_source,
        "a47_temperature_mix": _a47_temperature_mix,
        "a48_shard_assign": _a48_shard_assign,
        "a51_vocab_coverage": _a51_vocab_coverage,
        "a54_boilerplate": _a54_boilerplate,
        "a75_quality_calibration": _a75_quality_calibration,
        "a7_ivf_topk": _a_ivf_topk,
        "a85_length_histogram": _a85_length_histogram,
        "a86_type_token_stats": _a86_type_token_stats,
        "a87_split_balance": _a87_split_balance,
        "a88_dup_gram_report": _a88_dup_gram_report,
        "a91_hll_distinct": _a91_hll_distinct,
        "a92_bloom_decontaminate": _a92_bloom_decontaminate,
        "a93_containment": _a93_containment,
        "a94_power_iteration": _a94_power_iteration,
        "a95_source_entropy": _a95_source_entropy,
        "a96_weighted_sample": _a96_weighted_sample,
        "a97_sparse_cosine_pairs": _a97_sparse_cosine_pairs,
        "a98_zipf_slope": _a98_zipf_slope,
        "a99_triangle_count": _a99_triangle_count,
        "d23_integrity_audit": _d23_integrity_audit,
        "d38_resubmit_e2e": _d38_resubmit_e2e,
        "d39_resubmit_e2e_ocf": _d39_resubmit_e2e_ocf,
        "a142_window_category_drift": _a142_window_category_drift,
        "a144_ks_event_value": _a144_ks_event_value,
        "a33_semdedup": _a_semdedup,
        "a6_lsh_topk": _a_lsh_topk,
        "e10_join_topk": _e10_join_topk,
        "e11_asof_join": _e11_asof_join,
        "e12_percentiles": _e12_percentiles,
        "e13_grouping_sets": _e13_grouping_sets,
        "e14_except": _e14_except,
        "e15_pivot": _e15_pivot,
        "e16_correlated_exists": _e16_correlated_exists,
        "e17_term_heavy_hitters": _e17_term_heavy_hitters,
        "e18_null_safe_join": _e18_null_safe_join,
        "e19_sliding_window": _e19_sliding_window,
        "e20_time_range_rolling": _e20_time_range_rolling,
        "e21_interval_join": _e21_interval_join,
        "e22_unpivot": _e22_unpivot,
        "e23_ntile": _e23_ntile,
        "e8_tumbling_window": _e_tumbling_window,
        "e9_sessionize": _e9_sessionize,
        "a12_embedding_pairs": _a12_embedding_pairs,
        "a19_simhash_md5": _a19_simhash_md5,
        "a26_cc_two_phase": _a_cc_two_phase,
        "a57_centroid_drift": _a57_centroid_drift,
        "a58_skew_profile": _a58_skew_profile,
        "a59_quality_funnel": _a59_quality_funnel,
        "a61_unigram_kl": _a61_unigram_kl,
        "a62_dataset_card": _a62_dataset_card,
        "a63_temperature_sample": _a63_temperature_sample,
        "a64_decontaminate": _a64_decontaminate,
        "a66_snapshot_diff": _a66_snapshot_diff,
        "a67_cms_merge": _a67_cms_merge,
        "a68_grouped_split": _a68_grouped_split,
        "a69_filtered_ann": _a69_filtered_ann,
        "a71_vocab_overlap": _a71_vocab_overlap,
        "a72_threshold_curve": _a72_threshold_curve,
        "a74_embedding_outliers": _a74_embedding_outliers,
        "a76_blocklist_filter": _a76_blocklist_filter,
        "a77_soft_quality_sample": _a77_soft_quality_sample,
        "a78_eval_overlap_severity": _a78_eval_overlap_severity,
        "a79_cluster_size_dist": _a79_cluster_size_dist,
        "a80_token_spectrum": _a80_token_spectrum,
        "a81_exactsubstr_clean": _a81_exactsubstr_clean,
        "a82_token_budget": _a82_token_budget,
        "a140_curation_e2e": _a140_curation_e2e,
        "a141_windowed_dup_rate": _a141_windowed_dup_rate,
        "a143_quality_psi": _a143_quality_psi,
        "a145_late_arrivals": _a145_late_arrivals,
        "a146_window_percentiles": _a146_window_percentiles,
        "a147_new_key_rate": _a147_new_key_rate,
        "a148_window_anomaly": _a148_window_anomaly,
        "a149_windowed_hll_users": _a149_windowed_hll_users,
        "a150_dup_lineage": _a150_dup_lineage,
        "a151_window_funnel": _a151_window_funnel,
        "a152_session_stats": _a152_session_stats,
        "a153_watermark_curve": _a153_watermark_curve,
        "a154_attribution_rate": _a154_attribution_rate,
        "a4_simhash_pairs": _a_simhash,
        "a5_embedding_topk": _a_embedding_topk,
        "a8_text_stats": _a_text_stats,
        "a9_langid_profile": _a_langid_profile,
        "a10_multimodal_features": _a_multimodal_features,
        "a11_dedup_clusters": _a_dedup_clusters,
        "a27_lm_perplexity": _a_lm_perplexity,
        "a28_weighted_mix": _a_weighted_mix,
        "a30_dup_spans": _a_dup_spans,
        "a31_quota_sample": _a_quota_sample,
        "a35_audio_features": _a_audio_features,
        "a36_frame_samples": _a_frame_samples,
        "d22_mongo_payload_fetch": _d22_mongo_payload_fetch,
        "a37_chunking": _a37_chunking,
        "a38_pmi_bigrams": _a38_pmi,
        "a39_split_assign": _a39_splits,
        "a44_cluster_reps": _a44_cluster_reps,
        "a49_ann_recall": _a49_ann_recall,
        "a50_hybrid_rrf": _a50_hybrid_rrf,
        "a52_split_leakage": _a52_split_leakage,
        "a53_dup_substrings": _a53_dup_substrings,
        "a56_pagerank": _a56_pagerank,
        "a13_curation_pipeline": _a13_curation_pipeline,
        "a14_bm25_topk": _a14_bm25_topk,
        "a16_label_centroids": _a16_label_centroids,
        "a17_bpe_tokens": _a17_bpe_tokens,
        "a18_winnowing_pairs": _a18_winnowing_pairs,
        "a20_contamination": _a20_contamination,
        "a21_cms_sketch": _a21_cms_sketch,
        "a22_repetition": _a22_repetition,
        "a23_quality_rules": _a23_quality_rules,
        "a24_pii_scrub": _a24_pii_scrub,
        "a29_pack_sequences": _a_pack_sequences,
    }


# -- DuckDB oracles ----------------------------------------------------------

def _zorder_sql(cx: str, cy: str, bits_x: int, bits_y: int) -> str:
    """The d30 Morton expression as portable SQL, emitted from the SAME
    interleave schedule the Spark side uses (layout.zorder_plan) — pure
    integer shifts/masks, so the two engines agree bit-for-bit."""
    from persistor_spark.plans.layout import zorder_plan

    cols = {"x": cx, "y": cy}
    return " | ".join(
        f"((({cols[d]} >> {s}) & 1) << {t})" for d, s, t in zorder_plan(bits_x, bits_y)
    )


_OLS_ORACLE = (
    "WITH f AS (SELECT source, "
    "    CAST(len(string_split(text, ' ')) AS BIGINT) AS x, "
    "    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y, "
    "    CAST(n_chars AS BIGINT) AS z FROM documents), "
    "s AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
    "    sum(z) AS sz, sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy, "
    "    sum(x*z) AS sxz, sum(y*z) AS syz, sum(z*z) AS szz "
    "  FROM f GROUP BY source), "
    "c AS (SELECT source, n, "
    "    sxx - sx*sx/CAST(n AS DOUBLE) AS cxx, "
    "    syy - sy*sy/CAST(n AS DOUBLE) AS cyy, "
    "    sxy - sx*sy/CAST(n AS DOUBLE) AS cxy, "
    "    sxz - sx*sz/CAST(n AS DOUBLE) AS cxz, "
    "    syz - sy*sz/CAST(n AS DOUBLE) AS cyz, "
    "    szz - sz*sz/CAST(n AS DOUBLE) AS czz, "
    "    sx/CAST(n AS DOUBLE) AS mx, sy/CAST(n AS DOUBLE) AS my, "
    "    sz/CAST(n AS DOUBLE) AS mz "
    "  FROM s), "
    "b AS (SELECT source, n, "
    "    (cyy*cxz - cxy*cyz) / (cxx*cyy - cxy*cxy) AS b1, "
    "    (cxx*cyz - cxy*cxz) / (cxx*cyy - cxy*cxy) AS b2, "
    "    cxz, cyz, czz, mx, my, mz FROM c) "
    "SELECT source, n, round(b1, 6) AS b_words, round(b2, 6) AS b_distinct, "
    "  round(mz - b1*mx - b2*my, 4) AS intercept, "
    "  round((b1*cxz + b2*cyz) / czz, 6) AS r2 "
    "FROM b ORDER BY source"
)


def oracle_sql() -> dict[str, str]:
    P = oracle.with_prologue
    # CC output (doc_id -> component-min) is algorithm-independent, so the
    # min-label-propagation query (a11) and the large-star/small-star query
    # (a26) share one recursive-reach oracle.
    cc_with = (
        "WITH RECURSIVE "
        "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        + _posting_pairs_cte()
        + "pairs AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
        "edges AS (SELECT a AS src, b AS dst FROM pairs "
        "  UNION SELECT b AS src, a AS dst FROM pairs), "
        "reach(src, dst) AS ("
        "  SELECT src, dst FROM edges "
        "  UNION "
        "  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src) "
    )
    cc_oracle = cc_with + (
        "SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
        "FROM reach GROUP BY src ORDER BY doc_id"
    )
    # a150: the same components, restricted to non-representatives, with
    # the kept/removed sources attached (the survivorship lineage)
    lineage_oracle = cc_with + (
        ", comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
        "  FROM reach GROUP BY src) "
        "SELECT c.doc_id AS removed_id, c.cluster_id AS kept_id, "
        "  dr.source AS removed_source, dk.source AS kept_source, "
        "  (dr.source = dk.source) AS same_source "
        "FROM comp c JOIN documents dr ON c.doc_id = dr.doc_id "
        "JOIN documents dk ON c.cluster_id = dk.doc_id "
        "WHERE c.doc_id <> c.cluster_id ORDER BY removed_id"
    )
    # a44: the same components, then one representative per cluster
    # (singletons = docs with no near-dup edge are their own cluster).
    reps_oracle = cc_with + (
        ", comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
        "  FROM reach GROUP BY src), "
        "alld AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, "
        "  d.n_chars FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id), "
        "r AS (SELECT cluster_id, doc_id, n_chars, "
        "  row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rn, "
        "  count(*) OVER (PARTITION BY cluster_id) AS nm FROM alld) "
        "SELECT cluster_id, doc_id AS rep_doc_id, n_chars AS rep_quality, "
        "nm AS n_members, nm - 1 AS n_dropped FROM r WHERE rn = 1 ORDER BY cluster_id"
    )
    # a68: the same components, group key = component min (own id for
    # singletons), then the a39 hash-interval split keyed on the GROUP
    from persistor_spark.analytics.sampling import split_thresholds as _st

    _t0, _t1 = _st({"train": 0.8, "val": 0.1, "test": 0.1})
    grouped_split_oracle = cc_with + (
        ", comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
        "  FROM reach GROUP BY src), "
        "alld AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_key "
        "  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id), "
        "u AS (SELECT doc_id, group_key, "
        "  CAST(CONCAT('0x', substr(md5('42_' || group_key), 1, 15)) AS BIGINT) "
        "    / 1152921504606846976.0 AS u FROM alld) "
        "SELECT doc_id, group_key, CASE "
        f"WHEN u < {_t0!r} THEN 'train' "
        f"WHEN u < {_t1!r} THEN 'val' "
        "ELSE 'test' END AS split FROM u ORDER BY doc_id"
    )
    # a79: same components, singleton fill, then the size-of-sizes rollup
    cluster_size_oracle = cc_with + (
        ", comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
        "  FROM reach GROUP BY src), "
        "alld AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cid "
        "  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id), "
        "sz AS (SELECT cid, count(*) AS size FROM alld GROUP BY cid) "
        "SELECT size, count(*) AS n_clusters FROM sz GROUP BY size ORDER BY size"
    )
    # a45: the SAME seeded JL matrix the Spark operator folds into its plan,
    # embedded as DOUBLE[] literals (repr round-trips to the identical
    # double on both engines).
    from persistor_spark.analytics.similarity import jl_matrix as _jl

    _jl_dims = ", ".join(
        f"round(list_dot_product(emb, {json.dumps(row)}::DOUBLE[]), 4)"
        for row in _jl(64, 16, 7)
    )
    # r7: exploded to scalar (vec_id, dim, proj) rows — the driver harness
    # cannot canonicalize array-typed cells (the only red rows it ever
    # produced, r6 a42/a45); dim is 0-based to match Spark's posexplode.
    jl_oracle = (
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
        f"p AS (SELECT vec_id, [{_jl_dims}] AS proj FROM v) "
        "SELECT vec_id, CAST(t.i AS INT) AS dim, proj[t.i + 1] AS proj "
        "FROM p, range(0, 16) t(i) ORDER BY vec_id, dim"
    )
    return {
        # -- r9 growth: composed curation chain + windowed stream-quality
        #    analytics (the day bucket is epoch-aligned BIGINT seconds,
        #    matching F.window('1 day') under the UTC session) ----------
        "a140_curation_e2e": _curation_e2e_oracle(),
        "a150_dup_lineage": lineage_oracle,
        "a151_window_funnel": (
            "WITH f AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  user_id, "
            "  min(CASE WHEN event_type = 'view' THEN ts END) AS v, "
            "  min(CASE WHEN event_type = 'click' THEN ts END) AS c, "
            "  min(CASE WHEN event_type = 'purchase' THEN ts END) AS p "
            "  FROM events GROUP BY 1, 2), "
            "g AS (SELECT bucket, "
            "  CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS viewed, "
            "  CASE WHEN v IS NOT NULL AND c > v THEN 1 ELSE 0 END AS clicked, "
            "  CASE WHEN v IS NOT NULL AND c > v AND p > c THEN 1 ELSE 0 END AS purchased "
            "  FROM f) "
            "SELECT bucket, sum(viewed)::BIGINT AS n_view_users, "
            "  sum(clicked)::BIGINT AS n_clicked, sum(purchased)::BIGINT AS n_purchased, "
            "  sum(clicked)::DOUBLE / sum(viewed) AS click_rate, "
            "  sum(purchased)::DOUBLE / sum(viewed) AS purchase_rate "
            "FROM g GROUP BY bucket HAVING sum(viewed) > 0 ORDER BY bucket"
        ),
        "a152_session_stats": (
            "WITH s AS (SELECT user_id, ts, event_id, "
            "  CASE WHEN lag(ts) OVER w IS NULL "
            "    OR CAST(floor(epoch(ts)) AS BIGINT) - "
            "       CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 "
            "  THEN 1 ELSE 0 END AS new_sess "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s2 AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM s), "
            "per AS (SELECT user_id, sess_id, count(*) AS n_events, min(ts) AS start_ts, "
            "  CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS dur_s "
            "  FROM s2 GROUP BY 1, 2) "
            "SELECT CAST(floor(epoch(start_ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  count(*)::BIGINT AS n_sessions, round(avg(n_events), 4) AS avg_events, "
            "  round(avg(dur_s), 4) AS avg_duration_s, max(n_events)::BIGINT AS max_events "
            "FROM per GROUP BY 1 ORDER BY 1"
        ),
        "a153_watermark_curve": (
            "WITH h AS (SELECT ts, max(ts) OVER (ORDER BY event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm FROM events), "
            "l AS (SELECT CAST(floor(epoch(hwm)) AS BIGINT) - "
            "  CAST(floor(epoch(ts)) AS BIGINT) AS late_s FROM h), "
            "d AS (SELECT unnest([600, 1800, 3600, 7200]) AS delay_seconds) "
            "SELECT delay_seconds::BIGINT AS delay_seconds, count(*)::BIGINT AS n_rows, "
            "  sum(CASE WHEN late_s > delay_seconds THEN 1 ELSE 0 END)::BIGINT AS n_late, "
            "  sum(CASE WHEN late_s > delay_seconds THEN 1 ELSE 0 END)::DOUBLE "
            "    / count(*) AS late_rate "
            "FROM l, d GROUP BY delay_seconds ORDER BY delay_seconds"
        ),
        "a154_attribution_rate": (
            "WITH v AS (SELECT user_id, event_id AS view_id, ts AS vts FROM events "
            "  WHERE event_type = 'view'), "
            "p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'), "
            "att AS (SELECT v.view_id, v.vts, "
            "  max(CASE WHEN p.pts IS NOT NULL THEN 1 ELSE 0 END) AS attributed "
            "  FROM v LEFT JOIN p ON v.user_id = p.user_id "
            "  AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 10 MINUTE "
            "  GROUP BY 1, 2) "
            "SELECT CAST(floor(epoch(vts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  count(*)::BIGINT AS n_views, sum(attributed)::BIGINT AS n_attributed, "
            "  sum(attributed)::DOUBLE / count(*) AS attribution_rate "
            "FROM att GROUP BY 1 ORDER BY 1"
        ),
        "a141_windowed_dup_rate": (
            "WITH pk AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2, 3) "
            "SELECT bucket, sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys, "
            "  1 - (count(*)::DOUBLE / sum(n)) AS dup_rate "
            "FROM pk GROUP BY bucket ORDER BY bucket"
        ),
        "a142_window_category_drift": (
            "WITH c AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS ws, "
            "  event_type, count(*) AS n FROM events GROUP BY 1, 2), "
            "tot AS (SELECT ws, sum(n) AS tot FROM c GROUP BY ws), "
            "p AS (SELECT c.ws, c.event_type, c.n / tot.tot::DOUBLE AS p "
            "  FROM c JOIN tot ON c.ws = tot.ws), "
            "prev AS (SELECT ws + 86400 AS ws, event_type, p AS p_prev FROM p), "
            "al AS (SELECT coalesce(p.ws, prev.ws) AS ws, "
            "  coalesce(p.p, 0) AS pa, coalesce(prev.p_prev, 0) AS pb "
            "  FROM p FULL OUTER JOIN prev "
            "  ON p.ws = prev.ws AND p.event_type = prev.event_type) "
            "SELECT ws AS bucket, CASE WHEN ws - 86400 IN (SELECT ws FROM tot) "
            "  THEN round(0.5 * sum(abs(pa - pb)), 4) END AS tv_drift "
            "FROM al WHERE ws IN (SELECT ws FROM tot) "
            "GROUP BY ws ORDER BY ws"
        ),
        "a143_quality_psi": (
            "WITH e AS (SELECT quantile_cont(n_chars::DOUBLE, "
            "  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ed FROM documents), "
            "b AS (SELECT source, list_sum(list_transform(ed, "
            "  x -> CASE WHEN n_chars::DOUBLE > x THEN 1 ELSE 0 END)) AS bucket "
            "  FROM documents, e), "
            "ref AS (SELECT bucket, count(*) AS n_ref FROM b GROUP BY bucket), "
            "tot AS (SELECT source, count(*) AS tot_g FROM b GROUP BY source), "
            "grid AS (SELECT source, tot_g, r AS bucket FROM tot, range(0, 10) t(r)), "
            "per AS (SELECT source, bucket, count(*) AS n_g FROM b GROUP BY 1, 2), "
            "j AS (SELECT g.source, "
            "  greatest(coalesce(per.n_g, 0) / g.tot_g::DOUBLE, 1e-6) AS p_g, "
            "  greatest(coalesce(ref.n_ref, 0) / (SELECT count(*) FROM documents)::DOUBLE, 1e-6) AS p_ref "
            "  FROM grid g "
            "  LEFT JOIN per ON g.source = per.source AND g.bucket = per.bucket "
            "  LEFT JOIN ref ON g.bucket = ref.bucket) "
            "SELECT source, round(sum((p_g - p_ref) * ln(p_g / p_ref)), 4) AS psi "
            "FROM j GROUP BY source ORDER BY source"
        ),
        "a144_ks_event_value": (
            "WITH counts AS (SELECT event_type AS g, value::DOUBLE AS v, count(*) AS n "
            "  FROM events GROUP BY 1, 2), "
            "sizes AS (SELECT g, sum(n)::BIGINT AS tot FROM counts GROUP BY g), "
            "pairs AS (SELECT a.g AS ga, b.g AS gb FROM sizes a JOIN sizes b ON a.g < b.g), "
            "sided AS (SELECT ga, gb, v, "
            "  sum(CASE WHEN g = ga THEN n ELSE 0 END) AS na, "
            "  sum(CASE WHEN g = gb THEN n ELSE 0 END) AS nb "
            "  FROM counts JOIN pairs ON g = ga OR g = gb GROUP BY 1, 2, 3), "
            "cum AS (SELECT ga, gb, "
            "  sum(na) OVER w AS ca, sum(nb) OVER w AS cb FROM sided "
            "  WINDOW w AS (PARTITION BY ga, gb ORDER BY v "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
            "SELECT ga AS group_a, gb AS group_b, "
            "  round(max(abs(ca::DOUBLE / ta.tot - cb::DOUBLE / tb.tot)), 4) AS ks_stat, "
            "  ta.tot AS n_a, tb.tot AS n_b "
            "FROM cum JOIN sizes ta ON ga = ta.g JOIN sizes tb ON gb = tb.g "
            "GROUP BY ga, gb, ta.tot, tb.tot ORDER BY 1, 2"
        ),
        "a145_late_arrivals": (
            "WITH h AS (SELECT ts, max(ts) OVER (ORDER BY event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm FROM events), "
            "f AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  CASE WHEN ts < hwm - INTERVAL 1 HOUR THEN 1 ELSE 0 END AS late FROM h) "
            "SELECT bucket, count(*)::BIGINT AS n_rows, sum(late)::BIGINT AS n_late, "
            "  sum(late)::DOUBLE / count(*) AS late_rate "
            "FROM f GROUP BY bucket ORDER BY bucket"
        ),
        "a146_window_percentiles": (
            "SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "count(*)::BIGINT AS n, "
            "round(quantile_cont(value, 0.5), 4) AS p50, "
            "round(quantile_cont(value, 0.9), 4) AS p90, "
            "round(quantile_cont(value, 0.99), 4) AS p99 "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "a147_new_key_rate": (
            "WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id), "
            "per AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  count(*)::BIGINT AS n_rows, count(DISTINCT user_id)::BIGINT AS n_keys "
            "  FROM events GROUP BY 1), "
            "nw AS (SELECT CAST(floor(epoch(first_ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  count(*)::BIGINT AS n_new FROM f GROUP BY 1) "
            "SELECT per.bucket, n_rows, n_keys, coalesce(n_new, 0)::BIGINT AS n_new, "
            "  coalesce(n_new, 0) / n_keys::DOUBLE AS new_key_rate "
            "FROM per LEFT JOIN nw ON per.bucket = nw.bucket ORDER BY per.bucket"
        ),
        # a157: a141 restricted to closed windows (the streaming sink's
        # exact content; same cutoff construction as a155/a156)
        "a157_dup_rate_stream": (
            "WITH cut AS (SELECT epoch(max(ts)) - 7200 AS cutoff FROM events), "
            "pk AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2, 3) "
            "SELECT bucket, sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys, "
            "  1 - (count(*)::DOUBLE / sum(n)) AS dup_rate "
            "FROM pk WHERE bucket + 86400 <= (SELECT cutoff FROM cut) "
            "GROUP BY bucket ORDER BY bucket"
        ),
        # a155: a142's drift restricted to CLOSED windows (window end <=
        # max(ts) - the 2h watermark) and computed from the closed counts
        # only — exactly what the streaming sink holds.  Closure is a
        # time-prefix, so a closed window's predecessor is always closed.
        "a155_drift_stream": (
            "WITH cut AS (SELECT epoch(max(ts)) - 7200 AS cutoff FROM events), "
            "raw AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS ws, "
            "  event_type, count(*) AS n FROM events GROUP BY 1, 2), "
            "c AS (SELECT * FROM raw WHERE ws + 86400 <= (SELECT cutoff FROM cut)), "
            "tot AS (SELECT ws, sum(n) AS tot FROM c GROUP BY ws), "
            "p AS (SELECT c.ws, c.event_type, c.n / tot.tot::DOUBLE AS p "
            "  FROM c JOIN tot ON c.ws = tot.ws), "
            "prev AS (SELECT ws + 86400 AS ws, event_type, p AS p_prev FROM p), "
            "al AS (SELECT coalesce(p.ws, prev.ws) AS ws, "
            "  coalesce(p.p, 0) AS pa, coalesce(prev.p_prev, 0) AS pb "
            "  FROM p FULL OUTER JOIN prev "
            "  ON p.ws = prev.ws AND p.event_type = prev.event_type) "
            "SELECT ws AS bucket, CASE WHEN ws - 86400 IN (SELECT ws FROM tot) "
            "  THEN round(0.5 * sum(abs(pa - pb)), 4) END AS tv_drift "
            "FROM al WHERE ws IN (SELECT ws FROM tot) "
            "GROUP BY ws ORDER BY ws"
        ),
        # a156: a147 restricted to closed windows; n_new still buckets by
        # each key's GLOBAL first occurrence (the ledger is emitted on
        # first sight regardless of window closure — only the totals side
        # gates the output rows)
        "a156_new_key_stream": (
            "WITH cut AS (SELECT epoch(max(ts)) - 7200 AS cutoff FROM events), "
            "f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id), "
            "per AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  count(*)::BIGINT AS n_rows, count(DISTINCT user_id)::BIGINT AS n_keys "
            "  FROM events GROUP BY 1), "
            "nw AS (SELECT CAST(floor(epoch(first_ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  count(*)::BIGINT AS n_new FROM f GROUP BY 1) "
            "SELECT per.bucket, n_rows, n_keys, coalesce(n_new, 0)::BIGINT AS n_new, "
            "  coalesce(n_new, 0) / n_keys::DOUBLE AS new_key_rate "
            "FROM per LEFT JOIN nw ON per.bucket = nw.bucket "
            "WHERE per.bucket + 86400 <= (SELECT cutoff FROM cut) "
            "ORDER BY per.bucket"
        ),
        "a148_window_anomaly": (
            "WITH per AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  sum(value) AS total FROM events GROUP BY 1), "
            "z AS (SELECT bucket, total, avg(total) OVER w AS mu, "
            "  stddev_samp(total) OVER w AS sd FROM per "
            "  WINDOW w AS (ORDER BY bucket ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) "
            "SELECT bucket, round(total, 2) AS total, "
            "  round(CASE WHEN sd IS NOT NULL AND sd > 0 THEN (total - mu) / sd END, 4) "
            "    AS trailing_z "
            "FROM z ORDER BY bucket"
        ),
        "a149_windowed_hll_users": (
            # p=8 -> 52-bit suffix; mask = 2^52 - 1 (the a91 register/rho
            # arithmetic, grouped by the day bucket)
            "WITH h AS (SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, "
            "  CAST(CONCAT('0x', substr(md5(user_id::VARCHAR), 1, 15)) AS BIGINT) AS h "
            "  FROM events), "
            "r AS (SELECT bucket, h >> 52 AS register, h & 4503599627370495 AS w FROM h), "
            "rh AS (SELECT bucket, register, CASE WHEN w = 0 THEN 53 "
            "  ELSE 52 - length(bin(w)) + 1 END AS rho FROM r) "
            "SELECT bucket, register::INT AS register, max(rho)::INT AS max_rho "
            "FROM rh GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "d1_point_lookup": P(
            "SELECT unique_id, broker_id, location_key, location_position "
            "FROM index_metadata WHERE unique_id = 'b3_m000000123' ORDER BY unique_id"
        ),
        "d2_in_list": P(
            "SELECT unique_id, broker_id FROM index_metadata WHERE unique_id IN "
            "('b1_m000000001','b2_m000000002','b3_m000000003','b0_m000000004') "
            "ORDER BY unique_id"
        ),
        "d3_interval_page": P(
            "SELECT unique_id, publish_time FROM index_metadata "
            "WHERE publish_time >= TIMESTAMP '2024-01-05 00:00:00' "
            "AND publish_time < TIMESTAMP '2024-01-10 00:00:00' "
            "AND broker_id = 'b1' ORDER BY unique_id LIMIT 20 OFFSET 40"
        ),
        "d4_interval_count": P(
            "SELECT count(*) AS total_count FROM index_metadata "
            "WHERE publish_time >= TIMESTAMP '2024-01-05 00:00:00' "
            "AND publish_time < TIMESTAMP '2024-01-10 00:00:00' AND broker_id = 'b1'"
        ),
        "d5_or_of_ands": P(
            "SELECT unique_id FROM index_metadata WHERE "
            "(broker_id = 'b0' AND ordering_key = 'k4') OR "
            "(business_source_key = 'src2' AND publish_time >= TIMESTAMP '2024-01-03 00:00:00') "
            "ORDER BY unique_id"
        ),
        "d6_key_derivation": P(
            "SELECT broker_id || '_' || broker_msg_id AS unique_id, "
            "CASE WHEN business_source_key IS NOT NULL AND business_object_key IS NOT NULL "
            "THEN business_source_key || '_' || business_object_key END AS index_source_key "
            "FROM messages ORDER BY unique_id"
        ),
        "d7_version_partition": P(
            "SELECT coalesce(attr_version, 'unknown') AS version, count(*) AS n "
            "FROM messages GROUP BY 1 ORDER BY 1"
        ),
        "d8_time_partition": P(
            "SELECT year(ingestion_time) AS y, month(ingestion_time) AS m, "
            "day(ingestion_time) AS d, count(*) AS n FROM messages GROUP BY 1,2,3 "
            "ORDER BY 1,2,3"
        ),
        "d9_position_align_join": P(
            "SELECT m.unique_id, b.payload FROM index_metadata m "
            "JOIN blob_records b ON m.location_key = b.location_key "
            "AND m.location_position = b.position "
            "UNION ALL "
            "SELECT m.unique_id, b.payload FROM index_metadata m "
            "JOIN blob_records b ON m.location_key = b.location_key "
            "WHERE m.location_position IS NULL "
            "ORDER BY unique_id"
        ),
        # d22: the S6 store rebuilt relationally — same parity split, same
        # location list (50 hits + 1 missing + 1 malformed), same row-level
        # error routing
        "d22_mongo_payload_fetch": (
            "WITH k AS (SELECT o_orderkey AS k FROM orders ORDER BY k LIMIT 50), "
            "loc AS (SELECT (CASE WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END) "
            "    || '/o' || k::VARCHAR AS location_key FROM k "
            "  UNION ALL SELECT 'even/o999999999' UNION ALL SELECT 'malformed'), "
            "p AS (SELECT location_key, string_split(location_key, '/') AS parts "
            "  FROM loc), "
            "parsed AS (SELECT location_key, "
            "  CASE WHEN len(parts) = 2 AND length(parts[1]) > 0 "
            "    AND length(parts[2]) > 0 THEN parts[1] END AS collection, "
            "  CASE WHEN len(parts) = 2 AND length(parts[1]) > 0 "
            "    AND length(parts[2]) > 0 THEN parts[2] END AS msg_id FROM p), "
            "store AS (SELECT (CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END) "
            "    AS collection, 'o' || o_orderkey::VARCHAR AS msg_id, "
            "  o_orderpriority AS payload FROM orders) "
            "SELECT parsed.location_key, parsed.collection, parsed.msg_id, "
            "  store.payload, "
            "  CASE WHEN parsed.collection IS NULL THEN 'invalid_location_key' "
            "    WHEN store.msg_id IS NULL THEN 'document_not_found' END "
            "    AS error_category "
            "FROM parsed LEFT JOIN store "
            "  ON parsed.collection = store.collection AND parsed.msg_id = store.msg_id "
            "ORDER BY location_key"
        ),
        "d21_salted_agg": (
            "SELECT event_type, count(*) AS n, round(sum(value), 2) AS total "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "d20_first_seen": P(
            "SELECT broker_id || '_' || broker_msg_id AS unique_id, ingestion_time "
            "FROM ("
            "  SELECT *, row_number() OVER ("
            "    PARTITION BY broker_id, broker_msg_id "
            "    ORDER BY ingestion_time, event_seq) AS rk "
            "  FROM (SELECT * FROM messages "
            "        UNION ALL "
            "        SELECT * REPLACE (ingestion_time + INTERVAL 1 MINUTE AS ingestion_time) "
            "        FROM messages WHERE event_seq % 2 = 0)) "
            "WHERE rk = 1 ORDER BY unique_id"
        ),
        "d19_ocf_roundtrip": P(
            # identical to d9: the storage format must not change the result
            "SELECT m.unique_id, b.payload FROM index_metadata m "
            "JOIN blob_records b ON m.location_key = b.location_key "
            "AND m.location_position = b.position "
            "UNION ALL "
            "SELECT m.unique_id, b.payload FROM index_metadata m "
            "JOIN blob_records b ON m.location_key = b.location_key "
            "WHERE m.location_position IS NULL "
            "ORDER BY unique_id"
        ),
        "d10_group_by_location": P(
            "SELECT location_key, count(*) AS n, min(location_position) AS minp, "
            "max(location_position) AS maxp FROM index_metadata "
            "GROUP BY location_key ORDER BY location_key"
        ),
        "d11_unique_invariant": P(
            "SELECT unique_id, count(*) AS c FROM index_metadata GROUP BY unique_id "
            "HAVING count(*) > 1 ORDER BY unique_id"
        ),
        "d12_deadletter_antijoin": P(
            "SELECT m.broker_id || '_' || m.broker_msg_id AS unique_id FROM messages m "
            "LEFT JOIN deadletter d ON m.broker_id || '_' || m.broker_msg_id = d.unique_id "
            "WHERE d.unique_id IS NULL ORDER BY 1"
        ),
        "d13_lineage_counts": P(
            "SELECT count(*) AS indexed, count(location_position) AS positioned, "
            "count(DISTINCT location_key) AS blobs FROM index_metadata"
        ),
        # d38: the composed resubmit chain — replay query page -> metadata
        # prune -> position-align (both join arms) -> per-ordering-key
        # publish sequence -> publish manifest; uid_chain pins the exact
        # per-key publish ORDER, not just the membership
        "d38_resubmit_e2e": P(
            ", ids AS (SELECT unique_id FROM index_metadata "
            "  WHERE business_source_key = 'src1' "
            "  OR (business_source_key = 'src2' AND ordering_key = 'k3')), "
            "meta AS (SELECT m.* FROM index_metadata m JOIN ids USING (unique_id)), "
            "rec AS ("
            "  SELECT m.unique_id, m.ordering_key, b.payload, m.location_key, "
            "    m.location_position "
            "  FROM meta m JOIN blob_records b ON m.location_key = b.location_key "
            "  AND m.location_position = b.position "
            "  UNION ALL "
            "  SELECT m.unique_id, m.ordering_key, b.payload, m.location_key, "
            "    m.location_position "
            "  FROM meta m JOIN blob_records b ON m.location_key = b.location_key "
            "  WHERE m.location_position IS NULL), "
            "ord AS (SELECT *, row_number() OVER (PARTITION BY ordering_key "
            "  ORDER BY location_key, location_position ASC NULLS FIRST, unique_id) "
            "  AS publish_seq FROM rec) "
            "SELECT ordering_key, count(*)::BIGINT AS n_records, "
            "  sum(length(payload))::BIGINT AS n_bytes, "
            "  string_agg(unique_id, ',' ORDER BY publish_seq) AS uid_chain "
            "FROM ord GROUP BY ordering_key ORDER BY ordering_key"
        ),
        # d39: IDENTICAL to d38 — the OCF blob path must not change
        # the composed pipeline result (the d9-vs-d19 contract, lifted)
"d39_resubmit_e2e_ocf": P(
            ", ids AS (SELECT unique_id FROM index_metadata "
            "  WHERE business_source_key = 'src1' "
            "  OR (business_source_key = 'src2' AND ordering_key = 'k3')), "
            "meta AS (SELECT m.* FROM index_metadata m JOIN ids USING (unique_id)), "
            "rec AS ("
            "  SELECT m.unique_id, m.ordering_key, b.payload, m.location_key, "
            "    m.location_position "
            "  FROM meta m JOIN blob_records b ON m.location_key = b.location_key "
            "  AND m.location_position = b.position "
            "  UNION ALL "
            "  SELECT m.unique_id, m.ordering_key, b.payload, m.location_key, "
            "    m.location_position "
            "  FROM meta m JOIN blob_records b ON m.location_key = b.location_key "
            "  WHERE m.location_position IS NULL), "
            "ord AS (SELECT *, row_number() OVER (PARTITION BY ordering_key "
            "  ORDER BY location_key, location_position ASC NULLS FIRST, unique_id) "
            "  AS publish_seq FROM rec) "
            "SELECT ordering_key, count(*)::BIGINT AS n_records, "
            "  sum(length(payload))::BIGINT AS n_bytes, "
            "  string_agg(unique_id, ',' ORDER BY publish_seq) AS uid_chain "
            "FROM ord GROUP BY ordering_key ORDER BY ordering_key"
        ),
        # d40: the SAME chain over the STREAMED tables — location keys are
        # batch-scoped (blob name carries -b<batch_id> = event_seq % 4 by
        # the pinned chunking; positions restart per batch), so the oracle
        # rebuilds the streamed index/blob CTEs from `keyed` and the chain
        # SQL is otherwise verbatim d38
        "d40_lifecycle_e2e": P(
            ", skeyed AS (SELECT *, "
            "    'gs://persistor-bucket/msg/' "
            "    || CAST(year(ingestion_time) AS STRING) || '/' "
            "    || lpad(CAST(month(ingestion_time) AS STRING), 2, '0') || '/' "
            "    || lpad(CAST(day(ingestion_time) AS STRING), 2, '0') || '/' "
            "    || coalesce(attr_version, 'unknown') || '/' "
            "    || 'blob-' || broker_id || '-b' || CAST(event_seq % 4 AS STRING) "
            "    || '.avro' AS slk "
            "  FROM keyed), "
            "spos AS (SELECT *, count(*) OVER (PARTITION BY slk) AS sblob_n, "
            "  CAST(row_number() OVER (PARTITION BY slk ORDER BY unique_id) AS INT) "
            "  AS srn FROM skeyed), "
            "sidx AS (SELECT unique_id, business_source_key, ordering_key, "
            "  slk AS location_key, "
            "  CASE WHEN sblob_n = 1 THEN NULL ELSE srn END AS location_position "
            "  FROM spos), "
            "sblobs AS (SELECT slk AS location_key, srn AS position, "
            "  unique_id AS record_id, payload FROM spos), "
            "ids AS (SELECT unique_id FROM sidx "
            "  WHERE business_source_key = 'src1' "
            "  OR (business_source_key = 'src2' AND ordering_key = 'k3')), "
            "meta AS (SELECT m.* FROM sidx m JOIN ids USING (unique_id)), "
            "rec AS ("
            "  SELECT m.unique_id, m.ordering_key, b.payload, m.location_key, "
            "    m.location_position "
            "  FROM meta m JOIN sblobs b ON m.location_key = b.location_key "
            "  AND m.location_position = b.position "
            "  UNION ALL "
            "  SELECT m.unique_id, m.ordering_key, b.payload, m.location_key, "
            "    m.location_position "
            "  FROM meta m JOIN sblobs b ON m.location_key = b.location_key "
            "  WHERE m.location_position IS NULL), "
            "ord AS (SELECT *, row_number() OVER (PARTITION BY ordering_key "
            "  ORDER BY location_key, location_position ASC NULLS FIRST, unique_id) "
            "  AS publish_seq FROM rec) "
            "SELECT ordering_key, count(*)::BIGINT AS n_records, "
            "  sum(length(payload))::BIGINT AS n_bytes, "
            "  string_agg(unique_id, ',' ORDER BY publish_seq) AS uid_chain "
            "FROM ord GROUP BY ordering_key ORDER BY ordering_key"
        ),
        # d41: exactly-once accounting under a crashed consumer — publish
        # order is pure SQL (publish_time := event_seq seconds), so the
        # oracle states the whole redelivery matrix: the crashed first
        # batch (first 1000 ids in delivery order) delivered twice,
        # everything else once
        "d41_multi_consumer": P(
            ", pub AS (SELECT payload, "
            "  row_number() OVER (ORDER BY event_seq) - 1 AS ridx FROM messages) "
            "SELECT 'm' || lpad(CAST(ridx AS STRING), 9, '0') AS message_id, "
            "  payload, "
            "  CAST(CASE WHEN ridx < 1000 THEN 2 ELSE 1 END AS BIGINT) AS deliveries "
            "FROM pub ORDER BY message_id"
        ),
        # a158: the streamed incremental-dedup emission rule row for row —
        # batch membership b = -1 for evens (the seeded index) else
        # (doc_id % 6) // 2; a pair lands at new's batch iff old's b is
        # strictly smaller (same-batch odd pairs never emit: the index
        # gains a batch only AFTER its probe)
        "a158_dedup_ingest_stream": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, "
            "  list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]) AS sh "
            "  FROM t), "
            "d AS (SELECT doc_id, sh, CASE WHEN doc_id % 2 = 0 THEN -1 "
            "  ELSE (doc_id % 6) // 2 END AS b FROM s) "
            "SELECT n.doc_id AS new_id, o.doc_id AS old_id, "
            "  round(len(list_intersect(n.sh, o.sh))::DOUBLE / "
            "    (len(n.sh) + len(o.sh) - len(list_intersect(n.sh, o.sh))), 3) AS jaccard, "
            "  CAST(n.b AS BIGINT) AS batch_id "
            "FROM d n JOIN d o ON o.b < n.b "
            "WHERE n.b >= 0 "
            "  AND len(list_intersect(n.sh, o.sh))::DOUBLE / "
            "    (len(n.sh) + len(o.sh) - len(list_intersect(n.sh, o.sh))) >= 0.8 "
            "ORDER BY new_id, old_id"
        ),
        # a159: the streamed-into index must search identically to a60's
        # in-memory add — shared clustered brute-force oracle
        # a159: streamed-into index == one-shot in-memory add (exact at
        # any SF) + the d46 recall-threshold form
        "a159_ann_ingest_stream": (
            _ANN_THRESHOLD_ORACLE.replace(
                "true AS mean_ok", "true AS mean_ok, true AS same_as_batch_add"
            )
        ),
        # d43: exactly-once across checkpoint RESTART — the replayed
        # crashed batches must leave the same index as the batch prologue
        # (same column set as d42; the merge sinks absorb the replays)
        "d43_restart_recovery": P(
            "SELECT unique_id, business_source_key, business_object_key, "
            "  index_source_key, ordering_key, publish_time, ingestion_time, "
            "  indexer_ingestion_time "
            "FROM index_metadata ORDER BY unique_id"
        ),
        # d50: a resident-manifest reader races a compaction; the healed
        # lookup serves the same rows the pre-compaction lookup did
        "d50_compact_under_reader": P(
            "SELECT unique_id, broker_id, location_key FROM index_metadata "
            "WHERE unique_id IN "
            "('b0_m000000008', 'b1_m000000025', 'b2_m000000006') "
            "ORDER BY unique_id"
        ),
        # d51: either serialization order of the two maintenance ops
        # converges to original-minus-victims (d24's anti-join semantics)
        "d51_compact_delete_race": P(
            "SELECT unique_id, broker_id, location_key FROM index_metadata "
            "WHERE unique_id NOT IN "
            "('b0_m000000004', 'b1_m000000025', 'b3_m000000123') "
            "ORDER BY unique_id"
        ),
        # d54: the probes survive the delete untouched; the healed lookup
        # serves the identical rows (d50's shape over the delete path)
        "d54_delete_under_reader": P(
            "SELECT unique_id, broker_id, location_key FROM index_metadata "
            "WHERE unique_id IN "
            "('b0_m000000008', 'b1_m000000021', 'b3_m000000119') "
            "ORDER BY unique_id"
        ),
        # d52: the healed replay serves the identical packaged records —
        # the d9 position-align join restricted to the replay ids
        "d52_resubmit_under_compaction": P(
            "SELECT m.unique_id, m.ordering_key, b.payload "
            "FROM index_metadata m "
            "JOIN blob_records b ON m.location_key = b.location_key "
            "AND m.location_position = b.position "
            "WHERE m.unique_id IN "
            "('b0_m000000008', 'b1_m000000025', 'b2_m000000006') "
            "UNION ALL "
            "SELECT m.unique_id, m.ordering_key, b.payload "
            "FROM index_metadata m "
            "JOIN blob_records b ON m.location_key = b.location_key "
            "WHERE m.location_position IS NULL AND m.unique_id IN "
            "('b0_m000000008', 'b1_m000000025', 'b2_m000000006') "
            "ORDER BY unique_id"
        ),
        # d53: stream-v1 rows (chunks 0-2) surface the evolved column as
        # NULL, the side v2 batch (chunk 3) carries its literal — one
        # mergeSchema scan across the stream's two runs and the evolution
        "d53_stream_schema_evolution": P(
            "SELECT unique_id, business_source_key, business_object_key, "
            "  index_source_key, ordering_key, publish_time, ingestion_time, "
            "  CASE WHEN event_seq % 4 = 3 THEN 2 END AS index_schema_version "
            "FROM pos ORDER BY unique_id"
        ),
        # d49: v1 rows surface the evolved column as NULL, v2 rows carry
        # their literal — one mergeSchema scan over both footer versions
        "d49_schema_evolution": P(
            "SELECT unique_id, business_source_key, business_object_key, "
            "  index_source_key, ordering_key, publish_time, ingestion_time, "
            "  CASE WHEN event_seq % 2 = 1 THEN 2 END AS index_schema_version "
            "FROM pos ORDER BY unique_id"
        ),
        # d48: two OS-process writers through the locked merge — the final
        # table is the exact fixture index whatever the interleaving
        "d48_concurrent_writers": P(
            "SELECT unique_id, business_source_key, business_object_key, "
            "  index_source_key, ordering_key, publish_time, ingestion_time, "
            "  indexer_ingestion_time "
            "FROM index_metadata ORDER BY unique_id"
        ),
        # d47: compaction + incremental manifest replacement + pruned
        # lookup as one composition — the three probed ids through the
        # post-compaction manifest equal the plain index rows
        "d47_compact_manifest_lookup": P(
            "SELECT unique_id, broker_id, location_key FROM index_metadata "
            "WHERE unique_id IN "
            "('b0_m000000004', 'b1_m000000001', 'b3_m000000123') "
            "ORDER BY unique_id"
        ),
        # d44: incremental small-file compaction preserves contents exactly
        # (the incremental-touch claim is pinned by in-code asserts on the
        # base file names; content equality is the hash)
        "d44_incremental_compaction": P(
            "SELECT unique_id, broker_id, location_key FROM index_metadata "
            "ORDER BY unique_id"
        ),
        # d45: the measured eviction-based admission rule, restated in SQL
        # (see _d45_watermark_policy's docstring): batches 0/1 fully
        # admitted (their windows were never evicted when they arrived),
        # batch 2 rows admitted iff their window end outlives
        # max(batch-0 event time) - 45 min; emitted windows are those the
        # final no-data batch's watermark (global max - 45 min) closes
        "d45_watermark_policy": (
            "WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS lo, "
            "  CAST(floor(epoch(max(ts))) AS BIGINT) AS hi FROM events), "
            "t AS (SELECT lo + (hi - lo) * 6 // 10 AS t_lo, "
            "  lo + (hi - lo) * 9 // 10 AS t_hi FROM b), "
            "ev AS (SELECT event_id, event_type, "
            "  CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events), "
            "tagged AS (SELECT ev.*, CASE "
            "  WHEN es <= t_lo AND event_id % 7 != 0 THEN 0 "
            "  WHEN es > t_lo AND es <= t_hi THEN 1 ELSE 2 END AS batch "
            "  FROM ev, t), "
            "wm AS (SELECT max(CASE WHEN batch = 0 THEN es END) - 2700 AS wm1, "
            "  max(es) - 2700 AS wmf FROM tagged), "
            "adm AS (SELECT event_type, (es // 3600) * 3600 AS ws "
            "  FROM tagged, wm "
            "  WHERE batch <= 1 OR (es // 3600) * 3600 + 3600 > wm1) "
            "SELECT ws AS window_start, event_type, count(*)::BIGINT AS n "
            "FROM adm, wm WHERE ws + 3600 <= wmf GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # d46: the recall computation runs Spark-side against the exact
        # brute-force ground truth; the oracle pins the query-key set and
        # the guaranteed threshold outcome (e37b's pattern)
        "d46_ann_recall": (
            "SELECT vec_id, CAST(10 AS INT) AS k, true AS recall_ok, "
            "true AS mean_ok FROM embeddings WHERE vec_id < 20 "
            "ORDER BY vec_id"
        ),
        # d42: the streamed dedup gate's index equals the batch prologue's
        # index_metadata on the non-location columns — first-delivery
        # timestamps included, so a leaked redelivery breaks the hash
        "d42_dedup_gate_stream": P(
            "SELECT unique_id, business_source_key, business_object_key, "
            "  index_source_key, ordering_key, publish_time, ingestion_time, "
            "  indexer_ingestion_time "
            "FROM index_metadata ORDER BY unique_id"
        ),
        # d23: both integrity directions as anti-joins over the derived
        # tables, with the same deterministic fault injection
        "d23_integrity_audit": P(
            ", blobs AS (SELECT * FROM blob_records WHERE position % 97 != 5), "
            "idx AS (SELECT * FROM index_metadata "
            "  WHERE CAST(substr(broker_msg_id, 2) AS BIGINT) % 89 != 3), "
            "dangling AS (SELECT i.unique_id FROM idx i "
            "  LEFT JOIN blobs b ON i.location_key = b.location_key "
            "    AND i.unique_id = b.record_id WHERE b.record_id IS NULL), "
            "orphans AS (SELECT b.record_id FROM blobs b "
            "  LEFT JOIN idx i ON b.record_id = i.unique_id "
            "  WHERE i.unique_id IS NULL) "
            "SELECT 'index_rows' AS check, count(*)::BIGINT AS n FROM idx "
            "UNION ALL SELECT 'blob_records', count(*)::BIGINT FROM blobs "
            "UNION ALL SELECT 'dangling_index', count(*)::BIGINT FROM dangling "
            "UNION ALL SELECT 'orphan_blobs', count(*)::BIGINT FROM orphans "
            "ORDER BY \"check\""
        ),
        "d14_window_topk": P(
            "SELECT broker_id, unique_id FROM ("
            "SELECT broker_id, unique_id, row_number() OVER ("
            "PARTITION BY broker_id ORDER BY publish_time, unique_id) AS rn "
            "FROM index_metadata WHERE publish_time IS NOT NULL) t "
            "WHERE rn <= 5 ORDER BY broker_id, unique_id"
        ),
        "d15_orders_agg": (
            "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"
        ),
        "d16_customer_nation_join": (
            "SELECT n_name, count(*) AS c FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1"
        ),
        "a1_dedup_exact": (
            "SELECT md5(text) AS digest, min(doc_id) AS keeper_id, count(*) AS group_size "
            "FROM documents GROUP BY md5(text) ORDER BY keeper_id"
        ),
        "a2_ngram_jaccard_pairs": _JACCARD_ORACLE,
        # MinHash-LSH is exact-verified; at the fixture's J≈0.99 pair structure
        # banded recall is ~1-1e-18, so it shares the exact-Jaccard oracle.
        "a3_minhash_lsh_pairs": _JACCARD_ORACLE,
        "a5_embedding_topk": (
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
            "q AS (SELECT vec_id AS qid, emb AS qv FROM v WHERE vec_id < 10), "
            "s AS (SELECT q.qid AS query_id, v.vec_id, "
            "  round(list_dot_product(q.qv, v.emb) / "
            "    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cos "
            "  FROM q CROSS JOIN v WHERE v.vec_id <> q.qid) "
            "SELECT query_id, vec_id, cos, rank FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM s) "
            "WHERE rank <= 5 ORDER BY query_id, rank"
        ),
        "a8_text_stats": _TEXT_STATS_ORACLE,
        "a9_langid_profile": (
            "WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS dtoks "
            "  FROM documents) "
            "SELECT lang, CASE "
            "  WHEN len(list_intersect(dtoks, ['le','la','et','les'])) >= 2 THEN 'fr' "
            "  WHEN len(list_intersect(dtoks, ['der','die','und','das'])) >= 2 THEN 'de' "
            "  WHEN len(list_intersect(dtoks, ['el','los','las','una'])) >= 2 THEN 'es' "
            "  WHEN len(list_intersect(dtoks, ['the','and','of','to'])) >= 2 THEN 'en' "
            "  ELSE 'und' END AS detected_lang, count(*) AS n "
            "FROM t GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # r3: the whole ANN/semantic family is oracle-checked.  Each op's
        # candidate stage provably (simhash banding) or verifiedly (topk
        # supersets at both check sfs) covers the exact answer, and the
        # final stage is an exact re-rank/verify — so the brute-force SQL
        # twin reproduces the output row-for-row.
        "a4_simhash_pairs": (
            # brute-force Hamming filter == the banded plan's result because
            # max_distance(8) < n_bands(10): banding misses only pairs with
            # >= n_bands differing bits (same argument as a19, different
            # band geometry)
            "WITH toks AS ("
            "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
            "), bits AS ("
            "  SELECT doc_id, i, "
            "    CASE WHEN substr(lpad(bin(CAST(CONCAT('0x', substr(md5(tok),1,15)) AS BIGINT)), 60, '0'), i, 1) = '1' "
            "         THEN 1 ELSE -1 END AS vote "
            "  FROM toks, range(1, 61) t(i)"
            "), votes AS ("
            "  SELECT doc_id, i, sum(vote) AS v FROM bits GROUP BY 1, 2"
            "), sh AS ("
            "  SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS b "
            "  FROM votes GROUP BY 1) "
            "SELECT x.doc_id AS a, y.doc_id AS b, hamming(x.b, y.b) AS distance "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE hamming(x.b, y.b) <= 8 ORDER BY 1, 2"
        ),
        # a6 searches the raw fixture with a candidate set verified to
        # cover the true top-5 -> it shares a5's brute-force oracle
        "a6_lsh_topk": _BRUTE_TOPK_ORACLE,
        # a34/a32/a55/a60: d46 threshold form at every SF (r12 VERDICT
        # #3) — recall computed Spark-side vs brute force, oracle pins
        # query keys + result shape + guaranteed threshold booleans
        "a34_opq_topk": _ANN_THRESHOLD_ORACLE,
        # a7/a25 search the clustered corpus (label-axis +10.0, the
        # _cl_embs construction) -> brute force over the same derivation
        "a7_ivf_topk": _CLUSTERED_TOPK_ORACLE,
        "a25_pq_topk": _CLUSTERED_TOPK_ORACLE,
        "a32_ivfpq_topk": _ANN_THRESHOLD_ORACLE,
        # a55 = a32 through a saved+loaded index: threshold form + the
        # exact saved==in-memory identity boolean
        "a55_ivfpq_persist": (
            _ANN_THRESHOLD_ORACLE.replace(
                "true AS mean_ok", "true AS mean_ok, true AS same_as_mem"
            )
        ),
        "a69_filtered_ann": _FILTERED_TOPK_ORACLE,
        # a79: recursive-CC components + singleton fill, then size-of-sizes
        "a79_cluster_size_dist": cluster_size_oracle,
        "a80_token_spectrum": (
            "WITH f AS (SELECT t, count(*) AS f FROM "
            "  (SELECT unnest(string_split(text, ' ')) AS t FROM documents) GROUP BY t) "
            "SELECT f, count(*) AS n_tokens FROM f GROUP BY f ORDER BY f LIMIT 40"
        ),
        "a78_eval_overlap_severity": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, CASE WHEN len(toks) >= 5 THEN "
            "  list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]) "
            "  ELSE [] END AS grams FROM t), "
            "e AS (SELECT doc_id, unnest(grams) AS g FROM s WHERE doc_id % 7 = 0), "
            "c AS (SELECT DISTINCT g FROM "
            "  (SELECT unnest(grams) AS g FROM s WHERE doc_id % 7 != 0)), "
            "m AS (SELECT e.doc_id, count(*) AS n_matched FROM e JOIN c USING (g) GROUP BY 1), "
            "tot AS (SELECT doc_id, count(*) AS n_grams FROM e GROUP BY 1) "
            "SELECT tot.doc_id AS eval_id, tot.n_grams, "
            "  coalesce(m.n_matched, 0)::BIGINT AS n_matched, "
            "  round(coalesce(m.n_matched, 0)::DOUBLE / tot.n_grams, 4) AS severity "
            "FROM tot LEFT JOIN m ON tot.doc_id = m.doc_id ORDER BY eval_id"
        ),
        "a76_blocklist_filter": (
            "SELECT doc_id, "
            "  len(list_filter(string_split(text, ' '), "
            "    x -> list_contains(['error','null','undefined','lorem'], lower(x))))::BIGINT "
            "    AS n_blocked, "
            "  len(list_filter(string_split(text, ' '), "
            "    x -> list_contains(['error','null','undefined','lorem'], lower(x)))) = 0 "
            "    AS keep "
            "FROM documents ORDER BY doc_id"
        ),
        # a77: same md5 60-bit hash-unit as a28/a39; score as in a75/a8
        "a77_soft_quality_sample": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "r AS (SELECT doc_id, "
            "  round(((CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
            "    + least(len(list_distinct(toks))::DOUBLE / len(toks) * 2, 1.0) "
            "    + least(len(list_filter(toks, x -> list_contains("
            "        ['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
            "      / len(toks) * 10, 1.0)) / 3, 4) AS score, "
            "  CAST(CONCAT('0x', substr(md5('7_' || doc_id), 1, 15)) AS BIGINT) "
            "    / 1152921504606846976.0 AS u FROM t) "
            "SELECT doc_id, score FROM r WHERE u < score ORDER BY doc_id"
        ),
        "a75_quality_calibration": (
            "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, text, toks, "
            "  CASE WHEN len(toks) >= 2 THEN "
            "    [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] "
            "    ELSE [] END AS g2, "
            "  CASE WHEN len(toks) >= 3 THEN "
            "    [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)] "
            "    ELSE [] END AS g3 FROM t), "
            "r AS (SELECT doc_id, "
            "  len(toks) BETWEEN 20 AND 2000 "
            "  AND (list_sum([length(x) FOR x IN toks])::DOUBLE / len(toks)) "
            "    BETWEEN 3.0 AND 10.0 "
            "  AND (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE "
            "    / length(text) <= 0.1 "
            "  AND len(list_intersect(list_distinct(toks), "
            "    ['the','a','and','of','to','in','is','on'])) >= 2 "
            "  AND (CASE WHEN len(g2) > 0 THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2) "
            "    ELSE 0.0 END) <= 0.1 "
            "  AND (CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3) "
            "    ELSE 0.0 END) <= 0.05 AS keep, "
            "  round(((CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
            "    + least(len(list_distinct(toks))::DOUBLE / len(toks) * 2, 1.0) "
            "    + least(len(list_filter(toks, x -> list_contains("
            "        ['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
            "      / len(toks) * 10, 1.0)) / 3, 4) AS score "
            "FROM g), "
            "d AS (SELECT doc_id, score, keep, "
            "  CAST(ntile(10) OVER (ORDER BY score, doc_id) AS INT) AS decile FROM r) "
            "SELECT decile, count(*) AS n_docs, round(avg(score), 4) AS avg_score, "
            "  round(avg(CASE WHEN keep THEN 1.0 ELSE 0.0 END), 4) AS keep_rate "
            "FROM d GROUP BY decile ORDER BY decile"
        ),
        "e31_stats_functions": (
            "WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents), "
            "r AS (SELECT lang, len(toks)::DOUBLE AS tc, "
            "  round(((CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
            "    + least(len(list_distinct(toks))::DOUBLE / len(toks) * 2, 1.0) "
            "    + least(len(list_filter(toks, x -> list_contains("
            "        ['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
            "      / len(toks) * 10, 1.0)) / 3, 4) AS qs FROM t) "
            "SELECT lang, count(*) AS n, round(corr(tc, qs), 4) AS corr_tc_qs, "
            "  round(covar_samp(tc, qs), 4) AS covar_tc_qs, "
            "  round(stddev_samp(tc), 4) AS stddev_tc "
            "FROM r GROUP BY lang ORDER BY lang"
        ),
        "e32_anomaly_zscore": (
            "WITH c AS (SELECT event_type, "
            "  (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS hour, "
            "  count(*) AS n FROM events GROUP BY 1, 2), "
            "s AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM c GROUP BY 1), "
            "g AS (SELECT event_type, unnest(generate_series(h0, h1, 3600)) AS hour FROM s), "
            "f AS (SELECT g.event_type, g.hour, coalesce(c.n, 0)::DOUBLE AS n "
            "  FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour), "
            "st AS (SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd FROM f GROUP BY 1) "
            "SELECT f.event_type, f.hour, f.n::BIGINT AS n, "
            "  round((f.n - st.mu) / st.sd, 4) AS z "
            "FROM f JOIN st ON f.event_type = st.event_type "
            "WHERE abs((f.n - st.mu) / st.sd) >= 2 "
            "ORDER BY f.event_type, f.hour"
        ),
        "e30_rank_functions": (
            "SELECT o_orderpriority, o_orderkey, "
            "  round(percent_rank() OVER w, 6) AS pr, "
            "  round(cume_dist() OVER w, 6) AS cd "
            "FROM orders "
            "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) "
            "ORDER BY o_orderpriority, o_orderkey LIMIT 200"
        ),
        "a74_embedding_outliers": (
            "WITH flat AS (SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS v, "
            "  generate_subscripts(embedding, 1) AS i FROM embeddings), "
            "per_dim AS (SELECT label, i, avg(v) AS m FROM flat GROUP BY 1, 2), "
            "d AS (SELECT f.vec_id, f.label, "
            "  round(sqrt(sum((f.v - p.m) * (f.v - p.m))), 4) AS dist "
            "  FROM flat f JOIN per_dim p ON f.label = p.label AND f.i = p.i "
            "  GROUP BY 1, 2) "
            "SELECT vec_id, label, dist FROM d ORDER BY dist DESC, vec_id LIMIT 20"
        ),
        "a71_vocab_overlap": (
            "WITH v AS (SELECT DISTINCT source, t FROM "
            "  (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)), "
            "sz AS (SELECT source, count(*) AS n FROM v GROUP BY 1), "
            "i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS inter "
            "  FROM v a JOIN v b ON a.t = b.t AND a.source < b.source GROUP BY 1, 2) "
            "SELECT sa AS source_a, sb AS source_b, inter, "
            "  round(inter::DOUBLE / (na.n + nb.n - inter), 4) AS vocab_jaccard "
            "FROM i JOIN sz na ON na.source = sa JOIN sz nb ON nb.source = sb "
            "WHERE inter >= 10 ORDER BY source_a, source_b"
        ),
        # a72: filter on the UNROUNDED jaccard at 0.5 (the operator's
        # candidate cut), then count thresholds on the ROUNDED value —
        # Spark's exact order of operations
        "a72_threshold_curve": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            + _posting_pairs_cte()
            + "p AS (SELECT round(" + _PC_JRAW + ", 3) AS j FROM pc "
            "  WHERE " + _PC_JRAW + " >= 0.7), "
            "agg AS (SELECT "
            "  count(CASE WHEN j >= 0.7 THEN 1 END) AS s0, "
            "  count(CASE WHEN j >= 0.75 THEN 1 END) AS s1, "
            "  count(CASE WHEN j >= 0.8 THEN 1 END) AS s2, "
            "  count(CASE WHEN j >= 0.85 THEN 1 END) AS s3, "
            "  count(CASE WHEN j >= 0.9 THEN 1 END) AS s4 FROM p) "
            "SELECT 0.7::DOUBLE AS threshold, s0 AS n_pairs FROM agg "
            "UNION ALL SELECT 0.75::DOUBLE, s1 FROM agg "
            "UNION ALL SELECT 0.8::DOUBLE, s2 FROM agg "
            "UNION ALL SELECT 0.85::DOUBLE, s3 FROM agg "
            "UNION ALL SELECT 0.9::DOUBLE, s4 FROM agg "
            "ORDER BY threshold"
        ),
        # a60 = a32 built on half the corpus + incremental add of the
        # rest; d46 threshold form vs FULL-corpus brute force (a broken
        # add() collapses recall)
        "a60_ivfpq_add": _ANN_THRESHOLD_ORACLE,
        "e29_event_sequences": (
            "SELECT user_id, count(*) AS n_events, "
            "  array_to_string(list(event_type ORDER BY ts, event_id), '>') AS sequence "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "e27_event_funnel": (
            "WITH v AS (SELECT user_id, min(ts) AS t FROM events "
            "  WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "  JOIN v ON e.user_id = v.user_id AND e.ts > v.t "
            "  WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "  JOIN c ON e.user_id = c.user_id AND e.ts > c.t "
            "  WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM v "
            "UNION ALL SELECT 2, 'click', count(*) FROM c "
            "UNION ALL SELECT 3, 'purchase', count(*) FROM p "
            "ORDER BY stage"
        ),
        "e28_cohort_retention": (
            "WITH act AS (SELECT DISTINCT user_id, "
            "  CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w FROM events), "
            "fw AS (SELECT user_id, min(w) AS w0 FROM act GROUP BY user_id), "
            "sz AS (SELECT w0, count(*) AS cohort_size FROM fw GROUP BY w0), "
            "j AS (SELECT a.user_id, f.w0, CAST(a.w - f.w0 AS INT) AS k "
            "  FROM act a JOIN fw f ON a.user_id = f.user_id WHERE a.w - f.w0 <= 3) "
            "SELECT j.w0 AS cohort_week, j.k AS week_offset, "
            "  count(*) AS n_active, s.cohort_size, "
            "  count(*)::DOUBLE / s.cohort_size AS retention "
            "FROM j JOIN sz s ON j.w0 = s.w0 "
            "GROUP BY j.w0, j.k, s.cohort_size "
            "ORDER BY cohort_week, week_offset"
        ),
        "e26_array_agg": (
            "SELECT n_name, "
            "  array_to_string(list(s_name ORDER BY s_name), ',') AS suppliers, "
            "  count(*) AS n_suppliers "
            "FROM nation JOIN supplier ON n_nationkey = s_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "a66_snapshot_diff": (
            "WITH newsnap AS ("
            "  SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN 'edited ' || text "
            "    ELSE text END AS text "
            "  FROM documents WHERE doc_id % 11 != 0 "
            "  UNION ALL "
            "  SELECT 1000000 + i AS doc_id, 'brand new doc ' || i::VARCHAR AS text "
            "  FROM range(0, 5) t(i)) "
            "SELECT coalesce(o.doc_id, n.doc_id) AS id, "
            "  CASE WHEN o.doc_id IS NULL THEN 'added' "
            "       WHEN n.doc_id IS NULL THEN 'removed' "
            "       WHEN md5(o.text) != md5(n.text) THEN 'changed' "
            "       ELSE 'unchanged' END AS status "
            "FROM documents o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id "
            "ORDER BY id"
        ),
        "e25_gap_fill": (
            "WITH c AS (SELECT event_type, "
            "  (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS hour, "
            "  count(*) AS n FROM events GROUP BY 1, 2), "
            "s AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM c GROUP BY 1), "
            "g AS (SELECT event_type, unnest(generate_series(h0, h1, 3600)) AS hour FROM s) "
            "SELECT g.event_type, g.hour, coalesce(c.n, 0)::BIGINT AS n "
            "FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour "
            "ORDER BY g.event_type, g.hour"
        ),
        # a63: weight rounded to 6dp BEFORE the floor in BOTH engines, so a
        # pow() ULP can never flip a per-source target count
        "a63_temperature_sample": (
            "WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1), "
            "w AS (SELECT source, n, pow(n, 0.3) AS ww FROM c), "
            "t AS (SELECT sum(ww) AS tw FROM w), "
            "tg AS (SELECT source, least(CAST(floor(round(ww / tw, 6) * 173 "
            "  + 0.000001) AS BIGINT), n) AS target FROM w, t), "
            "r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source "
            "  ORDER BY md5('7_' || doc_id::VARCHAR), doc_id) AS sample_rank "
            "  FROM documents) "
            "SELECT doc_id, source, sample_rank FROM r JOIN tg USING (source) "
            "WHERE sample_rank <= target ORDER BY doc_id"
        ),
        # a64: the a20 flag set applied as NOT IN — the clean-corpus output
        "a64_decontaminate": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, CASE WHEN len(toks) >= 5 THEN "
            "  list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]) "
            "  ELSE [] END AS grams FROM t), "
            "c AS (SELECT doc_id AS corpus_id, unnest(grams) AS g FROM s WHERE doc_id % 7 != 0), "
            "e AS (SELECT doc_id AS eval_id, unnest(grams) AS g FROM s WHERE doc_id % 7 = 0), "
            "flagged AS (SELECT DISTINCT c.corpus_id FROM c JOIN e USING (g)) "
            "SELECT d.doc_id, d.source, d.n_chars FROM documents d "
            "WHERE d.doc_id % 7 != 0 "
            "  AND d.doc_id NOT IN (SELECT corpus_id FROM flagged) "
            "ORDER BY d.doc_id"
        ),
        "a61_unigram_kl": (
            "WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS t "
            "  FROM documents), "
            "by_src AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2), "
            "corpus AS (SELECT t, sum(c)::BIGINT AS cc FROM by_src GROUP BY 1), "
            "st AS (SELECT source, sum(c)::BIGINT AS n_tokens FROM by_src GROUP BY 1), "
            "ct AS (SELECT sum(cc)::BIGINT AS nn FROM corpus) "
            "SELECT s.source, max(st.n_tokens) AS n_tokens, count(*) AS n_terms, "
            "  round(sum((s.c::DOUBLE / st.n_tokens) "
            "    * ln((s.c::DOUBLE / st.n_tokens) / (c2.cc::DOUBLE / ct.nn))), 6) "
            "    AS kl_vs_corpus "
            "FROM by_src s JOIN corpus c2 USING (t) JOIN st USING (source), ct "
            "GROUP BY s.source ORDER BY s.source"
        ),
        # a62: same flag definitions as a23/a59, folded into the one-row card
        "a62_dataset_card": (
            "WITH t AS (SELECT doc_id, text, source, lang, "
            "  string_split(text, ' ') AS toks, md5(lower(text)) AS fp FROM documents), "
            "g AS (SELECT *, "
            "  CASE WHEN len(toks) >= 2 THEN "
            "    [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] "
            "    ELSE [] END AS g2, "
            "  CASE WHEN len(toks) >= 3 THEN "
            "    [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)] "
            "    ELSE [] END AS g3 FROM t), "
            "r AS (SELECT *, "
            "  len(toks) BETWEEN 20 AND 2000 "
            "  AND (list_sum([length(x) FOR x IN toks])::DOUBLE / len(toks)) "
            "    BETWEEN 3.0 AND 10.0 "
            "  AND (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE "
            "    / length(text) <= 0.1 "
            "  AND len(list_intersect(list_distinct(toks), "
            "    ['the','a','and','of','to','in','is','on'])) >= 2 "
            "  AND (CASE WHEN len(g2) > 0 THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2) "
            "    ELSE 0.0 END) <= 0.1 "
            "  AND (CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3) "
            "    ELSE 0.0 END) <= 0.05 AS keep "
            "FROM g) "
            "SELECT count(*) AS n_docs, count(DISTINCT source) AS n_sources, "
            "  count(DISTINCT lang) AS n_langs, count(DISTINCT fp) AS n_distinct_texts, "
            "  (count(*) - count(DISTINCT fp))::DOUBLE / count(*) AS dup_rate, "
            "  sum(len(toks))::BIGINT AS total_tokens, "
            "  avg(len(toks)) AS avg_tokens, "
            "  count(CASE WHEN keep THEN 1 END)::DOUBLE / count(*) "
            "    AS quality_pass_rate "
            "FROM r"
        ),
        "a33_semdedup": (
            # filter on the UNROUNDED cosine then round for output (matches
            # Spark's order of operations); dup-id offset = max(vec_id)+1
            "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
            "dup AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM base) AS vec_id, "
            "  [x * 1.5 FOR x IN emb] AS emb "
            "  FROM base WHERE vec_id < 25), "
            "v AS (SELECT * FROM base UNION ALL SELECT * FROM dup), "
            "p AS (SELECT a.vec_id AS a, b.vec_id AS b, "
            "  list_dot_product(a.emb, b.emb) / "
            "    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS rawcos "
            "  FROM v a JOIN v b ON a.vec_id < b.vec_id) "
            "SELECT a, b, round(rawcos, 4) AS cos FROM p WHERE rawcos >= 0.95 ORDER BY a, b"
        ),
        "a36_frame_samples": (
            "SELECT 'media-' || doc_id AS media_id, n_frames, 10 AS fps, "
            "  least(ts // 100, n_frames - 1)::INT AS frame_idx, "
            "  ts::INT AS frame_ts_ms, 12 AS height, 16 AS width "
            "FROM (SELECT doc_id, "
            "    greatest(least((doc_id % 10000) // 100, 30), 1)::INT AS n_frames "
            "  FROM documents WHERE doc_id % 3 = 2), "
            "  LATERAL unnest(range(0, greatest(n_frames * 100, 1), 200)) AS t(ts) "
            "ORDER BY media_id, frame_ts_ms"
        ),
        "a35_audio_features": (
            "SELECT 'media-' || doc_id AS media_id, 4000 AS rate, "
            "  greatest(4 * (doc_id % 10000), 1)::BIGINT AS n_samples, "
            "  (greatest(4 * (doc_id % 10000), 1) // 4)::BIGINT AS decoded_ms, "
            "  (44 + 2 * greatest(4 * (doc_id % 10000), 1))::BIGINT AS n_bytes "
            "FROM documents WHERE doc_id % 3 = 1 ORDER BY media_id"
        ),
        "a10_multimodal_features": (
            # the synthesized BMPs have doc_id-determined dims, and the REAL
            # encoder's file size is pure arithmetic (54-byte header + rows
            # padded to 4 bytes) — so the oracle pins the actual encoded
            # bytes without needing a codec in DuckDB
            "SELECT 'media-' || doc_id AS media_id, "
            "  (doc_id % 120 + 8)::INT AS width, "
            "  (doc_id % 90 + 8)::INT AS height, "
            "  (54 + ((3 * (doc_id % 120 + 8) + 3) // 4) * 4 "
            "      * (doc_id % 90 + 8))::BIGINT AS n_bytes "
            "FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id"
        ),
        "d17_message_size": P(
            # strlen = BYTE length in DuckDB, matching Spark octet_length
            # (the reference counts bytes; attribute KEY lengths are ASCII
            # constants either way)
            "SELECT broker_id || '_' || broker_msg_id AS unique_id, "
            "strlen(payload) "
            "+ CASE WHEN business_source_key IS NOT NULL "
            "  THEN 19 + strlen(business_source_key) ELSE 0 END "
            "+ CASE WHEN business_object_key IS NOT NULL "
            "  THEN 19 + strlen(business_object_key) ELSE 0 END "
            "+ CASE WHEN attr_version IS NOT NULL "
            "  THEN 12 + strlen(attr_version) ELSE 0 END "
            "+ 10 + strlen(event_type) AS size_bytes "
            "FROM messages ORDER BY unique_id"
        ),
        "d18_wire_timestamps": P(
            "SELECT broker_id || '_' || broker_msg_id AS unique_id, "
            "strftime(ingestion_time, '%Y-%m-%d %H:%M:%S.%f') AS wire, "
            "TRUE AS roundtrip_ok FROM messages ORDER BY unique_id"
        ),
        "e1_rollup": (
            "SELECT coalesce(o_orderpriority, 'ALL') AS prio, "
            "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n "
            "FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus) "
            "ORDER BY prio, status"
        ),
        "e2_cube": (
            "SELECT coalesce(o_orderpriority, 'ALL') AS prio, "
            "coalesce(o_orderstatus, 'ALL') AS status, round(sum(o_totalprice), 2) AS rev "
            "FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) "
            "ORDER BY prio, status"
        ),
        "e3_set_ops": (
            "SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' "
            "INTERSECT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000 "
            "ORDER BY k"
        ),
        "e4_semi_anti_join": (
            "SELECT c_custkey, TRUE AS has_orders FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
            "UNION ALL "
            "SELECT c_custkey, FALSE AS has_orders FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) "
            "ORDER BY c_custkey"
        ),
        "e5_window_lag_lead_frames": (
            "SELECT event_id, user_id, "
            "round(value - lag(value) OVER w, 2) AS delta, "
            "round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running, "
            "lead(event_type) OVER w AS next_type "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "ORDER BY event_id"
        ),
        "e6_scalar_subquery": (
            "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders "
            "WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders) "
            "ORDER BY o_orderkey"
        ),
        "e7_string_funcs": (
            "SELECT p_partkey, lower(p_brand) AS brand_lc, "
            "substr(p_name, 1, 8) AS name8, length(p_type) AS type_len, "
            "p_brand || '|' || p_type AS bt, "
            "CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' "
            "ELSE 'small' END AS size_class "
            "FROM part ORDER BY p_partkey"
        ),
        "e8_tumbling_window": (
            "SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket, "
            "event_type, count(*) AS n, round(sum(value), 2) AS total "
            "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "e21_interval_join": (
            "SELECT v.event_id AS view_id, b.event_id AS buy_id "
            "FROM events v JOIN events b ON v.user_id = b.user_id "
            "AND v.event_type = 'view' AND b.event_type = 'purchase' "
            "AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 10 MINUTE "
            "ORDER BY 1, 2"
        ),
        "e20_time_range_rolling": (
            "SELECT user_id, event_id, "
            "count(*) OVER w AS n_trailing_1h, "
            "round(sum(value) OVER w, 2) AS sum_trailing_1h "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) "
            "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) "
            "ORDER BY user_id, event_id"
        ),
        "e19_sliding_window": (
            # window starts s: s <= t < s + 1h, s = 0 mod 15min -> exactly the
            # 4 values (floor(t/900) - o) * 900, o in 0..3
            "SELECT (CAST(floor(epoch(ts) / 900) AS BIGINT) - o) * 900 AS window_start, "
            "event_type, count(*) AS n, round(sum(value), 2) AS total "
            "FROM events, range(0, 4) t(o) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # a11: iterative connected components — the DuckDB twin is a
        # recursive-CTE transitive closure over the same exact-Jaccard pairs
        "a11_dedup_clusters": cc_oracle,
        "a26_cc_two_phase": cc_oracle,
        "a44_cluster_reps": reps_oracle,
        "a68_grouped_split": grouped_split_oracle,
        "a45_random_projection": jl_oracle,
        "a47_temperature_mix": (
            "WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), "
            "t AS (SELECT sum(pow(n_docs, 0.3)) AS tw, sum(n_docs)::DOUBLE AS nn FROM c) "
            "SELECT source, n_docs, round(pow(n_docs, 0.3) / tw, 6) AS weight, "
            "round(pow(n_docs, 0.3) / tw * nn / n_docs, 6) AS effective_epochs "
            "FROM c, t ORDER BY source"
        ),
        "a49_ann_recall": _ann_recall_oracle(),
        # a56: the three PageRank iterations unrolled as CTEs (same damping
        # 0.85, uniform init, symmetric graph so no dangling-mass term)
        "a56_pagerank": (
            "WITH p AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS c, "
            "  's' || l_suppkey::VARCHAR AS s "
            "  FROM orders JOIN lineitem ON l_orderkey = o_orderkey), "
            "e AS (SELECT c AS src, s AS dst FROM p "
            "  UNION ALL SELECT s AS src, c AS dst FROM p), "
            "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
            "nn AS (SELECT count(*)::DOUBLE AS n FROM deg), "
            "r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM deg), "
            "r1 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) "
            "  + 0.85 * sum(r.rank / deg.deg) AS rank "
            "  FROM e JOIN deg ON e.src = deg.src JOIN r0 r ON r.node = e.src "
            "  GROUP BY e.dst), "
            "r2 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) "
            "  + 0.85 * sum(r.rank / deg.deg) AS rank "
            "  FROM e JOIN deg ON e.src = deg.src JOIN r1 r ON r.node = e.src "
            "  GROUP BY e.dst), "
            "r3 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) "
            "  + 0.85 * sum(r.rank / deg.deg) AS rank "
            "  FROM e JOIN deg ON e.src = deg.src JOIN r2 r ON r.node = e.src "
            "  GROUP BY e.dst) "
            "SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node"
        ),
        "a57_centroid_drift": (
            "WITH flat AS (SELECT label, unnest(embedding::DOUBLE[]) AS v, "
            "  generate_subscripts(embedding, 1) AS i FROM embeddings), "
            "per_dim AS (SELECT label, i, avg(v) AS m FROM flat GROUP BY 1, 2), "
            "norms AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM per_dim GROUP BY 1), "
            "dots AS (SELECT a.label AS la, b.label AS lb, sum(a.m * b.m) AS dot "
            "  FROM per_dim a JOIN per_dim b ON a.i = b.i AND a.label < b.label "
            "  GROUP BY 1, 2) "
            "SELECT la AS label_a, lb AS label_b, "
            "  round(dot / (na.nrm * nb.nrm), 4) AS cos "
            "FROM dots JOIN norms na ON na.label = la JOIN norms nb ON nb.label = lb "
            "ORDER BY label_a, label_b"
        ),
        "a58_skew_profile": (
            "WITH c AS (SELECT l_partkey AS key, count(*) AS n_rows "
            "  FROM lineitem GROUP BY 1), "
            "s AS (SELECT sum(n_rows)::BIGINT AS total_rows, count(*) AS n_keys, "
            "  avg(n_rows) AS avg_rows, "
            "  max(n_rows)::DOUBLE / sum(n_rows) AS max_share, "
            "  max(n_rows)::DOUBLE / avg(n_rows) AS skew_factor, "
            "  round(quantile_cont(n_rows, 0.5), 4) AS p50_rows, "
            "  round(quantile_cont(n_rows, 0.99), 4) AS p99_rows FROM c) "
            "SELECT key, n_rows, total_rows, n_keys, avg_rows, max_share, "
            "  skew_factor, p50_rows, p99_rows "
            "FROM (SELECT * FROM c ORDER BY n_rows DESC, key LIMIT 10) t, s "
            "ORDER BY n_rows DESC, key"
        ),
        # a59: same flag definitions as the a23 oracle, folded into one
        # aggregate; funnel rows unioned from that single result row
        "a59_quality_funnel": (
            "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, text, toks, "
            "  CASE WHEN len(toks) >= 2 THEN "
            "    [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] "
            "    ELSE [] END AS g2, "
            "  CASE WHEN len(toks) >= 3 THEN "
            "    [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)] "
            "    ELSE [] END AS g3 FROM t), "
            "r AS (SELECT doc_id, "
            "  len(toks) BETWEEN 20 AND 2000 AS flag_words, "
            "  (list_sum([length(x) FOR x IN toks])::DOUBLE / len(toks)) "
            "    BETWEEN 3.0 AND 10.0 AS flag_mean_len, "
            "  (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE "
            "    / length(text) <= 0.1 AS flag_symbols, "
            "  len(list_intersect(list_distinct(toks), "
            "    ['the','a','and','of','to','in','is','on'])) >= 2 AS flag_stopwords, "
            "  (CASE WHEN len(g2) > 0 THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2) "
            "    ELSE 0.0 END) <= 0.1 "
            "  AND (CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3) "
            "    ELSE 0.0 END) <= 0.05 AS flag_repetition "
            "FROM g), "
            "agg AS (SELECT count(*) AS n_total, "
            "  count(CASE WHEN flag_words THEN 1 END) AS s0, "
            "  count(CASE WHEN flag_words AND flag_mean_len THEN 1 END) AS s1, "
            "  count(CASE WHEN flag_words AND flag_mean_len AND flag_symbols "
            "    THEN 1 END) AS s2, "
            "  count(CASE WHEN flag_words AND flag_mean_len AND flag_symbols "
            "    AND flag_stopwords THEN 1 END) AS s3, "
            "  count(CASE WHEN flag_words AND flag_mean_len AND flag_symbols "
            "    AND flag_stopwords AND flag_repetition THEN 1 END) AS s4 FROM r) "
            "SELECT stage, rule, entered, survivors, entered - survivors AS dropped, "
            "  (entered - survivors)::DOUBLE / entered AS drop_rate "
            "FROM ("
            "  SELECT 1 AS stage, 'flag_words' AS rule, n_total AS entered, s0 AS survivors FROM agg "
            "  UNION ALL SELECT 2, 'flag_mean_len', s0, s1 FROM agg "
            "  UNION ALL SELECT 3, 'flag_symbols', s1, s2 FROM agg "
            "  UNION ALL SELECT 4, 'flag_stopwords', s2, s3 FROM agg "
            "  UNION ALL SELECT 5, 'flag_repetition', s3, s4 FROM agg) "
            "ORDER BY stage"
        ),
        "a48_shard_assign": (
            "WITH h AS (SELECT doc_id, md5('7_' || doc_id::VARCHAR) AS hh FROM documents), "
            "s AS (SELECT doc_id, hh, "
            "  (CAST(CONCAT('0x', substr(hh, 1, 15)) AS BIGINT) % 8)::INT AS shard FROM h) "
            "SELECT doc_id, shard, "
            "row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS position "
            "FROM s ORDER BY doc_id"
        ),
        "a46_dup_rate_by_source": (
            "WITH f AS (SELECT doc_id, source, md5(lower(text)) AS fp FROM documents), "
            "r AS (SELECT source, fp, "
            "  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f) "
            "SELECT source, count(*) AS n_docs, "
            "count(CASE WHEN rn > 1 THEN 1 END) AS n_dups, "
            "count(DISTINCT fp) AS n_distinct, "
            "count(CASE WHEN rn > 1 THEN 1 END)::DOUBLE / count(*) AS dup_rate "
            "FROM r GROUP BY source ORDER BY source"
        ),
        "a28_weighted_mix": (
            "WITH c AS (SELECT source, count(*) AS n FROM documents "
            "  WHERE source IN ('src0','src1') GROUP BY source), "
            "w AS (SELECT 'src0' AS source, 2.0/3.0 AS nw "
            "  UNION ALL SELECT 'src1', 1.0/3.0), "
            "mt AS (SELECT min(n / nw) AS t FROM c JOIN w USING (source)), "
            "fr AS (SELECT source, least(nw * t / n, 1.0) AS f "
            "  FROM c JOIN w USING (source), mt) "
            "SELECT d.doc_id, d.source FROM documents d JOIN fr USING (source) "
            "WHERE CAST(CONCAT('0x', substr(md5('7_' || d.doc_id), 1, 15)) AS BIGINT) "
            "  / 1152921504606846976.0 < f "
            "ORDER BY d.doc_id"
        ),
        "a29_pack_sequences": (
            "WITH t AS (SELECT doc_id, "
            "  len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents), "
            "s AS (SELECT doc_id, n_tokens, "
            "  CAST(CAST(CONCAT('0x', substr(md5(doc_id::VARCHAR), 1, 15)) AS BIGINT) "
            "    % 4 AS INT) AS shard FROM t), "
            "c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM s) "
            # ::BIGINT casts: DuckDB promotes the windowed SUM(BIGINT) to
            # HUGEINT, and the driver's hasher formats HUGEINT differently
            # from Spark's BIGINT (r2 VERDICT "What's wrong" #2)
            "SELECT doc_id, n_tokens, shard, "
            "  ((cum - n_tokens) // 1024)::BIGINT AS seq_id, "
            "  ((cum - n_tokens) % 1024)::BIGINT AS seq_offset, "
            "  ((cum - 1) // 1024 - (cum - n_tokens) // 1024 + 1)::BIGINT AS spans "
            "FROM c ORDER BY doc_id"
        ),
        "e22_unpivot": (
            "SELECT metric, count(*) AS n, round(avg(value), 4) AS avg_value, "
            "  round(sum(value), 2) AS sum_value "
            "FROM (UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, "
            "      l_discount, l_tax FROM lineitem) "
            "  ON l_quantity, l_extendedprice, l_discount, l_tax "
            "  INTO NAME metric VALUE value) "
            "GROUP BY metric ORDER BY metric"
        ),
        "e23_ntile": (
            "SELECT c_mktsegment, decile, count(*) AS n, "
            "  round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal "
            "FROM (SELECT c_mktsegment, c_acctbal, ntile(10) OVER ("
            "  PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS decile "
            "  FROM customer) "
            "GROUP BY c_mktsegment, decile ORDER BY c_mktsegment, decile"
        ),
        "a31_quota_sample": (
            "SELECT doc_id, source FROM ("
            "  SELECT doc_id, source, row_number() OVER ("
            "    PARTITION BY source ORDER BY "
            "    CAST(CONCAT('0x', substr(md5('7_' || doc_id), 1, 15)) AS BIGINT) "
            "      / 1152921504606846976.0 ASC, doc_id ASC) AS qrk "
            "  FROM documents) WHERE qrk <= 10 ORDER BY doc_id"
        ),
        "a30_dup_spans": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest([{'pos': i, 'g': array_to_string(toks[i:i+7], ' ')} "
            "    FOR i IN range(1, len(toks) - 6)], recursive := true) "
            "  FROM t WHERE len(toks) >= 8), "
            "dup AS (SELECT g FROM (SELECT g, count(*) AS c FROM g GROUP BY g) WHERE c >= 2), "
            "d AS (SELECT doc_id, pos FROM g JOIN dup USING (g)), "
            "per_doc AS (SELECT doc_id, count(*) AS dup_grams FROM d GROUP BY doc_id), "
            "cov AS (SELECT doc_id, count(*) AS covered_tokens FROM ("
            "  SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS idx FROM d) "
            "  GROUP BY doc_id), "
            "base AS (SELECT doc_id, len(toks) AS n_tokens FROM t) "
            "SELECT base.doc_id, n_tokens, "
            "  coalesce(dup_grams, 0) AS dup_grams, "
            "  coalesce(covered_tokens, 0) AS covered_tokens, "
            "  round(coalesce(covered_tokens, 0) / n_tokens, 4) AS dup_fraction "
            "FROM base LEFT JOIN per_doc USING (doc_id) LEFT JOIN cov USING (doc_id) "
            "ORDER BY base.doc_id"
        ),
        "a27_lm_perplexity": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "tok AS (SELECT doc_id, unnest(toks) AS w FROM t), "
            "uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w), "
            "scal AS (SELECT sum(c) AS n, count(*) AS v FROM uni), "
            "uscore AS (SELECT doc_id, round(avg(-ln(c::DOUBLE / n)), 4) AS uni_nll "
            "  FROM tok JOIN uni USING (w), scal GROUP BY doc_id), "
            "bgr AS (SELECT doc_id, unnest([{'pw': toks[i], 'w': toks[i+1]} "
            "    FOR i IN range(1, len(toks))], recursive := true) "
            "  FROM t WHERE len(toks) >= 2), "
            "bi AS (SELECT pw, w, count(*) AS c2 FROM bgr GROUP BY pw, w), "
            "bscore AS (SELECT doc_id, "
            "  round(avg(-ln((c2 + 1.0) / (c1 + v))), 4) AS bi_nll "
            "  FROM bgr JOIN bi USING (pw, w) "
            "  JOIN (SELECT w AS pw, c AS c1 FROM uni) USING (pw), scal "
            "  GROUP BY doc_id), "
            "base AS (SELECT doc_id, len(toks) AS n_tokens FROM t) "
            "SELECT base.doc_id, n_tokens, uni_nll, bi_nll FROM base "
            "LEFT JOIN uscore USING (doc_id) LEFT JOIN bscore USING (doc_id) "
            "ORDER BY doc_id"
        ),
        "e9_sessionize": (
            "WITH flagged AS ("
            "  SELECT user_id, event_id, ts, "
            "    CAST(floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800 AS INT) AS new_session "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
            "), sess AS ("
            # ::BIGINT: DuckDB windowed SUM promotes to HUGEINT (r2 a29 class)
            "  SELECT user_id, event_id, "
            "    sum(coalesce(new_session, 1)) OVER ("
            "      PARTITION BY user_id ORDER BY ts, event_id "
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id "
            "  FROM flagged)"
            "SELECT user_id, session_id, count(*) AS n_events, "
            "  min(event_id) AS first_event, max(event_id) AS last_event "
            "FROM sess GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "a13_curation_pipeline": (
            "WITH RECURSIVE "
            "t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents), "
            "r AS (SELECT doc_id, source, toks, len(toks) AS token_count, "
            "  len(list_distinct(toks))::DOUBLE / len(toks) AS dtr, "
            "  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
            "    / len(toks) AS swr FROM t), "
            "scored AS (SELECT doc_id, source, toks, token_count, "
            "  round(((CASE WHEN token_count BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
            "    + least(dtr * 2, 1.0) + least(swr * 10, 1.0)) / 3, 4) AS quality_score FROM r), "
            "gated AS (SELECT * FROM scored WHERE quality_score >= 0.6), "
            + _posting_pairs_cte("gated")
            + "pairs AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
            "edges AS (SELECT a AS src, b AS dst FROM pairs "
            "  UNION SELECT b AS src, a AS dst FROM pairs), "
            "reach(src, dst) AS (SELECT src, dst FROM edges "
            "  UNION SELECT r2.src, e.dst FROM reach r2 JOIN edges e ON r2.dst = e.src), "
            "clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
            "  FROM reach GROUP BY src), "
            "losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id), "
            "kept AS (SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM losers)) "
            "SELECT source, count(*) AS n_docs, round(avg(token_count), 4) AS avg_tokens, "
            "  round(avg(quality_score), 4) AS avg_quality "
            "FROM kept GROUP BY 1 ORDER BY 1"
        ),
        "a21_cms_sketch": _CMS_GRID_ORACLE,
        # a67 = per-partition sketches merged by counter addition; CMS
        # linearity makes the whole-corpus grid (a21's oracle) exact
        "a67_cms_merge": _CMS_GRID_ORACLE,
        "a20_contamination": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, CASE WHEN len(toks) >= 5 THEN "
            "  list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]) "
            "  ELSE [] END AS grams FROM t), "
            "c AS (SELECT doc_id AS corpus_id, unnest(grams) AS g FROM s WHERE doc_id % 7 != 0), "
            "e AS (SELECT doc_id AS eval_id, unnest(grams) AS g FROM s WHERE doc_id % 7 = 0) "
            "SELECT c.corpus_id, e.eval_id, count(*) AS shared_ngrams "
            "FROM c JOIN e USING (g) GROUP BY 1, 2 HAVING count(*) >= 1 "
            "ORDER BY 1, 2"
        ),
        "a19_simhash_md5": (
            # brute-force Hamming filter == the banded plan's result because
            # max_distance(5) < n_bands(6): banding misses only pairs with
            # >= n_bands differing bits
            "WITH toks AS ("
            "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
            "), bits AS ("
            "  SELECT doc_id, i, "
            "    CASE WHEN substr(lpad(bin(CAST(CONCAT('0x', substr(md5(tok),1,15)) AS BIGINT)), 60, '0'), i, 1) = '1' "
            "         THEN 1 ELSE -1 END AS vote "
            "  FROM toks, range(1, 61) t(i)"
            "), votes AS ("
            "  SELECT doc_id, i, sum(vote) AS v FROM bits GROUP BY 1, 2"
            "), sh AS ("
            "  SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS b "
            "  FROM votes GROUP BY 1) "
            "SELECT x.doc_id AS a, y.doc_id AS b, hamming(x.b, y.b) AS distance "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE hamming(x.b, y.b) <= 5 ORDER BY 1, 2"
        ),
        "a18_winnowing_pairs": (
            # same algorithm, same md5-derived 60-bit rolling hashes: k-gram
            # hash pass, per-window minima, distinct, posting-list self-join
            "WITH g AS ("
            "  SELECT doc_id, "
            "    [CAST(CONCAT('0x', substr(md5(substr(text, i, 20)), 1, 15)) AS BIGINT) "
            "     FOR i IN range(1, greatest(length(text) - 19, 1) + 1)] AS grams "
            "  FROM documents"
            "), w AS ("
            "  SELECT doc_id, "
            "    list_distinct([list_min(grams[i:i+7]) "
            "      FOR i IN range(1, greatest(len(grams) - 7, 1) + 1)]) AS fps "
            "  FROM g"
            "), e AS (SELECT doc_id, unnest(fps) AS fp FROM w) "
            "SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS shared_fingerprints "
            "FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2"
        ),
        "a17_bpe_tokens": (
            "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "a24_pii_scrub": (
            "WITH aug AS (SELECT doc_id, text "
            "  || CASE WHEN doc_id % 7 = 0 THEN ' reach user' || doc_id::VARCHAR "
            "      || '@example.com' ELSE '' END "
            "  || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567' ELSE '' END "
            "  || CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.0.' "
            "      || (doc_id % 250)::VARCHAR ELSE '' END AS a FROM documents) "
            "SELECT doc_id, "
            "  len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "    AS n_emails, "
            "  len(regexp_extract_all(a, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS n_phones, "
            "  len(regexp_extract_all(a, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ips, "
            "  (len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "   + len(regexp_extract_all(a, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) "
            "   + len(regexp_extract_all(a, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))) > 0 AS has_pii, "
            "  regexp_replace(regexp_replace(regexp_replace(a, "
            "    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), "
            "    '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g'), "
            "    '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g') AS redacted "
            "FROM aug ORDER BY doc_id"
        ),
        "a22_repetition": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, "
            "  CASE WHEN len(toks) >= 2 THEN "
            "    [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] "
            "    ELSE [] END AS g2, "
            "  CASE WHEN len(toks) >= 3 THEN "
            "    [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)] "
            "    ELSE [] END AS g3 FROM t) "
            "SELECT doc_id, "
            "  round(CASE WHEN len(g2) > 0 THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2) "
            "    ELSE 0.0 END, 4) AS dup_2gram, "
            "  round(CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3) "
            "    ELSE 0.0 END, 4) AS dup_3gram "
            "FROM g ORDER BY doc_id"
        ),
        "a23_quality_rules": (
            "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, text, toks, "
            "  CASE WHEN len(toks) >= 2 THEN "
            "    [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] "
            "    ELSE [] END AS g2, "
            "  CASE WHEN len(toks) >= 3 THEN "
            "    [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)] "
            "    ELSE [] END AS g3 FROM t), "
            "r AS (SELECT doc_id, "
            "  len(toks) BETWEEN 20 AND 2000 AS flag_words, "
            "  (list_sum([length(x) FOR x IN toks])::DOUBLE / len(toks)) "
            "    BETWEEN 3.0 AND 10.0 AS flag_mean_len, "
            "  (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE "
            "    / length(text) <= 0.1 AS flag_symbols, "
            "  len(list_intersect(list_distinct(toks), "
            "    ['the','a','and','of','to','in','is','on'])) >= 2 AS flag_stopwords, "
            "  (CASE WHEN len(g2) > 0 THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2) "
            "    ELSE 0.0 END) <= 0.1 "
            "  AND (CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3) "
            "    ELSE 0.0 END) <= 0.05 AS flag_repetition "
            "FROM g) "
            "SELECT doc_id, flag_words, flag_mean_len, flag_symbols, flag_stopwords, "
            "  flag_repetition, "
            "  flag_words AND flag_mean_len AND flag_symbols AND flag_stopwords "
            "    AND flag_repetition AS keep "
            "FROM r ORDER BY doc_id"
        ),
        "a16_label_centroids": (
            "WITH flat AS (SELECT label, vec_id, "
            "  unnest(embedding::DOUBLE[]) AS v, "
            "  generate_subscripts(embedding, 1) AS i FROM embeddings), "
            "per_dim AS (SELECT label, i, avg(v) AS m FROM flat GROUP BY 1, 2), "
            "norms AS (SELECT label, round(sqrt(sum(m * m)), 4) AS centroid_norm "
            "  FROM per_dim GROUP BY 1), "
            "counts AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1) "
            "SELECT n2.label, c.n, n2.centroid_norm FROM norms n2 JOIN counts c USING (label) "
            "ORDER BY n2.label"
        ),
        # incremental LSH probe is exact-verified, so its oracle is the
        # exact-Jaccard pair set restricted to cross-parity pairs
        "a15_incremental_dedup": _INCR_DEDUP_ORACLE,
        # a65 = a15 through a saved+loaded band-partitioned index;
        # identical result contract
        "a65_lsh_persist": _INCR_DEDUP_ORACLE,
        "a14_bm25_topk": (
            "WITH toks AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term "
            "  FROM documents), "
            "dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY id), "
            "postings AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term), "
            "stats AS (SELECT count(*) AS n FROM documents), "
            "ad AS (SELECT avg(dl) AS avgdl FROM dl), "
            "idf AS (SELECT term, ln((s.n - t.df + 0.5) / (t.df + 0.5) + 1) AS idf "
            "  FROM (SELECT term, count(DISTINCT id) AS df FROM toks GROUP BY term) t, stats s), "
            "hits AS (SELECT p.id, i.idf * (p.tf * 2.2) / "
            "    (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / a.avgdl)) AS s "
            "  FROM postings p JOIN idf i USING (term) JOIN dl d USING (id), ad a "
            "  WHERE p.term IN ('spark', 'join', 'filter')), "
            "scored AS (SELECT id, round(sum(s), 4) AS score FROM hits GROUP BY id) "
            "SELECT id, score, rank FROM ("
            "  SELECT *, row_number() OVER (ORDER BY score DESC, id) AS rank FROM scored) "
            "WHERE rank <= 10 ORDER BY rank"
        ),
        # a50: the a14 BM25 ranking (top-20) and the a5-shape exact-cosine
        # ranking for query vec 0 (top-20), fused with the same
        # left-to-right coalesce sum rrf_fuse computes
        "a50_hybrid_rrf": (
            "WITH toks AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term "
            "  FROM documents), "
            "dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY id), "
            "postings AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term), "
            "stats AS (SELECT count(*) AS n FROM documents), "
            "ad AS (SELECT avg(dl) AS avgdl FROM dl), "
            "idf AS (SELECT term, ln((s.n - t.df + 0.5) / (t.df + 0.5) + 1) AS idf "
            "  FROM (SELECT term, count(DISTINCT id) AS df FROM toks GROUP BY term) t, stats s), "
            "hits AS (SELECT p.id, i.idf * (p.tf * 2.2) / "
            "    (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / a.avgdl)) AS s "
            "  FROM postings p JOIN idf i USING (term) JOIN dl d USING (id), ad a "
            "  WHERE p.term IN ('spark', 'join', 'filter')), "
            "scored AS (SELECT id, round(sum(s), 4) AS score FROM hits GROUP BY id), "
            "bm AS (SELECT id, rank FROM (SELECT id, "
            "    row_number() OVER (ORDER BY score DESC, id) AS rank FROM scored) "
            "  WHERE rank <= 20), "
            "v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
            "q AS (SELECT emb AS qv FROM v WHERE vec_id = 0), "
            "ann AS (SELECT vec_id AS id, rank FROM (SELECT v.vec_id, "
            "    row_number() OVER (ORDER BY round(list_dot_product(q.qv, v.emb) / "
            "      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.emb, v.emb))), 4) "
            "      DESC, v.vec_id) AS rank "
            "  FROM v, q WHERE v.vec_id <> 0) WHERE rank <= 20), "
            "f AS (SELECT coalesce(bm.id, ann.id) AS id, "
            "    round(coalesce(1.0 / (60 + bm.rank), 0) + coalesce(1.0 / (60 + ann.rank), 0), 6) AS rrf "
            "  FROM bm FULL JOIN ann ON bm.id = ann.id) "
            "SELECT id, rrf, rank FROM (SELECT *, "
            "  row_number() OVER (ORDER BY rrf DESC, id) AS rank FROM f) "
            "WHERE rank <= 10 ORDER BY rank"
        ),
        "a51_vocab_coverage": (
            "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents), "
            "c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term), "
            "tot AS (SELECT count(*) AS t FROM toks), "
            "head AS (SELECT term, cnt, "
            "  row_number() OVER (ORDER BY cnt DESC, term) AS rank FROM c), "
            "cum AS (SELECT rank, term, cnt, "
            "  sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS cum "
            "  FROM head WHERE rank <= 30) "
            "SELECT rank, term, cnt, cnt::DOUBLE / t AS share, "
            "  cum::DOUBLE / t AS cum_share "
            "FROM cum, tot ORDER BY rank"
        ),
        "a52_split_leakage": _split_leakage_oracle(),
        # a53: duplicated 8-grams -> per-doc gaps-and-islands interval merge
        # (new island when the position gap exceeds the gram length)
        "a53_dup_substrings": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram "
            "  FROM t, unnest(range(1, len(toks) - 6)) AS u(i)), "
            "d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2), "
            "p AS (SELECT doc_id, pos FROM g JOIN d USING (gram)), "
            "i AS (SELECT doc_id, pos, CASE WHEN pos - "
            "    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8 "
            "  THEN 1 ELSE 0 END AS brk FROM p), "
            "isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id "
            "  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM i) "
            "SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end, "
            "  max(pos) + 7 - min(pos) + 1 AS span_len "
            "FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start"
        ),
        # a81: a53's spans applied — tokens inside any span dropped, survivors
        # reassembled in order (anti-join expressed as left-join-IS-NULL; the
        # merged islands are provably disjoint so no row duplication)
        "a81_exactsubstr_clean": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram "
            "  FROM t, unnest(range(1, len(toks) - 6)) AS u(i)), "
            "d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2), "
            "p AS (SELECT doc_id, pos FROM g JOIN d USING (gram)), "
            "i AS (SELECT doc_id, pos, CASE WHEN pos - "
            "    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8 "
            "  THEN 1 ELSE 0 END AS brk FROM p), "
            "isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id "
            "  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM i), "
            "sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e "
            "  FROM isl GROUP BY doc_id, grp), "
            "tok AS (SELECT doc_id, i AS pos, toks[i] AS tok "
            "  FROM t, unnest(range(1, len(toks) + 1)) AS u(i)), "
            "keep AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok "
            "  LEFT JOIN sp ON tok.doc_id = sp.doc_id AND tok.pos BETWEEN sp.s AND sp.e "
            "  WHERE sp.doc_id IS NULL), "
            "agg AS (SELECT doc_id, count(*) AS n_kept, "
            "  string_agg(tok, ' ' ORDER BY pos) AS clean_text "
            "  FROM keep GROUP BY doc_id) "
            "SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens, "
            "  (len(t.toks) - coalesce(agg.n_kept, 0))::BIGINT AS n_removed, "
            "  coalesce(agg.clean_text, '') AS clean_text "
            "FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id ORDER BY t.doc_id"
        ),
        # a82: greedy highest-score-first selection under a 20k token budget;
        # the score expression is the a75 quality heuristic verbatim, the
        # running sum a plain window (Spark side does it two-level)
        "a82_token_budget": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "r AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, "
            "  round(((CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
            "    + least(len(list_distinct(toks))::DOUBLE / len(toks) * 2, 1.0) "
            "    + least(len(list_filter(toks, x -> list_contains("
            "        ['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
            "      / len(toks) * 10, 1.0)) / 3, 4) AS score FROM t), "
            "c AS (SELECT doc_id, score, n_tokens, "
            "  sum(n_tokens) OVER (ORDER BY score DESC, doc_id "
            "    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens FROM r) "
            "SELECT doc_id, score, n_tokens, cum_tokens FROM c "
            "WHERE cum_tokens <= 20000 ORDER BY doc_id"
        ),
        # a83: the a2 pair CTE joined to each endpoint's source, counted by
        # canonical source pair
        "a83_source_dup_matrix": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            + _posting_pairs_cte()
            + "p AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
            "j AS (SELECT da.source AS s_a, db.source AS s_b FROM p "
            "  JOIN documents da ON p.a = da.doc_id "
            "  JOIN documents db ON p.b = db.doc_id) "
            "SELECT least(s_a, s_b) AS source_lo, greatest(s_a, s_b) AS source_hi, "
            "  count(*) AS n_pairs, "
            "  count(*) FILTER (WHERE s_a <> s_b) AS n_cross "
            "FROM j GROUP BY source_lo, source_hi ORDER BY source_lo, source_hi"
        ),
        # a84: gram -> min(doc_id) first-owner table; a doc's novel grams are
        # the ones it owns
        "a84_novelty": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "  [array_to_string(toks[i:i+7], ' ') for i in range(1, len(toks)-6)])) AS g "
            "  FROM t WHERE len(toks) >= 8), "
            "f AS (SELECT g, min(doc_id) AS first_id FROM g GROUP BY g), "
            "pd AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id), "
            "nv AS (SELECT g.doc_id, count(*) AS n_novel FROM g "
            "  JOIN f ON g.g = f.g AND g.doc_id = f.first_id GROUP BY g.doc_id) "
            "SELECT pd.doc_id, pd.n_grams::BIGINT AS n_grams, "
            "  coalesce(nv.n_novel, 0)::BIGINT AS n_novel, "
            "  round(coalesce(nv.n_novel, 0)::DOUBLE / pd.n_grams, 4) AS novelty "
            "FROM pd LEFT JOIN nv ON pd.doc_id = nv.doc_id ORDER BY pd.doc_id"
        ),
        # a85: log2-bucket length histogram; power-of-two boundaries are
        # IEEE-exact in both engines
        "a85_length_histogram": (
            "SELECT source, floor(log2(n_chars))::BIGINT AS bucket, "
            "  (2 ** floor(log2(n_chars)))::BIGINT AS bucket_lo, "
            "  count(*) AS n_docs, min(n_chars) AS min_chars, "
            "  max(n_chars) AS max_chars "
            "FROM documents WHERE n_chars > 0 "
            "GROUP BY source, bucket, bucket_lo ORDER BY source, bucket"
        ),
        # a86: lexical richness per source (one explode + one agg)
        "a86_type_token_stats": (
            "WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS t "
            "  FROM documents) "
            "SELECT source, count(*) AS n_tokens, "
            "  count(DISTINCT t) AS n_types, "
            "  count(DISTINCT t)::DOUBLE / count(*) AS ttr "
            "FROM tk GROUP BY source ORDER BY source"
        ),
        "a87_split_balance": _split_balance_oracle(),
        # a88: distinct 8-grams per doc -> doc/source frequency -> top-20
        # with a total-order tie-break on the gram string
        "a88_dup_gram_report": (
            "WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks "
            "  FROM documents), "
            "g AS (SELECT doc_id, source, unnest(list_distinct("
            "  [array_to_string(toks[i:i+7], ' ') for i in range(1, len(toks)-6)])) AS g "
            "  FROM t WHERE len(toks) >= 8) "
            "SELECT g, count(DISTINCT doc_id) AS n_docs, "
            "  count(DISTINCT source) AS n_sources "
            "FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2 "
            "ORDER BY n_docs DESC, g ASC LIMIT 20"
        ),
        # a89: the a81 span CTEs aggregated per source (spans are disjoint,
        # so removed tokens = sum of span lengths)
        "a89_removal_impact": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram "
            "  FROM t, unnest(range(1, len(toks) - 6)) AS u(i)), "
            "d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2), "
            "p AS (SELECT doc_id, pos FROM g JOIN d USING (gram)), "
            "i AS (SELECT doc_id, pos, CASE WHEN pos - "
            "    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8 "
            "  THEN 1 ELSE 0 END AS brk FROM p), "
            "isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id "
            "  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM i), "
            "sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e "
            "  FROM isl GROUP BY doc_id, grp), "
            "rm AS (SELECT doc_id, sum(e - s + 1) AS removed FROM sp GROUP BY doc_id) "
            "SELECT doc.source, count(*) AS n_docs, "
            "  sum(len(t.toks))::BIGINT AS n_tokens, "
            "  sum(coalesce(rm.removed, 0))::BIGINT AS n_removed, "
            "  count(CASE WHEN coalesce(rm.removed, 0) > 0 THEN 1 END) "
            "    AS n_docs_touched, "
            "  sum(coalesce(rm.removed, 0))::DOUBLE / sum(len(t.toks)) "
            "    AS removed_frac "
            "FROM t JOIN documents doc USING (doc_id) "
            "LEFT JOIN rm ON t.doc_id = rm.doc_id "
            "GROUP BY doc.source ORDER BY doc.source"
        ),
        # a91: the HLL register table rebuilt whole-corpus — equal to the
        # merged per-half sketch by max-associativity; rho via bin() string
        # length, so no float log2 crosses the engine boundary
        "a91_hll_distinct": (
            "WITH terms AS (SELECT unnest(string_split(text, ' ')) AS term "
            "  FROM documents), "
            "h AS (SELECT CAST(CONCAT('0x', substr(md5(term), 1, 15)) AS BIGINT) AS h "
            "  FROM terms), "
            "r AS (SELECT h >> 52 AS register, h & 4503599627370495 AS w FROM h), "
            "rh AS (SELECT register, CASE WHEN w = 0 THEN 53 "
            "  ELSE 52 - length(bin(w)) + 1 END AS rho FROM r) "
            "SELECT register::INT AS register, max(rho)::INT AS max_rho "
            "FROM rh GROUP BY register ORDER BY register"
        ),
        # a92: the SAME md5 hash family rebuilds the Bloom bit set and the
        # probe — flag semantics (all 4 positions set) match row for row
        "a92_bloom_decontaminate": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, CASE WHEN len(toks) >= 5 THEN "
            "  list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]) "
            "  ELSE [] END AS grams FROM t), "
            "g AS (SELECT doc_id, unnest(grams) AS gram FROM s), "
            "rr AS (SELECT unnest([0, 1, 2, 3]) AS r), "
            "bits AS (SELECT DISTINCT "
            "  CAST(CONCAT('0x', substr(md5(concat(r, ':', gram)), 1, 15)) AS BIGINT) % 4096 AS bit "
            "  FROM (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0), rr), "
            "pb AS (SELECT gram, "
            "  CAST(CONCAT('0x', substr(md5(concat(r, ':', gram)), 1, 15)) AS BIGINT) % 4096 AS bit "
            "  FROM (SELECT DISTINCT gram FROM g WHERE doc_id % 7 != 0), rr), "
            "hits AS (SELECT pb.gram, "
            "  count(CASE WHEN b.bit IS NOT NULL THEN 1 END) = 4 AS maybe "
            "  FROM pb LEFT JOIN bits b USING (bit) GROUP BY pb.gram) "
            "SELECT c.doc_id, count(*)::BIGINT AS n_grams, "
            "  count(CASE WHEN h.maybe THEN 1 END)::BIGINT AS n_maybe_hits, "
            "  (count(CASE WHEN h.maybe THEN 1 END)::DOUBLE / count(*)) >= 0.1 AS flagged "
            "FROM g c JOIN hits h USING (gram) WHERE c.doc_id % 7 != 0 "
            "GROUP BY c.doc_id ORDER BY c.doc_id"
        ),
        # a93: directional containment over the same 3-gram shingle sets as
        # a2; filter on the unrounded value, round in the projection
        "a93_containment": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
            "  list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) "
            "  ELSE [] END AS sh FROM t) "
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "  round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh), 3) AS containment "
            "FROM s a JOIN s b ON a.doc_id != b.doc_id "
            "WHERE len(a.sh) > 0 "
            "  AND len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) >= 0.9 "
            "ORDER BY a, b"
        ),
        # a94: the unrolled power-iteration CTE chain (generator above)
        "a94_power_iteration": _power_iteration_oracle(3, 64),
        # e33: SCD-2 change intervals from the event log
        "e33_scd2": (
            "WITH e AS (SELECT * FROM events WHERE user_id % 50 = 0), "
            "o AS (SELECT user_id, event_type, ts, event_id, "
            "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
            "  FROM e), "
            "c AS (SELECT user_id, event_type, ts, event_id FROM o "
            "  WHERE prev_type IS NULL OR event_type != prev_type) "
            "SELECT user_id, event_type, ts AS valid_from, "
            "  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to, "
            "  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)::INT AS version "
            "FROM c ORDER BY user_id, version"
        ),
        # e34: the exact band join the bucketed plan must reproduce
        "e34_band_join": (
            "WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer) "
            "SELECT a.c_custkey, count(b.c_custkey)::BIGINT AS n_close "
            "FROM c a LEFT JOIN c b ON a.c_nationkey = b.c_nationkey "
            "  AND a.c_custkey != b.c_custkey "
            "  AND abs(a.c_acctbal - b.c_acctbal) <= 1.0 "
            "GROUP BY a.c_custkey ORDER BY a.c_custkey"
        ),
        # a90: the a17 token expressions aggregated per source
        "a90_tokenizer_fertility": (
            "SELECT source, "
            "  sum(len(string_split(text, ' ')))::BIGINT AS ws_tokens, "
            "  sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))::BIGINT "
            "    AS bpe_tokens, "
            "  sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))::DOUBLE "
            "    / sum(len(string_split(text, ' '))) AS fertility "
            "FROM documents GROUP BY source ORDER BY source"
        ),
        # a54: per-source gram doc-frequency vs source doc count; boilerplate
        # grams flagged back onto each doc
        "a54_boilerplate": (
            "WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks "
            "  FROM documents), "
            "gr AS (SELECT doc_id, source, unnest(list_distinct("
            "  [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])) AS gram "
            "  FROM t), "
            "sd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), "
            "bo AS (SELECT c.source, c.gram FROM "
            "  (SELECT source, gram, count(*) AS df_ FROM gr GROUP BY source, gram) c "
            "  JOIN sd ON c.source = sd.source "
            "  WHERE sd.n_docs >= 2 AND c.df_::DOUBLE / sd.n_docs >= 0.2), "
            "pd AS (SELECT doc_id, source, count(*) AS n_grams FROM gr "
            "  GROUP BY doc_id, source), "
            "fb AS (SELECT gr.doc_id, count(*) AS n_boiler FROM gr "
            "  JOIN bo ON gr.source = bo.source AND gr.gram = bo.gram "
            "  GROUP BY gr.doc_id) "
            "SELECT pd.doc_id, pd.source, pd.n_grams, "
            "  coalesce(fb.n_boiler, 0) AS n_boiler, "
            "  round(coalesce(fb.n_boiler, 0)::DOUBLE / pd.n_grams, 4) AS boiler_frac "
            "FROM pd LEFT JOIN fb ON pd.doc_id = fb.doc_id ORDER BY pd.doc_id"
        ),
        "e13_grouping_sets": (
            "SELECT coalesce(o_orderpriority, 'ALL') AS prio, "
            "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n "
            "FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) "
            "ORDER BY prio, status"
        ),
        "e14_except": (
            "SELECT c_custkey AS k FROM customer "
            "EXCEPT ALL SELECT DISTINCT user_id AS k FROM events ORDER BY k"
        ),
        "e15_pivot": (
            "SELECT CAST(user_id % 5 AS INT) AS user_bucket, "
            "count(*) FILTER (WHERE event_type = 'click') AS click, "
            "count(*) FILTER (WHERE event_type = 'error') AS error, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS signup, "
            "count(*) FILTER (WHERE event_type = 'view') AS view "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "e16_correlated_exists": (
            "SELECT s_suppkey, s_name FROM supplier s "
            "WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = s.s_nationkey "
            "  AND c.c_acctbal > 9000) "
            "ORDER BY s_suppkey"
        ),
        "e18_null_safe_join": oracle.with_prologue(
            "SELECT coalesce(a.business_source_key, 'NULL') AS key, count(*) AS n "
            "FROM (SELECT * FROM messages WHERE event_seq % 97 = 0) a "
            "JOIN (SELECT * FROM messages WHERE event_seq % 97 = 13) b "
            "  ON a.business_source_key IS NOT DISTINCT FROM b.business_source_key "
            "GROUP BY 1 ORDER BY 1"
        ),
        "e17_term_heavy_hitters": (
            "WITH dterms AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term "
            "  FROM documents) "
            "SELECT term, count(*) AS doc_freq FROM dterms "
            "GROUP BY term ORDER BY doc_freq DESC, term LIMIT 20"
        ),
        "e12_percentiles": (
            "SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50, "
            "round(quantile_cont(value, 0.9), 4) AS p90, "
            "round(quantile_cont(value, 0.99), 4) AS p99, count(*) AS n "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "a12_embedding_pairs": (
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) "
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "round(list_dot_product(a.emb, b.emb) / "
            "  (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cos "
            "FROM v a JOIN v b ON a.vec_id < b.vec_id "
            "WHERE list_dot_product(a.emb, b.emb) / "
            "  (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) >= 0.4 "
            "ORDER BY a, b"
        ),
        "e11_asof_join": (
            "WITH ev AS (SELECT event_id, CAST(user_id % 10 AS INT) AS k, ts FROM events), "
            "ord AS (SELECT CAST(o_custkey % 10 AS INT) AS k, o_orderdate, "
            "  max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2) "
            "SELECT ev.event_id, ev.k, ord.o_orderdate, ord.o_orderkey "
            "FROM ev ASOF LEFT JOIN ord ON ev.k = ord.k AND ev.ts >= ord.o_orderdate "
            "ORDER BY ev.event_id"
        ),
        "e24_asof_tolerance": (
            # asof + post-filter: matches outside tolerance revert to NULL
            # (floor(epoch) both sides == Spark's unix_timestamp seconds)
            "WITH ev AS (SELECT event_id, CAST(user_id % 10 AS INT) AS k, ts FROM events), "
            "ord AS (SELECT CAST(o_custkey % 10 AS INT) AS k, o_orderdate, "
            "  max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2), "
            "j AS (SELECT ev.event_id, ev.k, ev.ts, ord.o_orderdate, ord.o_orderkey "
            "  FROM ev ASOF LEFT JOIN ord ON ev.k = ord.k AND ev.ts >= ord.o_orderdate), "
            "f AS (SELECT *, floor(epoch(ts)) - floor(epoch(o_orderdate)) <= 2592000 AS ok FROM j) "
            "SELECT event_id, k, "
            "  CASE WHEN ok THEN o_orderdate END AS o_orderdate, "
            "  CASE WHEN ok THEN o_orderkey END AS o_orderkey "
            "FROM f ORDER BY event_id"
        ),
        "e10_join_topk": (
            "SELECT o_orderkey, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"
        ),
        "a40_tfidf_topterms": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "tok AS (SELECT doc_id, unnest(toks) AS term FROM t), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), "
            "nd AS (SELECT count(*)::DOUBLE AS n FROM documents), "
            "idf AS (SELECT term, ln(((SELECT n FROM nd) + 1.0) / (count(*) + 1.0)) + 1.0 AS idf "
            "  FROM tf GROUP BY term), "
            "s AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS tfidf "
            "  FROM tf JOIN idf ON tf.term = idf.term), "
            "r AS (SELECT doc_id, term, tfidf, "
            "  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM s) "
            "SELECT doc_id, rank, term, round(tfidf, 4) AS tfidf FROM r "
            "WHERE rank <= 3 ORDER BY doc_id, rank"
        ),
        "a41_source_rollup": (
            "WITH t AS (SELECT source, lang, text, string_split(text, ' ') AS toks FROM documents), "
            "r AS (SELECT source, lang, length(text) AS chars, len(toks) AS tc, "
            # round(...,4) mirrors text.quality_score's per-row rounding
            "  round(((CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
            "   + least(len(list_distinct(toks))::DOUBLE / len(toks) * 2, 1.0) "
            "   + least(len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
            "       / len(toks) * 10, 1.0)) / 3, 4) AS q "
            "  FROM t) "
            "SELECT source, count(*) AS n_docs, round(avg(chars), 4) AS avg_chars, "
            "  round(avg(tc), 4) AS avg_tokens, round(avg(q), 4) AS avg_quality, "
            "  round(avg(CASE WHEN q >= 0.5 THEN 1.0 ELSE 0.0 END), 4) AS pass_fraction, "
            "  count(DISTINCT lang) AS n_langs "
            "FROM r GROUP BY source ORDER BY source"
        ),
        # r7: codes serialized to a comma-joined string (integers format
        # identically in both engines) — the driver harness cannot
        # canonicalize array-typed cells.
        "a42_int8_quantize": (
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
            "s AS (SELECT vec_id, emb, "
            "  greatest(list_max(list_transform(emb, x -> abs(x))), 1e-12) / 127.0 AS scale FROM v) "
            "SELECT vec_id, round(scale, 9) AS scale, "
            "  array_to_string(list_transform(emb, x -> (floor(x / scale + 0.5)::INT)::VARCHAR), ',') "
            "    AS codes_csv, "
            "  round(list_max(list_transform(emb, x -> abs(x - floor(x / scale + 0.5) * scale))), 9) "
            "    AS max_abs_err "
            "FROM s ORDER BY vec_id"
        ),
        "a43_norm_fingerprint": (
            "WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
            "  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm FROM documents) "
            "SELECT doc_id, length(norm) AS norm_len, md5(norm) AS norm_md5 "
            "FROM n ORDER BY doc_id"
        ),
        "a37_chunking": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, toks, len(toks) AS n, "
            "  unnest(range(0, greatest(len(toks), 1), 48)) AS start FROM t) "
            "SELECT doc_id, (start // 48)::INT AS chunk_id, start::INT AS start, "
            "  least(64, n - start)::INT AS chunk_len, "
            "  array_to_string(toks[start + 1:start + 64], ' ') AS chunk_text "
            "FROM s ORDER BY doc_id, chunk_id"
        ),
        "a38_pmi_bigrams": (
            "WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents), "
            "tok AS (SELECT unnest(toks) AS w FROM t), "
            "uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w), "
            "nu AS (SELECT sum(c)::DOUBLE AS n FROM uni), "
            "bg AS (SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]} "
            "    FOR i IN range(1, len(toks))], recursive := true) "
            "  FROM t WHERE len(toks) >= 2), "
            "bi AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY w1, w2), "
            "nb AS (SELECT sum(n_ab)::DOUBLE AS n FROM bi) "
            "SELECT w1, w2, n_ab, "
            "  round(ln((n_ab / nb.n) / ((ca.c / nu.n) * (cb.c / nu.n))), 4) AS pmi "
            "FROM bi JOIN uni ca ON ca.w = bi.w1 JOIN uni cb ON cb.w = bi.w2, nu, nb "
            "WHERE n_ab >= 3 "
            "ORDER BY pmi DESC, w1, w2 LIMIT 50"
        ),
        "a39_split_assign": _split_assign_oracle(),
        # -- round-6 additions ------------------------------------------
        "e35_equidepth_histogram": (
            "WITH r AS (SELECT o_orderkey, o_totalprice, "
            "  CAST(ntile(20) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS bucket "
            "  FROM orders) "
            "SELECT bucket, count(*) AS n, round(min(o_totalprice), 2) AS lo, "
            "  round(max(o_totalprice), 2) AS hi "
            "FROM r GROUP BY bucket ORDER BY bucket"
        ),
        "a95_source_entropy": (
            "WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS t "
            "  FROM documents), "
            "c AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2), "
            "p AS (SELECT source, count(*) AS vocab, sum(c) AS n, "
            "  sum(c * log2(c)) AS s FROM c GROUP BY source) "
            "SELECT source, CAST(vocab AS BIGINT) AS vocab, "
            "  CAST(n AS BIGINT) AS n_tokens, "
            "  round(log2(n) - s / n, 4) AS entropy_bits "
            "FROM p ORDER BY source"
        ),
        "a96_weighted_sample": (
            "WITH t AS (SELECT doc_id, "
            "  len(string_split(text, ' '))::DOUBLE AS w FROM documents), "
            "r AS (SELECT doc_id, w, "
            "  round(ln(CAST(CONCAT('0x', substr(md5('9_' || doc_id), 1, 15)) AS BIGINT) "
            "    / 1152921504606846976.0) / w, 8) AS key FROM t) "
            "SELECT doc_id, CAST(w AS BIGINT) AS n_tokens, key "
            "FROM r ORDER BY key DESC, doc_id ASC LIMIT 100"
        ),
        "a97_sparse_cosine_pairs": (
            "WITH toks AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term "
            "  FROM documents), "
            "tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2), "
            "nn AS (SELECT count(*) AS nd FROM documents), "
            "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "w AS (SELECT id, tf.term, tf * ln((SELECT nd FROM nn)::DOUBLE / df) AS w "
            "  FROM tf JOIN dfq USING (term) WHERE df * 2 <= (SELECT nd FROM nn)), "
            "norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id), "
            "d AS (SELECT a.id AS a, b.id AS b, sum(a.w * b.w) AS dot "
            "  FROM w a JOIN w b ON a.term = b.term AND a.id < b.id GROUP BY 1, 2) "
            "SELECT a, b, round(dot / (na.nrm * nb.nrm), 3) AS cos "
            "FROM d JOIN norms na ON d.a = na.id JOIN norms nb ON d.b = nb.id "
            "WHERE dot / (na.nrm * nb.nrm) >= 0.5 ORDER BY a, b"
        ),
        "d27_table_checksum": P(
            ", dd AS (SELECT broker_id, "
            "  CAST(CONCAT('0x', substr(md5(unique_id || '|' || broker_id || '|' "
            "    || location_key || '|' "
            "    || coalesce(CAST(location_position AS VARCHAR), '')), 1, 15)) "
            "    AS BIGINT) % 1000000007 AS d "
            "  FROM index_metadata) "
            "SELECT broker_id, count(*) AS n_rows, "
            "  CAST(sum(d) AS BIGINT) AS sum_digest, bit_xor(d) AS xor_digest "
            "FROM dd GROUP BY broker_id ORDER BY broker_id"
        ),
        "a105_lang_purity": (
            "WITH t AS (SELECT source, string_split(text, ' ') AS toks "
            "  FROM documents), "
            "d AS (SELECT source, CASE "
            "  WHEN len(list_intersect(list_distinct(toks), ['le','la','et','les'])) >= 2 THEN 'fr' "
            "  WHEN len(list_intersect(list_distinct(toks), ['der','die','und','das'])) >= 2 THEN 'de' "
            "  WHEN len(list_intersect(list_distinct(toks), ['el','los','las','una'])) >= 2 THEN 'es' "
            "  WHEN len(list_intersect(list_distinct(toks), ['the','and','of','to'])) >= 2 THEN 'en' "
            "  ELSE 'und' END AS det FROM t), "
            "c AS (SELECT source, det, count(*) AS c FROM d GROUP BY 1, 2), "
            "r AS (SELECT source, det, c, row_number() OVER (PARTITION BY source "
            "  ORDER BY c DESC, det ASC) AS rn FROM c) "
            "SELECT source, CAST(sum(c) AS BIGINT) AS n_docs, "
            "  count(*) AS n_langs, "
            "  max(CASE WHEN rn = 1 THEN det END) AS majority_lang, "
            "  CAST(max(CASE WHEN rn = 1 THEN c END) AS DOUBLE) / sum(c) AS purity "
            "FROM r GROUP BY source ORDER BY source"
        ),
        "e44_user_mode": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events "
            "  GROUP BY 1, 2), "
            "r AS (SELECT user_id, event_type, c, row_number() OVER "
            "  (PARTITION BY user_id ORDER BY c DESC, event_type ASC) AS rn FROM c) "
            "SELECT user_id, event_type AS modal_type, CAST(c AS BIGINT) AS n_events "
            "FROM r WHERE rn = 1 ORDER BY user_id"
        ),
        "a106_transitivity_gap": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            + _posting_pairs_cte()
            + "p AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
            "adj AS (SELECT a AS h, b AS n FROM p UNION ALL SELECT b, a FROM p), "
            "w AS (SELECT l.h, l.n AS x, r.n AS y FROM adj l JOIN adj r ON l.h = r.h "
            "  WHERE l.n < r.n), "
            "cl AS (SELECT h, count(*) AS n_closed FROM w "
            "  WHERE EXISTS (SELECT 1 FROM p WHERE p.a = w.x AND p.b = w.y) "
            "  GROUP BY h), "
            "tt AS (SELECT h, count(*) AS n_wedges FROM w GROUP BY h) "
            "SELECT tt.h AS doc_id, n_wedges, coalesce(n_closed, 0) AS n_closed, "
            "  round(coalesce(n_closed, 0) / n_wedges::DOUBLE, 4) AS closure_rate "
            "FROM tt LEFT JOIN cl ON tt.h = cl.h ORDER BY doc_id"
        ),
        "a107_sorted_neighborhood": (
            "WITH t AS (SELECT doc_id, substr(text, 1, 20) AS key, "
            "  string_split(text, ' ') AS toks FROM documents), "
            "s AS (SELECT doc_id, key, "
            "  list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]) AS sh "
            "  FROM t), "
            "r AS (SELECT doc_id, key, sh, row_number() OVER (ORDER BY key, doc_id) AS rn "
            "  FROM s), "
            "c AS (SELECT l.doc_id AS da, q.doc_id AS db, l.sh AS sa, q.sh AS sb "
            "  FROM r l JOIN r q ON q.rn > l.rn AND q.rn - l.rn <= 10), "
            "j AS (SELECT least(da, db) AS a, greatest(da, db) AS b, "
            "  len(list_intersect(sa, sb))::DOUBLE / "
            "    (len(sa) + len(sb) - len(list_intersect(sa, sb))) AS jraw FROM c) "
            "SELECT a, b, round(jraw, 3) AS jaccard FROM j WHERE jraw >= 0.5 "
            "ORDER BY a, b"
        ),
        "a108_basket_rules": (
            "WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem), "
            "nb AS (SELECT count(DISTINCT bk) AS n FROM it), "
            "im AS (SELECT item, count(*) AS n_i FROM it GROUP BY item), "
            "pr AS (SELECT x.item AS p1, y.item AS p2, count(*) AS pair_n "
            "  FROM it x JOIN it y ON x.bk = y.bk AND x.item < y.item "
            "  GROUP BY 1, 2 HAVING count(*) >= 3) "
            "SELECT p1, p2, pair_n, "
            "  pair_n / (SELECT n FROM nb)::DOUBLE AS support, "
            "  pair_n / n1::DOUBLE AS conf_1_2, "
            "  pair_n / n2::DOUBLE AS conf_2_1, "
            "  pair_n * (SELECT n FROM nb)::DOUBLE / (n1 * n2) AS lift "
            "FROM pr "
            "JOIN (SELECT item AS p1, n_i AS n1 FROM im) USING (p1) "
            "JOIN (SELECT item AS p2, n_i AS n2 FROM im) USING (p2) "
            "ORDER BY p1, p2"
        ),
        "a109_edit_distance_join": (
            "WITH t AS (SELECT doc_id, substr(text, 1, 40) AS pre, "
            "  string_split(text, ' ')[1] AS tok1, n_chars // 20 AS lb FROM documents) "
            "SELECT a.doc_id AS a, b.doc_id AS b, levenshtein(a.pre, b.pre) AS dist "
            "FROM t a JOIN t b ON a.tok1 = b.tok1 AND abs(a.lb - b.lb) <= 1 "
            "  AND a.doc_id < b.doc_id "
            "WHERE levenshtein(a.pre, b.pre) <= 8 ORDER BY a, b"
        ),
        "e45_markov_transitions": (
            "WITH nx AS (SELECT event_type AS from_type, lead(event_type) OVER "
            "  (PARTITION BY user_id ORDER BY ts, event_id) AS to_type FROM events), "
            "c AS (SELECT from_type, to_type, count(*) AS n FROM nx "
            "  WHERE to_type IS NOT NULL GROUP BY 1, 2), "
            "tt AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1) "
            "SELECT from_type, to_type, n, n::DOUBLE / tot AS p "
            "FROM c JOIN tt USING (from_type) ORDER BY from_type, to_type"
        ),
        "e46_time_weighted_avg": (
            "WITH h AS (SELECT user_id, value, ts, lead(ts) OVER "
            "  (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), "
            "d AS (SELECT user_id, value, date_diff('second', ts, nxt) AS dt "
            "  FROM h WHERE nxt IS NOT NULL) "
            "SELECT user_id, count(*) AS n_intervals, "
            "  CAST(sum(dt) AS BIGINT) AS held_seconds, "
            "  CAST(sum(CAST(value AS DECIMAL(12,6)) * CAST(dt AS DECIMAL(12,0))) "
            "    AS DOUBLE) / sum(dt) AS twa_value, "
            "  CAST(sum(CAST(value AS DECIMAL(12,6))) AS DOUBLE) / count(*) "
            "    AS plain_avg "
            "FROM d GROUP BY user_id ORDER BY user_id"
        ),
        "a110_heaps_curve": (
            "WITH b AS (SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS bucket "
            "  FROM documents), "
            "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, "
            "  unnest(list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])) AS gram "
            "  FROM t), "
            "f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram), "
            "np AS (SELECT b.bucket, count(*) AS new_grams FROM f "
            "  JOIN b ON f.first_doc = b.doc_id GROUP BY 1), "
            "nd AS (SELECT bucket, count(*) AS n_docs FROM b GROUP BY bucket) "
            "SELECT bucket, n_docs, coalesce(new_grams, 0) AS new_grams, "
            "  CAST(sum(coalesce(new_grams, 0)) OVER (ORDER BY bucket "
            "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_grams "
            "FROM nd LEFT JOIN np USING (bucket) ORDER BY bucket"
        ),
        "a111_skipgram_cooccurrence": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "p AS (SELECT doc_id, unnest([{'pos': i, 'w': toks[i]} for i in range(1, len(toks)+1)], recursive := true) FROM t), "
            "pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2, count(*) AS n "
            "  FROM p a JOIN p b ON a.doc_id = b.doc_id "
            "    AND b.pos BETWEEN a.pos + 1 AND a.pos + 3 GROUP BY 1, 2) "
            "SELECT w1, w2, n FROM pr ORDER BY n DESC, w1, w2 LIMIT 30"
        ),
        "a112_term_burstiness": (
            "WITH n AS (SELECT count(*)::DOUBLE AS nn FROM documents), "
            "t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), "
            "tf AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2), "
            "s AS (SELECT w, count(*) AS df, CAST(sum(c) AS BIGINT) AS sc, "
            "  CAST(sum(c * c) AS BIGINT) AS sc2 FROM tf GROUP BY w) "
            "SELECT w AS term, df, sc AS total_n, "
            "  round((sc2 / nn - (sc / nn) * (sc / nn)) / (sc / nn), 4) AS vmr "
            "FROM s, n WHERE df >= 20 ORDER BY vmr DESC, term LIMIT 30"
        ),
        "e47_weekly_churn": (
            "WITH wu AS (SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, "
            "  user_id FROM events), "
            "nxt AS (SELECT week - INTERVAL 7 DAY AS week, user_id FROM wu), "
            "obs AS (SELECT DISTINCT week FROM wu "
            "  WHERE week IN (SELECT week FROM nxt)), "
            "base AS (SELECT * FROM wu WHERE week IN (SELECT week FROM obs)), "
            "a AS (SELECT week, count(*) AS active FROM base GROUP BY week), "
            "r AS (SELECT week, count(*) AS retained FROM base "
            "  WHERE EXISTS (SELECT 1 FROM nxt WHERE nxt.week = base.week "
            "    AND nxt.user_id = base.user_id) GROUP BY week) "
            "SELECT a.week, active, coalesce(retained, 0) AS retained, "
            "  active - coalesce(retained, 0) AS churned, "
            "  round((active - coalesce(retained, 0)) / active::DOUBLE, 4) AS churn_rate "
            "FROM a LEFT JOIN r ON a.week = r.week ORDER BY a.week"
        ),
        "d28_storage_tiering": P(
            ", ba AS (SELECT location_key, max(ingestion_time) AS newest, "
            "  count(*) AS n_msgs FROM index_metadata GROUP BY location_key), "
            "mt AS (SELECT max(ingestion_time) AS mx FROM index_metadata), "
            "bb AS (SELECT location_key, sum(octet_length(encode(payload))) AS n_bytes "
            "  FROM blob_records GROUP BY location_key), "
            "tt AS (SELECT CASE "
            "  WHEN date_diff('day', newest, (SELECT mx FROM mt)) <= 7 THEN '1_hot' "
            "  WHEN date_diff('day', newest, (SELECT mx FROM mt)) <= 21 THEN '2_warm' "
            "  ELSE '3_cold' END AS tier, n_msgs, n_bytes "
            "  FROM ba JOIN bb USING (location_key)) "
            "SELECT tier, count(*) AS n_blobs, CAST(sum(n_msgs) AS BIGINT) AS n_messages, "
            "  CAST(sum(n_bytes) AS BIGINT) AS total_bytes "
            "FROM tt GROUP BY tier ORDER BY tier"
        ),
        "a113_histogram_quantiles": (
            "WITH b AS (SELECT CAST(least(greatest(floor((o_totalprice - 0.0) "
            "  / 500000.0 * 128), 0), 127) AS INT) AS bin FROM orders), "
            "g AS (SELECT bin, count(*) AS n FROM b GROUP BY bin), "
            "c AS (SELECT g.bin, g.n, CAST(sum(g2.n) AS BIGINT) AS cum "
            "  FROM g JOIN g g2 ON g2.bin <= g.bin GROUP BY g.bin, g.n), "
            "c2 AS (SELECT bin, n, cum, cum - n AS cum_prev FROM c), "
            "nn AS (SELECT max(cum) AS N FROM c2), "
            "qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q), "
            "hit AS (SELECT q, q * (SELECT N FROM nn) AS t, bin, n, cum_prev "
            "  FROM qs JOIN c2 ON cum_prev < q * (SELECT N FROM nn) "
            "    AND q * (SELECT N FROM nn) <= cum), "
            "exl AS (SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9, 0.99]) AS l "
            "  FROM orders), "
            "ex AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q, "
            "  unnest(l) AS exact_raw FROM exl) "
            "SELECT hit.q AS q, "
            "  round(0.0 + (bin + (t - cum_prev) / n) * 3906.25, 4) AS est, "
            "  round(exact_raw, 4) AS exact, "
            "  round(round(0.0 + (bin + (t - cum_prev) / n) * 3906.25, 4) "
            "    - exact_raw, 4) AS err "
            "FROM hit JOIN ex ON hit.q = ex.q ORDER BY q"
        ),
        "a114_mutual_information": (
            "WITH n AS (SELECT count(*) AS nt FROM documents), "
            "j AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2), "
            "s AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1), "
            "l AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1) "
            "SELECT source, lang, n, "
            "  log2((n * (SELECT nt FROM n)) / (n_s * n_l)) AS pmi, "
            "  (n / (SELECT nt FROM n)::DOUBLE) "
            "    * log2((n * (SELECT nt FROM n)) / (n_s * n_l)) AS mi_contrib "
            "FROM j JOIN s USING (source) JOIN l USING (lang) "
            "ORDER BY source, lang"
        ),
        "a115_chao1_richness": (
            "WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS toks "
            "  FROM documents), "
            "g AS (SELECT source, doc_id, "
            "  unnest(list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])) AS gram "
            "  FROM t), "
            "i AS (SELECT source, gram, count(*) AS df FROM g GROUP BY 1, 2), "
            "a AS (SELECT source, count(*) AS v, count(*) FILTER (df = 1) AS f1, "
            "  count(*) FILTER (df = 2) AS f2 FROM i GROUP BY source) "
            "SELECT source, v, f1, f2, "
            "  round(v + (f1 * (f1 - 1)) / (2.0 * (f2 + 1)), 2) AS chao1 "
            "FROM a ORDER BY source"
        ),
        "d29_ingest_heatmap": P(
            ", h AS (SELECT isodow(ingestion_time) AS iso_dow, "
            "  hour(ingestion_time) AS hh FROM index_metadata), "
            "nn AS (SELECT count(*) AS nt FROM h) "
            "SELECT iso_dow, hh, count(*) AS n, "
            "  count(*) / (SELECT nt FROM nn)::DOUBLE AS share "
            "FROM h GROUP BY 1, 2 ORDER BY iso_dow, hh"
        ),
        "d30_zorder_layout": (
            "WITH z AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
            f"  {_zorder_sql('l_partkey', 'l_suppkey', 16, 10)} AS z "
            "  FROM lineitem), "
            "b AS (SELECT *, ntile(32) OVER (ORDER BY z, l_orderkey, l_linenumber) "
            "  AS bucket FROM z) "
            "SELECT bucket, count(*) AS n, "
            "  min(l_partkey) AS min_part, max(l_partkey) AS max_part, "
            "  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp "
            "FROM b GROUP BY bucket ORDER BY bucket"
        ),
        "e48_longest_streak": (
            "WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), "
            "r AS (SELECT user_id, day, row_number() OVER (PARTITION BY user_id "
            "  ORDER BY day) AS rn FROM du), "
            "g AS (SELECT user_id, day - CAST(rn AS INT) AS grp FROM r), "
            "runs AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2) "
            "SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks, "
            "  CAST(sum(len) AS BIGINT) AS active_days "
            "FROM runs GROUP BY user_id ORDER BY user_id"
        ),
        "a116_bpe_merge_pairs": (
            "WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), "
            "p AS (SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair "
            "  FROM t) "
            "SELECT pair, count(*) AS n FROM p GROUP BY pair "
            "ORDER BY n DESC, pair LIMIT 30"
        ),
        "e49_mom_growth": (
            "WITH rev AS (SELECT n_name AS nation, "
            "  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, "
            "  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
            "  FROM orders JOIN customer ON o_custkey = c_custkey "
            "  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2) "
            "SELECT nation, month, revenue, "
            "  (revenue - lag(revenue) OVER (PARTITION BY nation ORDER BY month)) "
            "    / lag(revenue) OVER (PARTITION BY nation ORDER BY month) AS mom_growth "
            "FROM rev ORDER BY nation, month"
        ),
        # a117: the full KMV pipeline replicated — same 60-bit md5 hash
        # domain, same two-level == one-level bottom-k equivalence (the
        # oracle uses the direct one-level form), same (k-1)/theta
        # estimator with the unsaturated-sketch exact branch
        "a117_kmv_intersection": (
            "WITH toks AS (SELECT source AS g, "
            "    CAST(CONCAT('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h "
            "  FROM (SELECT source, unnest(string_split(text, ' ')) AS w "
            "        FROM documents WHERE source IN ('src0','src1','src2','src3')) "
            "  GROUP BY 1, 2), "
            "sk AS (SELECT g, h FROM (SELECT g, h, "
            "    row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM toks) "
            "  WHERE rn <= 64), "
            "est AS (SELECT g, CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE) "
            "    ELSE 63.0 / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0) END AS e "
            "  FROM sk GROUP BY g), "
            "pairs AS (SELECT ga.g AS a, gb.g AS b "
            "  FROM (SELECT DISTINCT g FROM sk) ga "
            "  JOIN (SELECT DISTINCT g FROM sk) gb ON ga.g < gb.g), "
            "merged AS (SELECT DISTINCT p.a, p.b, s.h "
            "  FROM pairs p JOIN sk s ON s.g = p.a OR s.g = p.b), "
            "usk AS (SELECT a, b, h FROM (SELECT a, b, h, "
            "    row_number() OVER (PARTITION BY a, b ORDER BY h) AS rn FROM merged) "
            "  WHERE rn <= 64), "
            "per AS (SELECT u.a, u.b, count(*) AS nu, max(u.h) AS hku, "
            "    sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL "
            "        THEN 1 ELSE 0 END) AS m "
            "  FROM usk u "
            "  LEFT JOIN sk sa ON sa.g = u.a AND sa.h = u.h "
            "  LEFT JOIN sk sb ON sb.g = u.b AND sb.h = u.h "
            "  GROUP BY u.a, u.b) "
            "SELECT p.a, p.b, round(ea.e, 4) AS est_a, round(eb.e, 4) AS est_b, "
            "  round(CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE) "
            "    ELSE 63.0 / (CAST(hku AS DOUBLE) / 1152921504606846976.0) END, 4) "
            "    AS est_union, "
            "  round(CAST(m AS DOUBLE) / CAST(nu AS DOUBLE), 4) AS est_jaccard, "
            "  round((CAST(m AS DOUBLE) / CAST(nu AS DOUBLE)) * "
            "    CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE) "
            "    ELSE 63.0 / (CAST(hku AS DOUBLE) / 1152921504606846976.0) END, 4) "
            "    AS est_intersection "
            "FROM per p JOIN est ea ON ea.g = p.a JOIN est eb ON eb.g = p.b "
            "ORDER BY a, b"
        ),
        # a118: a14's BM25 CTE chain widened to top-50, then the exact
        # TF-IDF cosine rerank over candidates only
        "a118_two_stage_rerank": (
            "WITH toks AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term "
            "  FROM documents), "
            "dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY id), "
            "postings AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term), "
            "stats AS (SELECT count(*) AS n FROM documents), "
            "ad AS (SELECT avg(dl) AS avgdl FROM dl), "
            "idf AS (SELECT term, ln((s.n - t.df + 0.5) / (t.df + 0.5) + 1) AS idf "
            "  FROM (SELECT term, count(DISTINCT id) AS df FROM toks GROUP BY term) t, stats s), "
            "hits AS (SELECT p.id, i.idf * (p.tf * 2.2) / "
            "    (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / a.avgdl)) AS s "
            "  FROM postings p JOIN idf i USING (term) JOIN dl d USING (id), ad a "
            "  WHERE p.term IN ('spark', 'join', 'filter')), "
            "scored AS (SELECT id, round(sum(s), 4) AS score FROM hits GROUP BY id), "
            "cands AS (SELECT id, score AS bm25 FROM (SELECT id, score, "
            "    row_number() OVER (ORDER BY score DESC, id) AS rk FROM scored) "
            "  WHERE rk <= 50), "
            "dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term), "
            "w AS (SELECT p.id, p.term, p.tf * ln(s.n * 1.0 / f.df) AS w "
            "  FROM postings p JOIN dfreq f USING (term), stats s), "
            "cw AS (SELECT w.* FROM w JOIN cands USING (id)), "
            "norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM cw GROUP BY id), "
            "qw AS (SELECT term, ln(s.n * 1.0 / f.df) AS qw FROM dfreq f, stats s "
            "  WHERE term IN ('spark', 'join', 'filter')), "
            "qn AS (SELECT sqrt(sum(qw * qw)) AS qn FROM qw), "
            "dots AS (SELECT id, sum(w * qw) AS dot FROM cw JOIN qw USING (term) "
            "  GROUP BY id), "
            "rer AS (SELECT c.id, c.bm25, round(d.dot / (nm.nrm * q.qn), 4) AS cosine "
            "  FROM cands c JOIN dots d USING (id) JOIN norms nm USING (id), qn q) "
            "SELECT id, bm25, cosine, rank FROM (SELECT *, "
            "  row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM rer) "
            "WHERE rank <= 10 ORDER BY rank"
        ),
        # e50: same contribution-form fan-out (range 0..13), same
        # round-6-then-weight discipline
        "e50_ewma_smoothing": (
            "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
            "    round(avg(value), 6) AS v FROM events GROUP BY 1, 2), "
            "contrib AS (SELECT event_type, day + CAST(k AS INT) AS day, "
            "    v * pow(0.8, k) AS wv, pow(0.8, k) AS wt "
            "  FROM daily, range(0, 14) r(k)), "
            "sm AS (SELECT event_type, day, sum(wv) AS swv, sum(wt) AS swt "
            "  FROM contrib GROUP BY 1, 2) "
            "SELECT d.event_type, d.day, d.v, round(sm.swv / sm.swt, 4) AS ewma "
            "FROM daily d JOIN sm ON sm.event_type = d.event_type AND sm.day = d.day "
            "ORDER BY d.event_type, d.day"
        ),
        # a119: same integer boundary rule 10*(cum-c) < 9*total
        "a119_nucleus_vocab": (
            "WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w "
            "  FROM documents), "
            "cnt AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2), "
            "r AS (SELECT source, c, "
            "    sum(c) OVER (PARTITION BY source ORDER BY c DESC, w "
            "      ROWS UNBOUNDED PRECEDING) AS cum, "
            "    sum(c) OVER (PARTITION BY source) AS total, "
            "    count(*) OVER (PARTITION BY source) AS vocab_size "
            "  FROM cnt) "
            "SELECT source, max(vocab_size) AS vocab_size, "
            "  count(*) AS nucleus_size, "
            "  CAST(sum(c) AS DOUBLE) / max(total) AS nucleus_share "
            "FROM r WHERE (cum - c) * 10 < total * 9 "
            "GROUP BY source ORDER BY source"
        ),
        # a120: CDF match with the same cross-multiplied integer compare
        "a120_quantile_normalize": (
            "WITH src AS (SELECT source, n_chars AS v, count(*) AS c "
            "  FROM documents GROUP BY 1, 2), "
            "sc AS (SELECT source, v, c, "
            "    sum(c) OVER (PARTITION BY source ORDER BY v "
            "      ROWS UNBOUNDED PRECEDING) AS cum_s, "
            "    sum(c) OVER (PARTITION BY source) AS n_s "
            "  FROM src), "
            "g AS (SELECT n_chars AS gv, count(*) AS gc FROM documents GROUP BY 1), "
            "gc AS (SELECT gv, sum(gc) OVER (ORDER BY gv ROWS UNBOUNDED PRECEDING) "
            "    AS cum_g FROM g), "
            "ng AS (SELECT count(*) AS n FROM documents) "
            "SELECT sc.source, sc.v, sc.c, "
            "  CAST(sc.cum_s AS DOUBLE) / sc.n_s AS cdf, "
            "  min(gc.gv) AS v_norm "
            "FROM sc JOIN gc ON gc.cum_g * sc.n_s >= sc.cum_s * (SELECT n FROM ng) "
            "GROUP BY sc.source, sc.v, sc.c, sc.cum_s, sc.n_s "
            "ORDER BY source, v"
        ),
        # a121: identical blocking + weighted-agreement score
        "a121_entity_resolution": (
            "WITH p AS (SELECT a.c_nationkey AS nk, a.c_mktsegment AS seg, "
            "    a.c_custkey AS a, b.c_custkey AS b, "
            "    round(0.7 * (1.0 - levenshtein(a.c_name, b.c_name) / "
            "      CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE)) "
            "      + 0.3 * (1.0 - least(abs(a.c_acctbal - b.c_acctbal) / 10000.0, "
            "        1.0)), 4) AS score "
            "  FROM customer a JOIN customer b "
            "    ON a.c_nationkey = b.c_nationkey "
            "    AND a.c_mktsegment = b.c_mktsegment "
            "    AND a.c_custkey < b.c_custkey) "
            "SELECT rank, nk, seg, a, b, score FROM (SELECT *, "
            "  row_number() OVER (ORDER BY score DESC, a, b) AS rank FROM p) "
            "WHERE rank <= 50 ORDER BY rank"
        ),
        # a122: identical sufficient-statistic sums and normal-equation
        # expressions — doubles derived from the same exact integers
        "a122_ols_sufficient_stats": _OLS_ORACLE,
        # a134: the applyInPandas twin computes the SAME closed form
        "a134_ols_pandas": _OLS_ORACLE,
        # d31: same FFD prefix-sum binning in exact integers
        "d31_compaction_plan": P(
            ", per AS (SELECT location_key, "
            "    sum(octet_length(encode(payload))) AS bytes FROM blob_records "
            "  GROUP BY location_key), "
            "d AS (SELECT regexp_replace(location_key, '/[^/]*$', '') AS dir, "
            "    location_key, bytes FROM per), "
            "c AS (SELECT dir, bytes, "
            "    floor((sum(bytes) OVER (PARTITION BY dir ORDER BY bytes DESC, "
            "      location_key ROWS UNBOUNDED PRECEDING) - bytes) / 8192.0) AS bin "
            "  FROM d) "
            "SELECT dir, CAST(bin AS BIGINT) AS bin, count(*) AS n_files, "
            "  CAST(sum(bytes) AS BIGINT) AS bin_bytes "
            "FROM c GROUP BY dir, bin ORDER BY dir, bin"
        ),
        # e51: the map pipeline stated relationally — counts, bucket
        # totals, the same integer 10%-share filter
        "e51_map_functions": (
            "WITH per AS (SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket, "
            "    event_type, count(*) AS n FROM events GROUP BY 1, 2), "
            "tot AS (SELECT user_bucket, count(*) AS n_types, "
            "    CAST(sum(n) AS BIGINT) AS total FROM per GROUP BY user_bucket) "
            "SELECT p.user_bucket, t.n_types, t.total, p.event_type, p.n "
            "FROM per p JOIN tot t USING (user_bucket) "
            "WHERE p.n * 10 >= t.total "
            "ORDER BY user_bucket, event_type"
        ),
        # a123: identical 16-member ±1 sign family from the shared 60-bit
        # md5 hash's parity
        "a123_ams_f2": (
            "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), "
            "signs AS (SELECT r, CAST((CAST(CONCAT('0x', substr(md5('ams' || r || ':' || w), 1, 15)) "
            "    AS BIGINT) % 2) * 2 - 1 AS BIGINT) AS s "
            "  FROM toks, range(0, 16) rr(r)), "
            "z AS (SELECT r, sum(s) AS z FROM signs GROUP BY r), "
            "est AS (SELECT avg(CAST(z AS DOUBLE) * z) AS f2_est, "
            "    count(*) AS n_estimators FROM z), "
            "ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM "
            "  (SELECT count(*) AS c FROM toks GROUP BY w)) "
            "SELECT n_estimators, f2_exact, f2_est, "
            "  f2_est / f2_exact AS ratio FROM est, ex"
        ),
        # a124: the dHash recomputed analytically from the procedural
        # pixel formula (x*7+did, y*13+did*3, x+y+did*5 mod 256) — the
        # closed-form twin of the real BMP decode
        "a124_image_dhash_pairs": (
            "WITH imgs AS (SELECT doc_id AS did, doc_id % 120 + 8 AS w, "
            "    doc_id % 90 + 8 AS h FROM documents WHERE doc_id % 3 = 0), "
            "g AS (SELECT did, j, i, (i * w) // 8 AS sx, (j * h) // 9 AS sy "
            "  FROM imgs, range(0, 8) ri(i), range(0, 9) rj(j)), "
            "l AS (SELECT did, j, i, "
            "    0.2126 * ((sx * 7 + did) % 256) + 0.7152 * ((sy * 13 + did * 3) % 256) "
            "    + 0.0722 * ((sx + sy + did * 5) % 256) AS lum FROM g), "
            "bits AS (SELECT l1.did, l1.j, l1.i, "
            "    CASE WHEN l2.lum > l1.lum THEN 1 ELSE 0 END AS b "
            "  FROM l l1 JOIN l l2 ON l2.did = l1.did AND l2.j = l1.j "
            "    AND l2.i = l1.i + 1 WHERE l1.i < 7), "
            "hh AS (SELECT did, CAST(sum(b * (1::BIGINT << (j * 7 + i))) AS BIGINT) "
            "    AS dhash FROM bits GROUP BY did), "
            "bands AS (SELECT 'media-' || did AS id, dhash, k, "
            "    (dhash >> (7 * k)) & 127 AS band FROM hh, range(0, 9) rk(k)), "
            "cand AS (SELECT DISTINCT ba.id AS a, bb.id AS b, ba.dhash AS ha, "
            "    bb.dhash AS hb FROM bands ba JOIN bands bb "
            "  ON ba.k = bb.k AND ba.band = bb.band AND ba.id < bb.id), "
            "ham AS (SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming "
            "  FROM cand WHERE bit_count(xor(ha, hb)) <= 20) "
            "SELECT a, b, hamming FROM (SELECT *, "
            "  row_number() OVER (ORDER BY hamming, a, b) AS rn FROM ham) "
            "WHERE rn <= 10 ORDER BY hamming, a, b"
        ),
        # e52: same exact-MIN offer reduction and tie rule
        "e52_min_cost_supplier": (
            "WITH offers AS (SELECT l_partkey AS p, l_suppkey AS s, "
            "    min(l_extendedprice) AS price FROM lineitem "
            "  WHERE l_partkey <= 200 GROUP BY 1, 2), "
            "best AS (SELECT p, min(price) AS best_price FROM offers GROUP BY p), "
            "win AS (SELECT o.p, o.s, b.best_price, "
            "    row_number() OVER (PARTITION BY o.p ORDER BY o.s) AS rn "
            "  FROM offers o JOIN best b ON o.p = b.p AND o.price = b.best_price) "
            "SELECT w.p AS p_partkey, w.s AS s_suppkey, sp.s_name, "
            "  round(w.best_price, 2) AS best_price "
            "FROM win w JOIN supplier sp ON w.s = sp.s_suppkey "
            "WHERE w.rn = 1 ORDER BY p_partkey"
        ),
        # e53: same per-row cents quantization and integer boundary compares
        "e53_pareto_abc": (
            "WITH rev AS (SELECT o_custkey AS cust, "
            "    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "  FROM orders GROUP BY 1), "
            "c AS (SELECT cust, cents, "
            "    sum(cents) OVER (ORDER BY cents DESC, cust "
            "      ROWS UNBOUNDED PRECEDING) AS cum, "
            "    sum(cents) OVER () AS total FROM rev), "
            "k AS (SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A' "
            "    WHEN cum * 20 <= total * 19 THEN 'B' ELSE 'C' END AS class, "
            "    cents, total FROM c) "
            "SELECT class, count(*) AS n_customers, "
            "  CAST(sum(cents) AS BIGINT) AS class_cents, "
            "  sum(cents) / CAST(max(total) AS DOUBLE) AS share "
            "FROM k GROUP BY class ORDER BY class"
        ),
        # d32: the long-format profile stated as a UNION ALL
        "d32_column_drift": (
            "WITH o AS (SELECT CASE WHEN o_orderdate < DATE '1998-01-01' "
            "    THEN 'a' ELSE 'b' END AS half, "
            "    CAST(o_custkey AS DOUBLE) AS c1, CAST(o_orderkey AS DOUBLE) AS c2, "
            "    CAST(o_totalprice AS DOUBLE) AS c3 FROM orders), "
            "lf AS (SELECT half, 'o_custkey' AS col, c1 AS v FROM o "
            "  UNION ALL SELECT half, 'o_orderkey', c2 FROM o "
            "  UNION ALL SELECT half, 'o_totalprice', c3 FROM o), "
            "per AS (SELECT col, half, count(*) AS n, "
            "    sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS nulls, "
            "    min(v) AS vmin, max(v) AS vmax, round(avg(v), 4) AS vavg "
            "  FROM lf GROUP BY 1, 2) "
            "SELECT a.col AS \"column\", a.n AS n_a, CAST(a.nulls AS BIGINT) AS nulls_a, "
            "  a.vmin AS min_a, a.vmax AS max_a, a.vavg AS avg_a, "
            "  b.n AS n_b, CAST(b.nulls AS BIGINT) AS nulls_b, "
            "  b.vmin AS min_b, b.vmax AS max_b, b.vavg AS avg_b, "
            "  round(b.vavg - a.vavg, 4) AS avg_delta "
            "FROM per a JOIN per b ON a.col = b.col AND a.half = 'a' AND b.half = 'b' "
            "ORDER BY 1"
        ),
        # a125: a56's unrolled-round twin with the restart mass FULL-JOINed
        # back onto the seed set each round
        "a125_personalized_pagerank": (
            "WITH p AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS c, "
            "    's' || l_suppkey::VARCHAR AS s "
            "  FROM orders JOIN lineitem ON l_orderkey = o_orderkey), "
            "e AS (SELECT c AS src, s AS dst FROM p "
            "  UNION ALL SELECT s AS src, c AS dst FROM p), "
            "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
            "seeds AS (SELECT 'c' || c_custkey::VARCHAR AS node FROM customer "
            "  WHERE c_custkey <= 3), "
            "ns AS (SELECT count(*)::DOUBLE AS n FROM seeds), "
            "r0 AS (SELECT node, 1.0 / (SELECT n FROM ns) AS rank FROM seeds), "
            "p1 AS (SELECT e.dst AS node, 0.85 * sum(r.rank / deg.deg) AS prop "
            "  FROM e JOIN deg ON e.src = deg.src JOIN r0 r ON r.node = e.src "
            "  GROUP BY e.dst), "
            "r1 AS (SELECT coalesce(p.node, s.node) AS node, "
            "    (CASE WHEN s.node IS NOT NULL THEN 0.15 / (SELECT n FROM ns) "
            "      ELSE 0 END) + coalesce(p.prop, 0) AS rank "
            "  FROM p1 p FULL JOIN seeds s ON p.node = s.node), "
            "p2 AS (SELECT e.dst AS node, 0.85 * sum(r.rank / deg.deg) AS prop "
            "  FROM e JOIN deg ON e.src = deg.src JOIN r1 r ON r.node = e.src "
            "  GROUP BY e.dst), "
            "r2 AS (SELECT coalesce(p.node, s.node) AS node, "
            "    (CASE WHEN s.node IS NOT NULL THEN 0.15 / (SELECT n FROM ns) "
            "      ELSE 0 END) + coalesce(p.prop, 0) AS rank "
            "  FROM p2 p FULL JOIN seeds s ON p.node = s.node), "
            "p3 AS (SELECT e.dst AS node, 0.85 * sum(r.rank / deg.deg) AS prop "
            "  FROM e JOIN deg ON e.src = deg.src JOIN r2 r ON r.node = e.src "
            "  GROUP BY e.dst), "
            "r3 AS (SELECT coalesce(p.node, s.node) AS node, "
            "    (CASE WHEN s.node IS NOT NULL THEN 0.15 / (SELECT n FROM ns) "
            "      ELSE 0 END) + coalesce(p.prop, 0) AS rank "
            "  FROM p3 p FULL JOIN seeds s ON p.node = s.node) "
            "SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node"
        ),
        # a126: the greedy unrolled round by round (a103's shingle
        # comprehension; each round excludes the pick and its shingles)
        "a126_coverage_selection": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "s0 AS (SELECT doc_id, unnest(list_distinct("
            "    [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))])) AS sh "
            "  FROM t WHERE len(toks) >= 2), "
            "c1 AS (SELECT doc_id, count(*) AS n FROM s0 GROUP BY doc_id), "
            "p1 AS (SELECT doc_id, n FROM c1 ORDER BY n DESC, doc_id LIMIT 1), "
            "s1 AS (SELECT s.* FROM s0 s WHERE s.doc_id <> (SELECT doc_id FROM p1) "
            "  AND s.sh NOT IN (SELECT sh FROM s0 WHERE doc_id = (SELECT doc_id FROM p1))), "
            "c2 AS (SELECT doc_id, count(*) AS n FROM s1 GROUP BY doc_id), "
            "p2 AS (SELECT doc_id, n FROM c2 ORDER BY n DESC, doc_id LIMIT 1), "
            "s2 AS (SELECT s.* FROM s1 s WHERE s.doc_id <> (SELECT doc_id FROM p2) "
            "  AND s.sh NOT IN (SELECT sh FROM s0 WHERE doc_id = (SELECT doc_id FROM p2))), "
            "c3 AS (SELECT doc_id, count(*) AS n FROM s2 GROUP BY doc_id), "
            "p3 AS (SELECT doc_id, n FROM c3 ORDER BY n DESC, doc_id LIMIT 1), "
            "s3 AS (SELECT s.* FROM s2 s WHERE s.doc_id <> (SELECT doc_id FROM p3) "
            "  AND s.sh NOT IN (SELECT sh FROM s0 WHERE doc_id = (SELECT doc_id FROM p3))), "
            "c4 AS (SELECT doc_id, count(*) AS n FROM s3 GROUP BY doc_id), "
            "p4 AS (SELECT doc_id, n FROM c4 ORDER BY n DESC, doc_id LIMIT 1), "
            "s4 AS (SELECT s.* FROM s3 s WHERE s.doc_id <> (SELECT doc_id FROM p4) "
            "  AND s.sh NOT IN (SELECT sh FROM s0 WHERE doc_id = (SELECT doc_id FROM p4))), "
            "c5 AS (SELECT doc_id, count(*) AS n FROM s4 GROUP BY doc_id), "
            "p5 AS (SELECT doc_id, n FROM c5 ORDER BY n DESC, doc_id LIMIT 1), "
            "u AS (SELECT 1 AS r, doc_id, n FROM p1 "
            "  UNION ALL SELECT 2, doc_id, n FROM p2 "
            "  UNION ALL SELECT 3, doc_id, n FROM p3 "
            "  UNION ALL SELECT 4, doc_id, n FROM p4 "
            "  UNION ALL SELECT 5, doc_id, n FROM p5) "
            "SELECT CAST(r AS BIGINT) AS round, doc_id, "
            "  CAST(n AS BIGINT) AS new_shingles, "
            "  CAST(sum(n) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "    AS covered_total "
            "FROM u ORDER BY round"
        ),
        # e54: same anti-join gap construction, i-th aligned to i-th
        "e54_sequence_gaps": (
            "WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem), "
            "b AS (SELECT min(k) AS mn, max(k) AS mx FROM k), "
            "st AS (SELECT k + 1 AS gap_start, "
            "    row_number() OVER (ORDER BY k) AS rn FROM k "
            "  WHERE k + 1 NOT IN (SELECT k FROM k) AND k < (SELECT mx FROM b)), "
            "en AS (SELECT k - 1 AS gap_end, "
            "    row_number() OVER (ORDER BY k) AS rn FROM k "
            "  WHERE k - 1 NOT IN (SELECT k FROM k) AND k > (SELECT mn FROM b)), "
            "g AS (SELECT gap_start, gap_end, gap_end - gap_start + 1 AS gap_len "
            "  FROM st JOIN en USING (rn)) "
            "SELECT rank, gap_start, gap_end, gap_len FROM (SELECT *, "
            "  row_number() OVER (ORDER BY gap_len DESC, gap_start) AS rank FROM g) "
            "WHERE rank <= 20 ORDER BY rank"
        ),
        # d33: the d30 bucket CTE + pruning arithmetic
        "d33_zonemap_audit": (
            "WITH z AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
            f"  {_zorder_sql('l_partkey', 'l_suppkey', 16, 10)} AS z "
            "  FROM lineitem), "
            "bk AS (SELECT *, ntile(32) OVER (ORDER BY z, l_orderkey, l_linenumber) "
            "  AS bucket FROM z), "
            "box AS (SELECT max(l_partkey) // 10 AS lo_p, max(l_partkey) // 5 AS hi_p, "
            "    max(l_suppkey) // 10 AS lo_s, max(l_suppkey) // 5 AS hi_s "
            "  FROM lineitem), "
            "per AS (SELECT bucket, count(*) AS n, "
            "    min(l_partkey) AS mn_p, max(l_partkey) AS mx_p, "
            "    min(l_suppkey) AS mn_s, max(l_suppkey) AS mx_s "
            "  FROM bk GROUP BY bucket), "
            "s AS (SELECT count(*) AS total_buckets, "
            "    sum(CASE WHEN mn_p <= hi_p AND mx_p >= lo_p AND mn_s <= hi_s "
            "      AND mx_s >= lo_s THEN 1 ELSE 0 END) AS touched_buckets, "
            "    sum(CASE WHEN mn_p <= hi_p AND mx_p >= lo_p AND mn_s <= hi_s "
            "      AND mx_s >= lo_s THEN n ELSE 0 END) AS rows_scanned "
            "  FROM per, box), "
            "m AS (SELECT count(*) AS rows_matched FROM lineitem, box "
            "  WHERE l_partkey BETWEEN lo_p AND hi_p "
            "  AND l_suppkey BETWEEN lo_s AND hi_s) "
            "SELECT total_buckets, CAST(touched_buckets AS BIGINT) AS touched_buckets, "
            "  CAST(rows_scanned AS BIGINT) AS rows_scanned, rows_matched, "
            "  CAST(rows_scanned AS DOUBLE) / rows_matched AS amplification "
            "FROM s, m"
        ),
        # a127: the a5/a50 cosine formula; per-(anchor, same) argmax
        "a127_hard_negatives": (
            "WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
            "q AS (SELECT vec_id AS anchor, label AS qlab, v AS qv FROM v "
            "  WHERE vec_id < 10), "
            "s AS (SELECT q.anchor, v.vec_id AS id, "
            "    CASE WHEN v.label = q.qlab THEN 1 ELSE 0 END AS same, "
            "    round(list_dot_product(q.qv, v.v) / "
            "      (sqrt(list_dot_product(q.qv, q.qv)) * "
            "       sqrt(list_dot_product(v.v, v.v))), 4) AS cos "
            "  FROM q JOIN v ON v.vec_id <> q.anchor), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY anchor, same "
            "  ORDER BY cos DESC, id) AS rn FROM s) "
            "SELECT anchor, "
            "  max(CASE WHEN same = 1 THEN id END) AS pos_id, "
            "  max(CASE WHEN same = 1 THEN cos END) AS pos_cos, "
            "  max(CASE WHEN same = 0 THEN id END) AS neg_id, "
            "  max(CASE WHEN same = 0 THEN cos END) AS neg_cos, "
            "  round(max(CASE WHEN same = 1 THEN cos END) - "
            "    max(CASE WHEN same = 0 THEN cos END), 4) AS margin "
            "FROM r WHERE rn = 1 GROUP BY anchor ORDER BY anchor"
        ),
        # a128: the a105 detection CASE, cells + declared-row share
        "a128_lang_confusion": (
            "WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents), "
            "d AS (SELECT lang, CASE "
            "  WHEN len(list_intersect(list_distinct(toks), ['le','la','et','les'])) >= 2 THEN 'fr' "
            "  WHEN len(list_intersect(list_distinct(toks), ['der','die','und','das'])) >= 2 THEN 'de' "
            "  WHEN len(list_intersect(list_distinct(toks), ['el','los','las','una'])) >= 2 THEN 'es' "
            "  WHEN len(list_intersect(list_distinct(toks), ['the','and','of','to'])) >= 2 THEN 'en' "
            "  ELSE 'und' END AS det FROM t), "
            "c AS (SELECT lang, det, count(*) AS n FROM d GROUP BY 1, 2) "
            "SELECT lang, det, n, "
            "  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang) "
            "    AS row_share, "
            "  CAST(CASE WHEN lang = det THEN 1 ELSE 0 END AS BIGINT) AS agree "
            "FROM c ORDER BY lang, det"
        ),
        # a129: the a2 exact-jaccard CTE + the md5 permutation family
        "a129_minhash_calibration": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            + _posting_pairs_cte()
            + "p AS (SELECT a, b, round(" + _PC_JRAW + ", 3) AS jaccard "
            "  FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
            "e AS (SELECT doc_id, unnest(sh) AS sh FROM s), "
            "hp AS (SELECT doc_id, pp, min(CAST(CONCAT('0x', "
            "    substr(md5(pp || ':' || sh), 1, 15)) AS BIGINT)) AS h "
            "  FROM e, range(0, 32) rp(pp) GROUP BY doc_id, pp), "
            "m AS (SELECT p.a, p.b, p.jaccard, "
            "    round(sum(CASE WHEN ha.h = hb.h THEN 1 ELSE 0 END) / 32.0, 4) "
            "      AS minhash_est "
            "  FROM p JOIN hp ha ON ha.doc_id = p.a "
            "  JOIN hp hb ON hb.doc_id = p.b AND hb.pp = ha.pp "
            "  GROUP BY 1, 2, 3) "
            "SELECT a, b, jaccard, minhash_est, "
            "  round(minhash_est - jaccard, 4) AS err FROM m ORDER BY a, b"
        ),
        # d34: quantile_cont is DuckDB's exact interpolated percentile
        # (the e12-established twin of Spark's percentile())
        "d34_ingest_lag": P(
            ", pb AS (SELECT broker_id, location_key, "
            "    max(epoch(ingestion_time)) - min(epoch(publish_time)) AS window_s "
            "  FROM index_metadata WHERE publish_time IS NOT NULL "
            "  GROUP BY broker_id, location_key) "
            "SELECT broker_id, count(*) AS n_blobs, "
            "  round(min(window_s), 4) AS min_s, round(max(window_s), 4) AS max_s, "
            "  round(avg(window_s), 4) AS avg_s, "
            "  round(quantile_cont(window_s, 0.5), 4) AS p50, "
            "  round(quantile_cont(window_s, 0.9), 4) AS p90, "
            "  round(quantile_cont(window_s, 0.99), 4) AS p99 "
            "FROM pb GROUP BY broker_id ORDER BY broker_id"
        ),
        # e55: same contribution fan-out; sufficient sums exact integers
        "e55_rolling_correlation": (
            "WITH daily AS (SELECT CAST(ts AS DATE) AS day, "
            "    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x, "
            "    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y "
            "  FROM events GROUP BY 1), "
            "contrib AS (SELECT day + CAST(k AS INT) AS day, x, y "
            "  FROM daily, range(0, 14) r(k)), "
            "sums AS (SELECT day, count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
            "    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy "
            "  FROM contrib GROUP BY day) "
            "SELECT s.day, s.n, CAST(s.sx AS BIGINT) AS clicks_14d, "
            "  CAST(s.sy AS BIGINT) AS purchases_14d, "
            "  CASE WHEN s.n >= 2 AND s.n * s.sxx - s.sx * s.sx > 0 "
            "    AND s.n * s.syy - s.sy * s.sy > 0 "
            "    THEN (s.n * s.sxy - s.sx * s.sy) / "
            "      sqrt(CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE) * "
            "           CAST(s.n * s.syy - s.sy * s.sy AS DOUBLE)) "
            "    END AS r "
            "FROM sums s JOIN (SELECT DISTINCT day FROM daily) d ON d.day = s.day "
            "ORDER BY s.day"
        ),
        # a130: the same three unrolled integer-DIV redistribution rounds
        "a130_waterfill_mixture": (
            "WITH caps AS (SELECT source, "
            "    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS cap "
            "  FROM documents GROUP BY source), "
            "t AS (SELECT CAST((sum(cap) * 4) // 5 AS BIGINT) AS budget, "
            "    count(*) AS n FROM caps), "
            "r1 AS (SELECT source, cap, CASE WHEN cap <= "
            "    (SELECT budget // n FROM t) THEN cap END AS fixed1 FROM caps), "
            "a1 AS (SELECT sum(CASE WHEN fixed1 IS NULL THEN 1 ELSE 0 END) AS n2, "
            "    (SELECT budget FROM t) - coalesce(sum(fixed1), 0) AS b2 FROM r1), "
            "r2 AS (SELECT source, cap, fixed1, CASE WHEN fixed1 IS NULL AND cap <= "
            "    (SELECT CASE WHEN n2 > 0 THEN b2 // n2 ELSE 0 END FROM a1) "
            "    THEN cap END AS fixed2 FROM r1), "
            "a2 AS (SELECT sum(CASE WHEN fixed1 IS NULL AND fixed2 IS NULL "
            "      THEN 1 ELSE 0 END) AS n3, "
            "    (SELECT budget FROM t) - coalesce(sum(fixed1), 0) "
            "      - coalesce(sum(fixed2), 0) AS b3 FROM r2), "
            "f AS (SELECT source, cap, CAST(coalesce(fixed1, fixed2, least(cap, "
            "    (SELECT CASE WHEN n3 > 0 THEN b3 // n3 ELSE 0 END FROM a2))) "
            "    AS BIGINT) AS alloc FROM r2) "
            "SELECT source, cap, alloc, CAST(alloc = cap AS BIGINT) AS capped "
            "FROM f ORDER BY source"
        ),
        # a131: the ||sum of unit vectors||^2 identity, per-dim sums
        "a131_label_dispersion": (
            "WITH v AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings), "
            "u AS (SELECT label, "
            "    [x * (1.0 / sqrt(list_dot_product(v, v))) for x in v] AS u FROM v), "
            "flat AS (SELECT label, generate_subscripts(u, 1) AS i, unnest(u) AS x "
            "  FROM u), "
            "dims AS (SELECT label, i, "
            "  CAST(sum(CAST(x AS DECIMAL(20,14))) AS DOUBLE) AS s "
            "  FROM flat GROUP BY 1, 2), "
            "per AS (SELECT label, "
            "  CAST(sum(CAST(s * s AS DECIMAL(26,12))) AS DOUBLE) AS sq "
            "  FROM dims GROUP BY label), "
            "cnt AS (SELECT label, count(*) AS n FROM v GROUP BY label) "
            "SELECT label, n, "
            "  (sq - n) / (n * (n - 1)) AS mean_pairwise_cos "
            "FROM per JOIN cnt USING (label) ORDER BY label"
        ),
        # e57: same exact-integer margins, expected in identical doubles
        "e57_chi_square": (
            "WITH cells AS (SELECT CAST(user_id % 5 AS BIGINT) AS bucket, "
            "    event_type, count(*) AS o FROM events GROUP BY 1, 2), "
            "rw AS (SELECT bucket, sum(o) AS row_n FROM cells GROUP BY bucket), "
            "cl AS (SELECT event_type, sum(o) AS col_n FROM cells GROUP BY event_type), "
            "g AS (SELECT count(*) AS grand_n FROM events), "
            "j AS (SELECT c.o, rw.row_n, cl.col_n, "
            "    rw.row_n * cl.col_n / CAST((SELECT grand_n FROM g) AS DOUBLE) AS e "
            "  FROM cells c JOIN rw USING (bucket) JOIN cl USING (event_type)) "
            "SELECT CAST(sum(CAST(floor((o - e) * (o - e) / e * 1e9 + 0.5) "
            "    AS BIGINT)) AS DOUBLE) / 1e9 AS chi2, "
            "  count(*) AS n_cells, "
            "  (SELECT CAST((count(DISTINCT bucket) - 1) * "
            "      (count(DISTINCT event_type) - 1) AS BIGINT) FROM cells) AS dof, "
            "  (SELECT grand_n FROM g) AS grand_n "
            "FROM j"
        ),
        # a132: Benford expectation log10(1 + 1/d), digit via the same
        # floor/log10 arithmetic
        "a132_benford_audit": (
            "WITH o AS (SELECT o_totalprice AS x FROM orders WHERE o_totalprice > 0), "
            "n AS (SELECT count(*) AS n FROM o), "
            "d AS (SELECT CAST(floor(x / pow(10.0, floor(log10(x)))) AS BIGINT) "
            "    AS digit FROM o), "
            "obs AS (SELECT digit, count(*) AS o FROM d GROUP BY digit) "
            "SELECT digit, o, "
            "  round(o / CAST((SELECT n FROM n) AS DOUBLE), 4) AS obs_share, "
            "  round(log10(1.0 + 1.0 / digit), 4) AS benford_share, "
            "  round(o / CAST((SELECT n FROM n) AS DOUBLE) "
            "    - log10(1.0 + 1.0 / digit), 4) AS deviation "
            "FROM obs ORDER BY digit"
        ),
        # d35: regr_slope/regr_intercept over exact-integer day indexes
        "d35_ingest_forecast": P(
            ", daily AS (SELECT i.broker_id, CAST(i.ingestion_time AS DATE) AS day, "
            "    sum(octet_length(encode(b.payload))) AS bytes "
            "  FROM index_metadata i JOIN blob_records b ON b.record_id = i.unique_id "
            "  GROUP BY 1, 2), "
            "fst AS (SELECT broker_id, min(day) AS d0 FROM daily GROUP BY broker_id), "
            "idx AS (SELECT d.broker_id, "
            "    CAST(datediff('day', f.d0, d.day) AS DOUBLE) AS di, "
            "    CAST(d.bytes AS DOUBLE) AS y "
            "  FROM daily d JOIN fst f USING (broker_id)) "
            "SELECT broker_id, count(*) AS n_days, "
            "  round(regr_slope(y, di), 4) AS slope, "
            "  round(regr_intercept(y, di), 4) AS intercept, "
            "  round(regr_intercept(y, di) + regr_slope(y, di) * (max(di) + 7), 4) "
            "    AS forecast_7d "
            "FROM idx GROUP BY broker_id ORDER BY broker_id"
        ),
        # e58: min-filter joins + quantile_cont (the e12/d34 twin)
        "e58_time_to_convert": (
            "WITH signup AS (SELECT user_id, min(epoch(ts)) AS t_signup "
            "  FROM events WHERE event_type = 'signup' GROUP BY user_id), "
            "p AS (SELECT user_id, epoch(ts) AS t_p FROM events "
            "  WHERE event_type = 'purchase'), "
            "conv AS (SELECT s.user_id, min(t_p - t_signup) AS lat_s "
            "  FROM signup s JOIN p USING (user_id) WHERE t_p >= t_signup "
            "  GROUP BY s.user_id), "
            "ns AS (SELECT count(*) AS n FROM signup) "
            "SELECT (SELECT n FROM ns) AS n_signups, count(*) AS n_converted, "
            "  count(*) / CAST((SELECT n FROM ns) AS DOUBLE) "
            "    AS conversion_rate, "
            "  round(quantile_cont(lat_s, 0.25), 4) AS p25_s, "
            "  round(quantile_cont(lat_s, 0.5), 4) AS p50_s, "
            "  round(quantile_cont(lat_s, 0.75), 4) AS p75_s, "
            "  round(quantile_cont(lat_s, 0.9), 4) AS p90_s "
            "FROM conv"
        ),
        # d36: same md5 ring, successor via ranked inequality join with
        # the wrap-to-global-min fallback
        "d36_consistent_hashing": P(
            ", keys AS (SELECT unique_id, "
            "    CAST(CONCAT('0x', substr(md5(unique_id), 1, 15)) AS BIGINT) AS h "
            "  FROM index_metadata), "
            "ring4 AS (SELECT 'n' || n AS node, CAST(CONCAT('0x', "
            "    substr(md5('n' || n || '#v' || v), 1, 15)) AS BIGINT) AS pos "
            "  FROM range(0, 4) rn(n), range(0, 8) rv(v)), "
            "ring5 AS (SELECT 'n' || n AS node, CAST(CONCAT('0x', "
            "    substr(md5('n' || n || '#v' || v), 1, 15)) AS BIGINT) AS pos "
            "  FROM range(0, 5) rn(n), range(0, 8) rv(v)), "
            "w4 AS (SELECT node FROM ring4 ORDER BY pos, node LIMIT 1), "
            "w5 AS (SELECT node FROM ring5 ORDER BY pos, node LIMIT 1), "
            "s4 AS (SELECT u, node FROM (SELECT k.unique_id AS u, r.node, "
            "    row_number() OVER (PARTITION BY k.unique_id "
            "      ORDER BY r.pos, r.node) AS rn "
            "  FROM keys k JOIN ring4 r ON r.pos >= k.h) WHERE rn = 1), "
            "s5 AS (SELECT u, node FROM (SELECT k.unique_id AS u, r.node, "
            "    row_number() OVER (PARTITION BY k.unique_id "
            "      ORDER BY r.pos, r.node) AS rn "
            "  FROM keys k JOIN ring5 r ON r.pos >= k.h) WHERE rn = 1), "
            "a AS (SELECT k.unique_id, "
            "    coalesce(s4.node, (SELECT node FROM w4)) AS node4, "
            "    coalesce(s5.node, (SELECT node FROM w5)) AS node5 "
            "  FROM keys k LEFT JOIN s4 ON s4.u = k.unique_id "
            "  LEFT JOIN s5 ON s5.u = k.unique_id) "
            "SELECT count(*) AS n_keys, "
            "  CAST(sum(CASE WHEN node4 <> node5 THEN 1 ELSE 0 END) AS BIGINT) "
            "    AS moved, "
            "  round(sum(CASE WHEN node4 <> node5 THEN 1 ELSE 0 END) "
            "    / CAST(count(*) AS DOUBLE), 4) AS moved_frac "
            "FROM a"
        ),
        # e59: DuckDB's IGNORE NULLS last_value is the LOCF twin
        "e59_forward_fill": (
            "WITH g AS (SELECT user_id, event_id, ts, "
            "    CASE WHEN event_id % 7 <> 3 THEN round(value, 4) END AS v "
            "  FROM events), "
            "f AS (SELECT user_id, v, last_value(v IGNORE NULLS) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id "
            "    ROWS UNBOUNDED PRECEDING) AS ff FROM g) "
            "SELECT user_id, count(*) AS n, "
            "  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps, "
            "  CAST(sum(CASE WHEN v IS NULL AND ff IS NOT NULL THEN 1 ELSE 0 END) "
            "    AS BIGINT) AS n_filled, "
            "  CAST(sum(CAST(ff AS DECIMAL(12,6))) AS DOUBLE) AS sum_filled_series "
            "FROM f GROUP BY user_id ORDER BY user_id"
        ),
        # d37: the dense-1..n invariant, stated identically
        "d37_position_density": P(
            ", per AS (SELECT location_key, count(*) AS n, "
            "    count(position) AS n_pos, "
            "    count(DISTINCT position) AS n_distinct, "
            "    min(position) AS mn, max(position) AS mx "
            "  FROM blob_records GROUP BY location_key) "
            "SELECT count(*) AS n_blobs, "
            "  CAST(sum(CASE WHEN (n_pos = 0 AND n = 1) OR (n_pos = n "
            "    AND n_distinct = n AND mn = 1 AND mx = n) THEN 0 ELSE 1 END) "
            "    AS BIGINT) AS violations, "
            "  CAST(sum(CASE WHEN n_pos = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "    AS single_record_blobs, "
            "  max(mx) AS max_position "
            "FROM per"
        ),
        # a133: same one-agg scatter + label-bounded centroid distances
        "a133_davies_bouldin": (
            "WITH v AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings), "
            "flat AS (SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x "
            "  FROM v), "
            "dims AS (SELECT label, i, avg(x) AS c, avg(x * x) AS xx "
            "  FROM flat GROUP BY 1, 2), "
            "per AS (SELECT label, sqrt(sum(xx) - sum(c * c)) AS sigma "
            "  FROM dims GROUP BY label), "
            "dist AS (SELECT a.label AS la, b.label AS lb, "
            "    sqrt(sum((a.c - b.c) * (a.c - b.c))) AS d "
            "  FROM dims a JOIN dims b ON a.i = b.i AND a.label <> b.label "
            "  GROUP BY 1, 2), "
            "r AS (SELECT la, (sa.sigma + sb.sigma) / d AS r "
            "  FROM dist JOIN per sa ON sa.label = dist.la "
            "  JOIN per sb ON sb.label = dist.lb) "
            "SELECT p.label, round(p.sigma, 4) AS sigma, "
            "  round(max(r.r), 4) AS db_index "
            "FROM per p JOIN r ON r.la = p.label "
            "GROUP BY p.label, p.sigma ORDER BY label"
        ),
        # e60: the e9 session CTE + the sweep-line running sum
        "e60_max_concurrency": (
            "WITH f AS (SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS ep, "
            "    CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER "
            "      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 "
            "    WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER "
            "      (PARTITION BY user_id ORDER BY ts, event_id) > 1800 "
            "      THEN 1 ELSE 0 END AS ns "
            "  FROM events), "
            "s AS (SELECT user_id, ep, sum(coalesce(ns, 1)) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id "
            "    ROWS UNBOUNDED PRECEDING) AS session_id FROM f), "
            "sess AS (SELECT user_id, session_id, min(ep) AS t0, max(ep) AS t1 "
            "  FROM s GROUP BY 1, 2), "
            "pts AS (SELECT t0 AS t, CAST(1 AS BIGINT) AS d, user_id, session_id "
            "    FROM sess "
            "  UNION ALL SELECT t1, CAST(-1 AS BIGINT), user_id, session_id "
            "    FROM sess), "
            "sw AS (SELECT t, sum(d) OVER (ORDER BY t, d, user_id, session_id "
            "    ROWS UNBOUNDED PRECEDING) AS live FROM pts), "
            "mx AS (SELECT max(live) AS m FROM sw) "
            "SELECT (SELECT count(*) FROM sess) AS n_sessions, "
            "  CAST((SELECT m FROM mx) AS BIGINT) AS max_concurrent, "
            "  CAST(min(t) AS BIGINT) AS t_first_peak "
            "FROM sw WHERE live = (SELECT m FROM mx)"
        ),
        # a135: identical sqrt-energy-ratio means per prefix dim
        "a135_matryoshka_quality": (
            "WITH v AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings), "
            "per AS (SELECT label, "
            "    sqrt(list_dot_product(v[1:8], v[1:8]) / list_dot_product(v, v)) AS c8, "
            "    sqrt(list_dot_product(v[1:16], v[1:16]) / list_dot_product(v, v)) AS c16, "
            "    sqrt(list_dot_product(v[1:32], v[1:32]) / list_dot_product(v, v)) AS c32 "
            "  FROM v) "
            "SELECT label, count(*) AS n, round(avg(c8), 4) AS mean_cos_d8, "
            "  round(avg(c16), 4) AS mean_cos_d16, round(avg(c32), 4) AS mean_cos_d32 "
            "FROM per GROUP BY label ORDER BY label"
        ),
        # a136: same per-source rank + (rank, source) schedule
        "a136_curriculum_interleave": (
            "WITH r AS (SELECT source, doc_id, n_chars, row_number() OVER ("
            "    PARTITION BY source ORDER BY n_chars, doc_id) AS pass_rank "
            "  FROM documents) "
            "SELECT slot, source, doc_id, n_chars, pass_rank FROM (SELECT *, "
            "  row_number() OVER (ORDER BY pass_rank, source) AS slot FROM r) "
            "WHERE slot <= 60 ORDER BY slot"
        ),
        # e61: the same six anti-join edge probes, unioned
        "e61_fk_integrity": (
            "WITH e1 AS (SELECT 'orders.o_custkey -> customer' AS fk_edge, "
            "    (SELECT count(*) FROM orders) AS n_child, "
            "    (SELECT count(*) FROM orders o WHERE o.o_custkey NOT IN "
            "      (SELECT c_custkey FROM customer)) AS n_orphans), "
            "e2 AS (SELECT 'lineitem.l_orderkey -> orders', "
            "    (SELECT count(*) FROM lineitem), "
            "    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey NOT IN "
            "      (SELECT o_orderkey FROM orders))), "
            "e3 AS (SELECT 'lineitem.l_partkey -> part', "
            "    (SELECT count(*) FROM lineitem), "
            "    (SELECT count(*) FROM lineitem l WHERE l.l_partkey NOT IN "
            "      (SELECT p_partkey FROM part))), "
            "e4 AS (SELECT 'lineitem.l_suppkey -> supplier', "
            "    (SELECT count(*) FROM lineitem), "
            "    (SELECT count(*) FROM lineitem l WHERE l.l_suppkey NOT IN "
            "      (SELECT s_suppkey FROM supplier))), "
            "e5 AS (SELECT 'customer.c_nationkey -> nation', "
            "    (SELECT count(*) FROM customer), "
            "    (SELECT count(*) FROM customer c WHERE c.c_nationkey NOT IN "
            "      (SELECT n_nationkey FROM nation))), "
            "e6 AS (SELECT 'nation.n_regionkey -> region', "
            "    (SELECT count(*) FROM nation), "
            "    (SELECT count(*) FROM nation n WHERE n.n_regionkey NOT IN "
            "      (SELECT r_regionkey FROM region))), "
            "u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 "
            "  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4 "
            "  UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6) "
            "SELECT fk_edge, n_child, n_orphans, "
            "  CAST(n_orphans AS DOUBLE) / n_child AS orphan_rate "
            "FROM u ORDER BY fk_edge"
        ),
        # a137: daily bottom-k + the e43 contribution fan-out + the
        # (k-1)/theta estimator with the unsaturated exact branch
        "a137_rolling_distinct_sketch": (
            "WITH dh AS (SELECT DISTINCT CAST(ts AS DATE) AS day, "
            "    CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) "
            "      AS BIGINT) AS h FROM events), "
            "dsk AS (SELECT day, h FROM (SELECT day, h, "
            "    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM dh) "
            "  WHERE rn <= 64), "
            "c AS (SELECT DISTINCT day + CAST(i AS INT) AS gday, h "
            "  FROM dsk, range(0, 7) r(i)), "
            "usk AS (SELECT gday, h FROM (SELECT gday, h, "
            "    row_number() OVER (PARTITION BY gday ORDER BY h) AS rn FROM c) "
            "  WHERE rn <= 64), "
            "est AS (SELECT gday, CASE WHEN count(*) < 64 "
            "    THEN CAST(count(*) AS DOUBLE) "
            "    ELSE 63.0 / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0) END "
            "    AS e FROM usk GROUP BY gday), "
            "du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events), "
            "ex AS (SELECT e2.gday, count(DISTINCT e2.user_id) AS users_7d "
            "  FROM (SELECT DISTINCT day + CAST(i AS INT) AS gday, user_id "
            "        FROM du, range(0, 7) r(i)) e2 "
            "  JOIN (SELECT DISTINCT day AS gday FROM du) g ON g.gday = e2.gday "
            "  GROUP BY e2.gday) "
            "SELECT ex.gday, ex.users_7d, round(est.e, 4) AS est_users_7d, "
            "  round((round(est.e, 4) - ex.users_7d) / CAST(ex.users_7d AS DOUBLE), 4) "
            "    AS rel_err "
            "FROM est JOIN ex ON ex.gday = est.gday ORDER BY ex.gday"
        ),
        # a138: four unrolled peel rounds with the same integer k rule
        "a138_kcore_peel": (
            "WITH p AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS c, "
            "    's' || l_suppkey::VARCHAR AS s "
            "  FROM orders JOIN lineitem ON l_orderkey = o_orderkey), "
            "e0 AS (SELECT c AS src, s AS dst FROM p "
            "  UNION ALL SELECT s AS src, c AS dst FROM p), "
            "d0 AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src), "
            "kk AS (SELECT (sum(deg) // count(*)) + 1 AS k FROM d0), "
            "k1 AS (SELECT src AS node FROM d0, kk WHERE deg >= k), "
            "e1 AS (SELECT e.* FROM e0 e WHERE e.src IN (SELECT node FROM k1) "
            "  AND e.dst IN (SELECT node FROM k1)), "
            "d1 AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src), "
            "k2 AS (SELECT src AS node FROM d1, kk WHERE deg >= k), "
            "e2 AS (SELECT e.* FROM e1 e WHERE e.src IN (SELECT node FROM k2) "
            "  AND e.dst IN (SELECT node FROM k2)), "
            "d2 AS (SELECT src, count(*) AS deg FROM e2 GROUP BY src), "
            "k3 AS (SELECT src AS node FROM d2, kk WHERE deg >= k), "
            "e3 AS (SELECT e.* FROM e2 e WHERE e.src IN (SELECT node FROM k3) "
            "  AND e.dst IN (SELECT node FROM k3)), "
            "d3 AS (SELECT src, count(*) AS deg FROM e3 GROUP BY src), "
            "k4 AS (SELECT src AS node FROM d3, kk WHERE deg >= k), "
            "e4 AS (SELECT e.* FROM e3 e WHERE e.src IN (SELECT node FROM k4) "
            "  AND e.dst IN (SELECT node FROM k4)), "
            "u AS (SELECT 1 AS round, (SELECT count(*) FROM k1) AS n_nodes, "
            "    (SELECT count(*) FROM e1) AS n_edges "
            "  UNION ALL SELECT 2, (SELECT count(*) FROM k2), "
            "    (SELECT count(*) FROM e2) "
            "  UNION ALL SELECT 3, (SELECT count(*) FROM k3), "
            "    (SELECT count(*) FROM e3) "
            "  UNION ALL SELECT 4, (SELECT count(*) FROM k4), "
            "    (SELECT count(*) FROM e4)) "
            "SELECT CAST(round AS BIGINT) AS round, n_nodes, n_edges, "
            "  CAST((SELECT k FROM kk) AS BIGINT) AS k "
            "FROM u ORDER BY round"
        ),
        # a139: same next-pow2 exponent + integer boundary repair
        "a139_length_bucket_waste": (
            "WITH l AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n "
            "  FROM documents), "
            "c0 AS (SELECT n, CAST(pow(2.0, ceil(log2(CAST(n AS DOUBLE)))) "
            "    AS BIGINT) AS cap0 FROM l), "
            "c AS (SELECT n AS len, CAST(CASE WHEN cap0 < n THEN cap0 * 2 "
            "    WHEN cap0 >= n * 2 AND n > 0 THEN cap0 / 2 "
            "    ELSE cap0 END AS BIGINT) AS cap FROM c0), "
            "m AS (SELECT max(len) AS mx FROM c) "
            "SELECT cap, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS tokens, "
            "  CAST(sum(cap - len) AS BIGINT) AS pad_bucketed, "
            "  CAST(sum((SELECT mx FROM m) - len) AS BIGINT) AS pad_global, "
            "  round(sum(cap - len) / CAST(sum(len) + sum(cap - len) AS DOUBLE), 4) "
            "    AS bucketed_waste_frac, "
            "  round(sum((SELECT mx FROM m) - len) / "
            "    CAST(sum(len) + sum((SELECT mx FROM m) - len) AS DOUBLE), 4) "
            "    AS global_waste_frac "
            "FROM c GROUP BY cap ORDER BY cap"
        ),
        "e43_rolling_distinct": (
            "WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events), "
            "e AS (SELECT DISTINCT day + CAST(i AS INT) AS gday, user_id FROM du, range(0, 7) r(i)), "
            "g AS (SELECT DISTINCT day AS gday FROM du) "
            "SELECT e.gday, count(DISTINCT user_id) AS users_7d "
            "FROM e JOIN g ON e.gday = g.gday GROUP BY e.gday ORDER BY e.gday"
        ),
        "d25_replay_estimate": P(
            "SELECT count(*) AS n_messages, "
            "  count(DISTINCT i.location_key) AS n_blobs, "
            "  CAST(sum(octet_length(encode(b.payload))) AS BIGINT) AS total_bytes "
            "FROM index_metadata i JOIN blob_records b ON i.unique_id = b.record_id "
            "WHERE i.broker_id = 'b1'"
        ),
        "d26_blob_skew_report": P(
            ", per AS (SELECT location_key, count(*) AS n_recs, "
            "  sum(octet_length(encode(payload))) AS n_bytes FROM blob_records "
            "  GROUP BY location_key) "
            "SELECT count(*) AS n_blobs, min(n_recs) AS min_recs, "
            "  max(n_recs) AS max_recs, avg(n_recs) AS avg_recs, "
            "  CAST(max(n_bytes) AS BIGINT) AS max_bytes, "
            "  max(n_recs) / avg(n_recs) AS skew_factor "
            "FROM per"
        ),
        "a103_dup_pair_qa_sample": (
            "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
            + _posting_pairs_cte()
            + "p AS (SELECT a, b, round(" + _PC_JRAW + ", 3) AS jaccard "
            "  FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
            "k AS (SELECT a, b, jaccard, "
            "  round(CAST(CONCAT('0x', substr(md5('7_' || a || '_' || b), 1, 15)) AS BIGINT) "
            "    / 1152921504606846976.0, 8) AS qa_key FROM p "
            "  ORDER BY qa_key, a, b LIMIT 20) "
            "SELECT k.a, k.b, jaccard, qa_key, "
            "  substr(da.text, 1, 40) AS snippet_a, substr(db.text, 1, 40) AS snippet_b "
            "FROM k JOIN documents da ON k.a = da.doc_id "
            "JOIN documents db ON k.b = db.doc_id ORDER BY qa_key, k.a, k.b"
        ),
        "a104_reshard_moves": (
            "WITH d AS (SELECT "
            "  CAST(CONCAT('0x', substr(md5('s_' || doc_id), 1, 15)) AS BIGINT) AS h "
            "  FROM documents), "
            "m AS (SELECT CAST(h % 8 AS INT) AS so, CAST(h % 10 AS INT) AS sn FROM d) "
            "SELECT so AS shard_old, sn AS shard_new, count(*) AS n_docs, "
            "  so <> sn AS moved "
            "FROM m GROUP BY so, sn ORDER BY so, sn"
        ),
        "a101_k_anonymity": (
            "WITH cls AS (SELECT lang, source, "
            "  CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS len_bucket, "
            "  count(*) AS class_size FROM documents GROUP BY 1, 2, 3) "
            "SELECT lang, count(*) AS n_classes, "
            "  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) "
            "    AS n_risky_classes, "
            "  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) "
            "    AS n_risky_docs, "
            "  min(class_size) AS min_class_size "
            "FROM cls GROUP BY lang ORDER BY lang"
        ),
        "e41_upsert_merge": P(
            ", b AS (SELECT unique_id, broker_id, confirmation_flag AS flag "
            "  FROM index_metadata "
            "  WHERE CAST(substr(broker_msg_id, 2) AS BIGINT) % 2 = 0), "
            "u AS (SELECT unique_id, broker_id, TRUE AS flag FROM index_metadata "
            "  WHERE CAST(substr(broker_msg_id, 2) AS BIGINT) % 3 = 0) "
            "SELECT coalesce(u.unique_id, b.unique_id) AS unique_id, "
            "  coalesce(u.broker_id, b.broker_id) AS broker_id, "
            "  coalesce(u.flag, b.flag) AS flag, "
            "  u.unique_id IS NOT NULL AS updated "
            "FROM b FULL OUTER JOIN u ON b.unique_id = u.unique_id ORDER BY unique_id"
        ),
        "e42_revenue_share": (
            "WITH rev AS (SELECT n_regionkey, n_name, "
            "  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec "
            "  FROM orders JOIN customer ON o_custkey = c_custkey "
            "  JOIN nation ON c_nationkey = n_nationkey "
            "  GROUP BY n_regionkey, n_name) "
            "SELECT n_regionkey, n_name, CAST(rev_dec AS DOUBLE) AS revenue, "
            "  CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) "
            "    OVER (PARTITION BY n_regionkey) AS DOUBLE) AS share, "
            "  CAST(row_number() OVER (PARTITION BY n_regionkey "
            "    ORDER BY rev_dec DESC, n_name ASC) AS INT) AS rank_in_region "
            "FROM rev ORDER BY n_regionkey, n_name"
        ),
        "a102_term_churn": (
            "WITH toks AS (SELECT doc_id % 2 = 0 AS even, "
            "  unnest(string_split(text, ' ')) AS t FROM documents), "
            "o AS (SELECT t, count(*) AS c_old FROM toks WHERE even GROUP BY t), "
            "n AS (SELECT t, count(*) AS c_new FROM toks WHERE NOT even GROUP BY t) "
            "SELECT coalesce(o.t, n.t) AS t, coalesce(c_old, 0) AS c_old, "
            "  coalesce(c_new, 0) AS c_new, "
            "  coalesce(c_new, 0) - coalesce(c_old, 0) AS delta "
            "FROM o FULL OUTER JOIN n ON o.t = n.t "
            "ORDER BY abs(delta) DESC, t ASC LIMIT 30"
        ),
        "e38_datetime_suite": (
            "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, "
            "  o_orderdate AS d FROM orders) "
            "SELECT month, CAST(quarter(month) AS INT) AS quarter, "
            "  last_day(month) AS month_end, count(*) AS n_orders, "
            "  min(d) AS first_order, max(d) AS last_order, "
            "  CAST(date_diff('day', min(d), max(d)) AS INT) AS span_days "
            "FROM m GROUP BY month ORDER BY month"
        ),
        "e39_json_extract": (
            "WITH e AS (SELECT event_type, "
            "  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) "
            "SELECT event_type, count(*) AS n, count(k) AS n_parsed, "
            "  min(k) AS min_k, max(k) AS max_k, round(avg(k), 4) AS avg_k "
            "FROM e GROUP BY event_type ORDER BY event_type"
        ),
        "a100_epoch_upsample": (
            "WITH d AS (SELECT doc_id, source, "
            "  CAST(CONCAT('0x', substr(md5(source), 1, 2)) AS BIGINT) % 3 + 1 AS ne "
            "  FROM documents) "
            "SELECT doc_id, source, "
            "  CAST(unnest(generate_series(1, ne)) AS INT) AS epoch "
            "FROM d ORDER BY doc_id, epoch"
        ),
        "e40_array_functions": (
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) "
            "SELECT vec_id, round(sqrt(list_sum([x * x FOR x IN e])), 4) + 0.0 AS l2_norm, "
            "  round(list_min(e), 4) + 0.0 AS min_v, round(list_max(e), 4) + 0.0 AS max_v, "
            "  round(list_sum(e) / len(e), 4) + 0.0 AS mean_v, "
            "  CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_pos "
            "FROM v ORDER BY vec_id"
        ),
        "d24_targeted_delete": P(
            "SELECT unique_id, broker_id, location_key FROM index_metadata "
            "WHERE unique_id NOT IN "
            "('b0_m000000004', 'b1_m000000001', 'b3_m000000123') "
            "ORDER BY unique_id"
        ),
        "e37_mad_outliers": (
            "WITH t AS (SELECT source, len(string_split(text, ' '))::DOUBLE AS tc "
            "  FROM documents), "
            "m AS (SELECT source, quantile_cont(tc, 0.5) AS med FROM t GROUP BY source), "
            "d AS (SELECT t.source, tc, abs(tc - med) AS adev, med "
            "  FROM t JOIN m USING (source)), "
            "md AS (SELECT source, min(med) AS median_tc, "
            "  quantile_cont(adev, 0.5) AS mad_tc, count(*) AS n_docs "
            "  FROM d GROUP BY source), "
            "o AS (SELECT d.source, count(*) AS n_outliers FROM d "
            "  JOIN md ON d.source = md.source WHERE adev > 3 * mad_tc "
            "  GROUP BY d.source) "
            "SELECT md.source, median_tc, mad_tc, CAST(n_docs AS BIGINT) AS n_docs, "
            "  CAST(coalesce(n_outliers, 0) AS BIGINT) AS n_outliers "
            "FROM md LEFT JOIN o ON md.source = o.source ORDER BY md.source"
        ),
        # e37b: the tolerance check runs SPARK-side (empirical rank of the
        # approx statistic vs the GK error bound); the oracle pins group
        # keys, exact counts, and the guaranteed all-within-tolerance
        # outcome — a broken percentile_approx flips a boolean.
        "e37b_approx_percentile": (
            "SELECT source, count(*) AS n_docs, true AS median_within_tol, "
            "true AS mad_within_tol FROM documents GROUP BY source ORDER BY source"
        ),
        "a98_zipf_slope": (
            "WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS t "
            "  FROM documents), "
            "c AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2), "
            "r AS (SELECT source, c, "
            "  row_number() OVER (PARTITION BY source ORDER BY c DESC, t ASC) AS rank "
            "  FROM c QUALIFY rank <= 100) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_terms, "
            "  round(regr_slope(ln(c), ln(rank)), 4) AS zipf_slope "
            "FROM r GROUP BY source ORDER BY source"
        ),
        "a99_triangle_count": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            + _posting_pairs_cte()
            + "p AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.7), "
            "tri AS (SELECT p1.a, p1.b, p2.b AS c FROM p p1 "
            "  JOIN p p2 ON p1.b = p2.a "
            "  JOIN p p3 ON p1.a = p3.a AND p2.b = p3.b), "
            "nodes AS (SELECT a AS doc_id FROM tri UNION ALL "
            "  SELECT b FROM tri UNION ALL SELECT c FROM tri) "
            "SELECT doc_id, count(*) AS n_triangles FROM nodes "
            "GROUP BY doc_id ORDER BY doc_id"
        ),
        "e36_graph_bfs": (
            "WITH RECURSIVE pairs AS (SELECT DISTINCT o_custkey, l_suppkey "
            "  FROM orders JOIN lineitem ON o_orderkey = l_orderkey), "
            "edges AS (SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst FROM pairs "
            "  UNION ALL SELECT 's' || l_suppkey, 'c' || o_custkey FROM pairs), "
            "reach(node, d) AS ("
            "  SELECT 'c' || c_custkey, 0 FROM customer WHERE c_custkey <= 3 "
            "  UNION "
            "  SELECT e.dst, r.d + 1 FROM reach r JOIN edges e ON r.node = e.src "
            "  WHERE r.d < 3) "
            "SELECT node, CAST(min(d) AS INT) AS dist FROM reach GROUP BY node "
            "ORDER BY node"
        ),
    }


def _split_balance_oracle() -> str:
    """a87 = the a39 split map joined to per-doc token counts + the a75
    quality score, aggregated per split."""
    from persistor_spark.analytics.sampling import split_thresholds

    t0, t1 = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        "WITH sp AS (SELECT doc_id, CASE "
        f"  WHEN u < {t0!r} THEN 'train' "
        f"  WHEN u < {t1!r} THEN 'val' "
        "  ELSE 'test' END AS split "
        "  FROM (SELECT doc_id, "
        "    CAST(CONCAT('0x', substr(md5('42_' || doc_id), 1, 15)) AS BIGINT) "
        "      / 1152921504606846976.0 AS u FROM documents)), "
        "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "r AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, "
        "  round(((CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
        "    + least(len(list_distinct(toks))::DOUBLE / len(toks) * 2, 1.0) "
        "    + least(len(list_filter(toks, x -> list_contains("
        "        ['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
        "      / len(toks) * 10, 1.0)) / 3, 4) AS score FROM t) "
        "SELECT sp.split, count(*) AS n_docs, sum(r.n_tokens)::BIGINT AS n_tokens, "
        "  round(avg(r.score), 4) AS avg_score "
        "FROM r JOIN sp ON r.doc_id = sp.doc_id "
        "GROUP BY sp.split ORDER BY sp.split"
    )


def _curation_e2e_oracle() -> str:
    """a140 = the a13 quality+near-dup chain, then a20's 5-gram
    decontamination CTE, then a29's packing arithmetic over the CLEAN
    corpus, then a39's hash-interval split — composed verbatim from the
    stage oracles so each stage's SQL twin is the one already proven
    green stand-alone."""
    from persistor_spark.analytics.sampling import split_thresholds

    t0, t1 = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        "WITH RECURSIVE "
        "t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents), "
        "r AS (SELECT doc_id, source, toks, len(toks) AS token_count, "
        "  len(list_distinct(toks))::DOUBLE / len(toks) AS dtr, "
        "  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
        "    / len(toks) AS swr FROM t), "
        "scored AS (SELECT doc_id, source, toks, token_count, "
        "  round(((CASE WHEN token_count BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
        "    + least(dtr * 2, 1.0) + least(swr * 10, 1.0)) / 3, 4) AS quality_score FROM r), "
        "gated AS (SELECT * FROM scored WHERE quality_score >= 0.6), "
        + _posting_pairs_cte("gated")
        + "pairs AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
        "edges AS (SELECT a AS src, b AS dst FROM pairs "
        "  UNION SELECT b AS src, a AS dst FROM pairs), "
        "reach(src, dst) AS (SELECT src, dst FROM edges "
        "  UNION SELECT r2.src, e.dst FROM reach r2 JOIN edges e ON r2.dst = e.src), "
        "clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
        "  FROM reach GROUP BY src), "
        "losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id), "
        "kept AS (SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM losers)), "
        # decontamination: a20's gram CTE over ALL docs (eval side needs
        # grams for every %7==0 doc, gated or not)
        "g AS (SELECT doc_id, CASE WHEN len(toks) >= 5 THEN "
        "  list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]) "
        "  ELSE [] END AS grams FROM t), "
        "evg AS (SELECT DISTINCT unnest(grams) AS gm FROM g WHERE doc_id % 7 = 0), "
        "flagged AS (SELECT DISTINCT c.doc_id FROM "
        "  (SELECT doc_id, unnest(grams) AS gm FROM g WHERE doc_id % 7 <> 0) c "
        "  JOIN evg USING (gm)), "
        "clean AS (SELECT * FROM kept WHERE doc_id % 7 <> 0 "
        "  AND doc_id NOT IN (SELECT doc_id FROM flagged)), "
        # packing: a29's shard + cumsum arithmetic (::BIGINT casts per the
        # r2 HUGEINT lesson)
        "p AS (SELECT doc_id, source, quality_score, token_count, "
        "  CAST(CAST(CONCAT('0x', substr(md5(doc_id::VARCHAR), 1, 15)) AS BIGINT) "
        "    % 4 AS INT) AS shard FROM clean), "
        "c2 AS (SELECT *, sum(token_count) OVER (PARTITION BY shard ORDER BY doc_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM p), "
        "pk AS (SELECT doc_id, source, quality_score, token_count, "
        "  ((cum - 1) // 1024 - (cum - token_count) // 1024 + 1)::BIGINT AS spans FROM c2), "
        "sp AS (SELECT *, CASE "
        f"  WHEN u < {t0!r} THEN 'train' WHEN u < {t1!r} THEN 'val' "
        "  ELSE 'test' END AS split FROM "
        "  (SELECT pk.*, CAST(CONCAT('0x', substr(md5('42_' || doc_id), 1, 15)) AS BIGINT) "
        "    / 1152921504606846976.0 AS u FROM pk)) "
        "SELECT split, source, count(*) AS n_docs, sum(token_count)::BIGINT AS n_tokens, "
        "  sum(spans)::BIGINT AS total_spans, "
        "  round(sum(CAST(round(quality_score * 10000) AS BIGINT))::DOUBLE "
        "    / (count(*) * 10000.0), 4) AS avg_quality "
        "FROM sp GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _split_assign_oracle() -> str:
    """The a39 oracle embeds the EXACT cumulative thresholds assign_splits
    computes (running Python-float sums, repr round-trip) — re-deriving
    0.8+0.1 as the decimal 0.9 would misclassify rows whose hash lands in
    the one-ULP gap."""
    from persistor_spark.analytics.sampling import split_thresholds

    t0, t1 = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        "SELECT doc_id, CASE "
        f"WHEN u < {t0!r} THEN 'train' "
        f"WHEN u < {t1!r} THEN 'val' "
        "ELSE 'test' END AS split "
        "FROM (SELECT doc_id, "
        "  CAST(CONCAT('0x', substr(md5('42_' || doc_id), 1, 15)) AS BIGINT) "
        "    / 1152921504606846976.0 AS u FROM documents) "
        "ORDER BY doc_id"
    )


def _split_leakage_oracle() -> str:
    """a52 = the a2 pair detection joined against the a39 split map (both
    oracles reused verbatim), grouped by the canonical split pair."""
    from persistor_spark.analytics.sampling import split_thresholds

    t0, t1 = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        + _posting_pairs_cte()
        + "p AS (SELECT a, b FROM pc WHERE " + _PC_JRAW + " >= 0.8), "
        "sp AS (SELECT doc_id, CASE "
        f"  WHEN u < {t0!r} THEN 'train' "
        f"  WHEN u < {t1!r} THEN 'val' "
        "  ELSE 'test' END AS split "
        "  FROM (SELECT doc_id, "
        "    CAST(CONCAT('0x', substr(md5('42_' || doc_id), 1, 15)) AS BIGINT) "
        "      / 1152921504606846976.0 AS u FROM documents)), "
        "j AS (SELECT least(sa.split, sb.split) AS split_lo, "
        "    greatest(sa.split, sb.split) AS split_hi, "
        "    sa.split AS s_a, sb.split AS s_b "
        "  FROM p JOIN sp sa ON p.a = sa.doc_id JOIN sp sb ON p.b = sb.doc_id) "
        "SELECT split_lo, split_hi, count(*) AS n_pairs, "
        "  count(*) FILTER (WHERE s_a <> s_b) AS n_cross "
        "FROM j GROUP BY split_lo, split_hi ORDER BY split_lo, split_hi"
    )


_BRUTE_TOPK_ORACLE = (
    # exact cosine top-5 for queries vec_id < 10 over the raw fixture — the
    # a5 oracle shape, shared by every ANN op whose candidate set covers the
    # true top-k (their exact re-rank then reproduces this row-for-row)
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
    "q AS (SELECT vec_id AS qid, emb AS qv FROM v WHERE vec_id < 10), "
    "s AS (SELECT q.qid AS query_id, v.vec_id, "
    "  round(list_dot_product(q.qv, v.emb) / "
    "    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cos "
    "  FROM q CROSS JOIN v WHERE v.vec_id <> q.qid) "
    "SELECT query_id, vec_id, cos, rank FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM s) "
    "WHERE rank <= 5 ORDER BY query_id, rank"
)

_CMS_GRID_ORACLE = (
    "WITH terms AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents), "
    "cells AS (SELECT r.r AS row, "
    "  CAST(CONCAT('0x', substr(md5(concat(r.r, ':', term)), 1, 15)) AS BIGINT) % 64 AS bucket "
    "  FROM terms, range(0, 4) r(r)) "
    "SELECT CAST(row AS INT) AS row, CAST(bucket AS INT) AS bucket, "
    "count(*) AS cnt FROM cells GROUP BY 1, 2 ORDER BY 1, 2"
)

def _posting_pairs_cte(src: str = "t") -> str:
    """EXACT posting-join pair enumeration for the a2-family oracles,
    mirroring the Spark plan (dedup.ngram_jaccard_pairs): explode each
    doc's DISTINCT shingles, self-join the postings on the shingle
    (a < b), count matches -> |A∩B| exactly; any pair at J >= t > 0
    shares a shingle, so the rows are IDENTICAL to the all-pairs
    list_intersect form these oracles previously used — at posting-list
    cost instead of n² (the all-pairs a106 twin was the sf0.1 tier's
    ~100-minute long pole; r13 VERDICT #5).  Emits CTEs s/po/pc over
    `src`(doc_id, toks); callers build `p` from pc with their threshold
    via _PC_JRAW.  Ends with a trailing comma."""
    return (
        "s AS (SELECT doc_id, "
        "  list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]) AS sh "
        f"  FROM {src}), "
        "po AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g0 FROM s), "
        "pc AS (SELECT x.doc_id AS a, y.doc_id AS b, x.n AS an, y.n AS bn, "
        "    count(*) AS inter "
        "  FROM po x JOIN po y ON x.g0 = y.g0 AND x.doc_id < y.doc_id "
        "  GROUP BY x.doc_id, y.doc_id, x.n, y.n), "
    )


# the unrounded Jaccard over pc's exact counters — spelled once so every
# consumer filters/rounds the same expression
_PC_JRAW = "inter::DOUBLE / (an + bn - inter)"


_INCR_DEDUP_ORACLE = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    + _posting_pairs_cte()
    + "p AS (SELECT a, b, round(" + _PC_JRAW + ", 3) AS jaccard FROM pc "
    "  WHERE (a % 2) <> (b % 2) AND " + _PC_JRAW + " >= 0.8) "
    "SELECT CASE WHEN a % 2 = 1 THEN a ELSE b END AS new_id, "
    "  CASE WHEN a % 2 = 1 THEN b ELSE a END AS old_id, jaccard "
    "FROM p ORDER BY new_id, old_id"
)

# a32/a34/a55/a60: the d46 threshold shape — the driver-stable claim is
# the pinned query keys, the exact result count, and the guaranteed
# recall-threshold booleans (the recall computation runs Spark-side vs
# brute force; the floors carry wide margin at every SF — see each
# entry's docstring for the measured min/mean per SF)
_ANN_THRESHOLD_ORACLE = (
    "SELECT vec_id AS query_id, CAST(5 AS INT) AS k, "
    "CAST(5 AS BIGINT) AS n_results, true AS recall_ok, true AS mean_ok "
    "FROM embeddings WHERE vec_id < 10 ORDER BY query_id"
)

_CLUSTERED_TOPK_ORACLE = (
    # same shape over the clustered corpus: +10.0 on the label-th axis
    # (DuckDB is 1-based, Spark's transform index 0-based -> i = label + 1)
    "WITH v AS (SELECT vec_id, "
    "  [embedding[i]::DOUBLE + CASE WHEN i = label + 1 THEN 10.0 ELSE 0.0 END "
    "   FOR i IN range(1, len(embedding) + 1)] AS emb FROM embeddings), "
    "q AS (SELECT vec_id AS qid, emb AS qv FROM v WHERE vec_id < 10), "
    "s AS (SELECT q.qid AS query_id, v.vec_id, "
    "  round(list_dot_product(q.qv, v.emb) / "
    "    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cos "
    "  FROM q CROSS JOIN v WHERE v.vec_id <> q.qid) "
    "SELECT query_id, vec_id, cos, rank FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM s) "
    "WHERE rank <= 5 ORDER BY query_id, rank"
)

# a69: the same brute force restricted to the SELECTOR subset (vec_id % 3 = 0)
_FILTERED_TOPK_ORACLE = (
    "WITH v AS (SELECT vec_id, "
    "  [embedding[i]::DOUBLE + CASE WHEN i = label + 1 THEN 10.0 ELSE 0.0 END "
    "   FOR i IN range(1, len(embedding) + 1)] AS emb FROM embeddings), "
    "q AS (SELECT vec_id AS qid, emb AS qv FROM v WHERE vec_id < 10), "
    "f AS (SELECT * FROM v WHERE vec_id % 3 = 0), "
    "s AS (SELECT q.qid AS query_id, f.vec_id, "
    "  round(list_dot_product(q.qv, f.emb) / "
    "    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(f.emb, f.emb))), 4) AS cos "
    "  FROM q CROSS JOIN f WHERE f.vec_id <> q.qid) "
    "SELECT query_id, vec_id, cos, rank FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM s) "
    "WHERE rank <= 5 ORDER BY query_id, rank"
)

_JACCARD_ORACLE = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    + _posting_pairs_cte()
    + "p AS (SELECT a, b, round(" + _PC_JRAW + ", 3) AS jaccard FROM pc "
    "  WHERE " + _PC_JRAW + " >= 0.8) "
    "SELECT a, b, jaccard FROM p ORDER BY a, b"
)

_TEXT_STATS_ORACLE = (
    "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
    "r AS (SELECT doc_id, text, len(toks) AS token_count, "
    "  len(list_distinct(toks))::DOUBLE / len(toks) AS dtr, "
    "  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','on'], x)))::DOUBLE "
    "    / len(toks) AS swr, "
    "  list_distinct(toks) AS dtoks FROM t) "
    "SELECT doc_id, token_count, round(dtr, 4) AS distinct_token_ratio, "
    "  round(swr, 4) AS stopword_ratio, "
    "  round(((CASE WHEN token_count BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) "
    "    + least(dtr * 2, 1.0) + least(swr * 10, 1.0)) / 3, 4) AS quality_score, "
    "  CASE "
    "    WHEN len(list_intersect(dtoks, ['le','la','et','les'])) >= 2 THEN 'fr' "
    "    WHEN len(list_intersect(dtoks, ['der','die','und','das'])) >= 2 THEN 'de' "
    "    WHEN len(list_intersect(dtoks, ['el','los','las','una'])) >= 2 THEN 'es' "
    "    WHEN len(list_intersect(dtoks, ['the','and','of','to'])) >= 2 THEN 'en' "
    "    ELSE 'und' END AS detected_lang, "
    "  md5(lower(text)) AS fingerprint "
    "FROM r ORDER BY doc_id"
)
