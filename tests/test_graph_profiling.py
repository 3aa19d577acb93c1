"""PageRank, key-skew profiling, centroid drift, quality funnel — semantic
invariants plus the plan shapes the scale story depends on."""

import pytest
from pyspark.sql import functions as F

from persistor_spark.analytics import graph, profiling, similarity, text
from persistor_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    return graph.bipartite_interaction_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).cache()


def test_edges_are_symmetric(edges):
    fwd = {(r.src, r.dst) for r in edges.collect()}
    assert fwd == {(d, s) for s, d in fwd}
    # bipartite: customers only link to suppliers
    assert all(s[0] != d[0] for s, d in fwd)


def test_pagerank_mass_conserved_and_positive(edges):
    """On a symmetric graph with no dangling nodes total rank mass stays 1
    (up to rounding) and every node gets >= (1-d)/N."""
    pr = graph.pagerank(edges, iterations=3)
    rows = pr.collect()
    n = len(rows)
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(r["rank"] >= (1 - 0.85) / n - 1e-9 for r in rows)
    # higher-degree nodes outrank the minimum floor
    assert max(r["rank"] for r in rows) > min(r["rank"] for r in rows)


def test_pagerank_uniform_on_regular_graph(spark):
    """A 4-cycle is 2-regular: PageRank must be exactly uniform."""
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    sym = e + [(b, a) for a, b in e]
    df = spark.createDataFrame(sym, "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in graph.pagerank(df, iterations=4).collect()}
    assert set(ranks) == {"a", "b", "c", "d"}
    assert all(abs(v - 0.25) < 1e-9 for v in ranks.values())


def test_skew_profile_stats(spark):
    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    prof = profiling.key_skew_profile(df, "k", top_n=3).collect()
    assert len(prof) == 3
    top = prof[0]
    assert top["key"] == "hot" and top["n_rows"] == 90
    assert top["total_rows"] == 100 and top["n_keys"] == 11
    assert top["max_share"] == 0.9
    # skew factor = max / mean = 90 / (100/11)
    assert abs(top["skew_factor"] - 90 / (100 / 11)) < 1e-3
    # ties below the hot key break by key ascending
    assert [p["key"] for p in prof[1:]] == ["k0", "k1"]


def test_skew_profile_no_cartesian(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k int")
    plan = profiling.key_skew_profile(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_centroid_drift_self_similarity(spark):
    """Two identical groups => cos 1.0; orthogonal groups => cos 0.0."""
    rows = (
        [(i, [1.0, 0.0, float(i % 3)], 0) for i in range(6)]
        + [(10 + i, [1.0, 0.0, float(i % 3)], 1) for i in range(6)]
        + [(20 + i, [0.0, 1.0, 0.0], 2) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r.label_a, r.label_b): r.cos for r in similarity.centroid_drift(df).collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 2)] < out[(0, 1)]


def test_quality_funnel_monotone(docs_funnel):
    rows = docs_funnel
    assert [r["stage"] for r in rows] == [1, 2, 3, 4, 5]
    # each stage enters with the previous stage's survivors
    for prev, cur in zip(rows, rows[1:]):
        assert cur["entered"] == prev["survivors"]
    assert all(r["dropped"] == r["entered"] - r["survivors"] for r in rows)
    assert all(r["survivors"] <= r["entered"] for r in rows)


@pytest.fixture(scope="module")
def docs_funnel(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_funnel(docs).collect()


def test_quality_funnel_single_scan(spark, sf_dir):
    """The funnel is ONE aggregation pass: exactly one scan of the input in
    the physical plan, not one per stage."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        text.quality_funnel(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


def test_unigram_kl_zero_for_identical_distribution(spark):
    """Two sources with the same token distribution => KL 0 for both."""
    rows = [(1, "a b c", "s1"), (2, "a b c", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r["kl_vs_corpus"] for r in text.unigram_kl_by_source(df).collect()}
    assert out == {"s1": 0.0, "s2": 0.0}


def test_unigram_kl_positive_for_shifted_source(spark):
    rows = [(1, "a a a a", "skewed"), (2, "a b c d", "mixed")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r["kl_vs_corpus"] for r in text.unigram_kl_by_source(df).collect()}
    assert out["skewed"] > 0 and out["mixed"] > 0


def test_dataset_card_counts(spark):
    rows = [
        (1, "the a and of to in is on good text here now", "web", "en"),
        (2, "the a and of to in is on good text here now", "web", "en"),  # exact dup
        (3, "the a and of to in is on other words too yes", "books", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    card = profiling.dataset_card(df).collect()[0]
    assert card["n_docs"] == 3 and card["n_sources"] == 2 and card["n_langs"] == 1
    assert card["n_distinct_texts"] == 2
    assert abs(card["dup_rate"] - 1 / 3) < 1e-4
    assert card["total_tokens"] == 36


def test_temperature_sample_targets_and_determinism(spark):
    from persistor_spark.analytics import sampling

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_sample(df, total_n=50, alpha=0.3, seed=7)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # alpha<1 up-weights the small source vs proportional (which would be 5)
    assert len(by_src["small"]) > 5
    assert len(by_src["small"]) <= 10  # capped by availability
    # deterministic: same seed -> same ids
    again = sampling.temperature_sample(df, total_n=50, alpha=0.3, seed=7).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in got)


def test_decontaminate_removes_flagged_docs(spark, sf_dir):
    from persistor_spark.analytics import dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    eval_df = docs.filter(F.col("doc_id") % 7 == 0)
    flagged = {
        r["corpus_id"]
        for r in dedup.ngram_contamination(corpus, eval_df, n=5).select("corpus_id").collect()
    }
    clean_ids = {r["doc_id"] for r in dedup.decontaminate(corpus, eval_df, n=5).select("doc_id").collect()}
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert clean_ids == corpus_ids - flagged
    assert flagged  # the fixture plants contamination; the test is non-vacuous


def test_lsh_index_roundtrip_and_append(spark, sf_dir, tmp_path):
    from persistor_spark.analytics import dedup

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "lsh")
    bt = dedup.build_band_table(old)
    dedup.lsh_index_save(bt, path)
    loaded = dedup.lsh_index_load(spark, path)
    # identical probe results through the disk round-trip
    mem = {(r.new_id, r.old_id) for r in dedup.incremental_dup_pairs(new, bt, 0.8).collect()}
    dsk = {(r.new_id, r.old_id) for r in dedup.incremental_dup_pairs(new, loaded, 0.8).collect()}
    assert mem == dsk and mem
    # appending a batch grows the band partitions in place
    batch = new.limit(20)
    dedup.lsh_index_append(spark, path, batch)
    grown = dedup.lsh_index_load(spark, path)
    assert grown.count() == loaded.count() + dedup.build_band_table(batch).count()


def test_snapshot_diff_statuses(spark):
    from persistor_spark.analytics import profiling

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "doc_id long, text string"
    )
    got = {r["id"]: r["status"] for r in profiling.snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    """Append-heavy band partitions compact into few files with identical
    contents — the periodic maintenance for lsh_index_append /
    ivfpq_add_to_disk layouts."""
    from persistor_spark.analytics import dedup
    from persistor_spark.plans import maintenance

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "lsh")
    dedup.lsh_index_save(dedup.build_band_table(docs.filter(F.col("doc_id") % 2 == 0)), path)
    # three appended batches -> many small files per band
    for i in range(3):
        dedup.lsh_index_append(
            spark, path, docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 == i))
        )
    before = dedup.lsh_index_load(spark, path)
    rows_before = sorted(
        (r["id"], r["band"], r["bh"]) for r in before.select("id", "band", "bh").collect()
    )
    stats = maintenance.compact_parquet(spark, path, partition_col="band")
    assert stats["files_after"] < stats["files_before"]
    after = dedup.lsh_index_load(spark, path)
    rows_after = sorted(
        (r["id"], r["band"], r["bh"]) for r in after.select("id", "band", "bh").collect()
    )
    assert rows_after == rows_before
    assert stats["rows"] == len(rows_before)


def test_grouped_split_keeps_near_dups_together(spark, sf_dir):
    """Leakage-safe splitting: every near-dup pair must land in the SAME
    split when keyed by component (the a52 audit finds zero cross-split
    near-dup pairs by construction)."""
    from persistor_spark.analytics import dedup, sampling

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, 0.8)
    comp = dedup.dedup_clusters(pairs)
    grouped = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("group_key")
    )
    out = sampling.assign_splits(
        grouped, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42, id_col="group_key"
    )
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    got_pairs = [(r["a"], r["b"]) for r in pairs.collect()]
    assert got_pairs
    assert all(split_of[a] == split_of[b] for a, b in got_pairs)


def test_compact_parquet_defers_trash_to_next_cycle(spark, tmp_path):
    """The displaced layout survives the compaction that displaced it (a
    concurrent scan that listed the old files can still open them) and is
    swept by the NEXT compaction of the same path."""
    import glob

    from persistor_spark.plans import maintenance

    path = str(tmp_path / "ds")
    spark.range(100).withColumn("p", F.col("id") % 4).write.partitionBy("p").parquet(path)
    for i in range(3):
        spark.range(100 * (i + 2), 100 * (i + 2) + 10).withColumn(
            "p", F.col("id") % 4
        ).write.mode("append").partitionBy("p").parquet(path)

    stats1 = maintenance.compact_parquet(spark, path, partition_col="p")
    assert stats1["trash_swept"] == 0
    trash = glob.glob(f"{path}.__trash_*")
    assert len(trash) == 1  # old layout parked, not deleted
    # the parked copy is still a readable snapshot of the OLD layout
    assert spark.read.parquet(trash[0]).count() == 130

    stats2 = maintenance.compact_parquet(spark, path, partition_col="p")
    assert stats2["trash_swept"] == 1
    assert glob.glob(f"{path}.__trash_*") != trash  # old trash gone, new parked
    # rows always intact through both swaps
    assert spark.read.parquet(path).count() == 130

    # the no-concurrent-readers escape hatch removes its own trash
    maintenance.sweep_trash(spark, path)
    stats3 = maintenance.compact_parquet(spark, path, partition_col="p", drop_trash_now=True)
    assert glob.glob(f"{path}.__trash_*") == []
    assert stats3["rows"] == 130


def test_bfs_distances_exact_minima_and_depth_bound(spark):
    # path graph a-b-c-d-e (symmetric) plus an isolated island x-y
    undirected = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    edges = spark.createDataFrame(
        [(s, d) for s, d in undirected] + [(d, s) for s, d in undirected],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in graph.bfs_distances(edges, seeds, 3).collect()}
    # exact hop minima; e is 4 hops away -> absent; island unreachable
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # multi-source: min over seeds, and a seeded node keeps dist 0
    seeds2 = spark.createDataFrame([("a",), ("e",)], "node string")
    got2 = {r["node"]: r["dist"] for r in graph.bfs_distances(edges, seeds2, 3).collect()}
    assert got2 == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}
    # a cycle must not re-lengthen distances (first reach wins)
    tri = [("p", "q"), ("q", "r"), ("r", "p")]
    edges3 = spark.createDataFrame(
        [(s, d) for s, d in tri] + [(d, s) for s, d in tri], "src string, dst string"
    )
    got3 = {
        r["node"]: r["dist"]
        for r in graph.bfs_distances(
            edges3, spark.createDataFrame([("p",)], "node string"), 3
        ).collect()
    }
    assert got3 == {"p": 0, "q": 1, "r": 1}


def test_tfidf_cosine_pairs_duplicates_and_max_df_cap(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),          # exact dup of 1 -> cos 1.0
        (3, "epsilon zeta eta theta"),          # disjoint from 1/2
        (4, "alpha beta gamma epsilon"),        # partial overlap with 1/2
        (5, "iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r["a"], r["b"]): r["cos"] for r in similarity.tfidf_cosine_pairs(df, 0.5).collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) not in got and (2, 3) not in got
    # universal terms are dropped by the df*2 <= N cap: with 'alpha' in 3
    # of 5 docs it survives, but a term in ALL docs must not join
    rows2 = [(i, f"common unique{i}") for i in range(1, 7)]
    df2 = spark.createDataFrame(rows2, "doc_id int, text string")
    # 'common' has df=6 > 6/2 -> dropped; remaining vectors are disjoint
    assert similarity.tfidf_cosine_pairs(df2, 0.1).count() == 0


def test_delete_by_key_rewrites_only_manifest_affected_files(spark, tmp_path):
    """The GDPR-delete contract: rows gone, and files whose manifest range
    cannot contain a key are NOT rewritten (same inode/content on disk)."""
    import glob
    import os

    from persistor_spark.plans import layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(1000).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 7).alias("payload"),
    )
    df.repartitionByRange(8, "unique_id").sortWithinPartitions("unique_id").write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)
    before = {f: os.stat(f).st_ino for f in glob.glob(f"{table}/part-*.parquet")}
    assert len(before) == 8

    # two victims in adjacent id space -> land in few files
    stats = maintenance.delete_by_key(spark, table, mf, ["id000010", "id000020"])
    assert stats["files_total"] == 8
    assert stats["rows_deleted"] == 2
    assert 1 <= stats["files_rewritten"] <= 2

    after = spark.read.parquet(table)
    assert after.count() == 998
    assert after.filter(F.col("unique_id").isin("id000010", "id000020")).count() == 0
    # untouched files survive byte-for-byte (same inode)
    untouched = [f for f in glob.glob(f"{table}/part-*.parquet") if f in before]
    assert len(untouched) == 8 - stats["files_rewritten"]
    assert all(os.stat(f).st_ino == before[f] for f in untouched)
    # the rebuilt manifest still serves pruned point lookups
    rows = layout.load_manifest(spark, mf)
    hit = layout.manifest_pruned_scan_cached(spark, table, rows, ["id000011"])
    assert hit.count() == 1
    # a delete with no manifest hit rewrites nothing
    stats2 = maintenance.delete_by_key(spark, table, mf, ["zzz999999"])
    assert stats2["files_rewritten"] == 0 and stats2["rows_deleted"] == 0
    # a clean run leaves no journal behind
    assert glob.glob(f"{table}.__delete_journal_*.json") == []


def test_delete_by_key_crash_recovery(spark, tmp_path):
    """r6 ADVICE: a crash after the rewritten del-* files move in but
    before the originals are removed must leave a resumable journal, and
    recover_pending_deletes must finish the swap (no duplicate rows, no
    stale manifest, journal gone)."""
    import glob
    import json
    import os

    from persistor_spark.plans import layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(200).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 7).alias("payload"),
    )
    df.repartitionByRange(4, "unique_id").sortWithinPartitions("unique_id").write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)

    # simulate the crash window: run a real delete, then RESTORE one
    # original file from a pre-delete copy and re-create its journal —
    # exactly the on-disk state of a crash before os.remove(original)
    originals = sorted(glob.glob(f"{table}/part-*.parquet"))
    backup = {f: open(f, "rb").read() for f in originals}
    maintenance.delete_by_key(spark, table, mf, ["id000010"])
    victim = [f for f in originals if not os.path.exists(f)]
    assert victim, "delete should have removed at least one original"
    for f in victim:
        with open(f, "wb") as fh:
            fh.write(backup[f])
    journal = f"{table}.__delete_journal_deadbeef.json"
    with open(journal, "w") as fh:
        json.dump({"remove": victim, "manifest": mf, "col": "unique_id"}, fh)
    # crash state: duplicated rows are visible (old + rewritten file)
    assert spark.read.parquet(table).count() > 199

    stats = maintenance.recover_pending_deletes(spark, table)
    assert stats["journals"] == 1 and stats["files_removed"] == len(victim)
    after = spark.read.parquet(table)
    assert after.count() == 199
    assert after.filter(F.col("unique_id") == "id000010").count() == 0
    assert glob.glob(f"{table}.__delete_journal_*.json") == []
    # manifest rebuilt over the recovered layout still prunes correctly
    rows = layout.load_manifest(spark, mf)
    assert layout.manifest_pruned_scan_cached(spark, table, rows, ["id000011"]).count() == 1
    # idempotent: a second recovery pass is a no-op
    assert maintenance.recover_pending_deletes(spark, table) == {
        "journals": 0, "files_removed": 0,
    }


def test_delete_by_key_crash_before_moves_loses_nothing(spark, tmp_path, monkeypatch):
    """The OTHER crash window: journal written, rewritten files still in
    tmp, NO moves executed.  Recovery must FINISH the swap (move the
    replacements in first) — a recovery that only deleted the journaled
    originals would destroy the only live copy of every surviving row in
    the affected files."""
    import glob

    from persistor_spark.plans import layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(200).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 7).alias("payload"),
    )
    df.repartitionByRange(4, "unique_id").sortWithinPartitions("unique_id").write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)

    def crash(*a, **k):
        raise RuntimeError("simulated crash before the move-in loop")

    monkeypatch.setattr(maintenance, "_replay_delete_plan", crash)
    with pytest.raises(RuntimeError):
        maintenance.delete_by_key(spark, table, mf, ["id000010"])
    monkeypatch.undo()

    # crash state: table untouched, journal + populated tmp dir present
    assert spark.read.parquet(table).count() == 200
    assert glob.glob(f"{table}.__delete_journal_*.json")
    assert glob.glob(f"{table}.__delete_*/part-*.parquet")

    stats = maintenance.recover_pending_deletes(spark, table)
    assert stats["journals"] == 1
    after = spark.read.parquet(table)
    # the deleted key is gone AND every surviving row still exists exactly once
    assert after.count() == 199
    assert after.select("unique_id").distinct().count() == 199
    assert after.filter(F.col("unique_id") == "id000010").count() == 0
    # journal consumed, tmp dir cleaned up, nothing left to recover
    assert glob.glob(f"{table}.__delete_journal_*.json") == []
    assert glob.glob(f"{table}.__delete_*") == []
    assert maintenance.recover_pending_deletes(spark, table) == {
        "journals": 0, "files_removed": 0,
    }


def test_compact_swap_never_deletes_before_replacement(spark, tmp_path):
    """layout.compact's swap goes old->trash, new->live (never delete-live-
    then-rename): the data must exist under SOME name at every step.  The
    trash is DEFERRED to the next compact cycle (deleting immediately would
    yank files from under a concurrent scan) and uses the shared
    `.__trash_` convention, so the next call sweeps it."""
    from persistor_spark.plans import layout

    path = str(tmp_path / "ds")
    spark.range(1000).selectExpr("id", "id % 13 as k").repartition(8).write.parquet(path)
    n = layout.compact(spark, path, target_file_bytes=1 << 30, sort_col="id")
    assert n == 1
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) == 1
    assert spark.read.parquet(path).count() == 1000
    # this cycle's trash survives for in-flight readers...
    first_trash = glob.glob(f"{path}.__trash_*")
    assert len(first_trash) == 1
    # ...and the NEXT cycle sweeps it
    layout.compact(spark, path, target_file_bytes=1 << 30, sort_col="id")
    remaining = glob.glob(f"{path}.__trash_*")
    assert first_trash[0] not in remaining and len(remaining) == 1
    assert spark.read.parquet(path).count() == 1000


def test_incremental_manifest_update_matches_full_rebuild(spark, tmp_path):
    """delete_by_key's manifest maintenance is incremental (only the
    rewritten files are rescanned); the resulting manifest must be
    row-for-row identical to a full rebuild over the final layout."""
    from persistor_spark.plans import layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(400).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 5).alias("payload"),
    )
    df.repartitionByRange(8, "unique_id").sortWithinPartitions("unique_id").write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)

    st = maintenance.delete_by_key(spark, table, mf, ["id000010", "id000350"])
    assert st["rows_deleted"] == 2 and 1 <= st["files_rewritten"] <= 2

    incremental = sorted(layout.load_manifest(spark, mf))
    mf2 = str(tmp_path / "mf_full")
    layout.write_minmax_manifest(spark, table, mf2)
    full = sorted(layout.load_manifest(spark, mf2))
    assert incremental == full
    # and the updated manifest still prunes point lookups correctly
    hit = layout.manifest_pruned_scan_cached(spark, table, incremental, ["id000011"])
    assert hit.count() == 1
    assert layout.manifest_pruned_scan_cached(spark, table, incremental, ["id000010"]).count() == 0


def test_compact_parquet_splits_hot_partition_values(spark, tmp_path):
    """With partition_col, hashing on the column alone gives ONE file per
    value however large; the salted repartition must split a hot value
    into ~ceil(rows/target) files."""
    from persistor_spark.plans import maintenance

    path = str(tmp_path / "bands")
    df = spark.range(10_000).selectExpr("id", "cast(id % 2 as int) as band")
    # fragment: 8 small appends
    for i in range(8):
        df.filter(F.col("id") % 8 == i).write.mode("append").partitionBy("band").parquet(path)
    stats = maintenance.compact_parquet(
        spark, path, target_rows_per_file=1000, partition_col="band",
        drop_trash_now=True,
    )
    assert stats["rows"] == 10_000
    import glob

    per_dir = [len(glob.glob(f"{d}/part-*.parquet")) for d in glob.glob(f"{path}/band=*")]
    # each band has 5000 rows -> ~5 files at 1000/target (hash-collision
    # merges allowed, single-file-per-value is the failure mode)
    assert all(n >= 3 for n in per_dir), per_dir
    assert spark.read.parquet(path).count() == 10_000


def test_delete_by_key_replays_pending_journal_first(spark, tmp_path, monkeypatch):
    """A crashed delete A must be replayed BEFORE a later delete B plans —
    otherwise A's eventual replay moves A's tmp files in and resurrects
    rows B deleted."""
    import glob

    from persistor_spark.plans import layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(300).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 3).alias("payload"),
    )
    df.repartitionByRange(4, "unique_id").sortWithinPartitions("unique_id").write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)

    # delete A crashes before its move-in
    def crash(*a, **k):
        raise RuntimeError("crash A")

    real = maintenance._replay_delete_plan
    monkeypatch.setattr(maintenance, "_replay_delete_plan", crash)
    with pytest.raises(RuntimeError):
        maintenance.delete_by_key(spark, table, mf, ["id000010"])
    monkeypatch.setattr(maintenance, "_replay_delete_plan", real)
    assert glob.glob(f"{table}.__delete_journal_*.json")

    # delete B runs normally; it must replay A first
    maintenance.delete_by_key(spark, table, mf, ["id000011"])
    after = spark.read.parquet(table)
    assert after.count() == 298
    assert after.filter(F.col("unique_id").isin("id000010", "id000011")).count() == 0
    assert glob.glob(f"{table}.__delete_journal_*.json") == []
    # and nothing resurrects on a further recovery pass
    maintenance.recover_pending_deletes(spark, table)
    assert spark.read.parquet(table).count() == 298


def test_manifest_swap_heals_after_mid_rename_crash(spark, tmp_path):
    """Crash between update_minmax_manifest's two renames leaves the
    manifest only under __upd_/__upd_trash_ names; _heal_manifest_swap must
    restore it (preferring the fully-written update) and sweep leftovers."""
    import glob
    import os

    from persistor_spark.plans import layout

    table, mf = str(tmp_path / "t"), str(tmp_path / "mf")
    spark.range(100).selectExpr("format_string('id%03d', id) as unique_id").write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)
    rows_before = sorted(layout.load_manifest(spark, mf))

    # simulate the crash window: the new manifest sits at __upd_, the old
    # one was renamed to __upd_trash_, nothing at the live name
    os.rename(mf, f"{mf}__upd_trash_dead")
    import shutil

    shutil.copytree(f"{mf}__upd_trash_dead", f"{mf}__upd_beef")
    layout._heal_manifest_swap(spark, mf)
    assert sorted(layout.load_manifest(spark, mf)) == rows_before
    assert glob.glob(f"{mf}__upd_*") == []


def test_ks_pairs_preserves_group_dtype_and_null_symmetry(spark):
    """r9 advisor: the pair list used to be a hardcoded-string literal
    DataFrame, so an int group column failed or silently miscompared
    after coercion.  Pairs now come from a self-join on the sizes frame:
    the group dtype is preserved end-to-end and NULL groups drop
    symmetrically (they form no pair at all)."""
    from persistor_spark.analytics import profiling

    rows = (
        [(1, float(v)) for v in range(10)]
        + [(2, float(v) + 5.0) for v in range(10)]
        + [(None, 999.0)]
    )
    df = spark.createDataFrame(rows, "seg int, v double")
    out = profiling.ks_two_sample_pairs(df, "v", "seg")
    got = out.collect()
    assert len(got) == 1  # NULL group forms no pair, (1,2) is the only pair
    r = got[0]
    assert r["group_a"] == 1 and r["group_b"] == 2  # ints in, ints out
    assert r["n_a"] == 10 and r["n_b"] == 10
    # identical-up-to-shift distributions: D = shift/10 = 0.5 exactly
    assert abs(r["ks_stat"] - 0.5) < 1e-9
    # string groups still work identically (the pinned-oracle path)
    df2 = spark.createDataFrame(
        [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)],
        "seg string, v double",
    )
    r2 = profiling.ks_two_sample_pairs(df2, "v", "seg").collect()[0]
    assert r2["group_a"] == "a" and r2["ks_stat"] == 0.0


def test_recover_swap_heals_crashed_compaction(spark, tmp_path):
    """r11 self-audit: a compaction swap crashed between its two renames
    leaves the LIVE path missing — the receiver recovers its own dirs,
    but any OTHER compacted layout (the persisted LSH index here) was
    unreadable until manual repair.  maintenance.recover_swap restores
    the complete pruned copy (preferred) or the displaced original, the
    load paths call it, and compact_parquet itself heals + clears stale
    orphans so at most one in-flight copy ever exists."""
    import glob
    import os
    import shutil

    from persistor_spark.analytics import dedup
    from persistor_spark.plans import maintenance

    docs = spark.createDataFrame(
        [(i, f"text piece number {i} with some shared shingle mass") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lsh")
    dedup.lsh_index_save(dedup.build_band_table(docs), path)

    def _rows():
        # (id, band) uniquely keys an index row; `sh` is NULL outside
        # band 0 (the slim persisted layout), so bare tuple sort would
        # compare None with list
        return sorted(
            (tuple(r) for r in dedup.lsh_index_load(spark, path).collect()),
            key=lambda t: (t[0], t[2]),
        )

    want = _rows()

    # crash window arm 1: pruned copy complete, live renamed away
    shutil.copytree(path, f"{path}.__compact_simcrash")
    os.rename(path, f"{path}.__trash_simcrash")
    assert _rows() == want, "load did not heal the crashed swap"
    assert os.path.isdir(path)

    # crash window arm 2: only the displaced original remains
    os.rename(path, f"{path}.__trash_simcrash2")
    assert maintenance.recover_swap(spark, path) == "trash"
    assert _rows() == want

    # orphan invariant: a stale complete copy beside an INTACT live dir is
    # cleared by the next compaction, so a later recovery can never
    # restore it over fresher data
    shutil.copytree(path, f"{path}.__compact_stale")
    maintenance.compact_parquet(spark, path, partition_col="band")
    assert not glob.glob(f"{path}.__compact_*"), "stale orphan survived"
    assert _rows() == want


def test_swap_tag_sorts_temporally_and_beats_legacy(spark):
    """r11 ADVICE: recover_swap picked the 'newest' copy by lexicographic
    sort of uuid-hex suffixes — random, not temporal.  swap_tag embeds a
    `t` sentinel + fixed-width nanosecond timestamp first, so plain sort
    IS creation order, and any legacy 8-hex suffix sorts before every
    tagged name (`t` > any hex char — a tagged copy always outranks a
    pre-migration leftover)."""
    from persistor_spark.plans import maintenance

    a = maintenance.swap_tag()
    b = maintenance.swap_tag()
    assert a < b, "later swap_tag must sort after an earlier one"
    legacy = ["deadbeef", "00c0ffee", "ffffffff"]
    assert all(leg < a for leg in legacy), (
        "legacy uuid-only suffixes must lose the newest-copy sort to any "
        "tagged name"
    )


def test_recover_swap_prefers_temporally_newest_copy(spark, tmp_path):
    """Two __compact_ copies where the OLDER one would win a naive hex
    sort (its nonce is lexicographically larger): recovery must restore
    the temporally newer copy — the timestamp decides, not the nonce."""
    import os

    from persistor_spark.plans import maintenance

    path = str(tmp_path / "tbl")
    spark.range(5).withColumn("v", F.lit("new")).write.parquet(path)
    newer = f"{path}.__compact_{maintenance.swap_tag()}"
    os.rename(path, newer)
    # forge an OLDER tag with a lexicographically huge nonce
    ts = int(newer.rsplit("__compact_t", 1)[1].split("_")[0])
    older = f"{path}.__compact_t{ts - 1_000_000:020d}_ffffffff"
    spark.range(5).withColumn("v", F.lit("stale")).write.parquet(older)
    assert maintenance.recover_swap(spark, path) == "compact"
    assert spark.read.parquet(path).select("v").distinct().collect()[0][0] == "new"


def test_claim_rename_detects_lost_race_and_unnests(spark, tmp_path):
    """Hadoop rename onto an EXISTING directory nests the source inside it
    instead of failing — two unlocked heal-on-read recoverers racing the
    exists()->rename window could corrupt the restored layout that way.
    _claim_rename must detect the nested arm, undo it, and report the
    race as lost (r11 ADVICE)."""
    import os

    from persistor_spark.plans import maintenance

    path = str(tmp_path / "tbl")
    spark.range(3).write.parquet(path)  # the racing winner's restored copy
    src = f"{path}.__compact_{maintenance.swap_tag()}"
    spark.range(3).write.parquet(src)
    # simulate the loser: its exists() check passed BEFORE the winner's
    # rename landed, so it calls the claim against a now-live path
    claimed = maintenance._claim_rename(spark, src, path)
    assert claimed is False
    assert os.path.isdir(src), "lost-race source must be restored, not nested"
    base = os.path.basename(src)
    assert not os.path.exists(os.path.join(path, base)), "nested dir left inside live"
    assert spark.read.parquet(path).count() == 3


def test_drop_compact_orphans_sweeps_legacy_undotted_names(spark, tmp_path):
    """layout.compact's pre-r11 tmp naming had no dot ({path}__compact_);
    orphans from a pre-migration crashed compaction must still be swept
    (r11 ADVICE — they were never read, but they leaked disk forever)."""
    import os

    from persistor_spark.plans import maintenance

    path = str(tmp_path / "tbl")
    spark.range(3).write.parquet(path)
    legacy = f"{path}__compact_deadbeef"
    dotted = f"{path}.__compact_{maintenance.swap_tag()}"
    spark.range(1).write.parquet(legacy)
    spark.range(1).write.parquet(dotted)
    removed = maintenance.drop_compact_orphans(spark, path)
    assert removed == 2
    assert not os.path.exists(legacy) and not os.path.exists(dotted)
    assert spark.read.parquet(path).count() == 3


def _frag_layout(spark, tmp_path, name="itbl"):
    """A partitioned layout with a compacted base + small-file appendix:
    3 partition values, one large base file each, then 6 small appends
    per value — the shape a streaming index reaches between maintenance
    cycles."""
    import glob

    path = str(tmp_path / name)
    base = spark.range(3000).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("v")
    )
    base.repartition("p").write.partitionBy("p").parquet(path)
    for i in range(6):
        (
            spark.range(3000 + i * 30, 3000 + (i + 1) * 30)
            .select((F.col("id") % 3).alias("p"), F.col("id").alias("v"))
            .coalesce(1)
            .write.mode("append")
            .partitionBy("p")
            .parquet(path)
        )
    import os

    sizes = {
        f: os.path.getsize(f) for f in glob.glob(f"{path}/p=*/part-*.parquet")
    }
    big = {
        f
        for f, sz in sizes.items()
        # the base writes one ~large file per value; appends are tiny
        if sz == max(
            sizes[g]
            for g in sizes
            if os.path.dirname(g) == os.path.dirname(f)
        )
    }
    # a threshold BETWEEN the append sizes and the base sizes, so "small"
    # captures exactly the appendix
    thresh = (min(sizes[f] for f in big) + max(sizes[f] for f in sizes if f not in big)) // 2
    return path, big, thresh


def test_compact_small_files_merges_only_the_appendix(spark, tmp_path):
    """r11 VERDICT #5 (incremental maintenance for the 100 TB story):
    compact_small_files must merge ONLY the small appendix files — the
    already-compacted base files keep their exact names (never read,
    never rewritten), contents are preserved, and the file count drops
    to ~base + one merged file per partition dir."""
    import glob
    import os

    from persistor_spark.plans import maintenance

    path, big, thresh = _frag_layout(spark, tmp_path)
    want = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    before = set(glob.glob(f"{path}/p=*/*.parquet"))
    stats = maintenance.compact_small_files(
        spark, path, partition_col="p", small_file_bytes=thresh
    )
    assert stats["files_small"] >= 18 and stats["dirs"] == 3
    assert stats["files_after"] < stats["files_before"]
    after = set(glob.glob(f"{path}/p=*/*.parquet"))
    assert big <= after, "large base files must be untouched (same names)"
    assert all(os.path.basename(f).startswith("cmp-") for f in after - before)
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == want
    # steady state: a second pass finds nothing mergeable per dir
    stats2 = maintenance.compact_small_files(
        spark, path, partition_col="p", small_file_bytes=thresh
    )
    assert stats2["dirs"] == 0 and stats2["files_after"] == stats2["files_before"]


def test_compact_small_files_unpartitioned_coalesces_without_shuffle(spark, tmp_path):
    import glob

    from persistor_spark.plans import maintenance

    path = str(tmp_path / "flat")
    spark.range(2000).write.parquet(path)
    for i in range(5):
        spark.range(2000 + i * 10, 2010 + i * 10).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    want = sorted(r[0] for r in spark.read.parquet(path).collect())
    stats = maintenance.compact_small_files(spark, path, small_file_bytes=1 << 20)
    assert stats["files_small"] >= 5
    assert stats["files_after"] < stats["files_before"]
    assert sorted(r[0] for r in spark.read.parquet(path).collect()) == want
    assert glob.glob(f"{path}.__smallcompact_*") == []


def test_compact_small_files_crash_mid_swap_recovers_exactly(spark, tmp_path, monkeypatch):
    """Crash with the journal written and the swap half-applied (merged
    files moved in, originals NOT yet removed): readers see duplicates
    until recovery; recover_small_compactions must finish the plan —
    exact contents, no journal, no tmp — and the heal-on-read loader
    path (lsh_index_load calls it) stays duplicate-free."""
    import glob
    import json

    from persistor_spark.plans import fsutil, maintenance

    path, _, thresh = _frag_layout(spark, tmp_path, "crash_tbl")
    want = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    real = maintenance._replay_small_compaction

    def crash_after_moves(spark_, j):
        for src, dst in j["moves"]:
            if fsutil.exists(spark_, src):
                fsutil.rename(spark_, src, dst)
        raise RuntimeError("simulated crash before removals")

    monkeypatch.setattr(maintenance, "_replay_small_compaction", crash_after_moves)
    try:
        maintenance.compact_small_files(
            spark, path, partition_col="p", small_file_bytes=thresh
        )
    except RuntimeError:
        pass
    monkeypatch.setattr(maintenance, "_replay_small_compaction", real)
    journals = glob.glob(f"{path}.__smallcompact_journal_*.json")
    assert len(journals) == 1
    # crash state: merged rows visible TWICE (cmp-* in, originals still there)
    assert len(spark.read.parquet(path).collect()) > len(want)

    stats = maintenance.recover_small_compactions(spark, path)
    assert stats["journals"] == 1 and stats["files_removed"] >= 18
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == want
    assert glob.glob(f"{path}.__smallcompact_*") == []
    # idempotent second pass
    assert maintenance.recover_small_compactions(spark, path) == {
        "journals": 0,
        "files_removed": 0,
    }


def test_compact_small_files_crash_before_journal_sweeps_orphan(spark, tmp_path):
    """Crash BEFORE the journal write: only an orphaned tmp dir exists,
    the live tree is untouched.  The next call sweeps the orphan and
    proceeds normally."""
    import glob

    from persistor_spark.plans import maintenance

    path, _, thresh = _frag_layout(spark, tmp_path, "orphan_tbl")
    want = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    orphan = f"{path}.__smallcompact_{maintenance.swap_tag()}"
    spark.range(5).write.parquet(orphan)
    maintenance.compact_small_files(
        spark, path, partition_col="p", small_file_bytes=thresh
    )
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == want
    assert glob.glob(f"{path}.__smallcompact_*") == []


def test_smallcompact_journal_tmp_carcass_is_swept(spark, tmp_path):
    """A crash INSIDE write_text's journal write leaves a `.json.tmp`
    carcass (the rename to the live journal name never happened, so no
    plan was ever visible and the live tree is untouched).  The next
    compact_small_files call must sweep it rather than leak it forever
    — while never touching a REAL journal, which recover consumes."""
    import glob

    from persistor_spark.plans import maintenance

    path, _, thresh = _frag_layout(spark, tmp_path, "carcass_tbl")
    want = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    carcass = f"{path}.__smallcompact_journal_{maintenance.swap_tag()}.json.tmp"
    open(carcass, "w").write("{half-written")
    maintenance.compact_small_files(
        spark, path, partition_col="p", small_file_bytes=thresh
    )
    assert not glob.glob(f"{path}.__smallcompact_*")
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == want


def test_compact_small_files_maintains_minmax_manifest(spark, tmp_path, monkeypatch):
    """Compacting a manifest-tracked table must REPLACE the merged
    files' manifest entries (incrementally — update_minmax_manifest
    scans only the new cmp-* files), or every pruned scan afterwards
    points at removed files.  Covers the straight path AND the
    crash-mid-swap path: the manifest step rides the journal, so
    recovery converges the manifest too."""
    import glob

    from persistor_spark.plans import fsutil, layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(400).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 7).alias("payload"),
    )
    df.repartitionByRange(2, "unique_id").sortWithinPartitions("unique_id").write.parquet(table)
    for i in range(4):
        (
            spark.range(400 + i * 10, 410 + i * 10)
            .select(
                F.format_string("id%06d", F.col("id")).alias("unique_id"),
                (F.col("id") % 7).alias("payload"),
            )
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
    assert stats["files_small"] >= 4
    # no stale entries: every manifest file exists, and pruned lookups hit
    rows = layout.load_manifest(spark, mf)
    assert all(fsutil.exists(spark, f) for f, *_ in rows), "stale manifest entry"
    for probe in ("id000005", "id000405", "id000431"):
        got = layout.manifest_pruned_scan_cached(spark, table, rows, [probe])
        assert got.count() == 1, probe
    assert len(rows) == len(fsutil.list_files_with_size(spark, table))

    # crash arm: append more, journal written + moves done, crash before
    # removals/manifest — recovery must finish AND converge the manifest
    for i in range(2):
        (
            spark.range(440 + i * 10, 450 + i * 10)
            .select(
                F.format_string("id%06d", F.col("id")).alias("unique_id"),
                (F.col("id") % 7).alias("payload"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )
    real = maintenance._replay_small_compaction

    def crash_after_moves(spark_, j):
        for src, dst in j["moves"]:
            if fsutil.exists(spark_, src):
                fsutil.rename(spark_, src, dst)
        raise RuntimeError("simulated crash before removals/manifest")

    monkeypatch.setattr(maintenance, "_replay_small_compaction", crash_after_moves)
    try:
        maintenance.compact_small_files(
            spark, table, small_file_bytes=thresh, manifest_path=mf
        )
    except RuntimeError:
        pass
    monkeypatch.setattr(maintenance, "_replay_small_compaction", real)
    maintenance.recover_small_compactions(spark, table)
    assert glob.glob(f"{table}.__smallcompact_*") == []
    rows = layout.load_manifest(spark, mf)
    assert all(fsutil.exists(spark, f) for f, *_ in rows)
    assert len(rows) == len(fsutil.list_files_with_size(spark, table))
    for probe in ("id000005", "id000445"):
        assert (
            layout.manifest_pruned_scan_cached(spark, table, rows, [probe]).count()
            == 1
        ), probe


def test_small_compaction_manifest_swaps_before_removals(spark, tmp_path, monkeypatch):
    """r12 ADVICE (phase order): the journaled swap must replace the
    manifest entries BETWEEN moving the cmp-* files in and removing the
    originals — a pruned scan racing the swap then sees harmless
    duplicates the manifest never exposes, never manifest entries
    resolving to already-deleted files.  Pinned by observing the
    filesystem at manifest-update time."""
    from persistor_spark.plans import fsutil, layout, maintenance

    path, _, thresh = _frag_layout(spark, tmp_path, "mf_order")
    mf = str(tmp_path / "mf_order_manifest")
    layout.write_minmax_manifest(spark, path, mf, "v")
    seen = {}
    real = layout.update_minmax_manifest

    def spy(spark_, mf_path, removed, added, col):
        import os

        loc = lambda p: fsutil._local_path(p) or p  # noqa: E731
        seen["originals_alive"] = [f for f in removed if os.path.exists(loc(f))]
        seen["added_alive"] = [f for f in added if os.path.exists(loc(f))]
        seen["removed_arg"] = list(removed)
        return real(spark_, mf_path, removed, added, col)

    monkeypatch.setattr(layout, "update_minmax_manifest", spy)
    maintenance.compact_small_files(
        spark,
        path,
        partition_col="p",
        small_file_bytes=thresh,
        manifest_path=mf,
        manifest_col="v",
    )
    assert seen, "manifest update must run as part of the swap"
    # every merged replacement is already in the live tree...
    assert seen["added_alive"] and len(seen["added_alive"]) == len(
        set(seen["added_alive"])
    )
    # ...and NO original has been removed yet (duplicates, not dangling refs)
    assert seen["originals_alive"] == seen["removed_arg"]
    # after the swap completes the manifest matches the surviving files
    loc = lambda p: fsutil._local_path(p) or p  # noqa: E731
    rows = layout.load_manifest(spark, mf)
    assert sorted(loc(f) for f, *_ in rows) == sorted(
        loc(f) for f, _ in fsutil.list_files_with_size(spark, path)
    )


def test_delete_manifest_swaps_before_removals(spark, tmp_path, monkeypatch):
    """Same phase-order contract for delete_by_key's journaled swap."""
    from persistor_spark.plans import fsutil, layout, maintenance

    table, mf = str(tmp_path / "del_order"), str(tmp_path / "del_order_mf")
    df = spark.range(1000).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 7).alias("payload"),
    )
    df.repartitionByRange(8, "unique_id").sortWithinPartitions(
        "unique_id"
    ).write.parquet(table)
    layout.write_minmax_manifest(spark, table, mf)
    seen = {}
    real = layout.update_minmax_manifest

    def spy(spark_, mf_path, removed, added, col):
        import os

        loc = lambda p: fsutil._local_path(p) or p  # noqa: E731
        seen["originals_alive"] = [f for f in removed if os.path.exists(loc(f))]
        seen["removed_arg"] = list(removed)
        return real(spark_, mf_path, removed, added, col)

    monkeypatch.setattr(layout, "update_minmax_manifest", spy)
    stats = maintenance.delete_by_key(spark, table, mf, ["id000010"])
    assert stats["rows_deleted"] == 1 and seen
    assert seen["originals_alive"] == seen["removed_arg"]


def test_recover_small_compactions_skips_vanished_journal(spark, tmp_path, monkeypatch):
    """r12 ADVICE (journal-read race): two unlocked heal-on-read
    recoverers may race on the same journal — when it vanishes between
    glob and read, recovery treats it as another recoverer's completion
    (skip), not an error."""
    from persistor_spark.plans import fsutil, maintenance

    path = str(tmp_path / "race_tbl")
    spark.range(10).write.parquet(path)
    ghost = f"{path}.__smallcompact_journal_deadbeef.json"
    real_glob = fsutil.glob

    def glob_spy(spark_, pattern):
        out = real_glob(spark_, pattern)
        if "__smallcompact_journal_" in pattern:
            return out + [ghost]  # consumed by the racing recoverer already
        return out

    monkeypatch.setattr(fsutil, "glob", glob_spy)
    stats = maintenance.recover_small_compactions(spark, path)
    assert stats == {"journals": 0, "files_removed": 0}


def test_recover_pending_deletes_skips_vanished_journal(spark, tmp_path, monkeypatch):
    from persistor_spark.plans import fsutil, maintenance

    table = str(tmp_path / "race_del")
    spark.range(10).write.parquet(table)
    ghost = f"{table}.__delete_journal_deadbeef.json"
    real_glob = fsutil.glob

    def glob_spy(spark_, pattern):
        out = real_glob(spark_, pattern)
        if "__delete_journal_" in pattern:
            return out + [ghost]
        return out

    monkeypatch.setattr(fsutil, "glob", glob_spy)
    stats = maintenance.recover_pending_deletes(spark, table)
    assert stats == {"journals": 0, "files_removed": 0}


def test_compact_small_files_refuses_flat_on_hive_layout(spark, tmp_path):
    """r12 ADVICE: compacting a Hive-partitioned layout WITHOUT
    partition_col would read small files non-basePath-aware (partition
    columns silently dropped) and land replacements at the table root —
    refuse loudly instead of corrupting the layout."""
    from persistor_spark.plans import maintenance

    path, _, thresh = _frag_layout(spark, tmp_path, "hive_guard")
    with pytest.raises(ValueError, match="Hive-partitioned"):
        maintenance.compact_small_files(spark, path, small_file_bytes=thresh)


def test_concurrent_compact_and_delete_serialize_whole_op(spark, tmp_path):
    """r14 (the d51 pin's unit twin): compact_small_files and
    delete_by_key released simultaneously against ONE table serialize on
    the whole-op maintenance flock — either order converges to
    original-minus-victims with a live manifest and no surviving
    journal.  Without whole-op locking the delete can plan against
    manifest entries the compaction is about to remove, then scan
    deleted files."""
    import glob
    import threading

    from persistor_spark.plans import layout, maintenance

    table, mf = str(tmp_path / "idx"), str(tmp_path / "mf")
    df = spark.range(1000).select(
        F.format_string("id%06d", F.col("id")).alias("unique_id"),
        (F.col("id") % 7).alias("payload"),
    )
    # base (4 range files) + 4 tiny appends = the compactable appendix
    base = df.filter(F.col("id") % 5 != 0)
    base.repartitionByRange(4, "unique_id").sortWithinPartitions(
        "unique_id"
    ).write.parquet(table)
    for i in range(4):
        df.filter((F.col("id") % 5 == 0) & (F.col("id") % 4 == i)).coalesce(
            1
        ).write.mode("append").parquet(table)
    layout.write_minmax_manifest(spark, table, mf)
    import os

    sizes = [
        os.stat(f).st_size for f in glob.glob(f"{table}/part-*.parquet")
    ]
    thresh = (max(sizes) + min(sizes)) // 2
    victims = ["id000010", "id000500", "id000995"]

    barrier = threading.Barrier(2)
    results: dict = {}
    errors: list = []

    def compactor():
        try:
            barrier.wait(timeout=30)
            results["c"] = maintenance.compact_small_files(
                spark, table, small_file_bytes=thresh, manifest_path=mf
            )
        except Exception as e:  # noqa: BLE001 — surfaced by the assert
            errors.append(e)

    def deleter():
        try:
            barrier.wait(timeout=30)
            results["d"] = maintenance.delete_by_key(spark, table, mf, victims)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=compactor), threading.Thread(target=deleter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, f"concurrent maintenance raised: {errors!r}"
    assert results["c"]["files_small"] >= 2
    assert results["d"]["rows_deleted"] == 3
    assert glob.glob(f"{table}.__*journal_*.json") == []
    from persistor_spark.plans import fsutil

    for f, _lo, _hi, _n in layout.load_manifest(spark, mf):
        assert fsutil.exists(spark, f), f"manifest points at dead file {f}"
    out = spark.read.parquet(table)
    assert out.count() == 997
    assert out.filter(F.col("unique_id").isin(victims)).count() == 0
