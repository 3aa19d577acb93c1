"""persistor_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dataphos/persistor (reference surveyed in
SURVEY.md), re-expressed Spark-first.

Four surfaces (SURVEY.md §7.0):

- ``plans.ingest``    — broker-message batches → partitioned blob table +
                        ``index_metadata`` + dead-letter table.
- ``plans.query``     — the Indexer-API query surface (point lookup, IN-list,
                        time-range with pagination envelope, generic
                        Mongo-dialect filter query) over ``index_metadata``.
- ``plans.resubmit``  — message reconstruction: metadata → blob join on
                        ``(location_key, location_position)`` → keyed publish,
                        with lineage counters.
- ``analytics``       — LLM-data-pipeline extension: dedup (exact / MinHash-LSH /
                        SimHash / n-gram Jaccard / embedding cosine), similarity
                        search, text analysis, multimodal plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where semantics require them
(hash-sketch operators), always Arrow-vectorized.
"""

__version__ = "0.1.0"
