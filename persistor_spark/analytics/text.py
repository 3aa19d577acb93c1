"""Text-analysis operators for LLM-data pipelines over the `documents` table.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen); no Python UDFs.  At 100 TB these are narrow per-row
transforms — no shuffle at all until an aggregation is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Marker-stopword language heuristic: tiny deterministic rule set so the
# DuckDB oracle can mirror it exactly.  A production system would swap in a
# trained n-gram profile; the operator shape (per-row expression, no shuffle)
# is what matters at scale.
LANG_MARKERS = (
    ("fr", ("le", "la", "et", "les")),
    ("de", ("der", "die", "und", "das")),
    ("es", ("el", "los", "las", "una")),
    ("en", ("the", "and", "of", "to")),
)

# Stopwords for the quality score (English-ish; deterministic).
QUALITY_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")


def tokens(text: Column | str = "text") -> Column:
    """Whitespace tokenization (single-space delimiter: the fixture corpus is
    single-spaced; swap for `\\s+` regex on real data)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str = "text") -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenization classes (letters / digits / single punctuation),
# the coarse split BPE vocabularies refine; counts approximate LLM token
# budgets far better than whitespace on punctuated text.
BPE_SPLIT_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0))


def distinct_token_ratio(text: Column | str = "text") -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def avg_token_length(text: Column | str = "text") -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t)


def stopword_ratio(text: Column | str = "text") -> Column:
    t = tokens(text)
    sw = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    return F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast("double") / F.size(t)


def quality_score(text: Column | str = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + lexical diversity +
    stopword presence (the standard cheap pre-filter before model-based
    scoring in training-data pipelines)."""
    n = token_count(text)
    # same band as gopher_flags — hardcoding it here let the two quality
    # signals drift when the GOPHER_* bounds are tuned
    length_ok = (
        (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    ).cast("double")
    diversity = F.least(distinct_token_ratio(text) * 2, F.lit(1.0))
    sw = F.least(stopword_ratio(text) * 10, F.lit(1.0))
    return F.round((length_ok + diversity + sw) / 3, 4)


def detect_language(text: Column | str = "text") -> Column:
    """First marker set with >=2 distinct marker hits wins, in rule order;
    fallback 'und'."""
    t = F.array_distinct(tokens(text))
    expr = F.lit("und")
    for lang, markers in reversed(LANG_MARKERS):
        marks = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.array_intersect(t, marks))
        expr = F.when(hits >= 2, F.lit(lang)).otherwise(expr)
    return expr


def word_ngrams(text: Column | str = "text", n: int = 3) -> Column:
    """POSITIONAL word n-grams (duplicates kept — unlike dedup.shingles,
    which distincts).  The repetition signal needs multiplicity."""
    toks = tokens(text)
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), m - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # guard: sequence(1, m) runs DESCENDING when m < 1
    return F.when(m >= n, grams).otherwise(F.array().cast("array<string>"))


def duplicate_ngram_fraction(text: Column | str = "text", n: int = 3) -> Column:
    """Fraction of n-gram positions occupied by a repeated n-gram:
    1 - distinct/total (the Gopher 'duplicate n-gram fraction' family,
    Rae et al. 2021 §A1.1).  High values flag boilerplate / degenerate
    repetition.  Pure per-row array expression — no shuffle."""
    grams = word_ngrams(text, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def with_duplicate_ngram_fractions(
    df: DataFrame,
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
    col_fmt: str = "dup_{n}gram",
    round_digits: int | None = None,
    keep_tokens: str | None = None,
) -> DataFrame:
    """Staged (multi-Project) form of `duplicate_ngram_fraction` for one or
    more n at once: tokenize ONCE, build each n's gram array ONCE, then
    derive the fractions.

    Why a DataFrame helper instead of the Column expression: higher-order
    functions (`transform`) are not whole-stage-codegen-supported, so the
    single-expression form gets an interpreted Project with NO runtime
    common-subexpression elimination — the plan re-evaluates the gram build
    3x per n (guard, distinct, total) and `split` ~12x.  Staging through
    intermediate columns keeps each expensive expression in its own Project
    (CollapseProject refuses to inline non-cheap aliases referenced more
    than once), so tokenization and each gram array are evaluated exactly
    once per row.  Measured at sf0.1: 5x faster than the expression form.
    Narrow per-row map either way — no shuffle; the win is pure CPU.

    `keep_tokens` keeps the staged token array under that column name so
    callers computing FURTHER token-derived signals (gopher_flags' word
    count / mean length / stopword flags) reuse the one tokenization
    instead of re-splitting the text per signal.
    """
    toks = tokens(text_col)
    temps = ["_dnf_toks", "_dnf_m"] + [f"_dnf_g{n}" for n in ns]
    out = df.withColumns({"_dnf_toks": toks, "_dnf_m": F.size(toks)})

    def gram_builder(n: int):
        # closure factory: a default-arg lambda would have arity 2 and be
        # (mis)treated by F.transform as an (element, index) lambda
        return lambda i: F.array_join(F.slice(F.col("_dnf_toks"), i, n), " ")

    for n in ns:
        g = F.when(
            F.col("_dnf_m") >= n,
            F.transform(
                F.sequence(F.lit(1), F.col("_dnf_m") - (n - 1)), gram_builder(n)
            ),
        ).otherwise(F.array().cast("array<string>"))
        out = out.withColumn(f"_dnf_g{n}", g)
    fracs = {}
    for n in ns:
        total = F.size(F.col(f"_dnf_g{n}"))
        frac = F.when(
            total > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(F.col(f"_dnf_g{n}"))).cast("double") / total,
        ).otherwise(F.lit(0.0))
        if round_digits is not None:
            frac = F.round(frac, round_digits)
        fracs[col_fmt.format(n=n)] = frac
    out = out.withColumns(fracs)
    if keep_tokens is not None:
        out = out.withColumnRenamed("_dnf_toks", keep_tokens)
        temps = [t for t in temps if t != "_dnf_toks"]
    return out.drop(*temps)


def symbol_ratio(text: Column | str = "text") -> Column:
    """Fraction of characters outside [A-Za-z0-9 ]."""
    c = F.col(text) if isinstance(text, str) else text
    total = F.length(c)
    sym = total - F.length(F.regexp_replace(c, "[^A-Za-z0-9 ]", ""))
    return F.when(total > 0, sym.cast("double") / total).otherwise(F.lit(0.0))


# Gopher-style rule thresholds (Rae et al. 2021, Table A1 — adapted bounds;
# deterministic so the DuckDB oracle mirrors them exactly).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 2000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_DUP_2GRAM = 0.1
GOPHER_MAX_DUP_3GRAM = 0.05


def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based document quality gate: one boolean column per rule plus
    the conjunction `keep` — the cheap pre-filter stage before model-based
    scoring in a training-data pipeline.  All flags are narrow per-row JVM
    expressions; filtering on `keep` pushes to the scan."""
    sw = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    # Staged via with_duplicate_ngram_fractions (see its docstring): the
    # repetition flag needs BOTH n=2 and n=3 fractions, and the expression
    # form would rebuild tokens + grams several times per row with no CSE.
    # keep_tokens threads the ONE tokenization through the word-count /
    # mean-length / stopword flags too — token_count()/avg_token_length()
    # here would each re-split the text per row.
    tok = F.col("_gf_toks")
    mean_len = (
        F.aggregate(tok, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        .cast("double")
        / F.size(tok)
    )
    out = (
        with_duplicate_ngram_fractions(
            df, text_col, (2, 3), "_gf_dup{n}", keep_tokens="_gf_toks"
        )
        .withColumn(
            "flag_words",
            F.size(tok).between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
        )
        .withColumn(
            "flag_mean_len",
            mean_len.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN),
        )
        .withColumn("flag_symbols", symbol_ratio(text_col) <= GOPHER_MAX_SYMBOL_RATIO)
        .withColumn(
            "flag_stopwords",
            F.size(F.array_intersect(F.array_distinct(tok), sw))
            >= GOPHER_MIN_STOPWORDS,
        )
        .withColumn(
            "flag_repetition",
            (F.col("_gf_dup2") <= GOPHER_MAX_DUP_2GRAM)
            & (F.col("_gf_dup3") <= GOPHER_MAX_DUP_3GRAM),
        )
        .drop("_gf_dup2", "_gf_dup3", "_gf_toks")
    )
    return out.withColumn(
        "keep",
        F.col("flag_words")
        & F.col("flag_mean_len")
        & F.col("flag_symbols")
        & F.col("flag_stopwords")
        & F.col("flag_repetition"),
    )


def fingerprint(text: Column | str = "text") -> Column:
    """Deterministic document fingerprint: md5 of the lowercased text.
    (The rolling-hash variant for shift-tolerant matching lives in
    dedup.simhash.)"""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(c))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.withColumn("token_count", token_count(text_col))
        .withColumn("distinct_token_ratio", F.round(distinct_token_ratio(text_col), 4))
        .withColumn("stopword_ratio", F.round(stopword_ratio(text_col), 4))
        .withColumn("quality_score", quality_score(text_col))
        .withColumn("detected_lang", detect_language(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


# ---------------------------------------------------------------------------
# n-gram language-model perplexity (CCNet-style quality signal)
# ---------------------------------------------------------------------------
#
# CCNet (Wenzek et al. 2020) filters web text by the perplexity of a KenLM
# n-gram model; the Spark-native shape of that signal is: train n-gram
# counts on the corpus itself (one groupBy shuffle per order), then score
# every document by joining its tokens against the count tables.  No Python
# in the path; the count tables shuffle on the token key so cardinality
# scales with vocabulary, not corpus size.

def lm_train(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(unigram_counts, bigram_counts): token -> c and (pw, w) -> c2 over
    the whole corpus.  At 100 TB each is one map-side-combinable groupBy;
    persist the outputs to amortize across scoring passes."""
    toks = tokens(text_col)
    tok = df.select(F.explode(toks).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    t = df.select(toks.alias("toks"))
    n = F.size(F.col("toks"))
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("pw"),
                F.element_at("toks", i + 1).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pw:string,w:string>>"))
    bi = (
        t.select(F.explode(pairs).alias("bg"))
        .select("bg.pw", "bg.w")
        .groupBy("pw", "w")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return uni, bi


def lm_perplexity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    uni: DataFrame | None = None,
    bi: DataFrame | None = None,
) -> DataFrame:
    """Per-document negative log-likelihood under corpus-trained unigram and
    add-alpha-smoothed bigram models: (doc_id, n_tokens, uni_nll, bi_nll).

    uni_nll = -avg ln( c(w) / N )                        over all tokens
    bi_nll  = -avg ln( (c(pw,w)+alpha) / (c(pw)+alpha*V) ) over all bigrams
    (NULL when the doc has < 2 tokens); both rounded to 4 decimals.  Lower
    = more typical of the corpus — threshold on these for CCNet-style
    head/middle/tail quality buckets.

    N (corpus tokens) and V (vocab size) collect as two scalars — bounded
    aggregates, same pattern as bm25's avgdl.  Token joins shuffle on the
    token key; the per-doc average is the only doc-keyed aggregation.
    """
    if uni is None or bi is None:
        uni, bi = lm_train(df, text_col)
        # persist only the internally-trained table: re-persisting a
        # caller-supplied frame would mutate its storage level and leak a
        # fresh cache per scoring call (the amortization pattern passes
        # the same uni/bi across many calls — caching is the caller's)
        uni = uni.persist()
    scal = uni.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")).collect()[0]  # collect-ok: 1-row scalars
    n_corpus, vocab = float(scal["n"] or 1), float(scal["v"] or 1)

    toks = tokens(text_col)
    tok = df.select(F.col(id_col), F.explode(toks).alias("w"))
    # LEFT join: an inner join would silently drop out-of-vocabulary
    # tokens from the average, scoring mostly-OOV junk as LOW (good)
    # perplexity over its few in-vocab tokens.  In-vocab tokens keep the
    # MLE c/N (oracle-pinned); OOV tokens get the add-alpha floor.
    up = F.when(
        F.col("c").isNotNull(), F.col("c") / F.lit(n_corpus)
    ).otherwise(F.lit(alpha) / F.lit(n_corpus + alpha * vocab))
    uscore = (
        tok.join(uni, "w", "left")
        .groupBy(id_col)
        .agg(F.round(F.avg(-F.log(up)), 4).alias("uni_nll"))
    )

    t = df.select(F.col(id_col), toks.alias("toks"))
    n = F.size(F.col("toks"))
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("pw"),
                F.element_at("toks", i + 1).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pw:string,w:string>>"))
    bgr = t.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, "bg.pw", "bg.w"
    )
    prefix = uni.select(F.col("w").alias("pw"), F.col("c").alias("c1"))
    # LEFT joins + coalesce-to-0: the add-alpha formula is exactly what
    # gives unseen bigrams (c2=0) and unseen prefixes (c1=0) their
    # smoothed probability — inner joins excluded them from the average,
    # defeating the smoothing's whole purpose on new-batch scoring
    bscore = (
        bgr.join(bi, ["pw", "w"], "left")
        .join(prefix, "pw", "left")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                        / (
                            F.coalesce(F.col("c1"), F.lit(0))
                            + F.lit(alpha) * F.lit(vocab)
                        )
                    )
                ),
                4,
            ).alias("bi_nll")
        )
    )
    base = df.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
    return (
        base.join(uscore, id_col, "left")
        .join(bscore, id_col, "left")
        .select(id_col, "n_tokens", "uni_nll", "bi_nll")
    )


# ---------------------------------------------------------------------------
# context-window chunking (training-prep: doc -> fixed-token chunks with
# overlap, the retrieval/pretraining preprocessing step)
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token chunks starting every
    `stride` tokens (overlap = chunk_tokens - stride), the standard
    context-window chunking for retrieval indexing and long-doc training
    prep.  Output: (id, chunk_id, start, chunk_len, chunk_text); the final
    chunk may be short (never empty).

    Scale shape: a narrow per-row explode — chunk starts come from ONE
    `sequence` expression, the chunk text from `slice`+`array_join` over
    the already-split token array.  Zero shuffle; at 100 TB this pipelines
    with the scan and fans out ~n_tokens/stride rows per doc.
    """
    toks = F.split(F.col(text_col), " ")
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    ).select(
        id_col,
        "__toks",
        "__n",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride))
        ).alias("chunk_id", "start"),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "start",
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("start")).alias("chunk_len"),
        F.array_join(F.slice("__toks", F.col("start") + 1, chunk_tokens), " ").alias(
            "chunk_text"
        ),
    )


# ---------------------------------------------------------------------------
# PMI collocations (corpus analysis: which adjacent word pairs co-occur far
# above chance — phrase mining / tokenizer-merge candidates)
# ---------------------------------------------------------------------------

def pmi_bigrams(
    df: DataFrame,
    min_count: int = 3,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-pair collocations by pointwise mutual information:
    pmi(a,b) = ln( P(ab) / (P(a)·P(b)) ) with bigram and unigram
    probabilities estimated from the corpus.  `min_count` floors the bigram
    count (PMI is noise-dominated on rare pairs).  Deterministic ordering:
    (round(pmi,4) DESC, w1, w2).

    Scale shape: two token-keyed aggregations (unigrams, bigrams) — the
    same partial-agg shuffles as word count; the two corpus totals are
    bounded scalars; the top-k is TakeOrderedAndProject.  Nothing
    quadratic, nothing driver-side beyond two scalars.
    """
    toks = F.split(F.col(text_col), " ")
    tok = df.select(F.explode(toks).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    grams = df.select(toks.alias("t")).filter(F.size("t") >= 2)
    bg = grams.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    n_uni = float(uni.agg(F.sum("c")).collect()[0][0] or 1)   # bounded scalar  # collect-ok: bounded scalar
    n_bi = float(bi.agg(F.sum("n_ab")).collect()[0][0] or 1)  # bounded scalar  # collect-ok: bounded scalar
    ca = uni.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    cb = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    scored = (
        bi.filter(F.col("n_ab") >= min_count)
        .join(ca, "w1")
        .join(cb, "w2")
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.lit(n_bi))
                    / ((F.col("ca") / F.lit(n_uni)) * (F.col("cb") / F.lit(n_uni)))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(k)


# ---------------------------------------------------------------------------
# TF-IDF top terms (the per-document keyword signal a curation pipeline uses
# for topic balancing; same shape as the reference's query-side scoring but
# corpus-global)
# ---------------------------------------------------------------------------

def tfidf_top_terms(
    df: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-`top_n` terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn smoothing).

    Scale shape: one (doc, term) count shuffle keyed by the pair, one
    vocab-bounded document-frequency agg (its result is vocab-sized ->
    broadcast-joined back), and a per-doc window bounded by the doc's
    distinct-term count.  Nothing corpus-squared, nothing collected.
    Ties rank by term string so results are deterministic."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "term",
        (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", F.round("tfidf", 4).alias("tfidf"))
    )


# ---------------------------------------------------------------------------
# per-source rollup (domain-level curation: keep/drop whole sources by
# aggregate quality, the C4/RefinedWeb-style domain filter)
# ---------------------------------------------------------------------------

def source_quality_rollup(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source aggregate curation stats: doc count, char/token means,
    mean quality score, fraction passing the rule filter, language spread.
    ONE shuffle keyed by source (source cardinality << corpus; a skewed
    mega-source is exactly what AQE skew-split handles)."""
    q = quality_score(text_col)
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length(text_col)), 4).alias("avg_chars"),
            F.round(F.avg(token_count(text_col)), 4).alias("avg_tokens"),
            F.round(F.avg(q), 4).alias("avg_quality"),
            F.round(
                F.avg((q >= F.lit(0.5)).cast("double")), 4
            ).alias("pass_fraction"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# normalization fingerprint (the canonical-text key exact dedup and
# train/test contamination checks hash on)
# ---------------------------------------------------------------------------

def normalized_text(text: Column | str = "text") -> Column:
    """Canonical form: lowercase, drop non-alphanumerics (keep spaces),
    collapse runs of whitespace, trim.  Character classes only — portable
    between Java regex (Spark) and RE2 (DuckDB oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    canon = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(canon, " +", " "))


def normalization_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, norm_len, norm_md5): pure narrow projection, zero shuffle —
    the join key for normalized exact-dedup across 100 TB is the 32-char
    md5, not the text."""
    norm = normalized_text(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )


def vocab_coverage(
    df: DataFrame, top_n: int = 100, text_col: str = "text"
) -> DataFrame:
    """Zipf head of the corpus vocabulary: the top_n terms by frequency with
    each term's share of all tokens and the running cumulative share —
    the "how small a vocab covers 90% of the corpus" curve a tokenizer /
    vocab-size decision reads off directly.

    Shape at 100 TB: one term-keyed count shuffle (vocab-bounded output),
    then TakeOrderedAndProject keeps only the top_n head — the cumulative
    window runs over those top_n survivors, never the full vocabulary.
    The single collected scalar is the corpus token total (one BIGINT).

    Output (rank, term, cnt, share, cum_share), rank ordered by
    (cnt DESC, term ASC), shares rounded to 6 decimals.
    """
    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt")).collect()[0][0]  # collect-ok: 1-row scalar total
    if total is None:  # empty corpus: empty head, not float(None)
        total = 1
    order = [F.col("cnt").desc(), F.col("term").asc()]
    head = counts.orderBy(*order).limit(top_n)
    # non-foldable constant partition spec (the search.py trick): the window
    # sorts only the top_n survivors, not a single global partition
    w = Window.partitionBy(F.pmod(F.length("term"), F.lit(1))).orderBy(*order)
    return head.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "term",
        "cnt",
        # UNROUNDED integer quotients (r14, the e46 class)
        (F.col("cnt").cast("double") / F.lit(float(total))).alias("share"),
        (
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            / F.lit(float(total))
        ).alias("cum_share"),
    )


def boilerplate_stats(
    df: DataFrame,
    n: int = 3,
    min_doc_frac: float = 0.2,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-document boilerplate load: the fraction of a doc's DISTINCT word
    n-grams that are boilerplate WITHIN ITS SOURCE — an n-gram is
    boilerplate when it appears in >= `min_doc_frac` of the source's
    documents (the CCNet/RefinedWeb per-domain heuristic for navigation
    chrome, footers, and templates; relative-to-source, so a phrase common
    in one crawl domain is still content in another).  Sources with fewer
    than `min_docs` documents flag nothing — with one page, every gram is
    trivially "in 100% of the domain".

    Plan at 100 TB: one (source, gram)-keyed distinct-doc count (the gram
    posting shuffle the dedup family already pays), a broadcastable
    per-source doc-count table, and one id-keyed join back — the
    boilerplate gram table is tiny after the >= min_doc_frac filter.
    Output (doc_id, source, n_grams, n_boiler, boiler_frac).
    """
    grams = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("g"),
    )
    src_docs = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    boiler = (
        grams.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("df_"))
        .join(F.broadcast(src_docs), "source")
        .filter(
            (F.col("n_docs") >= min_docs)
            & (F.col("df_").cast("double") / F.col("n_docs") >= min_doc_frac)
        )
        .select("source", "g")
    )
    flagged = grams.join(boiler, ["source", "g"], "left_semi")
    per_doc_boiler = flagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_boiler"))
    per_doc = grams.groupBy(id_col, "source").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        per_doc.join(per_doc_boiler, id_col, "left")
        .select(
            id_col,
            "source",
            "n_grams",
            F.coalesce("n_boiler", F.lit(0)).cast("long").alias("n_boiler"),
            F.round(
                F.coalesce("n_boiler", F.lit(0)).cast("double") / F.col("n_grams"), 4
            ).alias("boiler_frac"),
        )
    )


FUNNEL_STAGES = (
    "flag_words",
    "flag_mean_len",
    "flag_symbols",
    "flag_stopwords",
    "flag_repetition",
)


def quality_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rule funnel: survivors after applying each rule CUMULATIVELY in
    the canonical order — the ablation report a curation pipeline reads to
    see which gate costs how much data.

    One pass: all rule flags are evaluated per row (gopher_flags, narrow JVM
    expressions), every cumulative conjunction is counted in a SINGLE
    aggregation, and the 5 funnel rows are inlined from that one result row
    — no per-stage rescan, cost is one scan regardless of stage count.
    """
    flags = gopher_flags(df, text_col)
    cum = F.lit(True)
    aggs = [F.count(F.lit(1)).alias("n_total")]
    for i, name in enumerate(FUNNEL_STAGES):
        cum = cum & F.col(name)
        aggs.append(F.count(F.when(cum, 1)).alias(f"s{i}"))
    agg = flags.agg(*aggs)
    stages = [
        F.struct(
            F.lit(i + 1).alias("stage"),
            F.lit(name).alias("rule"),
            (F.col("n_total") if i == 0 else F.col(f"s{i-1}")).alias("entered"),
            F.col(f"s{i}").alias("survivors"),
        )
        for i, name in enumerate(FUNNEL_STAGES)
    ]
    return agg.select(F.inline(F.array(*stages))).select(
        "stage",
        "rule",
        "entered",
        "survivors",
        (F.col("entered") - F.col("survivors")).alias("dropped"),
        # UNROUNDED integer quotient (r14, the e46 class)
        (
            (F.col("entered") - F.col("survivors")).cast("double")
            / F.col("entered")
        ).alias("drop_rate"),
    ).orderBy("stage")


def unigram_kl_by_source(df: DataFrame, text_col: str = "text", source_col: str = "source") -> DataFrame:
    """Distribution-shift audit: KL(P_source || P_corpus) over unigram token
    distributions, per source.  The mixing diagnostic — a source whose token
    distribution diverges hard from the corpus shifts the trained model's
    distribution proportionally to its mixture weight.

    KL is computed against the CORPUS distribution, whose support is a
    superset of every source's tokens, so no smoothing is needed.  Scale
    shape: one (source, token) count shuffle + one token-keyed join against
    the corpus counts — both vocab-bounded, never corpus-row-bounded."""
    toks = df.select(F.col(source_col).alias("source"), F.explode(tokens(text_col)).alias("t"))
    by_src = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    corpus = by_src.groupBy("t").agg(F.sum("c").alias("cc"))
    src_tot = by_src.groupBy("source").agg(F.sum("c").alias("n_tokens"))
    corpus_tot = corpus.agg(F.sum("cc").alias("nn")).withColumn("j", F.lit(1))
    contrib = (
        by_src.join(corpus, "t")
        .join(F.broadcast(src_tot), "source")
        .withColumn("j", F.lit(1))
        .join(F.broadcast(corpus_tot), "j")
        .withColumn(
            "kl_term",
            (F.col("c") / F.col("n_tokens"))
            * F.log((F.col("c") / F.col("n_tokens")) / (F.col("cc") / F.col("nn"))),
        )
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("kl_term"), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )
