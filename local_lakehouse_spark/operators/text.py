"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure JVM-side column expressions (no Python UDFs) so they run
inside whole-stage codegen over 100 TB — and all four are expressible
in plain SQL, which is exactly what their DuckDB oracle twins run
(see queries.py x-series).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny marker lexicons per language — n-gram/stopword heuristic in the
# spirit of CLD/langid's top-feature lists. Deterministic and cheap:
# one pass, array_intersect against a literal array.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "y"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


def _words(text_col: Column) -> Column:
    return F.split(text_col, r"\s+")


def _lang_pred_expr(words: Column) -> Column:
    """The language_id argmax as a single expression (shared with
    corpus_filter's fused admission select)."""
    hit_cols = {
        lang: F.size(
            F.array_intersect(words, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best <= 0, F.lit("und")).otherwise(pred)


def _quality_score_expr(text_col: Column, words: Column) -> Column:
    """The quality_score 0–1 combination as a single expression
    (shared with corpus_filter's fused admission select)."""
    n_chars = F.length(text_col)
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    stopword_ratio = stop_hits / n_words
    length_ok = (n_words >= 10) & (n_words <= 100000)
    return (
        F.when(length_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(
            (avg_word_len >= 3) & (avg_word_len <= 12), F.lit(0.25)
        ).otherwise(F.lit(0.0))
        + F.when(
            (stopword_ratio >= 0.01) & (stopword_ratio <= 0.5), F.lit(0.25)
        ).otherwise(F.lit(0.0))
    )


def language_id(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, lang_pred, marker_hits) — argmax over marker-word hit
    counts, 'und' (undetermined) when no lexicon matches.
    """
    words = _words(F.col(text_col))
    hit_cols = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax with deterministic tie-break on language code order
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return df.select(
        F.col(id_col).alias("id"),
        pred.alias("lang_pred"),
        best.cast("int").alias("marker_hits"),
    )


def quality_score(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_chars, n_words, avg_word_len, stopword_ratio, score).

    Heuristic quality features a pretraining pipeline filters on:
    document length, mean word length, stopword density. ``score`` is
    a bounded combination in [0, 1]; all arithmetic is derived from
    integer counts so the SQL oracle matches bit-for-bit.
    """
    words = _words(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(words)
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(STOPWORDS))
    )
    avg_word_len = (n_chars - (n_words - 1)) / n_words  # total chars sans spaces
    stopword_ratio = stop_hits / n_words
    length_ok = (n_words >= 10) & (n_words <= 100000)
    score = (
        F.when(length_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when((avg_word_len >= 3) & (avg_word_len <= 12), F.lit(0.25)).otherwise(
            F.lit(0.0)
        )
        + F.when(
            (stopword_ratio >= 0.01) & (stopword_ratio <= 0.5), F.lit(0.25)
        ).otherwise(F.lit(0.0))
    )
    r3 = lambda c: F.floor(c * 1000 + F.lit(0.5)) / 1000  # noqa: E731
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        r3(avg_word_len).alias("avg_word_len"),
        r3(stopword_ratio).alias("stopword_ratio"),
        score.alias("score"),
    )


def token_count(
    df: DataFrame, id_col: str, text_col: str, chars_per_token: int = 4
) -> DataFrame:
    """(id, n_words, n_tokens_est) — whitespace word count plus a
    BPE-style subword estimate: Σ ceil(len(word)/chars_per_token).
    Pure integer arithmetic (oracle-exact); the scale-path analog of
    running a real tokenizer, which would be a mapInPandas stage.
    """
    words = _words(F.col(text_col))
    est = F.aggregate(
        F.transform(
            words,
            lambda w: F.ceil(F.length(w) / F.lit(chars_per_token)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(words).cast("bigint").alias("n_words"),
        est.alias("n_tokens_est"),
    )


def clean_text(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, clean) — pretraining-corpus text normalization: lowercase,
    strip non-alphanumeric ASCII to spaces, collapse whitespace, trim.
    Pure regexp_replace chain (whole-stage codegen); the patterns are
    RE2/Java-regex-common so the DuckDB oracle runs them verbatim.
    """
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.select(F.col(id_col).alias("id"), c.alias("clean"))


def corpus_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    langs: tuple[str, ...] = ("en",),
    min_score: float = 0.75,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The end-to-end training-data admission pipeline, composed from
    the individual operators: language-ID gate + quality-score gate +
    exact first-occurrence dedup. Returns the admitted documents as
    (id, lang_pred, n_words, score[, *keep]) — ``keep`` names extra
    input columns to carry through (r12: lets x49 chunk the admitted
    text directly instead of re-joining the corpus twice).

    Shape at scale (r12): language AND quality are ONE fused map-side
    select over ONE scan — they are both per-row expressions of the
    same row, so the pre-r12 lang ⋈ qual join on id (two scans + an
    exchange-backed join) was pure overhead. The dedup stays a
    separate min-id-per-text aggregate, applied as a left-semi join
    (broadcast below threshold). No Python anywhere.
    """
    words = _words(F.col(text_col))
    feats = df.select(
        F.col(id_col).alias("id"),
        _lang_pred_expr(words).alias("lang_pred"),
        F.size(words).cast("bigint").alias("n_words"),
        _quality_score_expr(F.col(text_col), words).alias("score"),
        *[F.col(c) for c in keep],
    )
    firsts = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .groupBy("__t")
        .agg(F.min("id").alias("id"))
        .select("id")
    )
    return feats.join(firsts, "id", "left_semi").filter(
        F.col("lang_pred").isin(list(langs)) & (F.col("score") >= min_score)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = 120,
    stride: int = 90,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, chunk_id, start, chunk, chunk_len[, *keep]) — fixed-width
    character chunking with overlap (chunk_chars - stride), the
    LLM-context windowing step of a pretraining pipeline. ``keep``
    names extra input columns copied onto every chunk row (r12: lets
    x49 carry ``source`` through instead of re-joining the corpus).

    Spark shape: sequence() + posexplode() — a generator expression
    evaluated inside the scan stage, no shuffle at all; output rows
    stay co-partitioned with their source document. At 100 TB this is
    a pure map stage whose output is ~(chunk_chars/stride)× the input.
    """
    n = F.length(F.col(text_col)).cast("bigint")
    starts = F.sequence(F.lit(1).cast("bigint"), n, F.lit(stride).cast("bigint"))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("__t"),
            *[F.col(c) for c in keep],
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            "id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            "start",
            F.expr(f"substring(__t, start, {chunk_chars})").alias("chunk"),
            F.length(F.expr(f"substring(__t, start, {chunk_chars})"))
            .cast("int")
            .alias("chunk_len"),
            *keep,
        )
    )


def repetition_score(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_words, n_distinct, dup_word_frac, top_word_frac,
    top_bigram_frac, keep) — Gopher-style repetition quality rules
    (Rae et al. 2021: filter docs whose most frequent word / 2-gram
    covers too much of the text).

    Spark shape: posexplode → two keyed aggregations + one keyed
    window, all partitioned by document id — at scale each doc's
    words stay in one task after a single shuffle on id; no global
    windows. Word splitting is on a single space so the DuckDB twin
    (string_split) is byte-identical.
    """
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    base = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("i", "w"),
    )
    wc = base.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    wstats = wc.groupBy("id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_word"),
    )
    win = Window.partitionBy("id").orderBy("i")
    bg = base.select(
        "id",
        F.concat_ws(" ", F.col("w"), F.lead("w").over(win)).alias("b"),
        F.lead("w").over(win).alias("__next"),
    ).filter(F.col("__next").isNotNull())
    bgc = bg.groupBy("id", "b").agg(F.count(F.lit(1)).alias("c"))
    bgstats = bgc.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram"),
    )
    top_word_frac = F.col("top_word") / F.col("n_words")
    top_bigram_frac = F.coalesce(
        F.col("top_bigram") / F.col("n_bigrams"), F.lit(0.0)
    )
    return (
        wstats.join(bgstats, "id", "left")
        .select(
            "id",
            "n_words",
            "n_distinct",
            r4(1 - F.col("n_distinct") / F.col("n_words")).alias("dup_word_frac"),
            r4(top_word_frac).alias("top_word_frac"),
            r4(top_bigram_frac).alias("top_bigram_frac"),
            ((top_word_frac <= 0.2) & (top_bigram_frac <= 0.18))
            .cast("int")
            .alias("keep"),
        )
    )


# PII patterns restricted to the Java-regex ∩ RE2 common subset so the
# DuckDB oracle can run them verbatim.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_ID_RUN = r"[0-9]{5,}"


def pii_redact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, redacted, n_email, n_ip, n_idrun) — PII scrubbing for
    training corpora: emails → [EMAIL], IPv4 → [IP], long digit runs
    (account/serial numbers) → [ID], with per-category match counts
    for audit sampling.

    Pure regexp_replace / regexp_extract_all chain — whole-stage
    codegen, zero Python in the hot path, trivially map-parallel at
    100 TB.
    """
    c = F.col(text_col)
    red = F.regexp_replace(c, PII_EMAIL, "[EMAIL]")
    red = F.regexp_replace(red, PII_IPV4, "[IP]")
    red = F.regexp_replace(red, PII_ID_RUN, "[ID]")
    return df.select(
        F.col(id_col).alias("id"),
        red.alias("redacted"),
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), 0)).alias("n_ip"),
        F.size(F.regexp_extract_all(c, F.lit(PII_ID_RUN), 0)).alias("n_idrun"),
    )


FP_MOD = 1_000_000_007
FP_MUL = 31


def fingerprint(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, fp) — order-sensitive rolling polynomial hash over the word
    sequence: fp = fold(acc·31 + code(word)) mod 1e9+7, where
    code(word) = ascii(first char)·31 + length(word).

    Engine-agnostic integer arithmetic (the DuckDB oracle runs the
    identical fold via list_reduce), unlike xxhash-based fingerprints.
    Order-sensitive → detects reordered plagiarism that bag-of-words
    hashes miss.
    """
    words = _words(F.col(text_col))
    codes = F.transform(
        words,
        lambda w: (F.ascii(w) * F.lit(FP_MUL) + F.length(w)).cast("bigint"),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * F.lit(FP_MUL) + c) % F.lit(FP_MOD),
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("fp"))


def bm25_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) — Okapi BM25 relevance of each document for a bag
    of query terms, the ranking primitive of corpus search / quality
    mining ("find docs most about X").

    Scale shape: one explode → two keyed aggregations. Doc lengths
    and term frequencies shuffle on doc id; document frequencies
    reduce to |terms| rows and the corpus stats to ONE row — both
    broadcast back, so the per-doc scoring join is map-side. Uses the
    +1 idf variant (always positive, Lucene's choice).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    doclen = words.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        words.filter(F.col("w").isin(terms))
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "w",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    scored = (
        tf.join(doclen, "id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(idf), "w")
        .select(
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return scored.groupBy("id").agg(r4(F.sum("term_score")).alias("score"))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    group_col: str,
    budget: int,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming sequence packing: assign documents (in id order,
    within each group/shard) to context-window bins of ``budget``
    tokens — the batch-construction step before LLM training.

    bin = floor(prefix_sum_before_doc / budget): the classic
    streaming approximation (a bin may overflow by at most one
    document, no bin splits a document). Closed-form over one window
    cumsum, so it parallelizes by group, merges trivially, and an
    independent engine reproduces it exactly. Output adds ``bin``
    (per-group bin index) and ``bin_prefix`` (tokens before this doc
    within its bin). ``passthrough`` names extra input columns to
    carry onto the output rows (r12: saves x49's join-back of the
    packing result to its own input — which duplicated the whole
    chunking subtree in the plan).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.select(
        group_col,
        id_col,
        tokens_col,
        F.floor(before / budget).cast("int").alias("bin"),
        (before % budget).cast("long").alias("bin_prefix"),
        *passthrough,
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    benchmark_mod: int = 97,
) -> DataFrame:
    """(id, n_hits, contaminated) — benchmark decontamination: flag
    training documents that share any word ``n``-gram with the
    held-out benchmark split (here the deterministic split
    ``id % benchmark_mod == 0``, standing in for an eval set). The
    n-gram-overlap rule is the standard train/test leakage check of
    LLM pretraining pipelines (e.g. GPT-3 appendix C uses 13-grams;
    shorter here because the synthetic docs are short).

    Scale shape: the benchmark side is a tiny fraction of the corpus
    (1/benchmark_mod), so its distinct n-gram set is broadcast; the
    training side streams map-side through the hash join — no shuffle
    of the 100 TB side. Per-doc shingles are pre-deduplicated
    (``shingles``), so the hit count is the DISTINCT overlapping
    n-gram count by construction.
    """
    from .dedup import shingles

    sh = shingles(df, id_col, text_col, n=n)
    bench = (
        sh.filter(F.col("id") % benchmark_mod == 0)
        .select(F.col("shingle").alias("b_shingle"))
        .distinct()
    )
    train_sh = sh.filter(F.col("id") % benchmark_mod != 0)
    hits = (
        train_sh.join(
            F.broadcast(bench),
            train_sh["shingle"] == bench["b_shingle"],
            "inner",
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    train = df.filter(F.col(id_col) % benchmark_mod != 0).select(
        F.col(id_col).alias("id")
    )
    return train.join(hits, "id", "left").select(
        "id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )


def vocab_stats(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 100
) -> DataFrame:
    """(word, cnt, rank, cum_share) — corpus vocabulary statistics:
    the ``top_k`` most frequent words with rank and cumulative
    coverage share (the Zipf curve a corpus audit reads).

    Scale shape: one explode → one word-keyed count agg (map-side
    partials shrink the shuffle to |vocab|), then a distributed
    TakeOrdered for the top-k — NO global sort and NO vocabulary-wide
    single-partition window; the running sum runs over only the k
    surviving rows. cum_share = running(cnt)/total is one exact IEEE
    division, rounded to 6 decimals.
    """
    words = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("word")).limit(top_k)
    )  # TakeOrderedAndProject: k rows cross the wire, not the vocab
    w = Window.orderBy(F.desc("cnt"), F.asc("word")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "word",
            "cnt",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("word")))
            .alias("rank"),
            r6(F.sum("cnt").over(w) / F.col("__total")).alias("cum_share"),
        )
        .orderBy("rank")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, word, tf, doc_freq, score_milli, rk) — top-``k`` TF-IDF
    terms per document (the "what is this doc about" primitive used
    for corpus topic audits and keyword mining).

    Uses an integer-scaled idf — ``score_milli = tf * ((N * 1000) DIV
    doc_freq)`` — monotone in tf and 1/df like ln-idf, but pure
    integer arithmetic, so the result is bit-identical across engines
    (ln differs in the last ulp between libm implementations).

    Scale shape: explode → (id, word) count shuffle; doc-frequency
    agg reduces to |vocab| rows; the tf↔df join shuffles on word
    (AQE broadcast-demotes when vocab is small); the final top-k is a
    per-doc window — partitioned by id, never global.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    )
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "word",
            "tf",
            "doc_freq",
            (
                F.col("tf")
                * F.expr("(__n * 1000) DIV doc_freq").cast("bigint")
            ).alias("score_milli"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score_milli"), F.asc("word")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("id", "rk")
    )


def word_rarity(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_words, mean_rarity, max_rarity) — unigram rarity
    scoring: rarity(w) = total_corpus_words DIV corpus_count(w)
    (integer inverse frequency), aggregated per document as mean and
    max. A rank-free surprisal proxy for perplexity-style quality
    filtering: common-word documents score low, documents of rare
    words score high — with NO global vocabulary sort (the classic
    rank formulation needs one) and no transcendental functions (an
    ln-based NLL differs across engines in the last ulp).

    Scale shape: explode → word-count agg (|vocab| rows) → word-keyed
    join back (AQE broadcasts small vocabs) → per-doc agg. Two
    shuffles total, both key-shrunk.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    rarity = counts.crossJoin(F.broadcast(total)).select(
        "word", F.expr("__total DIV cnt").cast("bigint").alias("rarity")
    )
    r3 = lambda c: F.floor(c * 1000 + F.lit(0.5)) / 1000  # noqa: E731
    return (
        words.join(rarity, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            r3(F.avg("rarity")).alias("mean_rarity"),
            F.max("rarity").alias("max_rarity"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 1,
    min_df: int = 2,
    max_df: int = 10000,
) -> DataFrame:
    """(term, doc_freq, postings) — materialized inverted index:
    sorted posting list (doc ids) per term, the search-index build
    step of corpus tooling (and literally the dedup blocker's data
    structure, exposed as a queryable table). ``ngram`` > 1 indexes
    word n-gram shingles instead of single words. Terms outside
    [min_df, max_df] document frequency are dropped: singletons index
    nothing, stop-terms blow up posting lists (the same hot-key guard
    the dedup path uses).

    Scale shape: explode → per-doc distinct (map-side) → ONE
    term-keyed shuffle building the posting array; posting lists are
    bounded by max_df so no reducer key can run away.
    """
    if ngram > 1:
        from .dedup import shingles

        terms = shingles(df, id_col, text_col, n=ngram).select(
            "id", F.col("shingle").alias("term")
        )
    else:
        terms = df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(_words(F.col(text_col)))).alias(
                "term"
            ),
        )
    return (
        terms.groupBy("term")
        .agg(F.sort_array(F.collect_list("id")).alias("postings"))
        .withColumn("doc_freq", F.size("postings").cast("bigint"))
        .filter(
            (F.col("doc_freq") >= min_df) & (F.col("doc_freq") <= max_df)
        )
        .select("term", "doc_freq", "postings")
        .orderBy("term")
    )


def bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
) -> DataFrame:
    """(w1, w2, pair_count, w1_count, cond_milli) — corpus bigram
    language-model table: count(w1 w2), count(w1 *), and the
    integer-scaled conditional P(w2|w1) ≈ pair_count * 1000 DIV
    w1_count. The n-gram-LM training step of a data pipeline
    (fluency scoring, next-word features) in exact integer arithmetic
    so an independent engine reproduces it bit-for-bit.

    Scale shape: adjacent pairs come from a row-side zip of the word
    array with its tail — zero shuffle until the pair-count agg; the
    w1 marginal reuses the pair counts (sum per w1), so the corpus is
    tokenized once.
    """
    w = _words(F.col(text_col))
    pairs = df.select(
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
                F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    marg = pc.groupBy("w1").agg(F.sum("pair_count").alias("w1_count"))
    return (
        pc.join(marg, "w1")
        .filter(F.col("pair_count") >= min_count)
        .select(
            "w1",
            "w2",
            "pair_count",
            "w1_count",
            F.expr("(pair_count * 1000) DIV w1_count").alias("cond_milli"),
        )
        .orderBy("w1", "w2")
    )


def bpe_merge_steps(
    docs: DataFrame, text_col: str = "text", n_merges: int = 3
) -> DataFrame:
    """Distributed BPE tokenizer training: learn the first
    ``n_merges`` merge rules over the corpus.

    The textbook algorithm (Sennrich et al. 2016, public): start from
    characters, repeatedly (1) count adjacent token pairs corpus-wide,
    (2) merge the most frequent pair everywhere. Counting runs on the
    WORD-FREQUENCY table, not raw tokens — the classic optimization
    that makes each round O(|vocab|), not O(|corpus|).

    Distribution shape per round: one groupBy over vocab for pair
    counts (map-side combined), a driver fetch of ONE winning pair
    (16 bytes — the same bounded-scalar pattern as x33's convergence
    check), then a scan-stage higher-order ``aggregate`` fold that
    applies the merge greedily left-to-right inside each word. No
    Python UDFs, no unbounded collect; ``n_merges`` linear rounds.

    The fold encodes greedy non-overlap exactly: walking tokens
    left-to-right, when the accumulator's last token is ``a`` and the
    next is ``b`` they merge, and the merged token cannot serve as
    the ``a`` of an immediately following occurrence (so pair (l,l)
    on "h e l l o" yields "h e ll o", and (a,a) on "a a a" yields
    "aa a") — byte-identical to the reference algorithm and to the
    DuckDB ``list_reduce`` twin.

    Ties break on (count DESC, pair-string ASC): deterministic across
    engines for the ASCII corpus.

    Returns ``(step, lhs, rhs, merged, pair_count)`` — the learned
    merge table, which IS the artifact a tokenizer trainer persists.
    """
    spark = docs.sparkSession
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("cnt"))
    # One corpus scan total: the word-frequency table materializes
    # once and every round's pair-count job starts from it (the fold
    # chains re-evaluate per round, but over |vocab| rows, not the
    # corpus).
    toks = vocab.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("tk"), "cnt"
    ).localCheckpoint(eager=False)

    # Each round's lazy localCheckpoint persists an RDD when the next
    # action materializes it; once round N is materialized, round
    # N-1's checkpoint is dead weight. Track the persistent-RDD ids
    # that appear at each materialization and free the previous
    # round's, so a library caller (without bench.py's
    # release_persisted sweep) doesn't accumulate one persisted RDD
    # per merge round per invocation.
    sc = spark.sparkContext

    def _persisted_ids() -> set:
        try:
            return set(sc._jsc.getPersistentRDDs().keys())
        except Exception:
            return set()

    def _unpersist(ids: set) -> None:
        try:
            jmap = sc._jsc.getPersistentRDDs()
            for rid in ids:
                if rid in jmap:
                    jmap[rid].unpersist(False)
        except Exception:
            pass  # cleanup is best-effort; never fail training over it

    prev_round_ids: set = set()
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        before = _persisted_ids()
        ta = F.split(F.col("tk"), " ")
        pairs = F.transform(
            F.slice(ta, 2, F.size(ta) - 1),
            lambda x, i: F.concat(
                F.element_at(ta, i + 1), F.lit(" "), x
            ),
        )
        best = (
            toks.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        # The collect above materialized THIS round's checkpoint;
        # the previous round's persisted RDD is now unreferenced.
        new_ids = _persisted_ids() - before
        if new_ids:
            _unpersist(prev_round_ids)
            prev_round_ids = new_ids
        pair, pair_count = best[0]["pair"], int(best[0]["pair_count"])
        a, b = pair.split(" ", 1)
        rules.append((step, a, b, a + b, pair_count))

        tail_len = len(a) + 1
        toks = toks.select(
            F.aggregate(
                F.slice(ta, 2, F.size(ta) - 1),
                F.element_at(ta, 1),
                lambda acc, x: F.when(
                    (x == F.lit(b))
                    & (
                        (acc == F.lit(a))
                        | (F.substring(acc, -tail_len, tail_len) == F.lit(" " + a))
                    ),
                    F.concat(acc, x),
                ).otherwise(F.concat(acc, F.lit(" "), x)),
            ).alias("tk"),
            "cnt",
        # checkpoint each round's token table: round N's pair count
        # then starts from round N-1's materialized rows instead of
        # replaying every earlier fold over the original vocab —
        # O(rounds) fold applications total, not O(rounds²)
        ).localCheckpoint(eager=False)

    # The merge table is fully collected into `rules`; nothing the
    # caller receives depends on the token checkpoints anymore.
    _unpersist(prev_round_ids)
    return spark.createDataFrame(
        rules, "step int, lhs string, rhs string, merged string, pair_count bigint"
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990): PMI(a,b) = ln( c(ab)·W / (c(a)·c(b)) ) with W the
    corpus word count — the phrase-mining step that finds multiword
    units ("new york") worth treating as single tokens.

    Determinism: counts are exact integers; the PMI itself is ONE
    double expression per surviving bigram (ratio → ln → floor-round
    to 1e-4) — no accumulation of floats, so both engines produce the
    identical value (the same contract BM25/x34 relies on).

    Scale shape: bigrams from a row-side zip (zero shuffle), one
    pair-count agg, one unigram agg, two joins on word keys (the
    unigram side is vocabulary-sized; AQE broadcasts it when small),
    then distributed TakeOrdered for the top-k.
    """
    w = _words(F.col(text_col))
    words = df.select(F.explode(w).alias("wd"))
    uni = words.groupBy("wd").agg(F.count(F.lit(1)).alias("cnt"))
    total = words.count()

    pairs = df.select(
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
                F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    scored = (
        pc.join(uni.select(F.col("wd").alias("w1"), F.col("cnt").alias("c1")), "w1")
        .join(uni.select(F.col("wd").alias("w2"), F.col("cnt").alias("c2")), "w2")
        .withColumn(
            "pmi_e4",
            F.floor(
                F.log(
                    F.col("pair_count").cast("double")
                    * F.lit(float(total))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                )
                * 10000
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi_e4"), "w1", "w2")
        .limit(k)
        .select("w1", "w2", "pair_count", "pmi_e4")
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    mask: int = 16,
) -> DataFrame:
    """(id, chunk_id, chunk, n_words) — CONTENT-DEFINED CHUNKING at
    word granularity: a chunk boundary falls after word *i* whenever
    the rolling hash of the trailing ``window`` words satisfies
    ``h % mask == 0`` (expected chunk length ≈ ``mask`` words). The
    Rabin-fingerprint idea behind storage dedup (LBFS, Muthitacharoen
    et al. SOSP'01), applied to text: because boundaries depend only
    on LOCAL content, inserting a sentence into a document shifts at
    most the surrounding chunk — every other chunk hashes identically
    and dedups against the unmodified copy, which fixed-size
    chunking cannot do.

    The hash is the engine-portable 48-bit md5 integer
    (sketches._md5_u48), so an external SQL engine reproduces the
    exact boundaries.

    Scale shape (r12): ZERO shuffles — boundaries are a per-row array
    computation. The pre-r12 form posexploded every word, ran a
    doc-keyed window (lag chain + running boundary sum) and
    reassembled chunks with a groupBy(id, chunk_id) + array_sort —
    one full word-level exchange plus two sorts, all to compute
    something each document row already determines locally. Now:
    boundary positions = ``filter(sequence, i -> hash(slice) % mask
    = 0)``, chunk spans = zip of shifted boundary arrays, chunk text
    = ``concat_ws(slice(ws, start, len))`` — scan-stage expressions
    only, the hash count per word is unchanged, and downstream
    consumers see the identical (id, chunk_id, chunk, n_words) rows.
    ``parallelize_small_scan`` guards the degenerate one-row-group
    input (the fused per-row work would otherwise run on ONE task;
    a no-op at production file counts).
    """
    from .dedup import parallelize_small_scan
    from .sketches import _md5_u48

    # Each intermediate array is PROJECTED into its own column so it
    # is evaluated once per row — lambda-inlined references would
    # re-derive the whole split per element (the x02 inlining trap).
    staged = parallelize_small_scan(df).select(
        F.col(id_col).alias("id"),
        F.filter(_words(F.col(text_col)), lambda x: x != "").alias("__ws"),
    )
    ws = F.col("__ws")
    n = F.size(ws)
    # 1-based word index i ends a chunk when the trailing-`window`
    # gram hashes to 0 mod mask (only defined from i >= window)
    bounded = staged.select(
        "id",
        "__ws",
        F.filter(
            F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: (i >= window)
            & (
                _md5_u48(
                    F.concat_ws(
                        " ", F.slice(ws, i - (window - 1), F.lit(window))
                    )
                )
                % mask
                == 0
            ),
        ).alias("__bpos"),
    )
    # chunk k spans [start_k, end_k] (1-based, inclusive): starts are
    # 1 + each boundary, ends are each boundary + n. A boundary ON
    # the last word would yield an empty trailing span — filtered.
    bpos = F.col("__bpos")
    spanned = bounded.select(
        "id",
        "__ws",
        F.filter(
            F.arrays_zip(
                F.concat(
                    F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1)
                ).alias("s"),
                F.concat(bpos, F.array(n)).alias("e"),
            ),
            lambda z: z["s"] <= z["e"],
        ).alias("__spans"),
    )
    return (
        spanned.select(
            "id",
            F.posexplode(
                F.transform(
                    F.col("__spans"),
                    lambda z: F.struct(
                        F.concat_ws(
                            " ", F.slice(ws, z["s"], z["e"] - z["s"] + 1)
                        ).alias("chunk"),
                        (z["e"] - z["s"] + 1).cast("bigint").alias("n_words"),
                    ),
                )
            ).alias("chunk_id", "c"),
        )
        .select(
            "id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.n_words").alias("n_words"),
        )
    )
