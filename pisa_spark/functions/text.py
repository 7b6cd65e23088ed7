"""Text-analysis scalar functions for training-data pipelines.

All pure column expressions (JVM, codegen) with exact DuckDB-oracle
twins — no UDFs. Each returns a Column usable in any select.

Operators: token counting (whitespace + BPE-ish subword estimate),
language-ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword / repetition signals), document fingerprinting
(md5 content hash + shingle sketch hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

# tiny per-language stopword lists (deterministic, shared with oracle)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (the tokenizer's token count)."""
    return F.size(tokens_col(text))


def subword_count_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate without a vocab: tokens plus one
    extra unit per 4 chars beyond the first 4 of each word — the
    standard chars/4 heuristic, computed exactly from word lengths."""
    toks = tokens_col(text)
    extra = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(F.length(t) > 4, ((F.length(t) - 1) / 4).cast("int")).otherwise(0),
    )
    return F.size(toks) + extra


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    toks = tokens_col(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def langid_heuristic(text: Column) -> Column:
    """Best-guess language by stopword-hit rate; 'und' if nothing hits.

    greatest/struct trick keeps it one expression; ties break by the
    fixed language order en > de > es > fr (struct comparison)."""
    scored = [
        F.struct(
            stopword_hits(text, lang).alias("hits"),
            F.lit(prio).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for prio, lang in enumerate(["fr", "es", "de", "en"])
    ]
    best = F.greatest(*scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic (web-pipeline style):
    0.25*len_ok + 0.25*alpha_ratio + 0.25*stopword_signal + 0.25*(1-rep).

    len_ok: 20..10000 tokens; alpha_ratio: alphanumeric chars / chars;
    stopword_signal: min(1, en-stopword rate * 10); rep: repetition =
    1 - distinct/total tokens."""
    toks = tokens_col(text)
    n = F.size(toks)
    len_ok = F.when((n >= 20) & (n <= 10000), 1.0).otherwise(0.0)
    alpha = (
        F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
        / F.greatest(F.length(text), F.lit(1))
    )
    sw_rate = stopword_hits(text, "en") / F.greatest(n, F.lit(1))
    sw_signal = F.least(F.lit(1.0), sw_rate * 10)
    rep = 1.0 - F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    return (
        0.25 * len_ok + 0.25 * alpha + 0.25 * sw_signal + 0.25 * (1.0 - rep)
    )


def content_fingerprint(text: Column) -> Column:
    """Exact content fingerprint: md5 hex of the normalized token
    stream (whitespace/punct-insensitive, case-folded)."""
    return F.md5(F.array_join(tokens_col(text), " "))


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (Schleimer et
    al., SIGMOD'03 — the MOSS scheme): hash every positional token
    k-gram, slide a window of ``w`` consecutive k-gram hashes, keep
    each window's minimum; the DISTINCT selected hashes are the doc's
    fingerprint set. Guarantees every match of length >= k+w-1 tokens
    shares a fingerprint, while storing ~1/w of the k-gram hashes.

    Output: one row per selected hash (doc_id, fp) — set semantics.
    Pure array higher-order functions over the md5 hash family (no
    explode before the final set, no UDF); identical arithmetic in the
    DuckDB oracle. Docs with fewer than k+w-1 tokens (i.e. less than
    one full window) produce no rows — the winnowing guarantee only
    speaks to matches of at least that length, and the DuckDB twin
    applies the same threshold.
    """
    from pisa_spark.dedup.dedup import hash64

    toks = tokens_col(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    hashes = F.transform(grams, lambda g: hash64(g, salt="wf:"))
    wmins = F.transform(
        F.sequence(F.lit(1), F.size(hashes) - (w - 1)),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    fps = F.array_sort(F.array_distinct(wmins))
    # guard: F.sequence descends when start > stop, so a doc must have
    # at least one full window (>= k+w-1 tokens) before fps is evaluated
    return docs.filter(F.size(toks) >= k + w - 1).select(
        "doc_id", F.explode(fps).alias("fp")
    )


def doc_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection: one row per doc with every text metric."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        subword_count_estimate(t).alias("n_subwords"),
        langid_heuristic(t).alias("lang_guess"),
        F.round(quality_score(t), 6).alias("quality"),
        content_fingerprint(t).alias("fingerprint"),
    )


def collocations_pmi(
    toks: DataFrame, min_count: int = 5
) -> DataFrame:
    """Collocation mining by pointwise mutual information over adjacent
    token bigrams (Church & Hanks 1990):

        pmi(a, b) = ln( (c_ab / N_bigrams)
                        / ((c_a / N_tokens) * (c_b / N_tokens)) )

    Returns (a, b, n_ab, pmi) for bigrams seen >= ``min_count`` times
    (the standard noise floor — PMI of rare pairs is dominated by
    chance). All counts are exact integers; the single log expression
    is mirrored operand-for-operand by the oracle. Dataflow: one
    bigram explode + two hash aggregations + a vocabulary-sized join —
    the classic text-statistics shape, no corpus-sized shuffle beyond
    the counts.
    """
    big = (
        toks.filter(F.size("tokens") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tokens) - 1),"
                    " i -> struct(element_at(tokens, i) AS a,"
                    "             element_at(tokens, i + 1) AS b))"
                )
            ).alias("bg")
        )
        .select("bg.a", "bg.b")
    )
    bgc = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = toks.select(F.explode("tokens").alias("t"))
    uc = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n_tokens = uni.count()
    n_bigrams = bgc.agg(F.sum("n_ab")).first()[0] or 0
    if n_bigrams == 0 or n_tokens == 0:
        # no adjacent pairs anywhere (all docs < 2 tokens): empty result
        # with the contract schema, not a driver TypeError
        return bgc.select(
            "a", "b", "n_ab", F.lit(0.0).alias("pmi")
        ).limit(0)
    pmi = F.log(
        (F.col("n_ab") / F.lit(int(n_bigrams)))
        / (
            (F.col("ca") / F.lit(int(n_tokens)))
            * (F.col("cb") / F.lit(int(n_tokens)))
        )
    )
    return (
        bgc.filter(F.col("n_ab") >= min_count)
        .join(uc.select(F.col("t").alias("a"), F.col("c").alias("ca")), "a")
        .join(uc.select(F.col("t").alias("b"), F.col("c").alias("cb")), "b")
        .select("a", "b", "n_ab", F.round(pmi, 6).alias("pmi"))
    )
