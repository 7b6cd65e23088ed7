"""Spelling suggestion ("did you mean") — k-gram candidate generation
+ Levenshtein verify over the term dictionary (Manning/Raghavan/
Schütze, *Introduction to Information Retrieval* §3.3: isolated-term
correction with k-gram indexes and edit distance).

Semantics (the gate-pinned contract): for each query word, the
suggestions are EXACTLY the vocabulary terms within Levenshtein
distance ``max_dist``, ranked (dist ASC, df DESC, term ASC), top
``n``. A word that is itself in the vocabulary yields a dist-0 row
(callers wanting only corrections drop it); a word with no in-range
term yields no rows. The oracle twin IS this brute-force definition —
equality proves the k-gram candidate route is lossless.

Candidate generation (why this scales where brute force cannot):
matching every query word against a 10^9-term dictionary by edit
distance is a |words| x |vocab| quadratic scan. The k-gram route
bounds it: one edit operation rewrites at most k of the anchored
'$word$' grams, so a term within distance d shares at least

    |distinct_grams(word)| - d*k

DISTINCT grams with the word (destroying one gram occurrence kills at
most one distinct gram, and d edits destroy at most d*k occurrences —
the bound is sound for the distinct-set join the gram table supports).
Candidates are therefore the terms sharing >= that many grams, with
the free length-band filter |len(term) - len(word)| <= d (edit
distance is at least the length difference); the Levenshtein verify
then removes gram-collision false positives exactly. Words too short
for a positive bound (|grams| - d*k < 1) fall back to the length-
banded vocabulary scan — still vocabulary-sized, same documented slow
path as gram-less wildcards.

Scale shape: the gram table is the SAME artifact the wildcard path
uses (query/kgram.py; persisted as the `kgram_index` catalog table by
engine.precompute_kgrams) — query grams are known driver-side, so the
lookup is a pushed In(gram, ...) filter; the shared-gram count is one
hash aggregate over candidate rows; the verify is a codegen
levenshtein over candidates only. Nothing corpus-sized moves: every
relation here is vocabulary-bounded or candidate-bounded.

Reference parity note: the reference has no query parser (exact id
lookup only — src/Inference.py:227-240); suggestion is target-engine
surface built on the index's own term dictionary, like wildcards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.query.kgram import KGRAM_K, kgram_table

_OUT_COLS = ("word", "rank", "term", "dist", "df")


def anchored_grams(word: str, k: int = KGRAM_K) -> list[str]:
    """Distinct k-grams of the '$'-anchored word — the driver-side
    mirror of kgram_col (same anchoring, same distinctness)."""
    p = f"${word}$"
    return list(dict.fromkeys(p[i : i + k] for i in range(len(p) - k + 1)))


def complete_prefix(
    vocab: DataFrame, prefixes: list[str], n: int = 10
) -> DataFrame:
    """(prefix, rank, term, df) — autocomplete: per prefix, the top-n
    dictionary terms under (df DESC, term ASC). One pushed-StartsWith
    dictionary scan per prefix (the wildcard 'dat*' fast path without
    the posting serve), unioned; vocabulary-sized worst case, usually
    far less once the filter reaches storage. Empty prefixes raise —
    an unanchored scan is the caller explicitly asking for the whole
    dictionary, not a completion."""
    if not prefixes or any(not p for p in prefixes):
        raise ValueError("complete_prefix needs non-empty prefixes")
    parts = []
    for p in list(dict.fromkeys(prefixes)):
        # TakeOrdered first: orderBy().limit(n) bounds the candidate
        # set distributedly; the rank window then runs over <= n rows
        # (a lit-partition window over an UNBOUNDED match set would be
        # a single-task sort of the whole prefix range)
        w = Window.partitionBy(F.lit(p)).orderBy(
            F.col("df").desc(), F.col("term").asc()
        )
        parts.append(
            vocab.filter(F.col("term").startswith(p))
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(n)
            .withColumn("prefix", F.lit(p))
            .withColumn("rank", F.row_number().over(w))
            .select("prefix", "rank", "term", "df")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def spell_suggestions(
    vocab: DataFrame,
    words: list[str],
    n: int = 5,
    max_dist: int = 2,
    k: int = KGRAM_K,
    kgrams: DataFrame | None = None,
) -> DataFrame:
    """(word, rank, term, dist, df) — top-``n`` suggestions per word.

    vocab: (term, df) — the dictionary (block-metadata aggregate when
    serving off an index; never a payload decode). kgrams: optional
    (gram, term, df) table (kgram_table output / the persisted
    `kgram_index`); derived on the fly from vocab when absent. Words
    are deduplicated; ordering and inclusion semantics per module doc.
    """
    if not words:
        raise ValueError("spell_suggestions needs at least one word")
    spark = vocab.sparkSession
    words = list(dict.fromkeys(words))
    gram_words: list[tuple[str, list[str], int]] = []
    scan_words: list[str] = []
    for w in words:
        grams = anchored_grams(w, k)
        bound = len(grams) - max_dist * k
        if bound >= 1:
            gram_words.append((w, grams, bound))
        else:
            scan_words.append(w)
    parts = []
    if gram_words:
        if kgrams is None:
            kgrams = kgram_table(vocab, k)
        all_grams = sorted({g for _, gs, _ in gram_words for g in gs})
        pairs = spark.createDataFrame(
            [(w, g) for w, gs, _ in gram_words for g in gs],
            "word string, gram string",
        )
        bounds = spark.createDataFrame(
            [(w, b) for w, _, b in gram_words], "word string, bound int"
        )
        # pushed In(gram, ...) — query grams are known driver-side
        cand = (
            kgrams.filter(F.col("gram").isin(all_grams))
            .join(F.broadcast(pairs), "gram")
            .groupBy("word", "term")
            .agg(
                F.count(F.lit(1)).alias("shared"),
                F.max("df").alias("df"),
            )
            .join(F.broadcast(bounds), "word")
            .filter(F.col("shared") >= F.col("bound"))
        )
        parts.append(cand.select("word", "term", "df"))
    if scan_words:
        wdf = spark.createDataFrame([(w,) for w in scan_words], "word string")
        parts.append(
            F.broadcast(wdf)
            .crossJoin(vocab.select("term", "df"))
            .select("word", "term", "df")
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    # project the distance once, then filter on the column (Spark does
    # not CSE levenshtein across a filter and a later projection)
    verified = (
        unioned.filter(
            F.abs(F.length("term") - F.length("word"))
            <= F.lit(int(max_dist))
        )
        .select(
            "word",
            "term",
            F.levenshtein("term", "word").cast("int").alias("dist"),
            "df",
        )
        .filter(F.col("dist") <= F.lit(int(max_dist)))
    )
    w_rank = Window.partitionBy("word").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        verified.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= n)
        .select(*_OUT_COLS)
    )
