"""Web-corpus quality filtering: Gopher-style document signals,
n-gram repetition metrics, and C4-style line filtering.

The rules are the published web-pipeline heuristics — the Gopher
document/repetition filters (Rae et al. 2021, arXiv:2112.11446,
Table A1) and the C4 line filters (Raffel et al. 2020,
arXiv:1910.10683 §2.2). Where a paper leaves a definition loose (what
counts as "the characters of an n-gram occurrence", tie-breaks for
the most frequent gram) this module pins one deterministic meaning
and the DuckDB oracle twin mirrors it exactly.

Everything is pure Spark column expressions (whole-stage codegen; no
UDFs); the repetition metrics are the only pass that shuffles — one
explode + groupBy on (doc_id, n, gram), which distributes by doc and
gram so a 100 TB corpus spreads evenly (no per-doc driver work, no
all-pairs anything). Scale note: the explode emits ~n_tokens rows per
doc per n — the same order of work as the index build's posting
explode, and it partitions the same way.

Reference parity note: the reference pipeline has no text-quality
stage (it consumes pre-cleaned interaction CSVs —
/root/reference/src/helpers/Reader.py); these operators are the
"beyond the reference" training-data-pipeline surface the brief
mandates, built on the same tokenizer as the index
(pisa_spark/corpus.py tokens_col) so filter decisions and index
contents agree.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

# Gopher's "must contain >=2 of these" stopword rule (Table A1).
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Gopher document-filter thresholds (Table A1).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_REQUIRED_STOPWORDS = 2


def _lines(text: Column) -> Column:
    """Non-empty trimmed lines of ``text`` (array<string>)."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _raw_words(text: Column) -> Column:
    """Whitespace-split words, case/punct preserved (array<string>)."""
    return F.filter(F.split(text, "\\s+"), lambda w: w != "")


def _occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences of a literal substring."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def gopher_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with the Gopher document-filter signals and the
    combined pass/fail verdict.

    Columns: n_words, mean_word_len, frac_alpha_words,
    symbol_word_ratio, frac_bullet_lines, frac_ellipsis_lines,
    n_required_stopwords, gopher_pass.

    Definitions (pinned; oracle twin mirrors them verbatim):
    - words = tokenizer tokens (corpus.tokens_col — same tokens the
      index sees, so the filter and the index agree on length);
    - mean_word_len over those tokens;
    - alpha words = whitespace-split raw words containing [a-zA-Z];
    - symbols = '#' chars + '...' + '…' occurrences, ratio over words;
    - bullet lines start with '-', '*' or '•' after trim; ellipsis
      lines end with '...' or '…';
    - required stopwords: distinct hits in REQUIRED_STOPWORDS.

    Fractions are rounded to 6 dp; the pass verdict is computed on the
    unrounded values.
    """
    t = F.col(text_col)
    toks = tokens_col(t)
    n = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    ) / F.greatest(n, F.lit(1))
    words = _raw_words(t)
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ) / F.greatest(F.size(words), F.lit(1))
    symbols = (
        _occurrences(t, "#") + _occurrences(t, "...") + _occurrences(t, "…")
    )
    sym_ratio = symbols / F.greatest(n, F.lit(1))
    lines = _lines(t)
    n_lines = F.size(lines)
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda l: l.like("-%") | l.like("*%") | l.like("•%"),
        )
    ) / F.greatest(n_lines, F.lit(1))
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.like("%...") | l.like("%…"))
    ) / F.greatest(n_lines, F.lit(1))
    n_req = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS]),
        )
    )
    gopher_pass = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
        & (sym_ratio <= GOPHER_MAX_SYMBOL_WORD_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (ellipsis_frac <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (n_req >= GOPHER_MIN_REQUIRED_STOPWORDS)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("frac_alpha_words"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("frac_bullet_lines"),
        F.round(ellipsis_frac, 6).alias("frac_ellipsis_lines"),
        n_req.cast("long").alias("n_required_stopwords"),
        gopher_pass.alias("gopher_pass"),
    )


def ngram_repetition(
    docs: DataFrame,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 10),
    text_col: str = "text",
) -> DataFrame:
    """Gopher repetition metrics: per doc, the character fraction
    covered by (a) the single most-covering n-gram for n in ``top_ns``
    (``top{n}_char_frac``) and (b) all duplicated n-grams for n in
    ``dup_ns`` (``dup{n}_char_frac``).

    Pinned definitions: grams are positional token n-grams joined with
    a single space; an occurrence covers len(gram) characters
    (overlaps counted per occurrence, so fractions can exceed 1 on
    pathological repeats — a stronger repetition signal, kept raw);
    the denominator is the character length of the space-joined token
    stream; "most-covering" = max over grams of count*len (count-then
    -length tie-breaks collapse into one deterministic max). Docs with
    fewer than n tokens score 0.0 for that n.

    Dataflow: one explode to (doc_id, n, gram) rows, one groupBy count
    — shuffle keyed by (doc, n, gram), so head grams of one doc cannot
    hot-spot a partition the way corpus-wide term keys would. This is
    the same cardinality as the index build's posting explode.
    """
    toks = tokens_col(F.col(text_col))
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.length(F.array_join(toks, " ")).alias("tc"),
    )
    ns = sorted(set(top_ns) | set(dup_ns))

    # one-arg lambda per n via a factory: a default-arg lambda would
    # have two params, which F.transform binds as (element, index)
    def _gram_at(n):
        return lambda i: F.array_join(F.slice("toks", i, n), " ")

    parts = []
    for n in ns:
        grams = F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)), _gram_at(n)
        )
        parts.append(
            base.filter(F.size("toks") >= n).select(
                "doc_id",
                "tc",
                F.lit(n).alias("n"),
                F.explode(grams).alias("g"),
            )
        )
    ex = reduce(lambda a, b: a.unionByName(b), parts)
    per = (
        ex.groupBy("doc_id", "tc", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "tc", "n")
        .agg(
            F.max(F.col("c") * F.length("g")).alias("top_chars"),
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("g")).otherwise(0)
            ).alias("dup_chars"),
        )
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.round(
                F.max(F.when(F.col("n") == n, F.col("top_chars")))
                / F.greatest("tc", F.lit(1)),
                6,
            ).alias(f"top{n}_char_frac")
        )
    for n in dup_ns:
        aggs.append(
            F.round(
                F.max(F.when(F.col("n") == n, F.col("dup_chars")))
                / F.greatest("tc", F.lit(1)),
                6,
            ).alias(f"dup{n}_char_frac")
        )
    out = per.groupBy("doc_id", "tc").agg(*aggs)
    cols = [f"top{n}_char_frac" for n in top_ns] + [
        f"dup{n}_char_frac" for n in dup_ns
    ]
    return docs.select("doc_id").join(out.drop("tc"), "doc_id", "left").select(
        "doc_id", *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in cols]
    )


def c4_kept_lines(text: Column) -> Column:
    """The lines C4's line filter keeps (array<string>): trimmed,
    non-empty, ending in terminal punctuation (. ! ? \"), at least 3
    whitespace words, and not mentioning 'javascript' (case-folded)."""
    return F.filter(
        _lines(text),
        lambda l: l.rlike('[.!?"]$')
        & (F.size(F.filter(F.split(l, "\\s+"), lambda w: w != "")) >= 3)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )


def c4_line_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with the C4 cleaning outcome: line counts, the
    char fraction kept, sentence count of the cleaned text, the
    page-level flags ('{' anywhere, 'lorem ipsum' anywhere), the
    combined ``c4_pass`` (no flags, >=3 sentences), and the md5 of the
    cleaned text (newline-joined kept lines) so the oracle pins the
    exact cleaned content, not just the counts.

    Sentences are counted as terminal-punctuation characters ([.!?])
    in the cleaned text — the deterministic stand-in for C4's sentence
    splitter, mirrored in the oracle.
    """
    t = F.col(text_col)
    lines = _lines(t)
    kept = c4_kept_lines(t)
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.length(F.regexp_replace(cleaned, "[^.!?]", ""))
    has_brace = F.contains(t, F.lit("{"))
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    c4_pass = ~has_brace & ~has_lorem & (n_sentences >= 3)
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.round(
            F.length(cleaned) / F.greatest(F.length(t), F.lit(1)), 6
        ).alias("kept_char_frac"),
        n_sentences.cast("long").alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        c4_pass.alias("c4_pass"),
        F.md5(cleaned).alias("cleaned_md5"),
    )
