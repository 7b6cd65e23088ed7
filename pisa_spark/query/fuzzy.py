"""Fuzzy term matching: edit-distance vocabulary lookup without an
all-pairs scan, plus did-you-mean query correction.

Algorithm (the SymSpell deletion-neighborhood scheme, Garbe 2012 —
public): a term's *deletion neighborhood* is itself plus every string
reachable by deleting up to ``max_dist`` characters. Two strings
within Levenshtein distance d share at least one member of their
d-deletion neighborhoods, so candidate pairs fall out of an equi-join
on neighborhood keys — O(|vocab| * len^d) small rows instead of
|vocab| x |queries| distance computations — and one JVM
``levenshtein`` verify pass removes the false positives the deletion
join admits (the join is complete, not exact).

Scale: the vocabulary relation is corpus-bounded (tens of millions of
terms at web scale, NOT corpus-sized), the explode multiplies it by
~word-length, and the join keys are short strings that hash-spread
evenly; query-side neighborhoods are tiny and broadcast. No stage
touches the posting lists.

Everything is column expressions (transform/sequence/substring —
whole-stage codegen); the DuckDB oracle twin deliberately uses the
naive cross-join + levenshtein formulation, so the gate proves the
deletion join reproduces the exact brute-force semantics.

Reference parity note: the reference has no query parser beyond exact
id lookup; this is target-engine surface (every web search box needs
it) built on the engine's own vocabulary table (term_stats / df).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(term: Column, max_dist: int = 1) -> Column:
    """array<string> deletion neighborhood of ``term``: the term plus
    every distinct string obtained by deleting up to ``max_dist``
    single characters (nested transform per level, then flatten +
    distinct). max_dist is 1 or 2 — d>2 explodes the neighborhood
    faster than it helps and real spell correction stops at 2."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def dels(t: Column) -> Column:
        # delete char i (1-based): prefix [1, i) + suffix (i, end]
        return F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.concat(
                F.substring(t, F.lit(1), i - 1),
                F.substring(t, i + 1, F.length(t)),
            ),
        )

    level1 = dels(term)
    out = F.concat(F.array(term), level1)
    if max_dist == 2:
        out = F.concat(out, F.flatten(F.transform(level1, dels)))
    return F.array_distinct(out)


def fuzzy_term_matches(
    vocab: DataFrame,
    queries: DataFrame,
    max_dist: int = 1,
) -> DataFrame:
    """All (qterm, term) pairs within Levenshtein ``max_dist``.

    vocab: (term [, df ...]) — extra columns ride through.
    queries: (qterm).
    Output: vocab columns + qterm + dist, exact-verified.

    Plan shape: explode both deletion neighborhoods, hash-join on the
    neighborhood key, drop duplicate candidates, one levenshtein
    verify. The query side is tiny -> broadcast; the vocab explode is
    the only sized stage and it is vocabulary- not corpus-sized.
    """
    v = vocab.withColumn(
        "_k", F.explode(deletion_variants(F.col("term"), max_dist))
    )
    q = queries.select(
        "qterm", F.explode(deletion_variants(F.col("qterm"), max_dist)).alias("_k")
    )
    cand = v.join(F.broadcast(q), "_k").drop("_k").dropDuplicates(
        ["term", "qterm"]
    )
    return cand.withColumn(
        "dist", F.levenshtein(F.col("qterm"), F.col("term"))
    ).filter(F.col("dist") <= max_dist)


def best_corrections(
    vocab: DataFrame,
    queries: DataFrame,
    max_dist: int = 1,
) -> DataFrame:
    """One row per qterm: the best vocabulary correction — smallest
    edit distance, then largest df (most common wins, the standard
    spell-correction prior), then term ascending as the deterministic
    tie-break. vocab must carry (term, df)."""
    from pyspark.sql import Window

    matched = fuzzy_term_matches(vocab, queries, max_dist)
    w = Window.partitionBy("qterm").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("qterm", "term", "dist", "df")
    )


def suggest_prefix(
    vocab: DataFrame,
    prefixes: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Query autocomplete: for each prefix, the top-``n`` vocabulary
    terms by document frequency (df DESC, term ASC tie-break).

    vocab: (term, df); prefixes: (prefix). The prefix side is tiny and
    broadcast; the match is a starts-with predicate over the term
    dictionary — at scale the dictionary is the index's term column
    (vocabulary-sized, not corpus-sized), and a sorted/bucketed term
    dictionary turns each prefix into a range scan (the standard FST/
    trie rendering is an in-memory optimization of the same contract).
    """
    from pyspark.sql import Window

    cand = vocab.join(
        F.broadcast(prefixes),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select("prefix", F.col("_rn").alias("rank"), "term", "df")
    )


def expand_wildcards(
    postings: DataFrame,
    prefixes: list[str],
    max_expand: int = 64,
) -> dict[str, list[str]]:
    """Prefix-wildcard expansion against the index's own term
    dictionary: 'dat*' -> every indexed term starting with 'dat',
    capped at ``max_expand`` per pattern by (df DESC, term ASC) — the
    deterministic 'most selective first' order every engine with
    wildcard support applies when a pattern explodes.

    One job over posting-block METADATA (term, n) only: the
    starts-with disjunction is pushed to the scan (StringStartsWith),
    payload columns are never read, and the per-pattern cap is applied
    IN SPARK (suggest_prefix's window rank) before the collect — the
    driver never receives more than |patterns| * max_expand rows, even
    for a one-character pattern over a web-scale vocabulary. Returns
    {prefix: [terms]} with df-desc/term-asc order."""
    if not prefixes:
        return {}
    cond = None
    for p in prefixes:
        c = F.col("term").startswith(p)
        cond = c if cond is None else cond | c
    # attribute/numeric filter pseudo-terms share the postings relation
    # ('lang:en' — build.attribute_tokens_col); a pattern like 'lang*'
    # must never expand into them, so the collision-free ':' separator
    # is excluded right in the pushed scan filter
    vocab = (
        postings.filter(cond & ~F.col("term").contains(":"))
        .groupBy("term")
        .agg(F.sum("n").alias("df"))
    )
    prefixes_df = postings.sparkSession.createDataFrame(
        [(p,) for p in prefixes], "prefix string"
    )
    ranked = suggest_prefix(vocab, prefixes_df, n=max_expand).collect()
    out: dict[str, list[str]] = {p: [] for p in prefixes}
    for r in sorted(ranked, key=lambda r: (r["prefix"], r["rank"])):
        out[r["prefix"]].append(r["term"])
    return out


def wildcard_topk(
    postings: DataFrame,
    queries: list[dict],
    n_docs: float,
    avgdl: float,
    k: int = 10,
    max_expand: int = 64,
    term_dfs: dict | None = None,
    pre_arranged: bool = False,
    kgrams: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k for queries mixing literal terms and wildcards:
    [{query_id, terms: [...], wildcards: ['dat*', '*tion', 's*t']}].

    Semantics: each wildcard expands to the indexed terms matching it;
    the query then runs as a plain DISJUNCTION over literals +
    expansions through the block-max WAND path — every matched term
    scores with its OWN df (no df pooling across the expansion), each
    term scores once even when a literal also matches a pattern.
    Expansion routes: prefix-form 'abc*' through the pushed-StartsWith
    dictionary scan (expand_wildcards); leading/infix/multi-star forms
    through the k-gram index (kgram.expand_patterns) — both capped at
    ``max_expand`` per pattern by (df DESC, term ASC). Conjunctive
    syntax does not combine with wildcards here (ambiguous: must EVERY
    expansion match?) and raises; '-term' negation and attribute
    filters compose (doc-level exclusion/inclusion is expansion-
    independent — the WAND kernel applies both bucket-locally, and the
    deletes layer's __deleted__ pseudo-term rides the same path)."""
    from pisa_spark.query.bm25 import bm25_topk_wand

    prefix_pats: list[str] = []
    general_pats: list[str] = []
    for q in queries:
        if q.get("conjunctive"):
            raise ValueError(
                "wildcard queries are disjunctive expansion only"
            )
        for w in q.get("wildcards", []):
            if "*" not in w or not w.replace("*", ""):
                raise ValueError(
                    f"unsupported wildcard {w!r}: needs at least one"
                    " literal character and one '*'"
                )
            if w.endswith("*") and "*" not in w[:-1]:
                prefix_pats.append(w[:-1])
            else:
                general_pats.append(w)
    expansions = expand_wildcards(
        postings, sorted(set(prefix_pats)), max_expand=max_expand
    )
    if general_pats:
        from pisa_spark.query.kgram import expand_patterns

        # vocabulary (term, df) from posting-block metadata, filter
        # pseudo-terms excluded by the collision-free ':' separator.
        # The relation is LAZY: with a precomputed kgrams table and no
        # gram-less pattern, no vocabulary job ever runs.
        vocab = (
            postings.filter(~F.col("term").contains(":"))
            .groupBy("term")
            .agg(F.sum("n").alias("df"))
        )
        expansions.update(
            expand_patterns(
                vocab,
                sorted(set(general_pats)),
                max_expand=max_expand,
                kgrams=kgrams,
            )
        )
    expanded = []
    for q in queries:
        terms = list(q.get("terms", []))
        for w in q.get("wildcards", []):
            key = w[:-1] if (w.endswith("*") and "*" not in w[:-1]) else w
            terms.extend(expansions.get(key, []))
        exp = {
            "query_id": q["query_id"],
            "terms": list(dict.fromkeys(terms)),
            "conjunctive": False,
        }
        if q.get("filter"):
            # attribute filters compose: the WAND kernel intersects
            # them bucket-locally after the expansion disjunction
            exp["filter"] = list(q["filter"])
        if q.get("negated"):
            exp["negated"] = list(q["negated"])
        expanded.append(exp)
    live = [q for q in expanded if q["terms"]]
    if not live:
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    return bm25_topk_wand(
        postings, live, n_docs, avgdl, k=k, term_dfs=term_dfs,
        pre_arranged=pre_arranged,
    )
