"""Distributed BPE tokenizer learner (Sennrich et al., ACL'16) —
relational all the way down, no Python UDFs.

A web-scale training-data pipeline learns its subword vocabulary from
the corpus it just curated. The classic BPE trainer is a sequential
loop over an in-memory word-frequency dict; re-expressed Spark-first
it decomposes into

1. ONE corpus pass: tokenize + hash-aggregate into the
   (word, freq) relation — the only scan that touches the 100 TB
   corpus; the vocabulary relation it produces is orders of magnitude
   smaller (Heaps' law), so every later round is cheap.
2. Per merge round, over the vocabulary relation only:
   - pair counting: explode adjacent symbol pairs, map-side-combining
     hash aggregate weighted by word freq (the shuffle is
     vocab-sized, keyed by pair — head pairs are naturally combined
     map-side so skew stays bounded);
   - argmax: a 1-row driver collect of the best (count DESC, pair
     ASC) pair — bounded, like the k-means centroid collect;
   - merge application: a NARROW per-row left fold (``F.aggregate``)
     that greedily rewrites ``… lhs rhs … -> … lhs+rhs …`` left to
     right — zero shuffle, whole-stage codegen, and the fold handles
     overlapping matches exactly like the sequential trainer (in
     ``a a a`` with merge (a,a) the middle symbol merges once).

Each round persists the small vocabulary relation and drops the
previous one, so lineage stays flat no matter how many merges are
learned. Determinism is integer/string-only: counts are exact longs,
ties break lexicographically, so two cluster sizes (or the DuckDB
twin replaying the same rounds) produce byte-identical merge tables.

The reference corpus pipeline tokenizes with a fixed regex
(/root/reference readers; see corpus.tokens_col) — this module learns
the subword layer underneath that tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

# end-of-word sentinel: outside the [a-z0-9] token alphabet, and '<'
# sorts below every alphanumeric so tie-breaks stay engine-agnostic
END = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the tokenized corpus — the single corpus scan
    of the trainer."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols() -> F.Column:
    """word -> [c1, c2, ..., cN, END] (typed, codegen)."""
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    return F.concat(chars, F.array(F.lit(END)))


def _pairs() -> F.Column:
    """Adjacent symbol pairs (empty for fully-merged single symbols —
    sequence() would run descending on size-1 arrays otherwise)."""
    return F.expr(
        """CASE WHEN size(syms) < 2 THEN
             CAST(array() AS ARRAY<STRUCT<lhs: STRING, rhs: STRING>>)
           ELSE transform(sequence(0, size(syms) - 2),
                          i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs))
           END"""
    )


def _apply_merge(lhs: str, rhs: str) -> F.Column:
    """Greedy left-to-right fold rewriting adjacent (lhs, rhs) into the
    merged symbol; narrow, no shuffle."""
    merged = lhs + rhs
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    words: DataFrame, n_merges: int, min_count: int = 2
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` merges over the (word, freq) relation.

    Returns (merges, final_vocab): merges is the ordered merge table
    [{step, lhs, rhs, merged, pair_count}, ...]; final_vocab is the
    persisted (word, freq, syms) relation in its post-merge state
    (caller unpersists). Stops early when the best pair's count drops
    below ``min_count``."""
    cur = words.select(
        "word", "freq", _initial_symbols().alias("syms")
    ).persist()
    cur.count()  # materialize before the loop ever references it twice
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        best = (
            cur.select("freq", F.explode(_pairs()).alias("p"))
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["cnt"]) < min_count:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merges.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "pair_count": cnt,
            }
        )
        nxt = cur.withColumn("syms", _apply_merge(lhs, rhs)).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    return merges, cur


def subword_stats(final_vocab: DataFrame, top_n: int = 20) -> DataFrame:
    """(rank, subword, total_freq): the ``top_n`` corpus-weighted
    subword units of the learned vocabulary — the trainer's summary
    relation (count DESC, subword ASC, 1-based dense rank)."""
    totals = (
        final_vocab.select("freq", F.explode("syms").alias("subword"))
        .groupBy("subword")
        .agg(F.sum("freq").alias("total_freq"))
    )
    # orderBy+limit -> TakeOrderedAndProject (per-partition top-N +
    # tiny driver merge), so the rank window only ever sees top_n rows
    top = totals.orderBy(F.desc("total_freq"), F.asc("subword")).limit(top_n)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("total_freq"), F.asc("subword")))
        .alias("rank"),
        "subword",
        "total_freq",
    )


def bpe_encode_words(
    words: DataFrame,
    merges: list[dict],
    max_expr_chain: int = 64,
) -> DataFrame:
    """(word) -> (word, syms): ENCODE arbitrary words under a learned
    merge table — the half of the tokenizer story the trainer doesn't
    cover (words never seen in training still segment; seen words
    segment byte-identically to their final_vocab state).

    Semantics pinned to the trainer's: merges apply sequentially in
    RANK order, each exhaustively with the same greedy left-to-right
    overlap fold as ``_apply_merge``. Two implementations, identical
    by construction (asserted in tests):

    - merge tables up to ``max_expr_chain``: a chain of the trainer's
      own ``_apply_merge`` column expressions — whole-stage codegen,
      no Python, and literally the training evolution replayed.
    - larger tables: an Arrow-batched kernel doing greedy-min-rank
      (repeatedly apply the LOWEST-rank pair present). Equivalent to
      sequential-by-rank because a merge's output symbol only ever
      forms pairs of HIGHER rank (training causality: a pair's rank
      postdates both its symbols), so once rank r is exhausted no
      rank <= r pair can reappear — but O(active pairs) per word
      instead of O(|table|).

    Input is deduplicated: encode once per DISTINCT word (Zipf makes
    the distinct-word relation orders of magnitude smaller than the
    corpus), join back at the consumer."""
    base = (
        words.select("word").distinct()
        .withColumn("syms", _initial_symbols())
    )
    if len(merges) <= max_expr_chain:
        cur = base
        for m in merges:
            cur = cur.withColumn("syms", _apply_merge(m["lhs"], m["rhs"]))
        return cur

    import pandas as pd

    table = [(m["lhs"], m["rhs"]) for m in merges]
    ranks = {p: i for i, p in enumerate(table)}

    def kernel(pdf_iter):
        def enc(word: str) -> list[str]:
            syms = list(word) + [END]
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                lhs, rhs = table[best]
                merged = lhs + rhs
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == lhs and x == rhs:
                        out[-1] = merged
                    else:
                        out.append(x)
                syms = out
            return syms

        for pdf in pdf_iter:
            yield pd.DataFrame(
                {"word": pdf["word"], "syms": [enc(w) for w in pdf["word"]]}
            )

    return base.select("word").mapInPandas(
        kernel, schema="word string, syms array<string>"
    )


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    max_expr_chain: int = 64,
) -> DataFrame:
    """(doc_id, subwords): each document's full ordered subword
    sequence under the merge table — tokenize, dictionary-encode
    (distinct words encode once), join the per-word segmentations
    back, reassemble in token order. The join is word-keyed (Zipf:
    the hot words broadcast well under AQE); the only corpus-sized
    shuffle is the per-doc reassembly."""
    enc = bpe_encode_words(
        docs.select(
            F.explode(tokens_col(F.col(text_col))).alias("word")
        ),
        merges,
        max_expr_chain=max_expr_chain,
    )
    doc_words = docs.select(
        "doc_id",
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "word"),
    )
    return (
        doc_words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda x: x["syms"],
                )
            ).alias("subwords")
        )
    )


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    max_expr_chain: int = 64,
) -> DataFrame:
    """(doc_id, n_words, n_subwords, n_unmerged): per-doc encoding
    summary — the budgeting relation a packing stage consumes.
    n_unmerged counts subwords that are still single characters or the
    bare END sentinel (a proxy for how much of the doc the vocabulary
    actually covers)."""
    enc = bpe_encode_words(
        docs.select(
            F.explode(tokens_col(F.col(text_col))).alias("word")
        ),
        merges,
        max_expr_chain=max_expr_chain,
    ).select(
        "word",
        F.size("syms").alias("n_syms"),
        F.size(
            F.filter(
                "syms",
                lambda s: (F.length(s) == F.lit(1)) | (s == F.lit(END)),
            )
        ).alias("n_single"),
    )
    doc_words = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    return (
        doc_words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_subwords"),
            F.sum("n_single").cast("long").alias("n_unmerged"),
        )
    )


def encode_token_counts(
    docs: DataFrame, final_vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_subwords): per-document subword token count
    under the learned vocabulary — a broadcast-or-shuffle equi-join of
    the document words against the final (word -> |syms|) state, never
    a re-encode; this is how the trainer's output is consumed by a
    packing/budgeting stage at corpus scale."""
    sizes = final_vocab.select(
        "word", F.size("syms").alias("n_syms")
    )
    doc_words = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    return (
        doc_words.join(sizes, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_subwords"),
        )
    )
