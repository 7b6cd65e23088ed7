"""N-gram language-model quality scoring (CCNet-style perplexity).

The classic web-curation quality signal (Wenzek et al. 2020, CCNet;
used by LLaMA/RedPajama pipelines): score each document by the
perplexity of a small language model; unusually high perplexity means
boilerplate/gibberish, unusually low means templated spam. CCNet uses
a KenLM 5-gram; no model ships in this sandbox, so this is the
self-contained deterministic rendering — a bigram LM with add-k
smoothing TRAINED ON A REFERENCE SLICE OF THE CORPUS ITSELF (or any
caller-supplied reference docs), which is the same shape: train once,
broadcast nothing, score by joins.

Model, pinned exactly (the DuckDB twin mirrors op for op):

    P(w)        = (c(w) + k) / (N + k*V)                (unigram)
    P(w | prev) = (c(prev, w) + k) / (c(prev) + k*V)    (bigram)
    logprob(d)  = [ln P(w_1) + sum_{i>=2} ln P(w_i|w_{i-1})] / len(d)
    perplexity  = exp(-logprob)

V = reference vocabulary size (distinct unigrams), N = reference token
count, k = 0.5. Unseen words/bigrams fall through the same smoothed
formulas (c = 0), so every document scores.

Scale shape: training is two partially-aggregated counts over the
reference slice (unigrams, bigrams). Scoring joins the corpus bigram
relation against the count tables on their natural keys — equi-joins
Catalyst plans as hash joins; the count tables are corpus-DERIVED
aggregates (vocabulary- and bigram-vocabulary-sized), so the joins
co-partition by key and nothing is driver-side. Per-doc aggregation is
one (doc_id) hash aggregate. At 100 TB you train on a sampled
reference slice (the CCNet design) — pass it as ``reference``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

ADD_K = 0.5


def _bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, pos, prev, term): pos 0 row carries prev = NULL (the
    unigram-scored document opener)."""
    toks = df.select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    return toks.select(
        "doc_id",
        F.posexplode("toks").alias("pos", "term"),
        F.col("toks").alias("_t"),
    ).select(
        "doc_id",
        "pos",
        F.when(F.col("pos") > 0, F.element_at("_t", F.col("pos"))).alias(
            "prev"
        ),
        "term",
    )


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame | None = None,
    k: float = ADD_K,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, logprob, perplexity) per document under the
    add-k bigram LM trained on ``reference`` (default: the docs
    themselves — self-perplexity, the in-corpus outlier detector).
    Empty documents are omitted (no tokens, no probability)."""
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    ref = docs if reference is None else reference
    ref_bi = _bigrams(ref, text_col)
    uni = ref_bi.groupBy("term").agg(F.count(F.lit(1)).alias("c_w"))
    stats = uni.agg(
        F.sum("c_w").alias("n_tokens"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if stats["n_tokens"] is None or int(stats["v"]) == 0:
        raise ValueError(
            "reference slice has no tokens — the LM cannot be trained"
            " (empty corpus, or every reference doc tokenizes to nothing)"
        )
    n_ref, v = int(stats["n_tokens"]), int(stats["v"])
    bi = (
        ref_bi.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).alias("c_pw"))
    )
    prev_tot = uni.select(
        F.col("term").alias("prev"), F.col("c_w").alias("c_prev")
    )

    kk = float(k)
    # self-perplexity reuses the reference's bigram subtree instead of
    # tokenizing the corpus a second time in the same job
    grams = ref_bi if reference is None else _bigrams(docs, text_col)
    scored = (
        grams.join(
            uni, "term", "left"
        )
        .join(bi, ["prev", "term"], "left")
        .join(prev_tot, "prev", "left")
        .withColumn(
            "lp",
            F.when(
                F.col("prev").isNull(),
                F.log(
                    (F.coalesce(F.col("c_w"), F.lit(0)) + F.lit(kk))
                    / F.lit(float(n_ref) + kk * v)
                ),
            ).otherwise(
                F.log(
                    (F.coalesce(F.col("c_pw"), F.lit(0)) + F.lit(kk))
                    / (
                        F.coalesce(F.col("c_prev"), F.lit(0))
                        + F.lit(kk * v)
                    )
                )
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.sum("lp") / F.count(F.lit(1))).alias("logprob"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "logprob",
        F.exp(-F.col("logprob")).alias("perplexity"),
    )


def perplexity_filter(
    docs: DataFrame,
    reference: DataFrame | None = None,
    max_perplexity: float | None = None,
    quantile: float = 0.9,
    k: float = ADD_K,
    text_col: str = "text",
) -> DataFrame:
    """Docs whose perplexity is below the cut — the CCNet keep-filter.
    max_perplexity pins an absolute cut; otherwise the cut is the
    exact ``quantile`` of the corpus perplexity distribution (one
    driver scalar, like the events quantile gate)."""
    scores = lm_perplexity(docs, reference=reference, k=k, text_col=text_col)
    if max_perplexity is None:
        max_perplexity = float(
            scores.agg(
                F.expr(f"percentile(perplexity, {float(quantile)})")
            ).collect()[0][0]
        )
    keep = scores.filter(F.col("perplexity") <= float(max_perplexity)).select(
        "doc_id"
    )
    return docs.join(keep, "doc_id", "left_semi")
