"""FastText-style quality classifier — Naive Bayes rendering.

The classifier-filter stage of the GPT-3 / LLaMA / CCNet curation
pipelines: train a linear text classifier on "high-quality reference"
documents (Wikipedia, books) versus raw crawl, then keep pages the
classifier scores as reference-like. fastText itself is a shallow
linear model over bag-of-words features; no trained weights ship in
this sandbox, so this is the deterministic closed-form rendering of
the same shape — multinomial Naive Bayes with add-k smoothing TRAINED
ON TWO CALLER-SUPPLIED REFERENCE SLICES (for NB the optimal linear
weights ARE the smoothed log-count ratios, so training is counting).

Model, pinned exactly (the DuckDB twin mirrors it op for op):

    V        = |vocab(pos) UNION vocab(neg)|   (distinct terms)
    P(t|c)   = (c_c(t) + k) / (N_c + k*V)      (k = 0.5)
    prior    = ln(D_pos / D_neg)               (slice doc counts)
    logit(d) = prior + sum_i [ln P(w_i|pos) - ln P(w_i|neg)]
    llr_tok  = (logit(d) - prior) / n_tokens   (length-invariant)
    p_ref    = 1 / (1 + exp(-logit))

c_c(t) = occurrences of t in class c's slice; N_c = class token
count. Terms unseen in both classes fall through the same smoothed
formulas (c = 0), so every document scores; empty documents are
omitted (no tokens, no likelihood).

Scale shape (the lm_quality pattern — train once, join by key, never
collect the model): training is one partially-aggregated count pass
per class (vocabulary-sized outputs); scoring equi-joins the corpus
token relation against the two count tables and runs ONE per-doc hash
aggregate. Four scalars (V, N_pos, N_neg, prior) reach the driver —
nothing else. At 100 TB the reference slices are samples (the CCNet
design); the corpus-side cost is one tokenize + join + aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

ADD_K = 0.5


def _term_rows(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term), one row per token occurrence."""
    return df.select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    ).select("doc_id", F.explode("toks").alias("term"))


def nb_classifier_scores(
    docs: DataFrame,
    positive: DataFrame,
    negative: DataFrame,
    k: float = ADD_K,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, llr_per_token, logit, p_ref) per document
    under the add-k multinomial NB trained on the two reference
    slices. p_ref is the calibrated reference-likeness probability
    (the keep signal); llr_per_token ranks length-invariantly."""
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    pos_tok = _term_rows(positive, text_col)
    neg_tok = _term_rows(negative, text_col)
    pos_counts = pos_tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("c_pos")
    )
    neg_counts = neg_tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("c_neg")
    )
    row = (
        pos_counts.select("term")
        .unionByName(neg_counts.select("term"))
        .distinct()
        .agg(F.count(F.lit(1)))
        .collect()[0]
    )
    v = int(row[0])
    n_pos = pos_counts.agg(F.sum("c_pos")).collect()[0][0]
    n_neg = neg_counts.agg(F.sum("c_neg")).collect()[0][0]
    d_pos, d_neg = positive.count(), negative.count()
    if not n_pos or not n_neg:
        raise ValueError(
            "both reference slices must tokenize to at least one term"
            " — the classifier cannot be trained"
        )
    import math

    kk = float(k)
    prior = math.log(float(d_pos) / float(d_neg))
    scored = (
        _term_rows(docs, text_col)
        .join(pos_counts, "term", "left")
        .join(neg_counts, "term", "left")
        .withColumn(
            "lr",
            F.log(
                (F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(kk))
                / F.lit(float(int(n_pos)) + kk * v)
            )
            - F.log(
                (F.coalesce(F.col("c_neg"), F.lit(0)) + F.lit(kk))
                / F.lit(float(int(n_neg)) + kk * v)
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("lr").alias("_s"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (F.col("_s") / F.col("n_tokens")).alias("llr_per_token"),
        (F.col("_s") + F.lit(prior)).alias("logit"),
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_s") + F.lit(prior))))
        ).alias("p_ref"),
    )


def classifier_filter(
    docs: DataFrame,
    positive: DataFrame,
    negative: DataFrame,
    min_llr: float | None = None,
    quantile: float = 0.5,
    k: float = ADD_K,
    text_col: str = "text",
) -> DataFrame:
    """Docs the classifier rates reference-like — the GPT-3 keep
    filter. min_llr pins an absolute cut on llr_per_token (the
    length-invariant signal); otherwise the cut is the exact
    ``quantile`` of the corpus distribution (one driver scalar, like
    perplexity_filter)."""
    scores = nb_classifier_scores(
        docs, positive, negative, k=k, text_col=text_col
    )
    if min_llr is None:
        min_llr = float(
            scores.agg(
                F.expr(f"percentile(llr_per_token, {float(quantile)})")
            ).collect()[0][0]
        )
    keep = scores.filter(
        F.col("llr_per_token") >= float(min_llr)
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
