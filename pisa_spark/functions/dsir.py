"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): the LLM-pretraining curation stage that picks raw-web
documents LOOKING LIKE a target domain (e.g. Wikipedia+books for
quality, a domain corpus for specialization), used for LLaMA-style
data selection at trillion-token scale.

Model (the public hashed bag-of-n-grams rendering, pinned exactly):

* features: word unigrams + space-joined bigrams of the build
  tokenizer's tokens, hashed into ``n_buckets`` by the engine's md5
  family — bucket = pmod(hash64('dsir:' || gram), B), replayed by the
  oracle as CAST('0x'||substring(md5('dsir:'||g),1,8) AS BIGINT) % B;
* importance model: add-``smoothing`` multinomial bucket models of a
  TARGET slice and a RAW slice; per-bucket log ratio
      lam[b] = ln((c_t[b]+s) / (N_t+s*B)) - ln((c_r[b]+s) / (N_r+s*B));
* per-doc log importance weight: log_w(d) = sum_b cnt(d,b) * lam[b]
  — bucket counts aggregated per doc FIRST (exact integers), then one
  dot product against the broadcast lambda relation;
* resampling: Gumbel top-k (the paper's sampling-without-replacement
  rule made deterministic): key(d) = log_w(d) + g(d) with
  g = -ln(-ln(u)), u = (pmod(hash64('dsir:g:' || doc_id), 10^6)+0.5)
  / 10^6 — the repo's exact-integer draw, so selection is a pure
  function of doc_id and replayable by the twin.

Scale shape: training is two explode + hash-aggregate passes over the
REFERENCE slices only (bucket-bounded output, <= B rows each side —
B, not vocabulary, crosses the wire); scoring is one explode + one
per-(doc, bucket) count + a broadcast join against the <= B-row
lambda relation + one per-doc aggregate; resampling is a TakeOrdered
top-n (orderBy().limit — never a single-partition window). Nothing
corpus-sized shuffles except the per-doc feature counts, which are
the same shape as every quality-scoring stage here.

Reference parity note: like the other curation stages
(functions/classifier.py, functions/lm_quality.py) this is
target-engine surface for the 100 TB pipeline, not reference-repo
surface; the deterministic-draw contract matches operators/
sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.dedup.dedup import hash64

_DEN = 1_000_000
DSIR_SALT = "dsir:"
GUMBEL_SALT = "dsir:g:"


def _features_col(text: Column) -> Column:
    """array<string>: unigrams + space-joined bigrams of the build
    tokenizer's tokens (duplicates KEPT — counts are multiplicities)."""
    toks = tokens_col(text)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucket_counts(
    docs: DataFrame, n_buckets: int, per_doc: bool
) -> DataFrame:
    """Explode features -> md5 bucket -> hash-aggregate counts.
    per_doc: (doc_id, bucket, cnt); else global (bucket, cnt)."""
    feats = docs.select(
        "doc_id", F.explode(_features_col(F.col("text"))).alias("g")
    ).select(
        "doc_id",
        F.pmod(hash64(F.col("g"), DSIR_SALT), F.lit(n_buckets)).alias(
            "bucket"
        ),
    )
    keys = ["doc_id", "bucket"] if per_doc else ["bucket"]
    return feats.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def dsir_train(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
) -> tuple[DataFrame, float]:
    """(lam, lam0): the importance model, trained on two reference
    slices (doc_id, text).

    ``lam`` is the (bucket, lam) log-ratio relation over every bucket
    OBSERVED in either slice (<= n_buckets rows — broadcast it at
    scoring time); ``lam0`` is the both-unseen constant
    ln(s/(N_t+s*B)) - ln(s/(N_r+s*B)) that corpus-only buckets take
    (same formula with ct = cr = 0). Raises when either slice has no
    features — an untrainable importance model, classifier.py's
    contract."""
    import math

    t_counts = _bucket_counts(target, n_buckets, per_doc=False)
    r_counts = _bucket_counts(raw, n_buckets, per_doc=False)
    n_t = t_counts.agg(F.sum("cnt")).collect()[0][0]
    n_r = r_counts.agg(F.sum("cnt")).collect()[0][0]
    if not n_t or not n_r:
        raise ValueError("dsir_train needs non-empty target and raw slices")
    s = float(smoothing)
    b = float(n_buckets)
    lam = (
        t_counts.withColumnRenamed("cnt", "ct")
        .join(r_counts.withColumnRenamed("cnt", "cr"), "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(s))
                    / F.lit(float(n_t) + s * b)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(s))
                    / F.lit(float(n_r) + s * b)
                )
            ).alias("lam"),
        )
    )
    lam0 = math.log(s / (float(n_t) + s * b)) - math.log(
        s / (float(n_r) + s * b)
    )
    return lam, lam0


def dsir_scores(
    docs: DataFrame,
    lam: DataFrame,
    lam0: float,
    n_buckets: int = 8192,
) -> DataFrame:
    """(doc_id, n_feats, log_w): per-doc importance weights under a
    trained (lam, lam0) model — per-doc integer bucket counts, one
    broadcast join against the <= n_buckets-row lambda relation
    (corpus-only buckets coalesce to lam0), one per-doc aggregate."""
    per_doc = _bucket_counts(docs, n_buckets, per_doc=True)
    joined = per_doc.join(F.broadcast(lam), "bucket", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(
                F.col("cnt") * F.coalesce(F.col("lam"), F.lit(float(lam0)))
            ).alias("log_w"),
        )
        .select("doc_id", "n_feats", "log_w")
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame,
    n: int,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """One-call pipeline: train on the reference slices, score
    ``docs``, Gumbel-top-``n`` resample. Returns the selected rows
    (doc_id, n_feats, log_w, key)."""
    lam, lam0 = dsir_train(target, raw, n_buckets, smoothing)
    return dsir_resample(dsir_scores(docs, lam, lam0, n_buckets), n)


def gumbel_key(log_w: Column, doc_id: Column) -> Column:
    """log_w + Gumbel(0,1) noise from the deterministic integer draw:
    u = (pmod(hash64('dsir:g:'||doc_id), 10^6) + 0.5) / 10^6,
    g = -ln(-ln(u))."""
    u = (
        F.pmod(hash64(doc_id.cast("string"), GUMBEL_SALT), F.lit(_DEN))
        + F.lit(0.5)
    ) / F.lit(float(_DEN))
    return log_w + (-F.log(-F.log(u)))


def dsir_resample(
    scored: DataFrame,
    n: int,
) -> DataFrame:
    """Gumbel top-``n`` selection over (doc_id, log_w [, ...]):
    returns the selected rows with the sampling ``key`` attached,
    ordered (key DESC, doc_id ASC) — sampling n docs without
    replacement proportionally to exp(log_w), derandomized by the
    doc-keyed draw. TakeOrdered (orderBy + limit), never a
    single-partition window."""
    keyed = scored.withColumn(
        "key", gumbel_key(F.col("log_w"), F.col("doc_id"))
    )
    return keyed.orderBy(F.col("key").desc(), F.col("doc_id").asc()).limit(n)
