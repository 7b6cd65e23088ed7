"""BM25F — fielded ranking (Robertson & Zaragoza 2009 §3.3.2, the
"simple BM25F" every production engine ships for title/body weighting):

    pseudo_tf(t, d) = sum_f  w_f * tf_f(t,d) / B_f(d)
    B_f(d)          = 1 - b_f + b_f * dl_f(d) / avgdl_f
    score(q, d)     = sum_t  idf(t) * pseudo_tf / (k1 + pseudo_tf)

Field tfs are length-normalized PER FIELD first, then combined with
field weights, and the saturation (k1) applies once to the combined
pseudo-tf — the crucial difference from naively summing per-field BM25
scores (which would double-saturate and over-reward matching the same
term in many fields). idf is document-level (df = docs containing the
term in ANY field), the standard pinning.

The synthetic corpus has no markup fields, so `fielded_tf` derives a
deterministic two-field split from the token stream (title = first
``title_len`` tokens, body = the rest) — the same split the oracle SQL
replays with list slicing. A real corpus plugs any (doc_id, field,
term, tf, field_len) relation into `bm25f_topk` unchanged.

Scale: identical dataflow to bm25_topk_dataframe with one extra
pre-aggregation (fields collapse into pseudo-tf per (doc, term) before
the query join) — all codegen expressions, one partial-agg shuffle per
aggregation, window top-k. Index-serving note: the stored posting
payload carries a single tf per (term, doc); serving BM25F off it
needs a fielded build (per-field tf payloads) — a declared seam, the
relation path here is the semantics contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import topk_window

BM25F_K1 = 0.9
# (weight, b) per field — title boosted, standard body normalization
FIELD_PARAMS = {"title": (2.0, 0.5), "body": (1.0, 0.4)}
TITLE_LEN = 8


def fielded_tf(toks: DataFrame, title_len: int = TITLE_LEN) -> DataFrame:
    """(doc_id, tokens) -> (doc_id, field, term, tf, field_len): the
    deterministic title/body split (title = first ``title_len``
    tokens). Docs shorter than the title keep an empty body (len 0)."""
    fields = toks.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("title").alias("field"),
                    F.slice("tokens", 1, title_len).alias("ftoks"),
                ),
                F.struct(
                    F.lit("body").alias("field"),
                    F.slice(
                        "tokens",
                        title_len + 1,
                        F.greatest(
                            F.size("tokens") - title_len, F.lit(0)
                        ),
                    ).alias("ftoks"),
                ),
            )
        ).alias("fx"),
    ).select(
        "doc_id",
        "fx.field",
        F.size("fx.ftoks").alias("field_len"),
        F.explode_outer("fx.ftoks").alias("term"),
    )
    return (
        fields.filter(F.col("term").isNotNull())
        .groupBy("doc_id", "field", "field_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_fielded_indexes(
    toks: DataFrame,
    n_buckets: int = 8,
    title_len: int = TITLE_LEN,
) -> dict[str, tuple[DataFrame, int, float]]:
    """Per-field compressed indexes from one (doc_id, tokens) relation:
    each field's token slice goes through the standard build_postings
    UNCHANGED — the per-field-index design real engines use for BM25F
    (no new payload format; the field's dls payload IS its field_len).
    Returns {field: (postings, n_docs, avg_field_len)}; n_docs and the
    per-field average count every doc, empty fields as 0."""
    from pisa_spark.index.build import build_postings

    slices = {
        "title": F.slice("tokens", 1, title_len),
        "body": F.slice(
            "tokens",
            title_len + 1,
            F.greatest(F.size("tokens") - title_len, F.lit(0)),
        ),
    }
    out = {}
    for field, expr in slices.items():
        ftoks = toks.select(
            "doc_id", expr.alias("tokens")
        ).withColumn("doc_len", F.size("tokens"))
        row = ftoks.agg(
            F.count(F.lit(1)), F.avg("doc_len"), F.max("doc_id")
        ).collect()[0]
        if int(row[0]) == 0:
            raise ValueError("build_fielded_indexes: empty corpus")
        avg = float(row[1] or 0.0)
        postings = build_postings(
            ftoks, int(row[0]), max(avg, 1e-9), n_buckets=n_buckets,
            max_doc_id=int(row[2]),
        )
        out[field] = (postings, int(row[0]), avg)
    return out


def bm25f_topk_indexed(
    field_postings: dict[str, tuple[DataFrame, int, float]],
    queries_df: DataFrame,
    k: int = 10,
    k1: float = BM25F_K1,
    field_params: dict[str, tuple[float, float]] | None = None,
    terms: list[str] | None = None,
) -> DataFrame:
    """BM25F served off per-field compressed indexes: each field's
    blocks are pruned to the query terms BELOW the decode barrier
    (PushedFilters reaches each field's scan), decoded back to a tf
    relation (postings_to_tf — its doc_len column is that field's
    length by construction), tagged and unioned into the fielded
    relation, then scored by bm25f_topk. Identical results to the
    relation path: per-term df and per-field averages are invariant to
    pruning other terms."""
    from pisa_spark.query.scorers import postings_to_tf

    if terms is None:
        terms = [
            r["term"]
            for r in queries_df.select("term").distinct().collect()
        ]
    frames = []
    n_docs = 0
    afl: dict[str, float] = {}
    for field, (postings, n, avg) in field_postings.items():
        n_docs = max(n_docs, n)
        afl[field] = avg
        rel = postings_to_tf(
            postings.filter(F.col("term").isin(list(terms)))
        ).select(
            "doc_id",
            "term",
            "tf",
            F.col("doc_len").alias("field_len"),
            F.lit(field).alias("field"),
        )
        frames.append(rel)
    ftf = frames[0]
    for f in frames[1:]:
        ftf = ftf.unionByName(f)
    return bm25f_topk(
        ftf, queries_df, n_docs, afl, k=k, k1=k1,
        field_params=field_params,
    )


def avg_field_lengths(
    toks: DataFrame, title_len: int = TITLE_LEN
) -> dict[str, float]:
    """Mean field length per field over ALL docs (empty bodies count
    as 0 — the avgdl_f denominator must see the whole corpus)."""
    row = toks.select(
        F.least(F.size("tokens"), F.lit(title_len)).alias("tl"),
        F.greatest(F.size("tokens") - title_len, F.lit(0)).alias("bl"),
    ).agg(F.avg("tl"), F.avg("bl")).collect()[0]
    return {"title": float(row[0]), "body": float(row[1])}


def bm25f_topk(
    ftf: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avg_field_lens: dict[str, float],
    k: int = 10,
    k1: float = BM25F_K1,
    field_params: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Top-k under BM25F over a fielded tf relation
    (doc_id, field, term, tf, field_len)."""
    field_params = field_params or FIELD_PARAMS
    # per-field normalized contribution, then collapse to pseudo-tf
    wexpr = None
    for f, (w, b) in field_params.items():
        val = (
            F.lit(w)
            * F.col("tf")
            / (
                1.0
                - b
                + F.lit(b)
                * F.col("field_len")
                / F.lit(float(avg_field_lens[f]))
            )
        )
        cond = F.col("field") == f
        wexpr = (
            F.when(cond, val) if wexpr is None else wexpr.when(cond, val)
        )
    # a field absent from field_params must ERROR, not silently
    # contribute nothing: without the otherwise, the when-chain yields
    # NULL and F.sum skips it. raise_error is a codegen expression —
    # no extra scan, fires only if an unlisted field value appears.
    wexpr = wexpr.otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "bm25f_topk: field value not in field_params "
                    f"{sorted(field_params)}: "
                ),
                F.col("field"),
            )
        ).cast("double")
    )
    contrib = ftf.withColumn("c", wexpr)
    pseudo = contrib.groupBy("doc_id", "term").agg(
        F.sum("c").alias("ptf")
    )
    # document-level df: docs containing the term in any field
    dfreq = pseudo.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries_df.select("query_id", "term").distinct()
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        pseudo.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .withColumn(
            "pscore", idf * F.col("ptf") / (F.lit(k1) + F.col("ptf"))
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("pscore").alias("score"))
    )
    return topk_window(scored.select("query_id", "doc_id", "score"), k)
