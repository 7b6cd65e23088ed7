"""RM3 pseudo-relevance feedback — automatic query expansion, the
classic two-pass retrieval composition (Lavrenko & Croft 2001 relevance
models; Abdul-Jaleel et al. 2004 RM3 interpolation; the rendering every
open-source engine ships as "RM3").

Pipeline, entirely in DataFrame ops (two scoring passes, one window
per pass — no driver round-trip between passes, the whole thing is a
single lazy plan):

1. **Pass 1**: BM25 top ``fb_docs`` per query (the engine's shared tie
   rule, score DESC / doc_id ASC).
2. **RM1 weights**: for each feedback doc D and term t,
   P(t|D) = tf(t,D)/|D|; the relevance-model weight is the mean over
   the query's feedback docs: ``w_rm(t) = sum_D tf/dl / n_fb``
   (uniform P(D) — the standard pinning). Rounded to 9 dp — the same
   quantization contract as similarity/kmeans.py: the round collapses
   cross-engine float-sum reassociation (sums of <= fb_docs addends,
   error ~1e-17) below decimal granularity, so expansion-term
   SELECTION is deterministic and the DuckDB twin replays it exactly.
3. **Expansion terms**: top ``fb_terms`` by (w_rm DESC, term ASC).
4. **RM3 interpolation**: v(t) = ow * P_orig(t) + (1-ow) * w_rm(t)
   with P_orig = 1/|Q| per distinct original term, ow =
   ``orig_weight`` (full outer merge — original terms always survive).
5. **Pass 2**: weighted BM25, score(d) = sum_t v(t) * bm25_t(d) over
   the merged term set; shared top-k window.

Scale: pass 1 touches only the original terms' postings; the RM1
aggregation touches only the feedback docs' rows (|queries| x fb_docs
doc ids, an equi-join on doc_id); pass 2 touches the merged terms'
postings (<= |Q| + fb_terms per query). Both scoring passes are the
same broadcast-terms / partial-agg shuffle shape as
bm25_topk_dataframe — nothing scans the corpus.

Reference parity: the reference has no query expansion (one fixed
learned scorer, /root/reference/src/Inference.py:227-240); this is
target-engine surface mandated by the full-text north rule's "query
and data-processing capabilities" completeness bar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import score_expr, topk_window


def _with_df(tf_df: DataFrame, df_df: DataFrame | None = None) -> DataFrame:
    """Decorate the tf relation with per-term document frequency.

    df_df: optional precomputed (term, df) side table. When serving off
    the compressed index, pass ``postings.groupBy("term").agg(
    F.sum("n"))`` — an aggregation over BLOCK METADATA rows (thousands)
    instead of the decoded posting relation (billions); without it the
    fallback groupBy re-traverses the full decode, which at bench scale
    dominated the RM3 plan (BENCH r3: q_rm3 4.45 s)."""
    if "df" in tf_df.columns:
        return tf_df
    if df_df is None:
        df_df = tf_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf_df.join(F.broadcast(df_df.select("term", "df")), "term")


def rm3_expansion_terms(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    fb_docs: int = 3,
    fb_terms: int = 5,
    orig_weight: float = 0.5,
    df_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, term, v) — the RM3-interpolated weighted query.

    ``tf_df``: (doc_id, term, tf, doc_len) [+ df]; ``queries_df``:
    (query_id, term); ``df_df``: optional (term, df) side table (see
    _with_df). See module docstring for the pinned semantics.
    """
    raw = tf_df  # RM1 needs no df — keep its subtree join-free
    tf_df = _with_df(tf_df, df_df)
    qterms = queries_df.select("query_id", "term").distinct()
    qn = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    # pass 1: BM25 feedback docs
    p1 = (
        tf_df.join(F.broadcast(qterms), "term")
        .withColumn("pscore", score_expr(n_docs, avgdl))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("pscore").alias("score"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    fb = (
        p1.withColumn("rnk", F.row_number().over(w1))
        .filter(F.col("rnk") <= fb_docs)
        .select("query_id", "doc_id")
    )
    nfb = fb.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_fb"))
    # RM1: mean P(t|D) over feedback docs, quantized to 9 dp.
    # fb is |queries| x fb_docs rows — broadcast it so the big decoded
    # relation streams through a map-side hash join, never a shuffle.
    rm1 = (
        F.broadcast(fb)
        .join(raw.select("doc_id", "term", "tf", "doc_len"), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("tf") / F.col("doc_len")).alias("s"))
        .join(nfb, "query_id")
        .select(
            "query_id",
            "term",
            F.round(F.col("s") / F.col("n_fb"), 9).alias("w_rm"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("w_rm").desc(), F.col("term").asc()
    )
    exp = (
        rm1.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= fb_terms)
        .select("query_id", "term", "w_rm")
    )
    orig = qterms.join(qn, "query_id").select(
        "query_id", "term", (F.lit(1.0) / F.col("n_terms")).alias("p_orig")
    )
    return (
        orig.join(exp, ["query_id", "term"], "full_outer")
        .select(
            "query_id",
            "term",
            (
                F.lit(orig_weight) * F.coalesce(F.col("p_orig"), F.lit(0.0))
                + F.lit(1.0 - orig_weight)
                * F.coalesce(F.col("w_rm"), F.lit(0.0))
            ).alias("v"),
        )
    )


def weighted_bm25_topk(
    tf_df: DataFrame,
    weighted_terms: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
    df_df: DataFrame | None = None,
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """Top-k under a weighted term query: score(d) = sum_t v(t) *
    bm25_t(d) over ``weighted_terms`` (query_id, term, v). The
    scoring pass every expansion/reformulation front ends on.

    exclude_ids: optional (doc_id) relation dropped by anti-join
    BEFORE the top-k window (an excluded doc must not occupy a rank
    slot) — the tombstone-deletes / '-term' hook. Not force-broadcast:
    the deletes table is small by contract but a stop-word negation's
    doc set is not; AQE picks the join strategy from runtime sizes."""
    scored = (
        _with_df(tf_df, df_df)
        .join(F.broadcast(weighted_terms), "term")
        .withColumn("pscore", F.col("v") * score_expr(n_docs, avgdl))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("pscore").alias("score"))
    )
    if exclude_ids is not None:
        scored = scored.join(
            exclude_ids.select("doc_id"), "doc_id", "left_anti"
        )
    return topk_window(scored.select("query_id", "doc_id", "score"), k)


def rocchio_expansion_terms(
    tf_df: DataFrame,
    queries_df: DataFrame,
    rel_df: DataFrame,
    nonrel_df: DataFrame | None = None,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    fb_terms: int = 5,
) -> DataFrame:
    """(query_id, term, v) — Rocchio EXPLICIT relevance feedback
    (Rocchio 1971; the judged-docs counterpart to RM3/Bo1's pseudo
    feedback), rendered over the same normalized-tf building block as
    RM1 so all three expansions share one serving pass.

    Pinned contract:

    * per candidate term (any term of a judged RELEVANT doc):
      ``w(t) = round(beta * mean_rel P(t|D) - gamma * mean_nonrel
      P(t|D), 9)`` with P(t|D) = tf/dl (mean over the query's judged
      sets; an empty nonrel set contributes 0) — the 9-dp round is
      RM1's cross-engine selection pin;
    * NEGATIVE weights clamp to 0 and never select (the standard
      Rocchio floor — negative evidence demotes, it does not flip);
    * expansion set: top ``fb_terms`` by (w DESC, term ASC) among
      w > 0;
    * final weights: v(t) = alpha * P_orig(t) + w(t) (P_orig = 1/|Q|
      per distinct original term; full outer merge — originals always
      survive).

    rel_df / nonrel_df: (query_id, doc_id) judgments — |queries| x
    judged rows, broadcast; the tf relation streams through map-side
    joins exactly as in RM1."""
    qterms = queries_df.select("query_id", "term").distinct()
    qn = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))

    def _mean_ptd(j: DataFrame, name: str) -> DataFrame:
        n = j.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_j"))
        return (
            F.broadcast(j.select("query_id", "doc_id"))
            .join(tf_df.select("doc_id", "term", "tf", "doc_len"), "doc_id")
            .groupBy("query_id", "term")
            .agg(F.sum(F.col("tf") / F.col("doc_len")).alias("s"))
            .join(n, "query_id")
            .select(
                "query_id",
                "term",
                (F.col("s") / F.col("n_j")).alias(name),
            )
        )

    pos = _mean_ptd(rel_df, "p_rel")
    if nonrel_df is not None:
        neg = _mean_ptd(nonrel_df, "p_non")
        merged = pos.join(neg, ["query_id", "term"], "left").select(
            "query_id",
            "term",
            F.round(
                F.lit(float(beta)) * F.col("p_rel")
                - F.lit(float(gamma))
                * F.coalesce(F.col("p_non"), F.lit(0.0)),
                9,
            ).alias("w"),
        )
    else:
        merged = pos.select(
            "query_id",
            "term",
            F.round(F.lit(float(beta)) * F.col("p_rel"), 9).alias("w"),
        )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    exp = (
        merged.filter(F.col("w") > 0)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= fb_terms)
        .select("query_id", "term", "w")
    )
    orig = qterms.join(qn, "query_id").select(
        "query_id", "term", (F.lit(1.0) / F.col("n_terms")).alias("p_orig")
    )
    return orig.join(exp, ["query_id", "term"], "full_outer").select(
        "query_id",
        "term",
        (
            F.lit(float(alpha)) * F.coalesce(F.col("p_orig"), F.lit(0.0))
            + F.coalesce(F.col("w"), F.lit(0.0))
        ).alias("v"),
    )


def rocchio_topk(
    tf_df: DataFrame,
    queries_df: DataFrame,
    rel_df: DataFrame,
    nonrel_df: DataFrame | None = None,
    n_docs: float = 0.0,
    avgdl: float = 0.0,
    k: int = 10,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    fb_terms: int = 5,
    df_df: DataFrame | None = None,
) -> DataFrame:
    """Rocchio retrieval: explicit-feedback expansion, then the shared
    weighted-BM25 pass. Judged docs that are also in the result space
    rank normally — Rocchio reweights, it does not filter."""
    v = rocchio_expansion_terms(
        tf_df, queries_df, rel_df, nonrel_df,
        alpha, beta, gamma, fb_terms,
    )
    return weighted_bm25_topk(tf_df, v, n_docs, avgdl, k, df_df=df_df)


_LOG2E = 1.4426950408889634  # log2 pinned as ln(x)*LOG2E, like query/qpp.py


def bo1_expansion_terms(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    fb_docs: int = 3,
    fb_terms: int = 5,
    beta: float = 0.4,
    df_df: DataFrame | None = None,
    cf_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, term, v) — Bo1 divergence-from-randomness expansion
    (Amati 2003, Bose-Einstein 1; the default query expansion model of
    the Terrier family), the DFR counterpart to RM3's language-model
    weighting.

    Pinned contract (the twin-critical arithmetic):

    * feedback docs: BM25 top ``fb_docs`` (score DESC, doc_id ASC) —
      the same pass 1 as RM3;
    * ``tf_x(t)`` = total tf of t over the query's feedback docs;
    * ``P_n(t)`` = cf(t) * 1.0 / N  (collection frequency over number
      of documents);
    * ``w(t)`` = round(tf_x * log2((1+P_n)/P_n) + log2(1+P_n), 9)
      with log2(x) := ln(x) * 1.4426950408889634 — the 9-dp round
      pins expansion-term SELECTION across engines exactly as RM1's
      does;
    * expansion set: top ``fb_terms`` by (w DESC, term ASC);
    * requery weights (Rocchio-beta normalization, Terrier's rule):
      v(t) = [t in original query] + beta * w(t)/w_max, w_max the
      largest w among the SELECTED expansion terms of that query.
      Original terms are distinct post-parse, so their qtf/qtf_max
      factor is exactly 1.

    cf_df: optional (term, cf) side table — pass a precomputed
    collection-frequency relation to keep the big decode out of the
    weighting subtree; without it cf comes from one hash aggregate
    over ``tf_df``. Scale shape otherwise identical to RM3: both
    passes touch only query/expansion terms' postings; tf_x touches
    only the feedback docs' rows.
    """
    raw = tf_df
    tf_df = _with_df(tf_df, df_df)
    if cf_df is None:
        cf_df = raw.groupBy("term").agg(F.sum("tf").alias("cf"))
    qterms = queries_df.select("query_id", "term").distinct()
    p1 = (
        tf_df.join(F.broadcast(qterms), "term")
        .withColumn("pscore", score_expr(n_docs, avgdl))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("pscore").alias("score"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    fb = (
        p1.withColumn("rnk", F.row_number().over(w1))
        .filter(F.col("rnk") <= fb_docs)
        .select("query_id", "doc_id")
    )
    tfx = (
        F.broadcast(fb)
        .join(raw.select("doc_id", "term", "tf"), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").alias("tf_x"))
    )
    pn_col = F.col("cf") * F.lit(1.0) / F.lit(float(n_docs))
    bo1 = (
        tfx.join(F.broadcast(cf_df.select("term", "cf")), "term")
        .select(
            "query_id",
            "term",
            F.round(
                F.col("tf_x")
                * (F.log((F.lit(1.0) + pn_col) / pn_col) * F.lit(_LOG2E))
                + (F.log(F.lit(1.0) + pn_col) * F.lit(_LOG2E)),
                9,
            ).alias("w"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    exp = (
        bo1.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= fb_terms)
        .withColumn(
            "w_max", F.max("w").over(Window.partitionBy("query_id"))
        )
        .select("query_id", "term", "w", "w_max")
    )
    orig = qterms.select("query_id", "term", F.lit(1.0).alias("qw"))
    return (
        orig.join(exp, ["query_id", "term"], "full_outer")
        .select(
            "query_id",
            "term",
            (
                F.coalesce(F.col("qw"), F.lit(0.0))
                + F.lit(beta)
                * F.coalesce(F.col("w") / F.col("w_max"), F.lit(0.0))
            ).alias("v"),
        )
    )


def bo1_topk(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    beta: float = 0.4,
    df_df: DataFrame | None = None,
    cf_df: DataFrame | None = None,
    persist_tf: bool = False,
) -> DataFrame:
    """Two-pass Bo1 retrieval: DFR expansion, then weighted-BM25
    top-k — rm3_topk's shape with the Bose-Einstein weighting
    (persist_tf: same three-subtree decode-reuse contract as
    rm3_topk; Bo1 adds a fourth reference when cf_df is absent)."""
    if persist_tf:
        from pyspark.storagelevel import StorageLevel

        tf_df = tf_df.persist(StorageLevel.MEMORY_AND_DISK)
    v = bo1_expansion_terms(
        tf_df, queries_df, n_docs, avgdl, fb_docs, fb_terms, beta,
        df_df=df_df, cf_df=cf_df,
    )
    return weighted_bm25_topk(tf_df, v, n_docs, avgdl, k, df_df=df_df)


def rm3_topk(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    orig_weight: float = 0.5,
    df_df: DataFrame | None = None,
    persist_tf: bool = False,
) -> DataFrame:
    """Two-pass RM3 retrieval: expand, then weighted-BM25 top-k.

    df_df: (term, df) side table — pass the block-metadata aggregate
    when tf_df is a postings decode so neither pass re-scans the
    decoded relation to count document frequencies.

    persist_tf: the single lazy plan references ``tf_df`` in THREE
    subtrees (pass-1 scoring, the RM1 feedback join, pass-2 scoring);
    when tf_df is a postings DECODE, each reference re-runs the full
    mapInPandas decode — Spark materializes no common subtree on its
    own. True persists it (MEMORY_AND_DISK) so the decode runs once —
    the right call for the offline corpus-resident batch-expansion
    context this path exists for (measured in BENCH.md). The persisted
    relation stays registered until the caller unpersists it or the
    session ends — one-shot batch jobs don't care; a long-lived server
    should manage the lifecycle itself and pass False. Also leave
    False when the relation is too large to persist — or better, use
    the engine facade, whose per-pass decodes are term-/id-pruned
    round-trips that never touch the whole index."""
    if persist_tf:
        from pyspark.storagelevel import StorageLevel

        tf_df = tf_df.persist(StorageLevel.MEMORY_AND_DISK)
    v = rm3_expansion_terms(
        tf_df, queries_df, n_docs, avgdl, fb_docs, fb_terms, orig_weight,
        df_df=df_df,
    )
    return weighted_bm25_topk(tf_df, v, n_docs, avgdl, k, df_df=df_df)
