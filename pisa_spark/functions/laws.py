"""Collection-law statistics: Zipf rank-frequency slope and Heaps'
vocabulary-growth fit — the two classical regularities of web text
(Manning/Raghavan/Schütze IIR §5.1, public). A crawl slice whose Zipf
slope or Heaps exponent is far from the expected band (~-1, and
beta ~ 0.4-0.6) is the cheapest corpus-level quality smoke test a
curation pipeline has, and the fits size index structures (vocabulary
growth -> term-dictionary capacity; the head of the Zipf curve ->
skew-split and stop-list candidates).

Determinism contract (DuckDB-twin-exact): the regression points are
log values ROUNDED to 8 dp and summed as DECIMAL(38,12) — exact
integer arithmetic, no float reassociation across partitionings or
engines; only the final slope/intercept/r2 touch floating point, from
identical decimal inputs. (Java's Math.log and libm's log may differ
in the last ulp; an 8-dp rounding only flips if a value sits within
~1e-16 of a rounding boundary — the same pinning argument the 4-dp
score gates use.)

Scale shape: Zipf reads the vocabulary-sized (term, cf) relation and
keeps only the top-``top_n`` head via orderBy().limit() — a
TakeOrdered (per-partition top-N + driver merge), never a full sort
shuffle; the rank window that follows runs over the N collected-size
rows ONLY (bounded by construction). Heaps is two broadcast-joined
conditional aggregates over (term, first_doc) and (doc_id, doc_len) —
one pass each, checkpoint count ~20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,12)"


def _ols(points: DataFrame, x: str, y: str, prefix: str) -> DataFrame:
    """One row ({prefix}_slope, {prefix}_intercept, {prefix}_r2,
    {prefix}_n): least-squares fit of y on x over a SMALL points
    relation (bounded upstream). Sums are exact decimals of the 8-dp
    rounded coordinates."""
    xd = F.round(F.col(x), 8).cast(_DEC)
    yd = F.round(F.col(y), 8).cast(_DEC)
    agg = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    intercept = (sy - slope * sx) / n
    r2 = (cov * cov) / (varx * vary)
    return agg.select(
        F.round(slope, 4).alias(f"{prefix}_slope"),
        F.round(intercept, 4).alias(f"{prefix}_intercept"),
        F.round(r2, 4).alias(f"{prefix}_r2"),
        F.col("n").alias(f"{prefix}_n"),
    )


def zipf_fit(tf: DataFrame, top_n: int = 1000) -> DataFrame:
    """One row (zipf_slope, zipf_intercept, zipf_r2, zipf_n): OLS fit
    of ln(cf) on ln(rank) over the top-``top_n`` collection-frequency
    head, rank by (cf DESC, term ASC). tf: (term, tf) doc-level rows.
    Pure Zipf would give slope -1; web corpora typically -0.7..-1.2."""
    from pyspark.sql import Window

    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    head = cf.orderBy(F.col("cf").desc(), F.col("term").asc()).limit(top_n)
    # window over <= top_n rows (bounded by the limit above)
    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    pts = head.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("lx"),
        F.log(F.col("cf").cast("double")).alias("ly"),
    )
    return _ols(pts, "lx", "ly", "zipf")


def heaps_points(
    tf: DataFrame,
    doc_lens: DataFrame,
    checkpoints: list[int],
) -> DataFrame:
    """(c, tokens_seen, vocab_seen) per checkpoint doc_id ``c``: the
    vocabulary-growth curve in total doc_id order — tokens_seen =
    sum(doc_len) over docs <= c, vocab_seen = #terms whose FIRST
    containing doc is <= c. Two conditional aggregates against the
    broadcast checkpoint list; nothing corpus-sized crosses the wire."""
    spark = tf.sparkSession
    cps = spark.createDataFrame([(int(c),) for c in checkpoints], "c long")
    first = tf.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    vocab = (
        first.join(F.broadcast(cps), F.col("first_doc") <= F.col("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("vocab_seen"))
    )
    toks = (
        doc_lens.join(F.broadcast(cps), F.col("doc_id") <= F.col("c"))
        .groupBy("c")
        .agg(F.sum("doc_len").alias("tokens_seen"))
    )
    return toks.join(vocab, "c")


def heaps_fit(points: DataFrame) -> DataFrame:
    """One row (heaps_slope=beta, heaps_intercept=ln K, heaps_r2,
    heaps_n): OLS of ln(vocab_seen) on ln(tokens_seen) over the
    checkpoint curve — V(n) = K * n^beta."""
    pts = points.select(
        F.log(F.col("tokens_seen").cast("double")).alias("lx"),
        F.log(F.col("vocab_seen").cast("double")).alias("ly"),
    )
    return _ols(pts, "lx", "ly", "heaps")


def collection_laws(
    tf: DataFrame,
    doc_lens: DataFrame,
    checkpoints: list[int],
    top_n: int = 1000,
) -> DataFrame:
    """One row: the Zipf head fit and the Heaps growth fit side by
    side — the corpus-level law report."""
    return zipf_fit(tf, top_n=top_n).crossJoin(
        heaps_fit(heaps_points(tf, doc_lens, checkpoints))
    )
