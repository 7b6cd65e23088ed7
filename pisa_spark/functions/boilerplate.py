"""Paragraph-level boilerplate classification — a one-pass rendering
of the jusText heuristic (Pomikalek 2011: stopword density + length
classes with context propagation), the block-level complement to the
C4 LINE rules (functions/quality.py) in the extraction-cleanup stage.

Pinned contract (the gate replays it verbatim):

* paragraphs: '\\n'-split blocks of ``text`` in document order
  (pos = 0-based split index; empty blocks classify 'bad');
* per paragraph, over the build tokenizer's tokens:
  ``n_words`` and ``stop_ratio`` = stopword occurrences / n_words
  (multiplicity counting; 0.0 when n_words == 0), with the stop set
  CORPUS-DERIVED — the same df > floor(N/2) negative-idf artifact
  query/stopwords.py serves (a fluent-prose signal that needs no
  hand list, jusText's core idea);
* core class:
    'bad'   if n_words == 0 or stop_ratio < s_low
    'good'  if n_words >= l_long  (and ratio >= s_low)
    'short' otherwise;
* context pass (ONE lag/lead window over core labels, the one-pass
  simplification of jusText's flood — documented, not hidden):
  'short' becomes 'good' iff the previous or next paragraph's CORE
  label is 'good', else 'bad'; 'good'/'bad' are final.

``boilerplate_strip`` reassembles each document from its final-good
paragraphs in order ('\\n'-joined; docs with none survive as '').

Scale shape: one posexplode (rows = paragraphs, not tokens), the
stop set broadcast as a token-membership array column, one window
over (doc_id, pos) — partitioned by doc, never global. All codegen;
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col


def paragraph_features(
    docs: DataFrame, stopwords: list[str]
) -> DataFrame:
    """(doc_id, pos, para, n_words, stop_ratio) for every paragraph."""
    stop_arr = F.array(*[F.lit(s) for s in sorted(set(stopwords))])
    paras = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "para"),
    )
    toks = tokens_col(F.col("para"))
    n_words = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    )
    return paras.select(
        "doc_id",
        "pos",
        "para",
        n_words.alias("n_words"),
        F.when(n_words > 0, stop_hits / n_words)
        .otherwise(F.lit(0.0))
        .alias("stop_ratio"),
    )


def justext_classify(
    docs: DataFrame,
    stopwords: list[str],
    s_low: float = 0.25,
    l_long: int = 15,
) -> DataFrame:
    """(doc_id, pos, para, n_words, stop_ratio, core, final) under the
    module contract."""
    feats = paragraph_features(docs, stopwords)
    core = (
        F.when(
            (F.col("n_words") == 0)
            | (F.col("stop_ratio") < F.lit(float(s_low))),
            F.lit("bad"),
        )
        .when(F.col("n_words") >= F.lit(int(l_long)), F.lit("good"))
        .otherwise(F.lit("short"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    classified = feats.withColumn("core", core).withColumn(
        "final",
        F.when(F.col("core") != "short", F.col("core")).otherwise(
            F.when(
                (F.lag("core", 1).over(w) == "good")
                | (F.lead("core", 1).over(w) == "good"),
                F.lit("good"),
            ).otherwise(F.lit("bad"))
        ),
    )
    return classified


def boilerplate_strip(
    docs: DataFrame,
    stopwords: list[str],
    s_low: float = 0.25,
    l_long: int = 15,
) -> DataFrame:
    """(doc_id, text): documents reassembled from final-good
    paragraphs in order."""
    good = justext_classify(docs, stopwords, s_low, l_long).filter(
        F.col("final") == "good"
    )
    kept = good.groupBy("doc_id").agg(
        F.concat_ws(
            "\n", F.array_sort(F.collect_list(F.struct("pos", "para")))
            .getField("para")
        ).alias("text")
    )
    return docs.select("doc_id").join(kept, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
