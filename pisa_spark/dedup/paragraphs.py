"""Paragraph-level exact deduplication — the RefinedWeb / C4 stage.

Web corpora repeat LINES far more than whole documents: boilerplate
footers, cookie banners, navigation text, licence blurbs. The standard
curation stage (C4's three-sentence rule, RefinedWeb/Dolma exact line
dedup) removes every repeated paragraph EXCEPT its first occurrence in
corpus order and stitches the survivors back into the document.

Pinned semantics (the DuckDB twin of gate ``dedup_paragraphs_stats``
replays each):

* a paragraph is a ``'\\n'``-delimited segment, byte-exact (no trim,
  no case folding);
* empty paragraphs are never dedup candidates and always survive
  (they are structure, not content — and they'd all be "duplicates"
  of each other);
* the surviving occurrence of a repeated paragraph is the globally
  first one by ``(doc_id, pos)`` — deterministic under any
  partitioning;
* the rewritten document is the surviving lines joined by ``'\\n'``
  in original order (a fully-deduplicated document becomes ``''``,
  never a dropped row).

Scale shape: the winner per distinct line is a ``groupBy(line).min
(struct(doc_id, pos))`` — a PARTIAL aggregate, so a boilerplate line
appearing in billions of documents combines map-side and ships one row
per task, where a window over ``partitionBy(line)`` would funnel the
entire hot line into one reducer. The winner relation is
distinct-lines-sized; it joins back by line equality (hashing the line
to a 64-bit join key would halve shuffle width at a ~2^-64 per-pair
false-merge risk — exactness is kept here, the knob is documented).
Reassembly groups by doc_id with a doc-bounded ``sort_array(
collect_list(...))`` — no window, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text, n_paragraphs, n_removed) — text rewritten with
    every repeated non-empty paragraph removed except its global first
    occurrence; n_paragraphs counts the doc's non-empty paragraphs
    BEFORE removal."""
    parts = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )
    winners = (
        parts.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
    )
    marked = parts.join(winners, "line", "left").select(
        "doc_id",
        "pos",
        "line",
        (
            (F.col("line") == "")
            | ((F.col("w.doc_id") == F.col("doc_id")) & (F.col("w.pos") == F.col("pos")))
        ).alias("keep"),
    )
    stats = marked.groupBy("doc_id").agg(
        F.sum(F.when(F.col("line") != "", 1).otherwise(0)).alias(
            "n_paragraphs"
        ),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
    )
    texts = (
        marked.filter("keep")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda x: x["line"],
                ),
            ).alias("_text")
        )
    )
    return stats.join(texts, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_text"), F.lit("")).alias("text"),
        "n_paragraphs",
        "n_removed",
    )
