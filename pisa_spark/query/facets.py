"""Faceted search — the search-UI sidebar aggregation: for each query,
count result docs per metadata facet value (language, source/host,
crawl, ...).

Dataflow: the results relation is |queries| x k rows; joining it to
the doc-metadata table keys on doc_id (broadcast the small results
side), then ONE melt + hash aggregation produces every requested
facet in a single shuffle — facets are unpivoted via an inline
array-of-structs explode (pure codegen), not one groupBy per facet
column, so adding facet dimensions adds zero stages.

Reference parity: no analog (the reference serves metric files, not
result sets); this is target-engine search surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame,
    docs_meta: DataFrame,
    facet_cols: list[str],
    broadcast_results: bool = True,
) -> DataFrame:
    """(query_id, facet, value, n) — per-query counts of each facet
    value over the result docs.

    results: (query_id, doc_id, ...); docs_meta: (doc_id, <facet_cols>).
    NULL facet values count under value NULL (surfaced, not dropped —
    a missing language is signal in a curation UI).

    broadcast_results (default True): the search-UI case is
    |queries| x k rows, which broadcast makes the metadata table a
    pure probe-side scan. Pass False for bulk analytics over huge
    result exports (beyond broadcast limits) — a plain shuffle join.
    """
    if not facet_cols:
        raise ValueError("facet_cols must name at least one column")
    res = results.select("query_id", "doc_id")
    if broadcast_results:
        res = F.broadcast(res)
    j = docs_meta.select("doc_id", *facet_cols).join(res, "doc_id")
    melted = j.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("facet"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in facet_cols
                ]
            )
        ).alias("fv"),
    )
    return (
        melted.groupBy("query_id", "fv.facet", "fv.value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_facet(
    results: DataFrame,
    docs_meta: DataFrame,
    col: str,
    bin_width: int,
    broadcast_results: bool = True,
) -> DataFrame:
    """(query_id, bin_lo, n) — fixed-width histogram of a NUMERIC doc
    attribute over each query's result set (the price/date/length
    sidebar histogram beside facet_counts' categorical one).

    Binning contract: bin_lo = floor(value / bin_width) * bin_width
    (the bin covers [bin_lo, bin_lo + bin_width)); NULL attribute
    values count under a bin_lo = NULL row, surfaced like
    facet_counts' NULL facet values. Same dataflow as facet_counts:
    broadcast the |queries| x k results, one join + one hash
    aggregate."""
    if int(bin_width) != bin_width or int(bin_width) < 1:
        raise ValueError(
            "bin_width must be a positive integer — a fractional width"
            " would silently truncate"
        )
    bin_width = int(bin_width)
    res = results.select("query_id", "doc_id")
    if broadcast_results:
        res = F.broadcast(res)
    j = docs_meta.select("doc_id", col).join(res, "doc_id")
    w = F.lit(int(bin_width))
    bin_lo = (F.floor(F.col(col) / w) * w).cast("long")
    return (
        j.select("query_id", bin_lo.alias("bin_lo"))
        .groupBy("query_id", "bin_lo")
        .agg(F.count(F.lit(1)).alias("n"))
    )
