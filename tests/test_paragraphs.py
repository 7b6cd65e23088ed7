"""Paragraph-level exact dedup (dedup/paragraphs.py): hand-checked
first-occurrence semantics, empty-line/empty-doc edges, parallelism
invariance, and the driver gate replayed against the DuckDB twin."""

import duckdb
import pytest

import __spark_entry__ as E
from pisa_spark.dedup.paragraphs import dedup_paragraphs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha\nshared line\nbeta"),
            (2, "shared line\ngamma"),
            (3, "delta\nshared line"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in dedup_paragraphs(docs).collect()}
    assert out[1]["text"] == "alpha\nshared line\nbeta"
    assert out[1]["n_removed"] == 0 and out[1]["n_paragraphs"] == 3
    assert out[2]["text"] == "gamma" and out[2]["n_removed"] == 1
    assert out[3]["text"] == "delta" and out[3]["n_removed"] == 1


def test_within_doc_repeats_also_dedup(spark):
    docs = _docs(spark, [(5, "x\nx\ny")])
    out = dedup_paragraphs(docs).collect()[0]
    assert out["text"] == "x\ny"
    assert out["n_paragraphs"] == 3 and out["n_removed"] == 1


def test_empty_lines_always_survive(spark):
    docs = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs).collect()}
    assert out[1] == "a\n\nb" and out[2] == "c\n\nd"


def test_fully_deduplicated_doc_becomes_empty_row(spark):
    docs = _docs(spark, [(1, "only line"), (2, "only line")])
    out = {r["doc_id"]: r.asDict() for r in dedup_paragraphs(docs).collect()}
    assert out[2]["text"] == "" and out[2]["n_removed"] == 1
    assert out[1]["text"] == "only line"
    # empty input doc: zero paragraphs, survives as a row
    e = dedup_paragraphs(_docs(spark, [(9, "")])).collect()[0]
    assert e["text"] == "" and e["n_paragraphs"] == 0 and e["n_removed"] == 0


def test_parallelism_invariance(spark):
    rows = [(i, f"doc {i}\nshared footer line\npayload {i % 4}") for i in range(40)]
    a = dedup_paragraphs(_docs(spark, rows).repartition(1)).collect()
    b = dedup_paragraphs(_docs(spark, rows).repartition(16)).collect()
    ka = sorted((r["doc_id"], r["text"], r["n_removed"]) for r in a)
    kb = sorted((r["doc_id"], r["text"], r["n_removed"]) for r in b)
    assert ka == kb
    # winner is doc 0 under any partitioning
    assert ka[0][1] == "doc 0\nshared footer line\npayload 0"


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = E.queries()["dedup_paragraphs_stats"](spark, sf_dir).toPandas()
    want = con.execute(E.oracle_sql()["dedup_paragraphs_stats"]).df()
    got = got[sorted(got.columns)].sort_values("doc_id").reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    # the injected footers actually deduplicated something
    assert int(got["n_removed"].sum()) > 0
