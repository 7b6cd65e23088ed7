"""Independent pure-Python/NumPy BM25 oracle (no Spark), the golden
scorer of SURVEY §5.2 item 3 — deliberately implemented with different
machinery (dict/Counter) than the engine so bugs don't correlate."""

from __future__ import annotations

import collections
import math
import re

import duckdb

from pisa_spark.index.build import BM25_B, BM25_K1

TOKEN_RE = re.compile("[^a-z0-9]+")


def load_corpus(sf_dir: str) -> dict[int, list[str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    return {d: [t for t in TOKEN_RE.split(txt.lower()) if t] for d, txt in rows}


class Bm25Oracle:
    def __init__(self, sf_dir: str):
        self.tok = load_corpus(sf_dir)
        self.n_docs = len(self.tok)
        self.avgdl = sum(len(v) for v in self.tok.values()) / self.n_docs
        self.df = collections.Counter()
        for ts in self.tok.values():
            self.df.update(set(ts))

    def topk(self, terms: list[str], k: int = 10, conjunctive: bool = False):
        """[(rank, doc_id, score)] with ties (score DESC, doc_id ASC)."""
        q = sorted(set(terms))
        out = {}
        for d, ts in self.tok.items():
            c = collections.Counter(ts)
            s, matched = 0.0, 0
            for t in q:
                if c[t]:
                    matched += 1
                    idf = math.log(
                        (self.n_docs - self.df[t] + 0.5) / (self.df[t] + 0.5)
                    )
                    s += (
                        idf
                        * c[t]
                        * (BM25_K1 + 1)
                        / (c[t] + BM25_K1 * (1 - BM25_B + BM25_B * len(ts) / self.avgdl))
                    )
            if matched and (not conjunctive or matched == len(q)):
                out[d] = s
        ranked = sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]
        return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
