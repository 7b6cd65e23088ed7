"""Percolation scale evidence: alerting cost vs registered-query
count. The claim (query/percolate.py): matching an ingest batch is
ONE term-keyed join + ONE hash aggregate — no per-query execution —
so wall time tracks data sizes, not #queries x per-query serving.

Setup: a deterministic Zipf corpus (5k-term vocabulary — selective
conjunctions exist, unlike the 31-term testdata soup) as the ingest
batch; stored queries are 3-term conjunctions over mid/rare vocab
ranks, swept across STRESS_QS sizes. Reports wall time and match
counts per size, appending to BENCH.md.

Usage: [STRESS_QS=10000,100000,1000000] python scripts/percolate_stress.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from pisa_spark.query.percolate import percolate
    from pisa_spark.session import get_spark

    cores = int(os.environ.get("STRESS_CORES", "8"))
    sizes = [
        int(s)
        for s in os.environ.get("STRESS_QS", "10000,100000,1000000").split(",")
    ]
    spark = get_spark(
        app_name="percolate_stress", cores=cores,
        shuffle_partitions=2 * cores,
    )
    rng = np.random.default_rng(0)
    vocab_n, n_docs, doc_len = 5000, 5000, 80
    ranks = np.arange(1, vocab_n + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    docs = spark.createDataFrame(
        [
            (d, " ".join(f"t{int(t)}" for t in rng.choice(vocab_n, doc_len, p=p)))
            for d in range(n_docs)
        ],
        "doc_id long, text string",
    ).cache()
    docs.count()
    rows = []
    for q_n in sizes:
        # 3-term conjunctions over mid/rare ranks (selective)
        qrng = np.random.default_rng(1)
        terms = qrng.integers(100, vocab_n, size=(q_n, 3))
        qdf = spark.createDataFrame(
            [
                (int(i), f"t{int(t)}")
                for i in range(q_n)
                for t in terms[i]
            ],
            "query_id int, term string",
        ).repartition(2 * cores).cache()
        qdf.count()
        t0 = time.perf_counter()
        n_matches = percolate(docs, qdf, mode="all").count()
        wall = time.perf_counter() - t0
        rows.append((q_n, wall, n_matches))
        qdf.unpersist()
        print(f"Q={q_n}: {wall:.2f} s, {n_matches} matches")
    md_rows = "\n".join(
        f"  {q:>9,} stored queries: {w:5.2f} s ({m:,} matches)"
        for q, w, m in rows
    )
    r0, rN = rows[0], rows[-1]
    md = f"""
- **Percolation scale sweep** (`scripts/percolate_stress.py`,
  {n_docs:,}-doc Zipf ingest batch, 3-term conjunctive stored
  queries, {cores} pinned cores):
{md_rows}
  — a {rN[0] // r0[0]}x query-count increase cost
  {rN[1] / r0[1]:.1f}x wall: the join+aggregate dataflow prices the
  DATA, never per-query serving.
"""
    print(md)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    spark.stop()


if __name__ == "__main__":
    main()
