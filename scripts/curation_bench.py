"""Curation-operator throughput at sf0.1 (500k-ish docs after
amplification): the LLM-pipeline stages measured end-to-end, appended
to BENCH.md. Usage: [CURATION_REPLICAS=100] python scripts/curation_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from pisa_spark.dedup.dedup import near_duplicate_pairs
    from pisa_spark.functions.decontam import contamination_report
    from pisa_spark.functions.lm_quality import lm_perplexity
    from pisa_spark.functions.pii import pii_signals, scrub_pii
    from pisa_spark.functions.quality import gopher_signals
    from pisa_spark.operators.packing import pack_sequences
    from pisa_spark.operators.sampling import temperature_sample
    from pisa_spark.corpus import tokens_col
    from pisa_spark.session import get_spark

    cores = int(os.environ.get("CURATION_CORES", "32"))
    replicas = int(os.environ.get("CURATION_REPLICAS", "100"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="curation_bench", cores=cores,
                      shuffle_partitions=cores)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_base = base.count()
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    docs = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * (n_base + 1)).alias("doc_id"),
            "text",
            "lang",
        )
        .repartition(cores)
        .cache()
    )
    n = docs.count()

    out = {"docs": n, "cores": cores}

    def run(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out[f"{name}_s"] = round(dt, 2)
        out[f"{name}_docs_per_s"] = round(n / dt)

    run("pii_scrub", scrub_pii(docs))
    run("pii_signals", pii_signals(docs))
    run("gopher_signals", gopher_signals(docs))
    run("lm_perplexity", lm_perplexity(docs))
    run("temperature_sample", temperature_sample(docs, "lang", 0.5))
    lens = docs.select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )
    run("pack_sequences", pack_sequences(lens, 2048))
    bench = base.filter(F.col("doc_id") % 17 == 0)
    run("decontam", contamination_report(docs, bench, n=8))
    from pisa_spark.index.build import term_frequencies
    from pisa_spark.functions.laws import collection_laws
    from pisa_spark.functions.sketches import bloom_build

    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks).select("doc_id", "term", "tf")
    cps = [2**j - 1 for j in range(4, 26) if 2**j - 1 < n]
    run("collection_laws", collection_laws(
        tf, toks.select("doc_id", "doc_len"), cps))
    run("bloom_build", bloom_build(
        docs.select(F.concat_ws(":", "lang", "doc_id").alias("k")), "k"))
    # dedup runs on the UNAMPLIFIED base: replication makes every doc
    # a near-dup of its clones, which measures the dup rate of the
    # amplification trick, not the operator. Repartition first — the
    # sf table is one parquet file, and a one-partition input would
    # serialize the whole signature map into a single task (at real
    # scale the scan supplies the parallelism).
    base_d = base.repartition(cores).cache()
    n_b = base_d.count()
    t0 = time.perf_counter()
    n_pairs = near_duplicate_pairs(base_d, threshold=0.5).count()
    out["minhash_dedup_s"] = round(time.perf_counter() - t0, 2)
    out["minhash_dedup_docs_per_s"] = round(n_b / out["minhash_dedup_s"])
    out["minhash_dedup_docs"] = int(n_b)
    out["minhash_pairs"] = int(n_pairs)

    print(json.dumps(out))
    md = f"""

## Curation-operator throughput ({n:,} docs, local[{cores}], sf0.1 x{replicas})

`CURATION_REPLICAS={replicas} python scripts/curation_bench.py` — each
stage end-to-end over the amplified corpus (noop sink, so the numbers
are the operators, not parquet writes):

| stage | wall s | docs/s |
|---|---|---|
| PII scrub (regex codegen, shuffle-free) | {out["pii_scrub_s"]} | {out["pii_scrub_docs_per_s"]:,} |
| PII signals | {out["pii_signals_s"]} | {out["pii_signals_docs_per_s"]:,} |
| Gopher quality signals | {out["gopher_signals_s"]} | {out["gopher_signals_docs_per_s"]:,} |
| LM perplexity (bigram train + score) | {out["lm_perplexity_s"]} | {out["lm_perplexity_docs_per_s"]:,} |
| temperature mixture sample | {out["temperature_sample_s"]} | {out["temperature_sample_docs_per_s"]:,} |
| sequence packing (L=2048) | {out["pack_sequences_s"]} | {out["pack_sequences_docs_per_s"]:,} |
| decontamination (13-gram-style, n=8) | {out["decontam_s"]} | {out["decontam_docs_per_s"]:,} |
| collection-law fits (Zipf + Heaps) | {out["collection_laws_s"]} | {out["collection_laws_docs_per_s"]:,} |
| Bloom build (per-doc keys) | {out["bloom_build_s"]} | {out["bloom_build_docs_per_s"]:,} |
| MinHash near-dup pipeline (base corpus, {out["minhash_dedup_docs"]:,} docs, {out["minhash_pairs"]:,} pairs) | {out["minhash_dedup_s"]} | {out["minhash_dedup_docs_per_s"]:,} |
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH.md"), "a") as f:
        f.write(md)
    print("appended to BENCH.md")
    spark.stop()


if __name__ == "__main__":
    main()
