"""spark-submit entry point for the index build + query smoke.

Cluster launch (north rule: "run via spark-submit --py-files"):

    cd /root/repo && zip -r /tmp/pisa_spark.zip pisa_spark
    spark-submit --py-files /tmp/pisa_spark.zip \
        scripts/submit_build.py \
        --input /root/testdata/sf0.1 --output /tmp/pisa_index \
        --buckets 64 --wave-size 16

In local sandbox testing the same file runs under plain python. The
script is deliberately thin: parse args, build (resumable), print
lineage metrics, run one verification query.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="pisa_spark index build")
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True, help="index root dir")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--wave-size", type=int, default=16)
    ap.add_argument("--query", nargs="*", default=["data", "join"],
                    help="smoke query terms")
    args = ap.parse_args()

    # import after argparse so --help works without a JVM
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pisa_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.path.insert(0, ".")
    from pisa_spark.index.lineage import build_index_resumable, load_index
    from pisa_spark.query.bm25 import bm25_topk_wand

    t0 = time.perf_counter()
    summary = build_index_resumable(
        spark, args.input, args.output,
        n_buckets=args.buckets, wave_size=args.wave_size,
    )
    wall = time.perf_counter() - t0
    summary["wall_s"] = round(wall, 2)
    summary["docs_per_s"] = round(summary["docs"] / wall, 1) if wall else None
    print(json.dumps({"build": summary}))

    postings, stats = load_index(spark, args.output)
    rows = bm25_topk_wand(
        postings,
        [{"query_id": 0, "terms": args.query, "conjunctive": False}],
        stats["n_docs"], stats["avgdl"], k=10,
    ).collect()
    print(json.dumps({
        "smoke_query": {"terms": args.query,
                        "topk": [[r["rank"], r["doc_id"], round(r["score"], 4)]
                                 for r in rows]}
    }))
    spark.stop()


if __name__ == "__main__":
    main()
