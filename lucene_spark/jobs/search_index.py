"""spark-submit entrypoint: BM25 top-k query over a built on-disk index.

    spark-submit --py-files /tmp/lucene_spark.zip \
        lucene_spark/jobs/search_index.py \
        --index-dir /data/idx --query "merge AND join" --k 10

Prints one JSON line per query with hits and latency.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> list[dict]:
    from pyspark.sql import SparkSession

    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", action="append", required=True, help="repeatable")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--strategy", default="auto", choices=["auto", "wand", "flat"])
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("lucene_spark_search").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_spark.index.segments import read_index
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.session import ship_package

    ship_package(spark)
    idx = read_index(spark, args.index_dir).persist()
    searcher = IndexSearcher(idx)
    out = []
    for q in args.query:
        t0 = time.perf_counter()
        hits = [
            {"doc_id": r.doc_id, "score": r.score, "rank": r.rank}
            for r in searcher.search(q, k=args.k, strategy=args.strategy).collect()
        ]
        rec = {
            "query": q,
            "k": args.k,
            "latency_sec": round(time.perf_counter() - t0, 4),
            "hits": hits,
        }
        print(json.dumps(rec))
        out.append(rec)
    return out


if __name__ == "__main__":
    main()
