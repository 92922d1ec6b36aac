"""spark-submit entry point: build the BM25 index over a corpus.

Usage:
    spark-submit --py-files koncorde_spark.zip jobs/build_index_job.py \
        --input  <parquet or iceberg table with (repo,path,commit,lang,content)> \
        --output <index dir> [--shards 32] [--synthetic-rows N] [--append]

With --synthetic-rows the deterministic generator is used instead of
--input (for smoke tests without data). --append adds the input's NEW
documents to an existing index as additional postings segments
(indexer.append_index) instead of building from scratch.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--synthetic-rows", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--append", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("koncorde-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from koncorde_spark.fulltext.indexer import IndexConfig, append_index, build_index
    from koncorde_spark.sources import load_corpus, synthetic_corpus_df

    if args.synthetic_rows:
        corpus = synthetic_corpus_df(spark, n_rows=args.synthetic_rows, seed=42)
    elif args.input:
        # iceberg:<catalog.db.table> / table:<name> / parquet path
        corpus = load_corpus(spark, args.input)
    else:
        raise SystemExit("either --input or --synthetic-rows is required")

    if args.append:
        meta = append_index(spark, corpus, args.output)
    else:
        meta = build_index(
            spark,
            corpus,
            args.output,
            IndexConfig(n_shards=args.shards),
            resume=not args.no_resume,
        )
    print(json.dumps(meta))
    spark.stop()


if __name__ == "__main__":
    main()
