"""spark-submit entry point: query a built BM25 index.

Usage:
    spark-submit --py-files koncorde_spark.zip jobs/search_job.py \
        --index <index dir> --query '<query string>' [--k 10] \
        [--mode qs|topk|phrase|count] [--slop N] [--local]

Query syntax in the default ``qs`` mode is the Lucene-style string
grammar (koncorde_spark.fulltext.querystring): ``+must -not
"phrase"~slop prefix* fuzzy~1 boost^2``. ``topk`` runs the plain WAND
path, ``phrase`` the positional path, ``count`` prints totalHits only.

``--local`` skips Spark entirely and serves the query from the
Spark-free serving tier (LocalSearcher) — same kernels, same ranks —
for index dirs that fit one machine's file system view.

``--index`` accepts a comma-separated list of index dirs: the query then
runs FEDERATED (combined global idf, per-member avgdl) on either tier;
federation serves ``--mode topk`` and ``--mode count``.

Each index entry may be an ``alias:<root>#<name>`` pointer (resolved
through <root>/aliases.json at open time — the zero-downtime reindex
flow) or a plain directory.

Prints one JSON line: {"query": ..., "mode": ..., "k": ...,
"hits": [{"doc_id": ..., "score": ...}, ...]} (or {"count": N}).
"""

from __future__ import annotations

import argparse
import json


def _resolve(entry: str) -> str:
    from koncorde_spark.fulltext.aliases import resolve_spec

    try:
        return resolve_spec(entry)
    except ValueError as e:
        raise SystemExit(str(e))


def _run_local(args) -> dict:
    from koncorde_spark.fulltext.querystring import execute_query_string
    from koncorde_spark.fulltext.serve import LocalSearcher

    dirs = [_resolve(d) for d in args.index.split(",")]
    if len(dirs) > 1:
        if args.mode not in ("topk", "count"):
            raise SystemExit(
                "federated search (multiple --index) supports --mode topk/count"
            )
        from koncorde_spark.fulltext.federate import LocalFederatedSearcher

        lf = LocalFederatedSearcher(dirs)
        if args.mode == "count":
            return {"query": args.query, "count": lf.count(args.query)}
        hits = lf.topk(args.query, args.k)
        return {
            "query": args.query, "mode": "topk", "k": args.k,
            "hits": [{"doc_id": int(d), "score": float(s)} for d, s in hits],
        }
    ls = LocalSearcher(dirs[0])
    if args.mode == "count":
        return {"query": args.query, "count": ls.count(args.query)}
    if args.mode == "phrase":
        hits = ls.phrase(args.query, args.k, slop=args.slop)
    elif args.mode == "topk":
        hits = ls.topk(args.query, args.k)
    else:
        hits = execute_query_string(ls, args.query, k=args.k)
    return {
        "query": args.query,
        "mode": args.mode,
        "k": args.k,
        "hits": [
            {"doc_id": int(d), "score": float(s)} for d, s in hits
        ],
    }


def _run_spark(args) -> dict:
    from pyspark.sql import SparkSession

    from koncorde_spark.fulltext.query import Bm25Index
    from koncorde_spark.fulltext.querystring import execute_query_string

    spark = SparkSession.builder.appName("koncorde-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs = [_resolve(d) for d in args.index.split(",")]
    if len(dirs) > 1:
        if args.mode not in ("topk", "count"):
            raise SystemExit(
                "federated search (multiple --index) supports --mode topk/count"
            )
        from koncorde_spark.fulltext.federate import federated_count, federated_topk

        members = [Bm25Index(spark, d) for d in dirs]
        if args.mode == "count":
            return {"query": args.query, "count": federated_count(members, args.query)}
        top = federated_topk(members, args.query, args.k)
        return {
            "query": args.query, "mode": "topk", "k": args.k,
            "hits": [
                {"doc_id": int(r["doc_id"]), "score": float(r["score"])}
                for r in top.collect()
            ],
        }
    idx = Bm25Index(spark, dirs[0])
    if args.mode == "count":
        return {"query": args.query, "count": idx.count(args.query)}
    if args.mode == "phrase":
        top = idx.topk_phrase(args.query, args.k, slop=args.slop)
    elif args.mode == "topk":
        top = idx.topk(args.query, args.k)
    else:
        top = execute_query_string(idx, args.query, k=args.k)
    return {
        "query": args.query,
        "mode": args.mode,
        "k": args.k,
        "hits": [
            {"doc_id": int(r["doc_id"]), "score": float(r["score"])}
            for r in top.collect()
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--mode", choices=["qs", "topk", "phrase", "count"], default="qs"
    )
    ap.add_argument("--slop", type=int, default=0)
    ap.add_argument("--local", action="store_true")
    args = ap.parse_args()
    out = _run_local(args) if args.local else _run_spark(args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
