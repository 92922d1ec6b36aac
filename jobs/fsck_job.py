"""spark-submit entry point: verify a BM25 index's internal invariants.

Usage:
    spark-submit --py-files koncorde_spark.zip jobs/fsck_job.py \
        --index <index dir> [--strict]

Prints one JSON line: {"ok": ..., "index_dir": ..., "checks": {...}}.
Exit status 1 when any check fails (always — --strict additionally
raises, surfacing the failing checks in the driver log).
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from koncorde_spark.fulltext.aliases import resolve_spec
    from koncorde_spark.fulltext.fsck import fsck_index

    spark = SparkSession.builder.appName("koncorde-fsck").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        target = resolve_spec(args.index)
    except ValueError as e:
        raise SystemExit(str(e))
    report = fsck_index(spark, target, raise_on_error=args.strict)
    print(json.dumps(report))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
