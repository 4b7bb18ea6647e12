#!/usr/bin/env python
"""A/B throughput comparison of the two tokenize->postings plans:

  A: postings_from_documents_rows (pandas groupby, posting-rows across Arrow)
  B: postings_from_documents      (per-doc arrays across Arrow, JVM explode — DEFAULT)
  C: postings_sql_plan            (pure Catalyst split/explode/groupBy)

The sandbox host's deliverable CPU drifts minute to minute, so runs are
INTERLEAVED (A,B,C,A,B,C,...) and the report shows per-round times plus the
median — adopt-if-reproducible methodology (ROUND1_NOTES item 2).

Usage: python scripts/tokenizer_ab.py [--docs 60000] [--cores 32] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.corpus import documents_from_corpus, synthetic_corpus  # noqa: E402
from sparksearch.session import get_spark  # noqa: E402
from sparksearch.tokenize import (  # noqa: E402
    postings_from_documents,
    postings_from_documents_rows,
    postings_sql_plan,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("tok-ab", cores=args.cores, shuffle_partitions=args.cores)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="tok_ab_")
    try:
        docs = documents_from_corpus(synthetic_corpus(spark, args.docs, seed=42))
        docs.write.mode("overwrite").parquet(f"{tmp}/documents")
        docs = spark.read.parquet(f"{tmp}/documents").repartition(args.cores * 2)
        docs.count()  # warm

        plans = {
            "pandas_rows": postings_from_documents_rows,
            "arrays_jvm_explode": postings_from_documents,
            "catalyst_sql": postings_sql_plan,
        }
        # correctness first: all three must produce identical postings
        base = None
        for name, fn in plans.items():
            got = sorted(
                (r["doc_id"], r["term"], r["tf"], r["doc_len"])
                for r in fn(docs.limit(500)).collect()
            )
            if base is None:
                base = got
            assert got == base, f"{name} disagrees with baseline"

        times: dict[str, list[float]] = {k: [] for k in plans}
        for _ in range(args.rounds):
            for name, fn in plans.items():
                t0 = time.perf_counter()
                fn(docs).write.mode("overwrite").parquet(f"{tmp}/out_{name}")
                times[name].append(round(time.perf_counter() - t0, 3))

        report = {
            "n_docs": args.docs,
            "cores": args.cores,
            "rounds": times,
            "median_sec": {k: statistics.median(v) for k, v in times.items()},
            "docs_per_sec": {
                k: round(args.docs / statistics.median(v), 1) for k, v in times.items()
            },
        }
        print(json.dumps(report, indent=1))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
