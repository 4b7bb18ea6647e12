#!/usr/bin/env python
"""spark-submit entry point for the sparksearch engine (north_rule: "runs
via spark-submit --py-files on multi-executor clusters").

Ship the library alongside this script:

    cd /root/repo && zip -qr /tmp/sparksearch.zip sparksearch
    spark-submit --py-files /tmp/sparksearch.zip scripts/sparksearch_job.py \
        build --input synthetic:20000 --output /tmp/ss_index
    spark-submit --py-files /tmp/sparksearch.zip scripts/sparksearch_job.py \
        query --index /tmp/ss_index --query "hash join merge" --mode disjunctive

On a cluster, drop the ``--master`` default (inherits the cluster manager)
and point --input at the Iceberg/parquet corpus table.  The build is
resumable: rerunning the same command against the same --output resumes
from committed stage manifests (sparksearch.checkpoint).

Subcommands:
  build   corpus -> documents/postings/lexicon/doc_table/blocks snapshots
  query   top-k over a built index (WAND over the compressed blocks)
  bench   timed build+query with docs/sec + q/s (JSON line)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(args):
    # under spark-submit the session is preconfigured; only fill gaps.
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("sparksearch-job")
    if args.local_cores:
        b = b.master(f"local[{args.local_cores}]").config(
            "spark.sql.shuffle.partitions", str(args.local_cores * 2)
        )
    b = b.config("spark.sql.adaptive.enabled", "true").config(
        "spark.sql.execution.arrow.pyspark.enabled", "true"
    )
    return b.getOrCreate()


def _load_corpus(spark, spec: str):
    from sparksearch.corpus import (
        documents_from_corpus,
        documents_from_testdata,
        synthetic_corpus,
    )

    if spec.startswith("synthetic:"):
        n = int(spec.split(":", 1)[1])
        return documents_from_corpus(synthetic_corpus(spark, n, seed=42))
    if spec.endswith("documents.parquet") or "testdata" in spec:
        return documents_from_testdata(spark, spec.rstrip("/").removesuffix("/documents.parquet"))
    # already-canonical documents table
    return spark.read.parquet(spec)


def cmd_build(args) -> None:
    from sparksearch.checkpoint import build_index_checkpointed

    spark = _spark(args)
    docs = _load_corpus(spark, args.input)
    out = build_index_checkpointed(
        spark, docs, args.output, bucket_span=args.bucket_span
    )
    summary = {
        s: {
            "rows": r.manifest["row_count"],
            "resumed": r.resumed,
            "wall_sec": r.manifest.get("wall_sec"),
        }
        for s, r in out.items()
    }
    print(json.dumps(summary, indent=1))


def cmd_query(args) -> None:
    from sparksearch.constants import TOP_K
    from sparksearch.query import query_terms_df
    from sparksearch.wand import wand_topk

    spark = _spark(args)
    from pyspark.sql import functions as F

    blocks = spark.read.parquet(f"{args.index}/blocks/data")
    lex = spark.read.parquet(f"{args.index}/lexicon/data").select("term", "df")
    doc_table = spark.read.parquet(f"{args.index}/doc_table/data")
    # explicit aliases: dict-style agg orders columns arbitrarily, which
    # silently swaps N and avgdl
    stats = doc_table.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avg_dl")
    ).collect()[0]
    n_docs, avg_dl = int(stats["n_docs"]), float(stats["avg_dl"])

    qt = query_terms_df(spark, [(0, args.query, args.mode)])
    res = wand_topk(blocks, lex, qt, n_docs, avg_dl, k=args.k or TOP_K)
    out = (
        F.broadcast(res)
        .join(doc_table.select("doc_id", "repo", "path"), "doc_id")
        .orderBy("rank")
        .collect()
    )
    for r in out:
        print(f"{r['rank']:3d}  {r['score']:12.6f}  {r['doc_id']:10d}  {r['repo']}/{r['path']}")


def cmd_bench(args) -> None:
    spark = _spark(args)
    t0 = time.perf_counter()
    cmd_build(args)
    t_build = time.perf_counter() - t0
    n = spark.read.parquet(f"{args.output}/documents/data").count()
    print(json.dumps({"metric": "build_wall", "value": round(t_build, 3), "unit": "sec",
                      "n_docs": n, "docs_per_sec": round(n / t_build, 1)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--local-cores", type=int, default=None,
                    help="run on local[N] (omit under a real cluster manager)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True,
                   help="documents parquet dir | testdata sf dir | synthetic:N")
    b.add_argument("--output", required=True)
    b.add_argument("--bucket-span", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--mode", default="disjunctive", choices=["disjunctive", "conjunctive"])
    q.add_argument("--k", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    be = sub.add_parser("bench")
    be.add_argument("--input", required=True)
    be.add_argument("--output", required=True)
    be.add_argument("--bucket-span", type=int, default=None)
    be.set_defaults(fn=cmd_bench)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
