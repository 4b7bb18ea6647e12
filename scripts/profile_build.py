#!/usr/bin/env python
"""Attribute the build phase's non-scaling seconds (Amdahl term).

The scaling harness's quiet-window numbers fit t_build(c) = P/c + f with
P ~ 228 s and f ~ 7.5 s (121.5 s @2 cores, 36 s @8): at 8 cores ~20% of the
phase is core-count-independent, which alone caps N->4N efficiency at ~0.83.
This profiler runs the EXACT build pipeline from bench_scaling.py's worker at
one core count and times each constituent job separately, plus two floors:

  sched192   an empty 192-task stage (pure scheduling/task-launch floor)
  noop_write the index job executed into a `noop` sink (same compute +
             shuffle, no parquet encode / file commit) — the delta vs the
             real write isolates the parquet write + driver commit protocol

Usage: python scripts/profile_build.py [--cores 8] [--docs 300000] [--reps 2]

Run it alone on the host (it is itself a Spark job; co-running anything
invalidates the numbers — see BASELINE.md's shared-host methodology).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.blocks import build_block_index, lexicon_from_blocks
from sparksearch.corpus import documents_from_corpus, synthetic_corpus
from sparksearch.session import get_spark
from sparksearch.stats import collection_stats
from sparksearch.tokenize import postings_from_documents


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--docs", type=int, default=300000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(f"profile-build-{args.cores}", cores=args.cores, shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix=f"profbuild{args.cores}_")
    timings: dict[str, list[float]] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings.setdefault(name, []).append(time.perf_counter() - t0)

    try:
        corpus = synthetic_corpus(spark, args.docs, seed=42, partitions=args.cores * 4)
        docs_df = documents_from_corpus(corpus)
        docs_df.write.mode("overwrite").parquet(f"{tmp}/documents")
        docs = spark.read.parquet(f"{tmp}/documents").repartition(args.cores * 3)
        docs.count()
        warm = docs.limit(args.cores * 64).repartition(args.cores * 4)
        postings_from_documents(warm).count()

        for _ in range(args.reps):
            # floors
            timed("sched192", lambda: spark.range(192).repartition(192).count())

            # the three jobs of the scaling worker's build phase, separated
            timed("collection_stats", lambda: collection_stats(docs))
            st = collection_stats(docs)

            def index_write() -> None:
                postings = postings_from_documents(docs)
                blocks = build_block_index(
                    postings, st["avg_doc_len"], bucket_span=1 << 11, num_partitions=192
                )
                blocks.write.mode("overwrite").parquet(f"{tmp}/index")

            def index_noop() -> None:
                postings = postings_from_documents(docs)
                blocks = build_block_index(
                    postings, st["avg_doc_len"], bucket_span=1 << 11, num_partitions=192
                )
                blocks.write.mode("overwrite").format("noop").save()

            timed("index_noop", index_noop)
            timed("index_write", index_write)

            def lex() -> None:
                lexicon_from_blocks(spark.read.parquet(f"{tmp}/index")).write.mode(
                    "overwrite"
                ).parquet(f"{tmp}/lexicon")

            timed("lexicon", lex)

        out = {
            "cores": args.cores,
            "docs": args.docs,
            "min": {k: round(min(v), 3) for k, v in timings.items()},
            "all": {k: [round(x, 3) for x in v] for k, v in timings.items()},
        }
        out["min"]["build_total_equiv"] = round(
            out["min"]["collection_stats"] + out["min"]["index_write"] + out["min"]["lexicon"], 3
        )
        out["min"]["parquet_commit_delta"] = round(
            out["min"]["index_write"] - out["min"]["index_noop"], 3
        )
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
