"""Regression: dense id assignment must be collision-free and
deterministic at sizes where range-boundary sampling used to diverge
between jobs (observed: duplicate doc_ids at 60k rows with the old
repartitionByRange-based two-pass)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.corpus import documents_from_corpus, synthetic_corpus  # noqa: E402


def test_dense_ids_20k(spark):
    docs = documents_from_corpus(synthetic_corpus(spark, 20_000, seed=7))
    agg = docs.agg(
        F.count("*").alias("c"),
        F.countDistinct("doc_id").alias("d"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    assert agg["c"] == agg["d"] == 20_000
    assert agg["mn"] == 0 and agg["mx"] == 19_999


def test_ids_follow_sort_order(spark):
    docs = documents_from_corpus(synthetic_corpus(spark, 2_000, seed=7))
    rows = docs.select("doc_id", "repo", "path").collect()
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"]))
    assert [r["doc_id"] for r in by_key] == list(range(len(rows)))
