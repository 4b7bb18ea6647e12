"""Semantic checks for the dedup + similarity-search operators on corpora
with known duplicate structure (the driver testdata has no dups, so we
inject them here)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.ann import cosine_topk, lsh_bucket_topk  # noqa: E402
from sparksearch.corpus import documents_from_testdata  # noqa: E402
from sparksearch.dedup import (  # noqa: E402
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Driver docs + exact clones of docs 0-4 (ids 10000-10004) + a
    near-clone of doc 0 (id 10005: doc 0's text with a short suffix)."""
    base = documents_from_testdata(spark, SF_DIR)
    clones = (
        base.filter(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + 10000)
    )
    near = (
        base.filter(F.col("doc_id") == 0)
        .withColumn("doc_id", F.lit(10005).cast("long"))
        .withColumn("content", F.concat(F.col("content"), F.lit(" extra tail token")))
        .withColumn("doc_len", F.length("content").cast("long"))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    return base.unionByName(clones).unionByName(near).cache()


def test_exact_duplicates(docs_with_dups):
    out = exact_duplicates(docs_with_dups).filter(F.col("group_size") > 1)
    rows = {r["doc_id"]: r for r in out.collect()}
    # 5 clone pairs -> 10 rows in dup groups; near-clone is NOT an exact dup
    assert set(rows) == {0, 1, 2, 3, 4, 10000, 10001, 10002, 10003, 10004}
    for orig in range(5):
        assert rows[orig]["is_canonical"]
        assert not rows[orig + 10000]["is_canonical"]
        assert rows[orig]["dup_group"] == rows[orig + 10000]["dup_group"]


def test_ngram_jaccard_finds_clones(docs_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_with_dups, threshold=0.5).collect()
    }
    for orig in range(5):
        assert pairs.get((orig, orig + 10000)) == 1.0  # identical shingle sets
    assert (0, 10005) in pairs  # near-clone above 0.5
    assert pairs[(0, 10005)] < 1.0


def test_minhash_lsh_finds_clones(docs_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["sig_agreement"]
        for r in minhash_lsh_pairs(docs_with_dups).collect()
    }
    for orig in range(5):
        assert pairs.get((orig, orig + 10000)) == 1.0  # all bands collide


def test_simhash_clones_zero_hamming(docs_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs_with_dups, max_hamming=8).collect()
    }
    for orig in range(5):
        assert pairs.get((orig, orig + 10000)) == 0


def test_simhash_pairs_full_recall_bruteforce(spark):
    """The (t+1)-segment pigeonhole blocking must find EVERY pair with
    hamming <= t — including pairs whose differing bits spread across the
    old 4x15-bit layout (which only guaranteed t <= 3).  Checked against
    an exhaustive O(n²) Python brute force over the simhash values."""
    from sparksearch.dedup import simhash, simhash_pairs

    base = documents_from_testdata(spark, SF_DIR).filter(F.col("doc_id") < 40)
    rows = base.select("doc_id", "content").collect()
    variants = []
    # progressively perturbed variants sweep pair hamming through 0..60
    for r in rows[:15]:
        toks = r["content"].split()
        for v, cut in enumerate((1, 2, 4, 8, 16)):
            t2 = list(toks)
            for j in range(min(cut, len(t2))):
                t2[j] = f"xv{v}q{j}"
            variants.append((10_000 + r["doc_id"] * 10 + v, " ".join(t2)))
    vdf = spark.createDataFrame(variants, "doc_id long, content string")
    docs = base.select("doc_id", "content").unionByName(vdf)

    sims = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    t = 8
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= t:
                want[(a, b)] = h
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=t).collect()
    }
    assert got == want
    # the test must actually exercise the 4..8 regime the old layout missed
    assert any(4 <= h <= 8 for h in want.values()), sorted(want.values())


def test_cosine_dup_pairs_blocked_recall(spark):
    """Blocked (LSH) near-dup detection in its design regime: genuinely
    similar vectors (clone + small noise, cos >= ~0.95).  Random-hyperplane
    collision probability is (1 - θ/π)^planes per table, so high-sim pairs
    collide with near-certainty across 4 tables while weak-sim pairs
    (cos ~0.35) legitimately escape — that regime belongs to the exact
    baseline, not to a recall assertion."""
    import numpy as np

    from sparksearch.ann import cosine_dup_pairs

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    base = rng.normal(size=(100, 32))
    clones = base[:40] + rng.normal(scale=0.05, size=(40, 32))  # cos ≈ 0.999
    vecs = np.vstack([base, clones]).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(len(vecs))], "vec_id long, embedding array<float>"
    )
    exact = {
        (r["vec_a"], r["vec_b"]) for r in cosine_dup_pairs(emb, threshold=0.95).collect()
    }
    blocked = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_dup_pairs(emb, threshold=0.95, blocked=True).collect()
    }
    assert blocked <= exact  # blocked never invents pairs
    assert len(exact) >= 40  # the planted clone pairs are found
    assert len(blocked) / len(exact) >= 0.9  # high-sim recall is near-total


def test_lsh_ann_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = list(range(16))
    k = 10
    exact = cosine_topk(emb, probes, k=k)
    approx = lsh_bucket_topk(emb, probes, k=k, num_planes=6, num_tables=4, probe_radius=1)
    ex = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["probe_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    # approximate by design; radius-2 multiprobe over 8 planes should
    # recover well over half of the true neighbors on 500 vectors
    assert recall >= 0.5, f"LSH ANN recall too low: {recall:.3f}"
    # and whatever it returns must be truly ranked by exact cosine
    for r in approx.groupBy("probe_id").agg(F.max("rank").alias("m")).collect():
        assert r["m"] <= k
