"""Blocked index on Spark: round-trip identity, bucketed (salted) build
equivalence, lexicon-from-blocks parity."""

import pytest
from pyspark.sql import functions as F

from sparksearch.blocks import (
    build_block_index,
    decode_block_index,
    index_size_stats,
    lexicon_from_blocks,
)
from sparksearch.corpus import documents_from_corpus, synthetic_corpus
from sparksearch.stats import collection_stats, lexicon
from sparksearch.tokenize import postings_from_documents


@pytest.fixture(scope="module")
def setup(spark):
    docs = documents_from_corpus(synthetic_corpus(spark, 200, seed=7)).cache()
    posts = postings_from_documents(docs).cache()
    st = collection_stats(docs)
    return docs, posts, st


def _postings_set(df):
    return {(r["term"], r["doc_id"], r["tf"], r["doc_len"]) for r in df.collect()}


def test_roundtrip_identity(spark, setup):
    _, posts, st = setup
    blocks = build_block_index(posts, st["avg_doc_len"]).cache()
    decoded = decode_block_index(blocks)
    assert _postings_set(decoded) == _postings_set(posts)


def test_decoded_order_within_term(spark, setup):
    _, posts, st = setup
    blocks = build_block_index(posts, st["avg_doc_len"])
    # hot term must appear; its decoded doc_ids are ascending
    rows = (
        decode_block_index(blocks.filter(F.col("term") == "if"))
        .orderBy("doc_id")
        .collect()
    )
    ids = [r["doc_id"] for r in rows]
    assert ids == sorted(set(ids)) and len(ids) > 50


def test_bucketed_build_same_postings(spark, setup):
    """Salted (doc_id-range bucketed) build must decode to identical postings
    and bound chunk geometry per bucket."""
    _, posts, st = setup
    plain = build_block_index(posts, st["avg_doc_len"])
    salted = build_block_index(posts, st["avg_doc_len"], bucket_span=37)
    assert _postings_set(decode_block_index(plain)) == _postings_set(decode_block_index(salted))
    # buckets really split hot terms into multiple groups
    nb = salted.filter(F.col("term") == "if").select("bucket").distinct().count()
    assert nb > 1


def test_lexicon_from_blocks_matches(spark, setup):
    _, posts, st = setup
    blocks = build_block_index(posts, st["avg_doc_len"])
    a = {r["term"]: r["df"] for r in lexicon_from_blocks(blocks).collect()}
    b = {r["term"]: r["df"] for r in lexicon(posts).collect()}
    assert a == b


def test_index_size_stats(spark, setup):
    _, posts, st = setup
    stats = index_size_stats(build_block_index(posts, st["avg_doc_len"]))
    assert stats["n_postings"] == posts.count()
    assert stats["payload_bytes"] > 0
    assert stats["n_terms"] == posts.select("term").distinct().count()


def test_bucketed_groups_bounded(spark, setup):
    """Skew invariant: with bucket_span=S no (term, bucket) group — and so
    no single encode task's working set for one list — exceeds S postings,
    even for stopword-class terms present in every doc."""
    docs, posts, st = setup
    span = 64
    blocks = build_block_index(posts, st["avg_doc_len"], bucket_span=span)
    per_group = (
        blocks.groupBy("term", "bucket")
        .agg(F.sum("n_postings").alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_group <= span
    # hot term sanity: 'if' occurs in (nearly) every doc yet still splits
    hot = blocks.filter(F.col("term") == "if").select("bucket").distinct().count()
    assert hot >= 2
