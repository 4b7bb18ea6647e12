"""Incremental (Structured Streaming) index == batch index, end to end.

Corpus parquet files land in a directory in three chunks; the streaming
indexer drains them with availableNow; queries over the incremental index
must be rank-identical to a batch build over the same docs with the same
pinned avgdl.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.blocks import build_block_index  # noqa: E402
from sparksearch.corpus import synthetic_corpus  # noqa: E402
from sparksearch.query import query_terms_df  # noqa: E402
from sparksearch.stats import lexicon  # noqa: E402
from sparksearch.streaming import read_index, run_incremental_index  # noqa: E402
from sparksearch.tokenize import postings_from_documents  # noqa: E402
from sparksearch.wand import wand_topk  # noqa: E402

QUERIES = [
    (1, "if return buffer", "disjunctive"),
    (2, "def value index", "conjunctive"),
    (3, "uniq5tok", "disjunctive"),
]


def test_streamed_index_equals_batch(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    index_dir = str(tmp_path / "index")
    os.makedirs(inbox)

    corpus = synthetic_corpus(spark, 300, seed=3).cache()
    # three arrival chunks, disjoint, deterministic order by repo/path
    chunks = [
        corpus.filter(F.crc32(F.concat_ws("/", "repo", "path")) % 3 == i) for i in range(3)
    ]
    for i, ch in enumerate(chunks):
        ch.coalesce(1).write.parquet(f"{inbox}/chunk{i}")
    # move chunk files into one flat stream dir
    import glob
    import shutil

    flat = str(tmp_path / "stream_in")
    os.makedirs(flat)
    for i in range(3):
        for j, f in enumerate(sorted(glob.glob(f"{inbox}/chunk{i}/*.parquet"))):
            shutil.copy(f, f"{flat}/part_{i}_{j}.parquet")

    run_incremental_index(spark, flat, index_dir, bucket_span=64, available_now=True)

    docs, blocks, lex, stats = read_index(spark, index_dir)
    assert stats["n_docs"] == 300
    # doc ids are dense and unique across batches
    agg = docs.agg(
        F.count("*").alias("c"), F.countDistinct("doc_id").alias("d"),
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"),
    ).collect()[0]
    assert agg["c"] == agg["d"] == 300 and agg["mn"] == 0 and agg["mx"] == 299

    # batch twin over the SAME doc-id assignment + pinned avgdl
    posts = postings_from_documents(docs)
    batch_blocks = build_block_index(posts, stats["avg_doc_len"], bucket_span=64)
    batch_lex = lexicon(posts).select("term", "df")

    qt = query_terms_df(spark, QUERIES)
    got = wand_topk(blocks, lex, qt, stats["n_docs"], stats["avg_doc_len"]).collect()
    want = wand_topk(batch_blocks, batch_lex, qt, stats["n_docs"], stats["avg_doc_len"]).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0


def test_stream_resume_no_double_count(spark, tmp_path):
    """Re-running the drained stream must not re-index anything."""
    flat = str(tmp_path / "in2")
    index_dir = str(tmp_path / "idx2")
    os.makedirs(flat)
    synthetic_corpus(spark, 50, seed=9).coalesce(1).write.parquet(f"{flat}/c0")
    import glob
    import shutil

    for j, f in enumerate(sorted(glob.glob(f"{flat}/c0/*.parquet"))):
        shutil.move(f, f"{flat}/f{j}.parquet")
    shutil.rmtree(f"{flat}/c0")

    run_incremental_index(spark, flat, index_dir, available_now=True)
    _, _, _, s1 = read_index(spark, index_dir)
    run_incremental_index(spark, flat, index_dir, available_now=True)
    _, _, _, s2 = read_index(spark, index_dir)
    assert s1["n_docs"] == s2["n_docs"] == 50


def test_compaction_preserves_results(spark, tmp_path):
    """Compaction (uniform re-bucketing + avgdl re-pin) must answer queries
    identically to a from-scratch batch build over the same docs with the
    same (re-pinned) avgdl."""
    import glob
    import shutil

    flat = str(tmp_path / "in3")
    index_dir = str(tmp_path / "idx3")
    os.makedirs(flat)
    synthetic_corpus(spark, 200, seed=13).coalesce(2).write.parquet(f"{flat}/c0")
    for j, f in enumerate(sorted(glob.glob(f"{flat}/c0/*.parquet"))):
        shutil.move(f, f"{flat}/f{j}.parquet")
    shutil.rmtree(f"{flat}/c0")

    run_incremental_index(spark, flat, index_dir, bucket_span=32, available_now=True)
    from sparksearch.streaming import compact_index

    pre_blocks = spark.read.parquet(f"{index_dir}/blocks").count()
    info = compact_index(spark, index_dir, bucket_span=128)
    assert info["n_blocks"] <= pre_blocks

    docs, blocks, lex, stats = read_index(spark, index_dir)
    assert stats["avg_doc_len"] == info["avg_doc_len"]

    posts = postings_from_documents(docs)
    batch_blocks = build_block_index(posts, stats["avg_doc_len"], bucket_span=128)
    batch_lex = lexicon(posts).select("term", "df")
    qt = query_terms_df(spark, QUERIES)
    got = wand_topk(blocks, lex, qt, stats["n_docs"], stats["avg_doc_len"]).collect()
    want = wand_topk(batch_blocks, batch_lex, qt, stats["n_docs"], stats["avg_doc_len"]).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
