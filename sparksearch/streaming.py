"""Incremental (streaming) index maintenance — Structured Streaming.

The reference is strictly batch (SURVEY §2.8); this module is the
Spark-first extension that makes the engine usable on a continuously
arriving corpus (the normal shape of a web-scale ingest pipeline).

Key design property that makes incremental indexing APPEND-ONLY: the
blocked index is keyed by (term, bucket) where ``bucket`` is a doc-id
range (blocks.py).  Every micro-batch is assigned a fresh, strictly
increasing doc-id range (offset persisted in the checkpoint state), so a
batch's buckets are disjoint from — and sort after — all existing
buckets.  Encoding a micro-batch therefore never rewrites existing
blocks: it appends new (term, bucket) rows, and the query path (which
orders by (bucket, block_id) per term and never assumes bucket alignment)
reads old + new blocks unchanged.  Compaction (re-encoding many small
buckets into big ones) is an optional offline rewrite, not a correctness
requirement.

Collection stats (N, avgdl) and the lexicon are maintained by cheap
aggregations over the appended tables at read time — both are one
skew-free aggregate over metadata-sized data (the reference reloads its
doc table/lexicon at startup the same way, hw3/DocTable.cpp:67-102).

``run_incremental_index(..., available_now=True)`` drains everything
currently in the input directory and stops — the testable/batch-catchup
trigger; with ``available_now=False`` it runs continuously per
micro-batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocks import build_block_index
from .corpus import DOCUMENTS_SCHEMA
from .tokenize import postings_from_documents

DEFAULT_BUCKET_SPAN = 1 << 14


def _state_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_STREAM_STATE.json")


def _load_state(index_dir: str) -> dict:
    p = _state_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"next_doc_id": 0, "batches": []}


def _save_state(index_dir: str, state: dict) -> None:
    tmp = _state_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, _state_path(index_dir))


def run_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    available_now: bool = True,
    avg_doc_len_hint: float | None = None,
) -> None:
    """Consume corpus parquet files arriving in ``input_dir``
    (repo, path, commit, lang, content) and maintain an appendable blocked
    index + documents table under ``index_dir``.

    BM25 normalization policy: the index pins ``avg_doc_len`` once (first
    batch, or the caller's hint) and stores it in the stream state; all
    block max/min tf_norm bounds AND query-time scoring use that pinned
    constant, so the bounds stay sound as the collection grows.  This is
    the reference's own policy — it scores with compile-time DOC_AVG_LEN
    (hw3/config.h:60).  Re-pinning is a compaction-time rewrite.
    """
    os.makedirs(index_dir, exist_ok=True)
    corpus_schema = "repo string, path string, commit string, lang string, content string"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_state(index_dir)
        if str(batch_id) in {str(b["batch_id"]) for b in state["batches"]}:
            return  # exactly-once replay guard (foreachBatch may redeliver)
        offset = int(state["next_doc_id"])

        from .corpus import assign_dense_ids

        with_ids = assign_dense_ids(batch_df, ["repo", "path"])
        docs = with_ids.select(
            (F.col("doc_id") + F.lit(offset)).alias("doc_id"),
            "repo",
            "path",
            "commit",
            "lang",
            "content",
            F.length("content").cast("long").alias("doc_len"),
            F.sha2(F.col("content"), 256).alias("content_sha256"),
        ).localCheckpoint(eager=True)
        n = docs.count()

        hint = state.get("avg_doc_len_hint") or avg_doc_len_hint
        if hint is None:
            hint = float(
                docs.agg(F.avg("doc_len").alias("a")).collect()[0]["a"] or 1.0
            )
        state["avg_doc_len_hint"] = float(hint)

        postings = postings_from_documents(docs)
        blocks = build_block_index(postings, float(hint), bucket_span=bucket_span)
        docs.write.mode("append").parquet(os.path.join(index_dir, "documents"))
        blocks.write.mode("append").parquet(os.path.join(index_dir, "blocks"))

        state["next_doc_id"] = offset + n
        state["batches"].append({"batch_id": batch_id, "n_docs": n, "offset": offset})
        _save_state(index_dir, state)

    reader = (
        spark.readStream.schema(corpus_schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(index_dir, "_checkpoint"))
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()


def compact_index(
    spark: SparkSession,
    index_dir: str,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    repin_avg_doc_len: bool = True,
) -> dict:
    """Offline compaction: decode all blocks, re-encode with uniform
    doc-range bucketing, and optionally re-pin ``avg_doc_len`` to the
    current collection mean (tightening block-max bounds drifted by
    growth).  Atomic swap: new blocks land in a staging dir, then replace.

    Many tiny per-micro-batch buckets → few uniform buckets: the
    streaming-ingest analog of the reference's pairwise run merge
    (hw2/DataLoader.cpp:239-255), done as one shuffle.
    """
    import shutil

    from .blocks import build_block_index, decode_block_index

    docs = spark.read.parquet(os.path.join(index_dir, "documents"))
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    state = _load_state(index_dir)

    if repin_avg_doc_len:
        avg_dl = float(docs.agg(F.avg("doc_len").alias("a")).collect()[0]["a"])
    else:
        avg_dl = float(state.get("avg_doc_len_hint") or 1.0)

    postings = decode_block_index(blocks)
    new_blocks = build_block_index(postings, avg_dl, bucket_span=bucket_span)
    staging = os.path.join(index_dir, "blocks__compact")
    new_blocks.write.mode("overwrite").parquet(staging)
    n_new = spark.read.parquet(staging).count()

    final = os.path.join(index_dir, "blocks")
    old = os.path.join(index_dir, "blocks__old")
    shutil.rmtree(old, ignore_errors=True)
    os.replace(final, old)
    os.replace(staging, final)
    shutil.rmtree(old, ignore_errors=True)

    state["avg_doc_len_hint"] = avg_dl
    state["compactions"] = state.get("compactions", 0) + 1
    _save_state(index_dir, state)
    return {"n_blocks": n_new, "avg_doc_len": avg_dl}


def read_index(spark: SparkSession, index_dir: str):
    """(documents, blocks, lexicon, stats) from an incremental index dir.

    Lexicon/stats recomputed by aggregation (metadata-sized; the
    reference's startup reload analog).  ``stats["avg_doc_len"]`` is the
    PINNED per-index hint, not the live mean: block-max bounds were
    computed under it, so query-time scoring must use the same constant
    for the bounds to remain sound — exactly how the reference scores with
    its compile-time DOC_AVG_LEN (hw3/config.h:60).  The live mean is
    returned as ``stats["avg_doc_len_actual"]`` for monitoring/periodic
    re-pin + compaction.
    """
    docs = spark.read.parquet(os.path.join(index_dir, "documents"))
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    lex = blocks.groupBy("term").agg(F.sum("n_postings").cast("long").alias("df"))
    row = docs.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avg_doc_len")
    ).collect()[0]
    state = _load_state(index_dir)
    stats = {
        "n_docs": int(row["n_docs"]),
        "avg_doc_len": float(state.get("avg_doc_len_hint") or row["avg_doc_len"]),
        "avg_doc_len_actual": float(row["avg_doc_len"]),
    }
    return docs, blocks, lex, stats
