"""Incremental (streaming) index maintenance — Structured Streaming.

The reference is strictly batch (SURVEY §2.8); this module is the
Spark-first extension that makes the engine usable on a continuously
arriving corpus (the normal shape of a web-scale ingest pipeline).

Key design property that makes incremental indexing APPEND-ONLY: the
blocked index is keyed by (term, bucket) where ``bucket`` is a doc-id
range (blocks.py).  Every micro-batch is assigned a fresh doc-id offset
ROUNDED UP to the next multiple of ``bucket_span`` (persisted in the
stream state), so each batch's buckets are strictly disjoint from — and
sort after — all existing buckets.  The alignment matters: two batches
sharing a (term, bucket) would both restart block_id at 0, and the query
path's (bucket, block_id) ordering would interleave their doc ranges,
breaking the monotone ``block_last`` sequence the WAND cursors binary-
search over.  The cost is doc-id GAPS at batch boundaries (ids are unique
and ascending but not dense across batches — documented deviation from
the batch builder's dense ids; BM25 and the query path never require
density).  Encoding a micro-batch therefore never rewrites existing
blocks, and the query path reads old + new blocks unchanged.  Compaction
(re-encoding many small buckets into big ones, re-densifying ids is NOT
needed) is an optional offline rewrite, not a correctness requirement.

Exactly-once: each batch lands in its own subdirectory
(``documents/batch_<id>``, ``blocks/batch_<id>``) via write-to-staging +
atomic rename, with the blocks rename LAST as the commit point.  On
foreachBatch redelivery (crash anywhere before state save), a committed
batch is detected by its blocks dir and only the stream state is
repaired from the batch's ``_meta.json``; a half-committed batch (docs
renamed, blocks missing) is discarded and rewritten.  Readers list both
layouts with ``recursiveFileLookup``.

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


def _read_parts(spark: SparkSession, path: str) -> DataFrame:
    """Read a table stored as per-batch subdirs and/or flat part files
    (post-compaction) — recursive listing, no hive partition inference."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)


def _save_state(index_dir: str, state: dict) -> None:
    tmp = _state_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, _state_path(index_dir))


def _batch_dirs(index_dir: str, batch_id: int) -> tuple[str, str]:
    return (
        os.path.join(index_dir, "documents", f"batch_{batch_id}"),
        os.path.join(index_dir, "blocks", f"batch_{batch_id}"),
    )


def _repair_state_from_commit(index_dir: str, state: dict, batch_id: int, docs_dir: str) -> None:
    """Blocks dir exists but the state file missed the batch (crash between
    the commit rename and the state save): restore offset/n from the
    batch's _meta.json."""
    with open(os.path.join(docs_dir, "_meta.json")) as f:
        meta = json.load(f)
    state["next_doc_id"] = max(int(state["next_doc_id"]), meta["offset"] + meta["n_docs"])
    state["batches"].append(
        {"batch_id": batch_id, "n_docs": meta["n_docs"], "offset": meta["offset"]}
    )
    if meta.get("avg_doc_len_hint") and not state.get("avg_doc_len_hint"):
        state["avg_doc_len_hint"] = meta["avg_doc_len_hint"]
    _save_state(index_dir, state)


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    avg_doc_len_hint: float | None = None,
) -> None:
    """Index one micro-batch exactly-once (idempotent under foreachBatch
    redelivery).  Commit protocol: stage both tables, atomic-rename docs
    then blocks (blocks = commit point), then record in the stream state;
    every crash window is covered by the replay checks at the top."""
    import shutil

    if batch_df.isEmpty():
        return
    state = _load_state(index_dir)
    if str(batch_id) in {str(b["batch_id"]) for b in state["batches"]}:
        return  # replay of a fully recorded batch
    docs_dir, blocks_dir = _batch_dirs(index_dir, batch_id)
    if os.path.exists(blocks_dir):
        # committed but not recorded (crash before state save) — repair
        _repair_state_from_commit(index_dir, state, batch_id, docs_dir)
        return
    # half-committed leftovers from a crashed attempt: discard and redo
    shutil.rmtree(docs_dir, ignore_errors=True)

    # doc-id offset aligned UP to a bucket boundary: batch buckets are
    # disjoint by construction (ids gap at batch boundaries — see module
    # docstring)
    offset = -(-int(state["next_doc_id"]) // bucket_span) * bucket_span

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
        hint = float(docs.agg(F.avg("doc_len").alias("a")).collect()[0]["a"] or 1.0)
    state["avg_doc_len_hint"] = float(hint)

    postings = postings_from_documents(docs)
    blocks = build_block_index(postings, float(hint), bucket_span=bucket_span)

    docs_stage, blocks_stage = docs_dir + "__stage", blocks_dir + "__stage"
    shutil.rmtree(docs_stage, ignore_errors=True)
    shutil.rmtree(blocks_stage, ignore_errors=True)
    docs.write.mode("overwrite").parquet(docs_stage)
    blocks.write.mode("overwrite").parquet(blocks_stage)
    with open(os.path.join(docs_stage, "_meta.json"), "w") as f:
        json.dump(
            {
                "offset": offset,
                "n_docs": n,
                "batch_id": batch_id,
                "avg_doc_len_hint": float(hint),
            },
            f,
        )
    os.makedirs(os.path.dirname(docs_dir), exist_ok=True)
    os.makedirs(os.path.dirname(blocks_dir), exist_ok=True)
    # Visibility window (ADVICE r2, documented trade-off): docs land before
    # blocks, so a concurrent read_index between the two renames can see
    # this batch's docs (n_docs/avg_doc_len include them) while its
    # postings are not yet queryable.  Acceptable under the single-WRITER
    # assumption this module states — readers see a consistent index again
    # after the blocks rename, and crash recovery treats blocks as the
    # commit point (docs-without-blocks is repaired on restart).  A
    # batch-root rename would make both visible atomically at the cost of
    # rewriting both directory trees per batch.
    os.replace(docs_stage, docs_dir)
    os.replace(blocks_stage, blocks_dir)  # <- commit point

    state["next_doc_id"] = offset + n
    state["batches"].append({"batch_id": batch_id, "n_docs": n, "offset": offset})
    _save_state(index_dir, state)


def run_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    available_now: bool = True,
    avg_doc_len_hint: float | None = None,
    max_files_per_trigger: int = 4,
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
        ingest_batch(batch_df, batch_id, index_dir, bucket_span, avg_doc_len_hint)

    reader = (
        spark.readStream.schema(corpus_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
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

    docs = _read_parts(spark, os.path.join(index_dir, "documents"))
    blocks = _read_parts(spark, os.path.join(index_dir, "blocks"))
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
    docs = _read_parts(spark, os.path.join(index_dir, "documents"))
    blocks = _read_parts(spark, os.path.join(index_dir, "blocks"))
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
