"""Doc table, collection stats, lexicon — pure built-in aggregations.

Reference equivalents: DocTable (hw3/DocTable.h:5-15, write/load
hw3/DocTable.cpp:25-102), collection scalars N/avgdl (hw3/DocTable.cpp:57-65),
Lexicon df counting (hw3/Lexicon.cpp:124).  All are single shuffle-free or
single-shuffle Catalyst plans with map-side partial aggregation; nothing here
needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_table(documents: DataFrame, postings: DataFrame) -> DataFrame:
    """(doc_id, repo, path, doc_len, word_nums, content_sha256).

    word_nums = number of distinct terms per doc (hw2/DataLoader.cpp:69).
    Postings are already distinct per (doc_id, term), so a plain count works —
    one shuffle keyed by doc_id (dense, skew-free).
    """
    wn = postings.groupBy("doc_id").agg(F.count("*").alias("word_nums"))
    return (
        documents.select("doc_id", "repo", "path", "doc_len", "content_sha256")
        .join(wn, "doc_id", "left")
        .na.fill({"word_nums": 0})
    )


def collection_stats(documents: DataFrame) -> dict:
    """N and avgdl (hw3/DocTable.cpp:57-65): one tiny all-reduce, broadcast
    into the scoring expression by the caller."""
    row = documents.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avg_doc_len")
    ).collect()[0]
    return {"n_docs": int(row["n_docs"]), "avg_doc_len": float(row["avg_doc_len"])}


def lexicon(postings: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency per term.

    Reference: df = posting count per term (hw3/Lexicon.cpp:124); cf is ours.
    groupBy(term) is skew-prone on hot terms only in the collect-postings
    sense; a count/sum aggregate partial-aggregates map-side, so no salting is
    needed here (it is needed in blocks.py where whole lists are materialized).
    """
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
