"""Tokenization -> postings.

Semantics pinned to the reference tokenizer (hw2/DataLoader.cpp:27-70,
hw3/config.h:59): maximal runs of non-separator characters, NO lowercasing, NO
stemming, empty tokens dropped.

Two equivalent plans are provided:

* :func:`postings_from_documents` — the scale path.  A vectorized pandas UDF
  (``mapInPandas``) computes per-document term frequencies entirely map-side:
  tokenize + count-by-(doc,term) needs no shuffle at all because a document is
  one row.  The reference's in-memory SortedPosting map + 20MB spill runs
  (hw2/InvertedIndex.cpp:82-118) collapse into this single narrow stage; the
  sorted-run *merge* (hw2/DataLoader.cpp:143-255) is simply whatever shuffle
  downstream consumers ask for.
* :func:`postings_sql_plan` — pure built-in expressions (split/explode/groupBy)
  used as an independent in-Spark cross-check and as the shape the DuckDB
  oracle mirrors.

Postings carry ``doc_len`` denormalized: at 10^12 docs the doc table cannot be
broadcast, and carrying the 8-byte length beats re-joining a trillion-row
dimension at query time (the reference's O(1) DocTable array lookup,
hw3/DataLoader.cpp:307, has no distributed equivalent that cheap).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import SEPARATOR_CHARS, SEPARATOR_REGEX

_PY_SEP_RE = re.compile(SEPARATOR_REGEX)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("doc_len", T.LongType(), False),
    ]
)


def tokenize_text(text: str) -> list[str]:
    """Reference-faithful tokenization of one string (order + duplicates kept).

    Equivalent to the char-scan loop of hw2/DataLoader.cpp:27-70 for any text;
    used for query strings (hw3/DataLoader.cpp:432-458 splitQuery) and as the
    oracle tokenizer.
    """
    return [t for t in _PY_SEP_RE.split(text) if t]


def tokenize_text_literal(text: str) -> list[str]:
    """Literal reimplementation of the C++ byte-scan (for parity tests only)."""
    out: list[str] = []
    word: list[str] = []
    for ch in text:
        if ch not in SEPARATOR_CHARS:
            word.append(ch)
        else:
            if word:
                out.append("".join(word))
            word.clear()
    if word:
        out.append("".join(word))
    return out


def postings_from_documents(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, term, tf, doc_len) via a zero-shuffle vectorized pandas UDF."""

    src = documents.select("doc_id", F.col(text_col).alias("content"), "doc_len")

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tokens = pdf["content"].str.split(_PY_SEP_RE)
            ex = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy().repeat(tokens.str.len().to_numpy()),
                    "term": [t for lst in tokens for t in lst],
                }
            )
            ex = ex[ex["term"].str.len() > 0]
            tf = (
                ex.groupby(["doc_id", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            tf["tf"] = tf["tf"].astype("int32")
            lens = pdf.set_index("doc_id")["doc_len"]
            tf["doc_len"] = tf["doc_id"].map(lens).astype("int64")
            yield tf[["doc_id", "term", "tf", "doc_len"]]

    return src.mapInPandas(tok, schema=POSTINGS_SCHEMA)


def postings_sql_plan(documents: DataFrame, text_col: str = "content") -> DataFrame:
    """Same result via pure Catalyst built-ins (JVM-side, codegen'd).

    One shuffle on (doc_id, term) with map-side partial aggregation; used as an
    independent correctness mirror of the UDF path and for DuckDB oracles.
    """
    return (
        documents.select(
            "doc_id",
            "doc_len",
            F.explode(F.split(F.col(text_col), SEPARATOR_REGEX)).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.first("doc_len").alias("doc_len"))
        .select("doc_id", "term", "tf", "doc_len")
    )
