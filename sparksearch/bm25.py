"""BM25 scoring expression — exact reference semantics.

hw3/DataLoader.cpp:302-314 (BM25_t_q):
    k1 = 1.2; b = 0.75
    K   = k1 * ((1 - b) + b * dl / avgdl)        # dl = CHAR length of doc
    idf = ln((N - df + 0.5) / (df + 0.5))        # NOT clamped: negative when
                                                 # df > N/2 (hot terms) — kept
    score = idf * (k1 + 1) * tf / (K + tf)

Operation order is pinned to the C++ left-assoc evaluation so doubles match
bit-for-bit between the Spark plan, the pure-Python oracle, and DuckDB SQL.
Everything is a native column expression (whole-stage codegen; no UDF).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .constants import BM25_B, BM25_K1


def bm25_score(tf: Column, df: Column, doc_len: Column, n_docs: int, avg_doc_len: float) -> Column:
    K = BM25_K1 * ((1 - BM25_B) + BM25_B * doc_len.cast("double") / F.lit(avg_doc_len))
    idf = F.log((F.lit(float(n_docs)) - df.cast("double") + 0.5) / (df.cast("double") + 0.5))
    return idf * F.lit(BM25_K1 + 1) * tf.cast("double") / (K + tf.cast("double"))


def bm25_score_py(tf: int, df: int, doc_len: int, n_docs: int, avg_doc_len: float) -> float:
    """Oracle-side scalar twin of :func:`bm25_score` (same op order)."""
    K = BM25_K1 * ((1 - BM25_B) + BM25_B * doc_len / avg_doc_len)
    return math.log((n_docs - df + 0.5) / (df + 0.5)) * (BM25_K1 + 1) * tf / (K + tf)


def bm25_sql(tf: str, df: str, doc_len: str, n_docs: int, avg_doc_len: float) -> str:
    """The same formula as an ANSI-SQL fragment (DuckDB oracle)."""
    k1, b = BM25_K1, BM25_B
    return (
        f"ln(({n_docs} - {df} + 0.5) / ({df} + 0.5)) * {k1 + 1} * {tf} "
        f"/ ({k1} * ((1 - {b}) + {b} * {doc_len} / {avg_doc_len}) + {tf})"
    )
