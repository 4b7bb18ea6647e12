"""Pure-Python single-process oracle engine.

A faithful reimplementation of the reference's *scoring semantics*
(hw3/DataLoader.cpp:302-314 BM25, 372-430 TAAT OR/AND, 636-671 top-k;
tokenizer hw2/DataLoader.cpp:27-70) used to generate golden fixtures that the
Spark engine must match rank-identically (tie-break pinned: score desc,
doc_id asc) and score-identically to 1e-9.  No Spark, no vectorization —
deliberately the dumbest correct implementation.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from ..bm25 import bm25_contribution_py
from ..constants import CONJUNCTIVE, TOP_K
from ..tokenize import tokenize_text


@dataclass
class OracleIndex:
    n_docs: int = 0
    avg_doc_len: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    # term -> list[(doc_id, tf)] in ascending doc_id order
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)

    @property
    def df(self) -> dict[str, int]:
        return {t: len(pl) for t, pl in self.postings.items()}

    def stats(self) -> dict:
        total_postings = sum(len(p) for p in self.postings.values())
        return {
            "n_docs": self.n_docs,
            "avg_doc_len": self.avg_doc_len,
            "n_terms": len(self.postings),
            "total_postings": total_postings,
        }


def build_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: (doc_id, content). doc_len = char length (reference norm)."""
    idx = OracleIndex()
    total_len = 0
    for doc_id, content in sorted(docs):
        tf = Counter(tokenize_text(content))
        idx.doc_len[doc_id] = len(content)
        total_len += len(content)
        for term, f in tf.items():
            idx.postings.setdefault(term, []).append((doc_id, f))
    idx.n_docs = len(docs)
    idx.avg_doc_len = total_len / len(docs) if docs else 0.0
    for pl in idx.postings.values():
        pl.sort()
    return idx


def topk(idx: OracleIndex, query: str, mode: str, k: int = TOP_K) -> list[tuple[int, float]]:
    """[(doc_id, score)] in rank order; matching docs only (SURVEY.md §5
    zero-score-padding deviation)."""
    terms = tokenize_text(query)
    bag = Counter(terms)
    scores: dict[int, float] = {}
    matched: dict[int, int] = {}
    for term, weight in bag.items():
        pl = idx.postings.get(term, [])
        df = len(pl)
        for doc_id, tf in pl:
            s = bm25_contribution_py(
                tf, df, idx.doc_len[doc_id], weight, idx.n_docs, idx.avg_doc_len
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + s
            matched[doc_id] = matched.get(doc_id, 0) + 1
    if mode == CONJUNCTIVE:
        need = len(bag)
        scores = {d: s for d, s in scores.items() if matched[d] == need}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
