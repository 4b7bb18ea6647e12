"""Snippet generation — the reference's six algorithms re-expressed for Spark.

Reference: hw3/Snippets.cpp (LinearMatch 45-119, PrefixSearch 121-195,
getWordPos 197-226, snippet-BM25/VSM scoring 228-250, getSnippetsByPos
270-306, ScoreSnippets 308-438, getWordWeight/getKeywordWeight 440-495,
WeightSnippets 497-621, getKeyword 623-662, KeywordSnippets 664-746,
calcWordPercent 749-772), constants hw3/config.h:47-50,62-64.

Per-document kernels are pure Python (single-doc scope, no data
parallelism to exploit inside one doc); the Spark operator fans them out
with ``mapInPandas`` over the top-k join — per query only k=20 docs reach
this stage, so the UDF cost is bounded by k×|queries| regardless of corpus
size (same shape as the reference, which fetches exactly the top-k raw
docs, hw3/DataLoader.cpp:866-895).

Faithfulness notes (quirks preserved deliberately, for rank/judge parity):

* deque algorithms append the terminating separator char to a token unless
  it is whitespace — so ``value,`` does not exact-match query word
  ``value`` (hw3/Snippets.cpp:63-66);
* empty tokens (separator runs) are pushed into the window and render as
  bare spaces (hw3/Snippets.cpp:27-42 concatDeque on empty strings);
* a token terminated by end-of-text is never flushed, in both the deque
  scan and getWordPos (loops keyed on separator hits only);
* cluster output order is ASCENDING score (the bounded min-heap is drained
  directly, hw3/Snippets.cpp:408-420);
* the snippet BM25 clamps at 0 (hw3/Snippets.cpp:240) unlike the ranking
  BM25 (unclamped, hw3/DataLoader.cpp:313).

Deviations (documented): the reference hardcodes N=DOC_NUM and
avgdl=DOC_AVG_LEN compile-time constants (hw3/config.h:60-61); we take the
actual collection stats.  Heap ties are pinned to push order (C++
priority_queue tie order is heap-layout-dependent).
"""

from __future__ import annotations

import heapq
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import (
    KEYWORD_PERCENT,
    MAX_SNIPPETS,
    MIN_KEYWORD,
    SEPARATOR_CHARS,
    SNIPPETS_RANGE,
    TOP_K,
)

SEP = set(SEPARATOR_CHARS)
ED = set("\t\x0b\r\n\x0c ")  # whitespace subset (hw3/Snippets.cpp:50)
TERM_NUM = 7  # window half-width in tokens (hw3/config.h:50)
CLUSTER_SIZE = 2  # clusters kept per doc (hw3/Snippets.cpp:341)
# concatDeque's trailing-punctuation set (hw3/Snippets.cpp:29) — no whitespace
CONCAT_SEP = set(":;,.[]{}()<>+-=*&^%$#@!~`'\"|\\/?·：“”")

ALGORITHMS = ("linear", "prefix", "bm25", "vsm", "weight", "keyword")


# --- per-document kernels ----------------------------------------------------


def _concat_window(window: list[str]) -> str:
    out = []
    for w in window:
        if w and w[-1] in CONCAT_SEP:
            out.append(w)
        else:
            out.append(w + " ")
    return "".join(out)


def _deque_snippet(text: str, match) -> str:
    """Shared core of LinearMatch / PrefixSearch / KeywordSnippets
    (hw3/Snippets.cpp:45-119): grow a token window; after the first match
    extend it TERM_NUM tokens and emit; after a second match emit again and
    stop."""
    snippets = ""
    word_chars: list[str] = []
    window: list[str] = []
    find_one = find_two = False
    containfirst = True
    max_size = TERM_NUM + 1
    for ch in text:
        if ch not in SEP:
            word_chars.append(ch)
            continue
        if word_chars and ch not in ED:
            word_chars.append(ch)
        word = "".join(word_chars)
        if len(window) < max_size:
            window.append(word)
        else:
            window.pop(0)
            containfirst = False
            window.append(word)
            if find_one and not find_two and not snippets:
                if not containfirst:
                    snippets += "... "
                snippets += _concat_window(window) + " ..."
                window.clear()
                max_size = TERM_NUM
            elif find_two:
                if not containfirst and not snippets:
                    snippets += "... "
                snippets += _concat_window(window) + "..."
                return snippets
        if match(word):
            if not find_one:
                find_one = True
                max_size = len(window) + TERM_NUM
            elif not find_two:
                find_two = True
                max_size = len(window) + TERM_NUM
        word_chars.clear()
    return snippets


def linear_match_snippet(text: str, word_list: list[str]) -> str:
    ws = set(word_list)
    return _deque_snippet(text, lambda w: w in ws)


def prefix_search_snippet(text: str, word_list: list[str]) -> str:
    # despite the name: substring containment (hw3/Snippets.cpp:15-25)
    return _deque_snippet(text, lambda w: any(q in w for q in word_list))


def get_word_pos(text: str, word_list: list[str]) -> dict[str, list[int]]:
    """Char start-offsets of exact query-term occurrences
    (hw3/Snippets.cpp:197-226)."""
    pos: dict[str, list[int]] = {w: [] for w in word_list}
    word_start = 0
    n = 0
    for i, ch in enumerate(text):
        if ch not in SEP:
            if n == 0:
                word_start = i
            n += 1
        else:
            if n and (w := text[word_start : word_start + n]) in pos:
                pos[w].append(word_start)
            n = 0
    return pos


def snippet_bm25(freq: int, df: int, doc_len: int, n_docs: int, avg_doc_len: float) -> float:
    """Snippet-variant BM25: clamped at 0 (hw3/Snippets.cpp:228-243)."""
    if freq == 0:
        return 0.0
    k1, b = 1.2, 0.75
    K = k1 * ((1 - b) + b * doc_len / avg_doc_len)
    s = math.log((n_docs - df + 0.5) / (df + 0.5)) * (k1 + 1) * freq / (K + freq)
    return s if s > 0 else 0.0


def snippet_vsm(freq: int, df: int, doc_len: int, n_docs: int) -> float:
    """Vector-space score (hw3/Snippets.cpp:242-250)."""
    if freq == 0 or df == 0 or doc_len == 0:
        return 0.0
    return (1 + math.log(freq)) * math.log(1 + n_docs / df) / math.sqrt(doc_len)


def get_snippets_by_pos(text: str, pos: list[int]) -> str:
    """Expand a position cluster into display text
    (hw3/Snippets.cpp:270-306)."""
    endpos = pos[-1]
    if endpos - pos[0] < SNIPPETS_RANGE * 2:
        endpos = pos[0] + SNIPPETS_RANGE * 2
    while endpos < len(text) and text[endpos] not in SEP:
        endpos += 1
    res: list[str] = []
    length = 0
    for i in range(pos[0], min(endpos, len(text))):
        ch = text[i]
        if ch in ED:
            if length > MAX_SNIPPETS:
                break
            res.append(" ")
        else:
            res.append(ch)
        length += 1
    out = "".join(res)
    if pos[0] != 0:
        out = "..." + out
    return out


def _cluster_snippet(text: str, word_pos: dict[str, list[int]], word_score: dict[str, float]) -> str:
    """Position clustering + top-CLUSTER_SIZE selection
    (hw3/Snippets.cpp:336-438): positions merged ascending; a gap >=
    SNIPPETS_RANGE starts a new cluster; the 2 best-scoring clusters are
    kept and emitted in ascending-score order."""
    merged: list[tuple[int, str]] = []
    for term, plist in word_pos.items():
        merged.extend((p, term) for p in plist)
    merged.sort()

    clusters: list[tuple[float, int, list[int]]] = []  # min-heap (score, seq, pos)
    seq = 0
    cur_pos: list[int] = []
    cur_score = 0.0
    for p, term in merged:
        if not cur_pos or p - cur_pos[-1] < SNIPPETS_RANGE:
            cur_pos.append(p)
            cur_score += word_score[term]
        else:
            heapq.heappush(clusters, (cur_score, seq, cur_pos))
            seq += 1
            if len(clusters) > CLUSTER_SIZE:
                heapq.heappop(clusters)
            cur_pos = [p]
            cur_score = word_score[term]
    if cur_pos:
        heapq.heappush(clusters, (cur_score, seq, cur_pos))
        if len(clusters) > CLUSTER_SIZE:
            heapq.heappop(clusters)

    snippets = ""
    while clusters:
        _, _, pos = heapq.heappop(clusters)  # ascending score — quirk preserved
        if len(snippets) > MAX_SNIPPETS:
            break
        snippets += get_snippets_by_pos(text, pos)
    if snippets:
        snippets += "..."
    return snippets


def score_snippet(
    text: str,
    word_list: list[str],
    df_list: list[int],
    n_docs: int,
    avg_doc_len: float,
    kind: str = "bm25",
) -> str:
    """ScoreSnippets (hw3/Snippets.cpp:308-438), kind in {bm25, vsm}."""
    word_pos = get_word_pos(text, word_list)
    dl = len(text)
    score = {}
    for w, df in zip(word_list, df_list):
        freq = len(word_pos[w])
        if kind == "bm25":
            score[w] = snippet_bm25(freq, df, dl, n_docs, avg_doc_len)
        else:
            score[w] = snippet_vsm(freq, df, dl, n_docs)
    return _cluster_snippet(text, word_pos, score)


def word_weights(word_list: list[str], word_pos: dict[str, list[int]], df_list: list[int]) -> dict[str, float]:
    """tf * log(RESULT_NUM / df) keyword weighting (hw3/Snippets.cpp:440-450)."""
    return {
        w: len(word_pos[w]) * math.log(TOP_K / df) if df > 0 else 0.0
        for w, df in zip(word_list, df_list)
    }


def _top_keywords(weights: dict[str, float]) -> list[tuple[str, float]]:
    """Bounded heap of the max(ceil(0.25·n), 2) heaviest terms, drained in
    ascending-weight order (hw3/Snippets.cpp:452-495,623-662)."""
    m = max(math.ceil(len(weights) * KEYWORD_PERCENT), MIN_KEYWORD)
    heap: list[tuple[float, int, str]] = []
    for i, (term, wt) in enumerate(weights.items()):  # dict order = insertion
        heapq.heappush(heap, (wt, i, term))
        if len(heap) > m:
            heapq.heappop(heap)
    out = []
    while heap:
        wt, _, term = heapq.heappop(heap)
        out.append((term, wt))
    return out


def weight_snippet(text: str, word_list: list[str], df_list: list[int]) -> str:
    """WeightSnippets (hw3/Snippets.cpp:497-621): cluster only the top
    keywords, scored by their keyword weight."""
    word_pos = get_word_pos(text, word_list)
    kw = dict(_top_keywords(word_weights(word_list, word_pos, df_list)))
    return _cluster_snippet(text, {w: word_pos[w] for w in kw}, kw)


def keyword_snippet(text: str, word_list: list[str], df_list: list[int]) -> str:
    """KeywordSnippets (hw3/Snippets.cpp:664-746): the deque window
    algorithm matching only the top keywords."""
    word_pos = get_word_pos(text, word_list)
    kws = {t for t, _ in _top_keywords(word_weights(word_list, word_pos, df_list))}
    return _deque_snippet(text, lambda w: w in kws)


def calc_word_percent(snippet: str, word_list: list[str]) -> float:
    """Snippet quality: fraction of snippet chars covered by query words
    (hw3/Snippets.cpp:749-772)."""
    if not snippet:
        return 0.0
    ws = set(word_list)
    total = 0
    n = 0
    start = 0
    for i, ch in enumerate(snippet):
        if ch not in SEP:
            if n == 0:
                start = i
            n += 1
        else:
            if n and snippet[start : start + n] in ws:
                total += n
            n = 0
    return total / len(snippet)


def make_snippet(
    algo: str,
    text: str,
    word_list: list[str],
    df_list: list[int],
    n_docs: int,
    avg_doc_len: float,
) -> str:
    if algo == "linear":
        return linear_match_snippet(text, word_list)
    if algo == "prefix":
        return prefix_search_snippet(text, word_list)
    if algo == "bm25":
        return score_snippet(text, word_list, df_list, n_docs, avg_doc_len, "bm25")
    if algo == "vsm":
        return score_snippet(text, word_list, df_list, n_docs, avg_doc_len, "vsm")
    if algo == "weight":
        return weight_snippet(text, word_list, df_list)
    if algo == "keyword":
        return keyword_snippet(text, word_list, df_list)
    raise ValueError(f"unknown snippet algorithm {algo!r} (choose from {ALGORITHMS})")


# --- Spark operator ----------------------------------------------------------

SNIPPET_SCHEMA_EXTRA = [
    T.StructField("snippet", T.StringType(), True),
    T.StructField("snippet_cover", T.DoubleType(), True),
]


def attach_snippets(
    topk_df: DataFrame,
    documents: DataFrame,
    query_info: dict[int, tuple[list[str], list[int]]],
    n_docs: int,
    avg_doc_len: float,
    algo: str = "bm25",
) -> DataFrame:
    """Add (snippet, snippet_cover) to a top-k result.

    ``query_info``: {query_id: (word_list, df_list)} — tiny, broadcast.
    Plan: broadcast the k×|queries| result rows against ``documents`` (the
    reference's random-access raw-doc fetch, hw3/DataLoader.cpp:875-895,
    becomes a broadcast hash join that scans only matching docs), then a
    narrow mapInPandas runs the per-doc kernel.
    """
    spark = topk_df.sparkSession
    binfo = spark.sparkContext.broadcast(query_info)
    joined = F.broadcast(topk_df).join(
        documents.select("doc_id", "content"), "doc_id", "inner"
    )
    schema = T.StructType(list(joined.drop("content").schema.fields) + SNIPPET_SCHEMA_EXTRA)
    out_cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        info = binfo.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            snips, covers = [], []
            for r in pdf.itertuples(index=False):
                words, dfs = info[int(r.query_id)]
                s = make_snippet(algo, r.content, words, dfs, n_docs, avg_doc_len)
                snips.append(s)
                covers.append(calc_word_percent(s, words))
            out = pdf.drop(columns=["content"])
            out["snippet"] = snips
            out["snippet_cover"] = covers
            yield out[out_cols]

    return joined.mapInPandas(run, schema=schema)
