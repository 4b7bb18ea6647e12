"""Snippet kernels: hand-computed cases pinning the reference semantics
(hw3/Snippets.cpp), plus the Spark attach_snippets operator end-to-end."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.snippets import (  # noqa: E402
    attach_snippets,
    calc_word_percent,
    get_snippets_by_pos,
    get_word_pos,
    linear_match_snippet,
    make_snippet,
    prefix_search_snippet,
    score_snippet,
    snippet_bm25,
    snippet_vsm,
    _top_keywords,
    word_weights,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


def test_get_word_pos_basic():
    text = "the cat sat on the mat "
    pos = get_word_pos(text, ["the", "mat"])
    assert pos["the"] == [0, 15]
    assert pos["mat"] == [19]


def test_get_word_pos_final_token_unflushed():
    # no trailing separator -> last token never recorded (reference quirk)
    pos = get_word_pos("foo bar", ["foo", "bar"])
    assert pos["foo"] == [0]
    assert pos["bar"] == []


def test_linear_match_window():
    words = ["target"]
    text = ("w%d " * 30) % tuple(range(30))
    text = text.replace("w12 ", "target ")
    snip = linear_match_snippet(text, words)
    assert "target" in snip
    assert snip.startswith("... ")
    assert snip.endswith("...")


def test_linear_match_punct_breaks_exact_match():
    # token keeps its trailing punctuation -> exact match fails (quirk)
    text = ("x " * 20) + "value, " + ("y " * 20)
    assert linear_match_snippet(text, ["value"]) == ""
    # prefix (substring) search still matches
    assert "value," in prefix_search_snippet(text, ["value"])


def test_snippet_bm25_clamps_negative():
    # df > N/2 -> negative idf -> clamped to 0 (unlike the ranking BM25)
    assert snippet_bm25(freq=3, df=90, doc_len=100, n_docs=100, avg_doc_len=100.0) == 0.0
    s = snippet_bm25(freq=3, df=5, doc_len=100, n_docs=100, avg_doc_len=100.0)
    K = 1.2 * (0.25 + 0.75 * 1.0)
    exp = math.log((100 - 5 + 0.5) / 5.5) * 2.2 * 3 / (K + 3)
    assert abs(s - exp) < 1e-12


def test_snippet_vsm_formula():
    s = snippet_vsm(freq=4, df=10, doc_len=400, n_docs=1000)
    exp = (1 + math.log(4)) * math.log(1 + 1000 / 10) / 20.0
    assert abs(s - exp) < 1e-12


def test_get_snippets_by_pos_window_and_ellipsis():
    text = "A" * 300 + " tail words here "
    out = get_snippets_by_pos(text, [10])
    assert out.startswith("...")  # pos[0] != 0
    # window = 100 chars extended to the next separator (all 'A's -> 300)
    assert out == "..." + "A" * 290
    out0 = get_snippets_by_pos("abc def ghi ", [0])
    assert not out0.startswith("...")


def test_cluster_split_and_order():
    # two occurrences >= 50 chars apart form two clusters; output order is
    # ascending cluster score (reference heap-drain quirk)
    text = "term " + "x" * 60 + " term term " + "y" * 60 + " "
    snip = score_snippet(text, ["term"], [5], n_docs=1000, avg_doc_len=100.0)
    assert snip.endswith("...")
    assert "term" in snip


def test_keyword_selection_bounds():
    words = [f"w{i}" for i in range(8)]
    pos = {w: [0] * (i + 1) for i, w in enumerate(words)}
    wts = word_weights(words, pos, [1] * 8)
    top = _top_keywords(wts)
    assert len(top) == max(math.ceil(8 * 0.25), 2) == 2
    # drained ascending
    assert top[0][1] <= top[1][1]


def test_calc_word_percent():
    snip = "the cat sat "
    assert abs(calc_word_percent(snip, ["cat"]) - 3 / 12) < 1e-12
    assert calc_word_percent("", ["x"]) == 0.0


def test_all_algorithms_run():
    text = ("alpha beta gamma " * 10) + "delta epsilon "
    for algo in ("linear", "prefix", "bm25", "vsm", "weight", "keyword"):
        out = make_snippet(algo, text, ["beta", "delta"], [3, 7], 1000, 120.0)
        assert isinstance(out, str)


def test_attach_snippets_spark(spark):
    from sparksearch.corpus import documents_from_testdata
    from sparksearch.query import query_terms_df, topk
    from sparksearch.stats import collection_stats, lexicon
    from sparksearch.tokenize import postings_from_documents, tokenize_text

    docs = documents_from_testdata(spark, SF_DIR)
    st = collection_stats(docs)
    postings = postings_from_documents(docs)
    lex = lexicon(postings)
    queries = [(1, "table scan", "disjunctive")]
    qt = query_terms_df(spark, queries)
    res = topk(postings, lex, qt, st["n_docs"], st["avg_doc_len"])

    dfs = {r["term"]: r["df"] for r in lex.filter(lex.term.isin(["table", "scan"])).collect()}
    words = tokenize_text("table scan")
    qinfo = {1: (words, [int(dfs.get(w, 0)) for w in words])}
    out = attach_snippets(res, docs, qinfo, st["n_docs"], st["avg_doc_len"], algo="bm25")
    rows = out.collect()
    assert len(rows) == res.count()
    assert {"snippet", "snippet_cover"} <= set(out.columns)
    assert any(r["snippet"] for r in rows)
    assert all(0.0 <= r["snippet_cover"] <= 1.0 for r in rows)
