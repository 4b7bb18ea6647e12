"""End-to-end: Spark engine == pure-Python oracle, rank-identical top-k.

Runs on (a) the deterministic synthetic source-code corpus and (b) the
driver's documents.parquet.  Also checks the UDF postings path against the
pure-SQL postings plan, and the sha256 end-to-end invariant.
"""

import hashlib
import math

import pytest

from sparksearch.constants import CONJUNCTIVE, DISJUNCTIVE
from sparksearch.corpus import documents_from_corpus, documents_from_testdata, synthetic_corpus
from sparksearch.oracle import engine as oracle
from sparksearch.query import query_terms_df, topk
from sparksearch.stats import collection_stats, doc_table, lexicon
from sparksearch.tokenize import postings_from_documents, postings_sql_plan

QUERIES = [
    (1, "if return", DISJUNCTIVE),
    (2, "uniq7tok", DISJUNCTIVE),           # doc-unique rare term
    (3, "uniq7tok return", CONJUNCTIVE),
    (4, "def else while", CONJUNCTIVE),
    (5, "for for int", DISJUNCTIVE),        # repeated query word
    (6, "zebraxyz", DISJUNCTIVE),           # absent term -> empty
    (7, "zebraxyz if", CONJUNCTIVE),        # absent term -> empty (AND)
    (8, "sym1 sym2 sym3 sym4 sym5", DISJUNCTIVE),
    (9, "buffer size", CONJUNCTIVE),
]


@pytest.fixture(scope="module")
def docs(spark):
    d = documents_from_corpus(synthetic_corpus(spark, 300, seed=42)).cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def oracle_idx(docs):
    rows = docs.select("doc_id", "content").collect()
    return oracle.build_index([(r["doc_id"], r["content"]) for r in rows])


def test_corpus_deterministic(spark):
    a = synthetic_corpus(spark, 50, seed=42, partitions=3).orderBy("repo", "path").collect()
    b = synthetic_corpus(spark, 50, seed=42, partitions=7).orderBy("repo", "path").collect()
    assert a == b  # partitioning-independent generation


def test_dense_ids(docs):
    ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    assert ids == list(range(300))
    # ids follow (repo, path) order
    rows = docs.select("doc_id", "repo", "path").orderBy("repo", "path").collect()
    assert [r["doc_id"] for r in rows] == list(range(300))


def test_sha256_invariant(docs):
    rows = docs.select("content", "content_sha256").limit(20).collect()
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha256"]


def test_udf_postings_equal_sql_postings(docs):
    a = postings_from_documents(docs)
    b = postings_sql_plan(docs)
    sym = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert sym == 0


def test_postings_match_oracle(docs, oracle_idx):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["doc_len"])
        for r in postings_from_documents(docs).collect()
    }
    want = {}
    for term, pl in oracle_idx.postings.items():
        for doc_id, tf in pl:
            want[(doc_id, term)] = (tf, oracle_idx.doc_len[doc_id])
    assert got == want


def test_stats_match_oracle(docs, oracle_idx):
    st = collection_stats(docs)
    assert st["n_docs"] == oracle_idx.n_docs
    assert math.isclose(st["avg_doc_len"], oracle_idx.avg_doc_len, rel_tol=1e-12)
    lex = {r["term"]: (r["df"], r["cf"]) for r in lexicon(postings_from_documents(docs)).collect()}
    assert {t: v[0] for t, v in lex.items()} == oracle_idx.df


def test_doc_table_word_nums(docs, oracle_idx):
    dt = doc_table(docs, postings_from_documents(docs))
    got = {r["doc_id"]: r["word_nums"] for r in dt.collect()}
    want = {}
    for term, pl in oracle_idx.postings.items():
        for doc_id, _ in pl:
            want[doc_id] = want.get(doc_id, 0) + 1
    assert got == want


def _rank_identical(spark_rows, oracle_ranked, tol=1e-9):
    """Rank lists must match; inside FP-tie groups order may permute."""
    got = [(r["doc_id"], r["score"]) for r in spark_rows]
    assert len(got) == len(oracle_ranked)
    for (gd, gs), (od, os_) in zip(got, oracle_ranked):
        assert abs(gs - os_) < tol, (gd, od, gs, os_)
    # group-wise doc set equality under near-ties
    i = 0
    n = len(got)
    while i < n:
        j = i
        while j + 1 < n and abs(oracle_ranked[j + 1][1] - oracle_ranked[i][1]) < tol:
            j += 1
        assert {d for d, _ in got[i : j + 1]} == {d for d, _ in oracle_ranked[i : j + 1]}
        i = j + 1


def test_topk_matches_oracle(spark, docs, oracle_idx):
    posts = postings_from_documents(docs)
    lex = lexicon(posts)
    st = collection_stats(docs)
    qt = query_terms_df(spark, QUERIES)
    res = topk(posts, lex, qt, st["n_docs"], st["avg_doc_len"]).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text, mode in QUERIES:
        want = oracle.topk(oracle_idx, text, mode)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert len(rows) == len(want), (qid, len(rows), len(want))
        _rank_identical(rows, want)
    assert 6 not in by_q and 7 not in by_q  # absent-term queries empty


def test_topk_on_testdata(spark, sf_dir):
    docs = documents_from_testdata(spark, sf_dir).cache()
    rows = docs.select("doc_id", "content").collect()
    idx = oracle.build_index([(r["doc_id"], r["content"]) for r in rows])
    posts = postings_from_documents(docs)
    lex = lexicon(posts)
    st = collection_stats(docs)
    queries = [(1, "join filter window", DISJUNCTIVE), (2, "dup table", CONJUNCTIVE)]
    qt = query_terms_df(spark, queries)
    res = topk(posts, lex, qt, st["n_docs"], st["avg_doc_len"]).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text, mode in queries:
        want = oracle.topk(idx, text, mode)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert len(rows) == len(want)
        _rank_identical(rows, want)
