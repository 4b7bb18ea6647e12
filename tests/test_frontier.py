"""Crawl-frontier scheduling vs a single-threaded oracle of the same
round-based semantics (reference: hw1/code/crawler.py priority-queue BFS
with blacklist / visited-set / per-site cap / link scoring)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.frontier import (  # noqa: E402
    crawl_frontier,
    filter_links,
    oracle_crawl,
    synthetic_link_graph as make_graph,
)


def test_frontier_matches_oracle(spark):
    urls, edges = make_graph()
    seeds = [urls[0], urls[40], urls[75]]
    seeds_df = spark.createDataFrame([(u,) for u in seeds], "url string")
    graph_df = spark.createDataFrame(edges, "src_url string, dst_url string")
    got = {
        r["url"]: r["round"]
        for r in crawl_frontier(
            seeds_df, graph_df, rounds=3, batch_per_site=5, site_cap=12
        ).collect()
    }
    want = oracle_crawl(seeds, edges, rounds=3, batch_per_site=5, site_cap=12)
    assert got == want


def test_filter_links(spark):
    df = spark.createDataFrame(
        [
            ("https://a.test/x.html",),
            ("https://a.test/x.pdf",),
            ("ftp://a.test/x.html",),
            ("http://b.test/y.css",),
            ("http://b.test/y",),
        ],
        "url string",
    )
    kept = {r["url"] for r in filter_links(df).collect()}
    assert kept == {"https://a.test/x.html", "http://b.test/y"}


def test_site_cap_respected(spark):
    urls, edges = make_graph(n_sites=2, pages_per_site=40)
    seeds_df = spark.createDataFrame([(urls[0],)], "url string")
    graph_df = spark.createDataFrame(edges, "src_url string, dst_url string")
    out = crawl_frontier(seeds_df, graph_df, rounds=4, batch_per_site=20, site_cap=15)
    per_site = {
        r["site"]: r["n"]
        for r in out.groupBy("site").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 15 for n in per_site.values())
