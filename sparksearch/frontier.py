"""Distributed crawl-frontier scheduling — the batch dataflow analog of the
reference's hw1 crawler (hw1/code/crawler.py:76-277).

The reference crawler is a sequential priority-queue BFS: pop the
highest-score URL, fetch, push its out-links, with an extension blacklist,
a visited set, a per-site page cap (50), and a link score
``n_url/Σurls + Σdomains/n_domain`` (hw1/code/crawler.py:273-277).
Fetching real pages is out of scope (the corpus is given); what IS in
scope as a dataflow engine capability is the *frontier scheduling
computation* itself, re-expressed round-based for a cluster:

* round r selects, per site, the top-``batch_per_site`` unvisited frontier
  URLs by (score desc, url asc) — the parallel analog of sequential
  highest-score-first popping (T7);
* selected URLs become "crawled" (joined against a given link graph to
  emit their out-links — standing in for fetch+parse);
* new links are filtered exactly like the reference: extension blacklist,
  `^https?://` scheme check, visited-set anti-join, per-site page cap
  (P5, hw1/code/crawler.py:199-227);
* scores recompute per round from global degree statistics (F12).

Everything is DataFrame ops: the per-round loop is a driver loop over
fully distributed steps (the only driver state is the loop counter), so
one round scales to any frontier size; `visited` accumulates via
checkpointed union (linear lineage kept shallow with localCheckpoint).

Semantics are deterministic: ties pinned (score desc, url asc), rounds are
synchronous — so a single-threaded Python oracle reproduces the exact
crawl set (tests/test_frontier.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# extension blacklist (hw1/code/crawler.py:199-204 spirit; exact set ours)
BLACKLIST_EXT = [
    "jpg", "jpeg", "png", "gif", "pdf", "zip", "gz", "tar", "mp3", "mp4",
    "avi", "css", "js", "ico", "svg",
]

SCHEME_RE = "^https?://"


def synthetic_link_graph(n_sites: int = 6, pages_per_site: int = 30, seed: int = 5):
    """Deterministic link graph for tests/benches: cross-site links plus
    some blacklisted and bad-scheme targets.  Returns (urls, edges)."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    urls = [
        f"https://site{s}.test/p{p}.html"
        for s in range(n_sites)
        for p in range(pages_per_site)
    ]
    edges = []
    for u in urls:
        for _ in range(4):
            edges.append((u, urls[int(rng.integers(0, len(urls)))]))
        if rng.random() < 0.3:
            edges.append((u, f"https://site0.test/file{int(rng.integers(0, 5))}.pdf"))
        if rng.random() < 0.2:
            edges.append((u, f"ftp://site1.test/x{int(rng.integers(0, 5))}.html"))
    return urls, edges


def url_site(url) -> F.Column:
    """Site (host) of a URL: the reference's per-site accounting key
    (hw1/code/crawler.py:137-141 urlparse().netloc analog)."""
    return F.regexp_extract(url, "^https?://([^/]+)", 1)


def url_ext(url) -> F.Column:
    return F.lower(F.regexp_extract(url, "\\.([A-Za-z0-9]+)$", 1))


def filter_links(links: DataFrame, url_col: str = "url") -> DataFrame:
    """P5: scheme check + extension blacklist (hw1/code/crawler.py:199-227).
    Pure narrow predicates — pushdown-friendly."""
    u = F.col(url_col)
    return links.filter(
        u.rlike(SCHEME_RE) & ~url_ext(u).isin(BLACKLIST_EXT)
    )


def link_scores(frontier: DataFrame, url_col: str = "url") -> DataFrame:
    """F12: score = n_url/Σurls + Σdomains/n_domain
    (hw1/code/crawler.py:273-277), where n_url = how many times this URL
    was discovered, n_domain = how many frontier URLs share its site.
    Two skew-free aggregations + a broadcastable global count.

    Returns None when the frontier is empty — the caller's stop signal
    (folds the emptiness probe into the one scalar collect this function
    already pays, instead of a separate isEmpty job per round)."""
    per_url = frontier.groupBy(url_col).agg(F.count("*").cast("double").alias("n_url"))
    with_site = per_url.withColumn("site", url_site(F.col(url_col)))
    per_site = with_site.groupBy("site").agg(F.sum("n_url").alias("site_urls"), F.count("*").cast("double").alias("n_domain"))
    total = with_site.agg(F.sum("n_url")).collect()[0][0]
    if total is None:
        return None
    return (
        with_site.join(per_site, "site")
        .select(
            url_col,
            "site",
            (F.col("n_url") / F.lit(float(total)) + F.col("site_urls") / F.col("n_domain")).alias(
                "score"
            ),
        )
    )


def oracle_crawl(
    seeds: list[str],
    edges: list[tuple[str, str]],
    rounds: int,
    batch_per_site: int,
    site_cap: int,
) -> dict[str, int]:
    """Single-threaded twin of :func:`crawl_frontier` — same round-based
    semantics, plain Python.  Used as the correctness oracle (the iterative
    rounds are not SQL-expressible): tests/test_frontier.py asserts exact
    equality, and entry_queries turns its output into a VALUES-table DuckDB
    oracle for the driver harness."""
    import re
    from collections import Counter, defaultdict

    graph = defaultdict(list)
    for s, d in edges:
        graph[s].append(d)

    def site(u: str) -> str:
        m = re.match(r"^https?://([^/]+)", u)
        return m.group(1) if m else ""

    def ok(u: str) -> bool:
        if not re.match(r"^https?://", u):
            return False
        m = re.search(r"\.([A-Za-z0-9]+)$", u)
        return not (m and m.group(1).lower() in BLACKLIST_EXT)

    crawled = {u: 0 for u in seeds}
    last = list(seeds)
    for r in range(1, rounds + 1):
        bag: Counter = Counter()
        for u in last:
            for d in graph.get(u, []):
                if ok(d) and d not in crawled:
                    bag[d] += 1
        if not bag:
            break
        total = sum(bag.values())
        site_urls: defaultdict = defaultdict(float)
        n_domain: defaultdict = defaultdict(int)
        for u, n in bag.items():
            site_urls[site(u)] += n
            n_domain[site(u)] += 1
        scored = {
            u: n / total + site_urls[site(u)] / n_domain[site(u)] for u, n in bag.items()
        }
        by_site: defaultdict = defaultdict(list)
        for u, sc in scored.items():
            by_site[site(u)].append((u, sc))
        used = Counter(site(u) for u in crawled)
        picked = []
        for st, items in by_site.items():
            items.sort(key=lambda t: (-t[1], t[0]))
            batch = items[:batch_per_site]
            room = max(site_cap - used[st], 0)
            picked.extend(u for u, _ in batch[:room])
        for u in picked:
            crawled[u] = r
        last = picked
    return crawled


def crawl_frontier(
    seeds: DataFrame,
    link_graph: DataFrame,
    rounds: int = 3,
    batch_per_site: int = 10,
    site_cap: int = 50,
) -> DataFrame:
    """Round-based frontier BFS over a (src_url, dst_url) link graph.

    Returns (url, site, round) of all crawled URLs.  Per round: score the
    frontier, take the top ``batch_per_site`` per site among unvisited
    URLs (respecting the cumulative ``site_cap``), "fetch" them by
    joining the link graph, filter new links (P5), repeat.
    """
    crawled = seeds.select(F.col("url"), url_site(F.col("url")).alias("site")).withColumn(
        "round", F.lit(0)
    )
    frontier = seeds.select("url")

    for r in range(1, rounds + 1):
        # out-links of everything crawled so far that we haven't expanded
        last = crawled.filter(F.col("round") == r - 1).select(F.col("url").alias("src_url"))
        out = link_graph.join(F.broadcast(last), "src_url").select(F.col("dst_url").alias("url"))
        out = filter_links(out)
        # drop already-crawled (visited set anti-join)
        fresh = out.join(crawled.select("url"), "url", "left_anti")
        scored = link_scores(fresh)
        if scored is None:  # empty frontier — probe folded into link_scores
            break
        # per-site crawl budget: top batch_per_site this round, and never
        # beyond site_cap cumulative pages per site.  ONE window suffices:
        # the batch filter keeps a per-site PREFIX of the (score desc, url)
        # order, so a row's rank among the kept rows equals its rank among
        # all rows — rn <= batch AND rn + used <= cap is exactly the
        # sequential twin's items[:batch][:cap-used].
        used = crawled.groupBy("site").agg(F.count("*").alias("used"))
        w = Window.partitionBy("site").orderBy(F.desc("score"), F.asc("url"))
        picked = (
            scored.join(used, "site", "left")  # AQE broadcasts when small
            .na.fill({"used": 0})
            .withColumn("rn", F.row_number().over(w))
            .filter(
                (F.col("rn") <= batch_per_site)
                & (F.col("rn") + F.col("used") <= site_cap)
            )
            .select("url", "site")
        )
        new_rows = picked.withColumn("round", F.lit(r))
        crawled = crawled.unionByName(new_rows).localCheckpoint(eager=True)
    return crawled