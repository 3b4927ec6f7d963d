"""Crawl-infrastructure operators: robots directives, sitemaps,
anchor-text index, HITS (operators/web.py)."""

from pyspark.sql import functions as F

from themis_spark.operators import web as W


ROBOTS = """# corp robots
User-agent: *
Disallow: /private
Crawl-delay: 10
Sitemap: https://a.example.com/sitemap.xml

User-agent: fastbot
User-agent: slowbot
Crawl-delay: 2.5
Sitemap:   https://a.example.com/news.xml
Crawl-delay:
"""


def test_robots_directives(spark):
    df = spark.createDataFrame([("a.example.com", ROBOTS)],
                               "host string, robots_txt string")
    rows = {(r.agent, r.directive, r.value)
            for r in W.robots_directives(df).collect()}
    assert ("*", "sitemap", "https://a.example.com/sitemap.xml") in rows
    assert ("*", "sitemap", "https://a.example.com/news.xml") in rows
    assert ("*", "crawl-delay", "10") in rows
    assert ("fastbot", "crawl-delay", "2.5") in rows
    assert ("slowbot", "crawl-delay", "2.5") in rows
    # the empty Crawl-delay: line is dropped
    assert not [r for r in rows if r[1] == "crawl-delay" and r[2] == ""]
    assert len([r for r in rows if r[1] == "sitemap"]) == 2


SITEMAP = """<?xml version="1.0"?>
<urlset>
  <url><loc> https://a.com/p1 </loc><lastmod>2026-01-02</lastmod></url>
  <url><lastmod>2026-01-03</lastmod></url>
  <url><loc>https://a.com/p2</loc></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
<sitemap><loc>https://a.com/s1.xml</loc></sitemap>
<sitemap><loc>https://a.com/s2.xml</loc><lastmod>2025-12-31</lastmod></sitemap>
</sitemapindex>"""


def test_parse_sitemaps_urlset_and_index(spark):
    df = spark.createDataFrame(
        [("a.com", SITEMAP), ("a.com", SITEMAP_INDEX)],
        "host string, sitemap_xml string")
    rows = {(r.kind, r.loc, r.lastmod)
            for r in W.parse_sitemaps(df).collect()}
    assert rows == {
        ("url", "https://a.com/p1", "2026-01-02"),
        ("url", "https://a.com/p2", None),        # loc-only entry kept
        ("sitemap", "https://a.com/s1.xml", None),
        ("sitemap", "https://a.com/s2.xml", "2025-12-31"),
    }  # the loc-less <url> block is dropped


HTML = ('<p>intro</p><a href="https://b.com/x" class="l">Click <b>here</b>'
        ' now</a><a href="/rel"><img src="i.png"></a>'
        '<A HREF="https://c.com/y">c page</A>')


def test_extract_anchors(spark):
    df = spark.createDataFrame([("u0", HTML)], "url string, html string")
    rows = {(r.link, r.anchor) for r in W.extract_anchors(df).collect()}
    assert ("https://b.com/x", "Click here now") in rows
    assert ("/rel", "") in rows                    # image link: empty anchor
    assert ("https://c.com/y", "c page") in rows   # case-insensitive tag


def test_anchor_text_index_topk_and_ties(spark):
    rows = [("u", "t1", "best page"), ("u", "t1", "best page"),
            ("u", "t1", "a page"), ("u", "t1", "z page"),
            ("u", "t1", ""), ("u", "t2", "other")]
    df = spark.createDataFrame(rows, "url string, link string, anchor string")
    out = W.anchor_text_index(df, k=2).collect()
    got = {(r.link, r.rank): (r.anchor, r.n) for r in out}
    assert got[("t1", 1)] == ("best page", 2)
    assert got[("t1", 2)] == ("a page", 1)      # tie n=1 → anchor asc
    assert got[("t2", 1)] == ("other", 1)
    assert ("t1", 3) not in got


def test_hits_hand_computed(spark):
    # graph: 0→1, 0→2, 3→1  (node 0 is the hub; node 1 the authority)
    edges = spark.createDataFrame([(0, 1), (0, 2), (3, 1)],
                                  "src long, dst long")
    out = {r.node: (r.hub, r.auth) for r in W.hits(edges, iters=1).collect()}
    # iter1: auth = indegree (hubs all 1): a(1)=2, a(2)=1; hub(0)=a1+a2=3, hub(3)=a1=2
    assert out == {0: (3, 0), 1: (0, 2), 2: (0, 1), 3: (2, 0)}
    out2 = {r.node: (r.hub, r.auth)
            for r in W.hits(edges, iters=2).collect()}
    # iter2: a(1)=h0+h3=5, a(2)=h0=3; h(0)=5+3=8, h(3)=5
    assert out2 == {0: (8, 0), 1: (0, 5), 2: (0, 3), 3: (5, 0)}


def test_hits_no_cartesian(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    plan = W.hits(edges, iters=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_extract_anchors_is_scan_stage(spark):
    df = spark.createDataFrame([("u0", HTML)], "url string, html string")
    plan = W.extract_anchors(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_crawl_budgets_politeness_and_share(spark):
    ranks = spark.createDataFrame(
        [("a.com", 300), ("b.com", 100), ("c.com", 0)],
        "host string, rank long")
    delays = spark.createDataFrame(
        [("a.com", 2.0), ("b.com", 0.5)], "host string, crawl_delay double")
    out = {r.host: (r.politeness_cap, r.share, r.budget)
           for r in W.crawl_budgets(ranks, delays, horizon_s=100,
                                    total_budget=80,
                                    max_budget=1000).collect()}
    # a: cap 100/2=50, share 80*300//400=60 → budget 50
    # b: cap 100/0.5=200, share 80*100//400=20 → budget 20
    # c: cap 100/1(default)=100, share 0 → budget 0
    assert out == {"a.com": (50, 60, 50), "b.com": (200, 20, 20),
                   "c.com": (100, 0, 0)}


def test_crawl_budgets_no_total(spark):
    ranks = spark.createDataFrame([("a.com", 5)], "host string, rank long")
    out = W.crawl_budgets(ranks, None, horizon_s=10,
                          max_budget=7).collect()[0]
    assert out.politeness_cap == 10 and out.share is None and out.budget == 7


def test_crawl_frontier_budget_caps_per_host(spark):
    pages = spark.createDataFrame(
        [(f"https://a.com/p{i}", 10 - i) for i in range(5)]
        + [("https://b.com/x", 1), ("https://b.com/y", 2)],
        "url string, priority long")
    budgets = spark.createDataFrame(
        [("a.com", 2), ("b.com", 5)], "host string, budget long")
    out = W.crawl_frontier(pages, budgets).collect()
    got = {(r.host, r.url): r.rank for r in out}
    assert got == {("a.com", "https://a.com/p0"): 1,
                   ("a.com", "https://a.com/p1"): 2,
                   ("b.com", "https://b.com/y"): 1,
                   ("b.com", "https://b.com/x"): 2}


def test_crawl_frontier_budgets_broadcast(spark):
    pages = spark.createDataFrame([("https://a.com/p", 1)],
                                  "url string, priority long")
    budgets = spark.createDataFrame([("a.com", 1)],
                                    "host string, budget long")
    plan = W.crawl_frontier(pages, budgets) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
