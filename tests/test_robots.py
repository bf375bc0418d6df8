"""robots.txt parsing + crawl verdicts (operators/robots.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.robots import _parse_robots_txt

POLICY = """# crawl policy
User-agent: googlebot
Disallow: /

User-agent: *
User-agent: mybot
Disallow: /admin/
Allow: /admin/public/
Crawl-delay: 10

User-agent: otherbot
Disallow: /secret/
"""


def test_parser_group_selection_rfc9309():
    # '*' agent: only the star group's rules
    assert _parse_robots_txt(POLICY) == [
        ("disallow", "/admin/"),
        ("allow", "/admin/public/"),
    ]
    # exact-match group overrides '*' entirely
    assert _parse_robots_txt(POLICY, agent="googlebot") == [("disallow", "/")]
    # agent named inside a multi-agent group gets that group
    assert _parse_robots_txt(POLICY, agent="mybot") == [
        ("disallow", "/admin/"),
        ("allow", "/admin/public/"),
    ]
    # unknown agent falls back to '*'
    assert _parse_robots_txt(POLICY, agent="nobody")[0] == ("disallow", "/admin/")
    # degenerate inputs
    assert _parse_robots_txt("") == []
    assert _parse_robots_txt("User-agent: *\nDisallow:") == []
    assert _parse_robots_txt("Disallow: /x/") == []  # groupless rules ignored
    assert _parse_robots_txt(None) == []


def test_verdicts_longest_match_allow_wins(spark):
    from textractssmlprocessor_spark.operators.robots import (
        parse_robots,
        robots_verdicts,
    )

    robots = spark.createDataFrame(
        [
            ("a.org", POLICY),
            ("b.org", "User-agent: *\nDisallow: /\n"),
            ("q.org", "User-agent: *\nDisallow: /search?q=\n"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://a.org/admin/x"),          # blocked by /admin/
            (2, "https://a.org/admin/public/y"),   # allow wins (longer)
            (3, "https://a.org/other"),            # no rule -> allowed
            (4, "https://b.org/anything"),         # blanket disallow
            (5, "https://c.org/whatever"),         # no robots row -> allowed
            (6, "https://a.org"),                  # bare host -> path '/'
            # RFC 9309 matches path + QUERY (fragment stripped):
            (7, "https://q.org/search?q=cats"),    # query rule matches
            (8, "https://q.org/search"),           # no query -> no match
            (9, "https://a.org/admin/public/y#f"), # fragment stripped
            (10, "https://q.org?x=1"),             # query, no path -> '/?x=1'
        ],
        "doc_id long, url string",
    )
    out = {r["id"]: r for r in robots_verdicts(urls, parse_robots(robots)).collect()}
    assert not out[1]["allowed"] and out[1]["matched_path"] == "/admin/"
    assert out[2]["allowed"] and out[2]["matched_path"] == "/admin/public/"
    assert out[3]["allowed"] and out[3]["matched_path"] is None
    assert not out[4]["allowed"] and out[4]["matched_path"] == "/"
    assert out[5]["allowed"]
    assert out[6]["allowed"] and out[6]["path"] == "/"
    assert not out[7]["allowed"] and out[7]["matched_path"] == "/search?q="
    assert out[7]["path"] == "/search?q=cats"
    assert out[8]["allowed"] and out[8]["matched_path"] is None
    assert out[9]["allowed"] and out[9]["path"] == "/admin/public/y"
    assert out[10]["allowed"] and out[10]["path"] == "/?x=1"


# --- canonical-link extraction (operators/weburl.py) -------------------------


def test_extract_canonical_signals(spark):
    from textractssmlprocessor_spark.operators.weburl import extract_canonical

    pages = spark.createDataFrame(
        [
            ("u1", '<link rel="canonical" href="https://c.org/a">'),
            ("u2", "<link href='https://c.org/b' rel='canonical'>"),
            ("u3", '<meta property="og:url" content="https://c.org/c">'),
            # link outranks og:url
            ("u4", '<link rel="canonical" href="https://c.org/d">'
                   '<meta property="og:url" content="https://c.org/WRONG">'),
            ("u5", "<p>nothing declared</p>"),
            ("u6", None),
        ],
        "url string, html string",
    )
    got = {r["url"]: (r["canonical_href"], r["canonical_source"])
           for r in extract_canonical(pages).collect()}
    assert got["u1"] == ("https://c.org/a", "link_rel")
    assert got["u2"] == ("https://c.org/b", "link_rel")
    assert got["u3"] == ("https://c.org/c", "og_url")
    assert got["u4"] == ("https://c.org/d", "link_rel")
    assert got["u5"] == (None, None)
    assert got["u6"] == (None, None)


def test_canonical_url_dedup_collapses_families(spark):
    from textractssmlprocessor_spark.operators.weburl import canonical_url_dedup

    pages = spark.createDataFrame(
        [
            (1, "https://m.ex.org/p?utm_source=x", '<link rel="canonical" href="https://ex.org/p">'),
            (2, "https://ex.org/p", '<link rel="canonical" href="https://ex.org/p">'),
            (3, "https://cdn.ex.org/p", '<meta property="og:url" content="https://ex.org/p">'),
            (4, "https://ex.org/Other?b=2&a=1", "<p>none</p>"),
            (5, "https://ex.org/Other?a=1&b=2#frag", "<p>none</p>"),
        ],
        "doc_id bigint, url string, html string",
    )
    got = {r["canonical_url"]: (r["keep_id"], r["n_dupes"])
           for r in canonical_url_dedup(pages).collect()}
    # the canonical family collapses across three DIFFERENT crawl hosts
    assert got["https://ex.org/p"] == (1, 3)
    # the no-canonical rows still get plain URL normalization (query sort,
    # fragment strip)
    assert got["https://ex.org/Other?a=1&b=2"] == (4, 2)


def test_host_quality_rollup(spark):
    from textractssmlprocessor_spark.operators.weburl import host_quality_rollup

    docs = spark.createDataFrame(
        [
            ("good.org", 0.9, True), ("good.org", 0.8, True),
            ("good.org", 0.7, False),
            ("spam.biz", 0.2, False), ("spam.biz", 0.3, False),
            # high mean but low pass-frac: verdict must fail on the AND
            ("mixed.net", 0.9, False), ("mixed.net", 0.95, False),
        ],
        "host string, q double, ok boolean",
    )
    got = {r["host"]: r for r in host_quality_rollup(
        docs, "q", pass_col="ok", min_mean=0.5, min_pass_frac=0.5
    ).collect()}
    assert got["good.org"]["n_docs"] == 3
    assert got["good.org"]["mean_score"] == 0.8
    assert got["good.org"]["pass_frac"] == round(2 / 3, 6)
    assert got["good.org"]["host_verdict"] is True
    assert got["spam.biz"]["host_verdict"] is False       # fails mean
    assert got["mixed.net"]["host_verdict"] is False      # fails pass_frac
    # no pass_col: verdict rests on the mean alone, pass_frac NULL
    nop = {r["host"]: r for r in host_quality_rollup(
        docs, "q", min_mean=0.5
    ).collect()}
    assert nop["mixed.net"]["host_verdict"] is True
    assert nop["mixed.net"]["pass_frac"] is None


def test_host_quality_rollup_score_scale_exact(spark):
    """score_scale path (fuzz seed 18): the mean of 6-rounded scores is
    an exact-integer sum + one division, so a .5e-6 boundary (any odd
    scaled sum at n=2) cannot flip on a cross-engine ulp. Values match
    the avg() path on its own terms, NULL scores stay excluded from the
    denominator, and an all-NULL host degrades to NULL."""
    from textractssmlprocessor_spark.operators.weburl import (
        host_quality_rollup,
    )

    docs = spark.createDataFrame(
        [
            # odd scaled sum: 0.768663 + 0.768664 = 1.537327e6 units
            ("edge.org", 0.768663, True), ("edge.org", 0.768664, True),
            ("nulls.net", 0.5, True), ("nulls.net", None, None),
            ("void.io", None, None),
        ],
        "host string, q double, ok boolean",
    )
    got = {r["host"]: r for r in host_quality_rollup(
        docs, "q", pass_col="ok", score_scale=1_000_000
    ).collect()}
    assert got["edge.org"]["mean_score"] == round(1537327 / 2e6, 6)
    assert got["nulls.net"]["mean_score"] == 0.5      # NULL not in denom
    assert got["nulls.net"]["pass_frac"] == 1.0
    assert got["nulls.net"]["n_docs"] == 2
    assert got["void.io"]["mean_score"] is None
    assert got["void.io"]["pass_frac"] is None


def test_crawl_frontier_round_robin(spark):
    from textractssmlprocessor_spark.operators.weburl import crawl_frontier_order

    pages = spark.createDataFrame(
        [(i, f"https://h{i % 5}.org/p/{i}") for i in range(40)],
        "doc_id bigint, url string",
    )
    got = sorted(
        crawl_frontier_order(pages).collect(), key=lambda r: r["frontier_pos"]
    )
    assert [r["frontier_pos"] for r in got] == list(range(1, 41))
    # round-robin: every consecutive window of 5 dispatches hits 5 DISTINCT
    # hosts, and ranks are non-decreasing along the frontier
    for w in range(0, 40, 5):
        assert len({r["host"] for r in got[w : w + 5]}) == 5
    ranks = [r["host_rank"] for r in got]
    assert ranks == sorted(ranks)


def test_url_quality_columns(spark):
    from textractssmlprocessor_spark.operators.weburl import url_quality_columns

    urls = spark.createDataFrame(
        [
            (1, "https://ads.site.org/p/1234/567/89"),
            (2, "https://www.site.org/a/b/c/d?x=1&y=2&z=3#frag"),
            (3, "https://clean.org/"),
            (4, "https://www.site.org/page"),
        ],
        "id bigint, u string",
    )
    cols = url_quality_columns(F.col("u"))
    got = {r["id"]: r for r in urls.select(
        "id", *[c.alias(k) for k, c in cols.items()]
    ).collect()}
    assert got[1]["url_suspect"] == "ads"
    assert got[1]["path_depth"] == 4 and got[1]["query_param_count"] == 0
    assert got[1]["url_digit_ratio"] == round(9 / len("https://ads.site.org/p/1234/567/89"), 6)
    assert got[2]["path_depth"] == 4 and got[2]["query_param_count"] == 3
    assert got[2]["url_suspect"] is None
    assert got[3]["path_depth"] == 0 and got[3]["query_param_count"] == 0
    assert got[4]["url_suspect"] is None and got[4]["path_depth"] == 1


def test_sitemap_entries(spark):
    from textractssmlprocessor_spark.operators.robots import sitemap_entries

    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<sitemapindex><sitemap><loc>https://h/nested.xml</loc></sitemap>"
        "</sitemapindex>"
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> https://h/a?x=1&amp;y=2 </loc>"
        "<lastmod>2024-03-01</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://h/b</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # loc-less: dropped
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("h.example.org", xml), ("empty.example.org", "<urlset></urlset>")],
        "host string, sitemap_xml string",
    )
    rows = sorted(
        sitemap_entries(df).collect(), key=lambda r: (r["host"], r["loc"])
    )
    assert len(rows) == 2  # nested sitemap loc + loc-less entry excluded
    a, b = rows
    assert a["loc"] == "https://h/a?x=1&y=2"  # trimmed + &amp; unescaped
    assert a["lastmod"] == "2024-03-01" and a["priority"] == 0.8
    assert b["loc"] == "https://h/b"
    assert b["lastmod"] is None and b["priority"] is None


def test_bom_prefixed_robots_txt_still_parses(spark):
    """A UTF-8 BOM before 'User-agent:' must not disable the whole file
    (the first field would be unrecognizable and every URL allowed)."""
    from textractssmlprocessor_spark.operators.robots import _parse_robots_txt

    rules = _parse_robots_txt("\ufeffUser-agent: *\nDisallow: /private/\n")
    assert rules == [("disallow", "/private/")]


def test_resolve_url_reference_forms(spark):
    from textractssmlprocessor_spark.operators.weburl import resolve_url

    base = "https://ex.org/a/b/page.html?q=1#frag"
    cases = [
        ("http://other.org/x", "http://other.org/x"),      # absolute
        ("//cdn.org/x", "https://cdn.org/x"),               # scheme-relative
        ("/index.html", "https://ex.org/index.html"),       # root-relative
        ("c.html", "https://ex.org/a/b/c.html"),            # path-relative
        ("?page=2", "https://ex.org/a/b/page.html?page=2"),  # query-only
        ("#top", "https://ex.org/a/b/page.html"),            # fragment-only
        ("", "https://ex.org/a/b/page.html"),                # empty = base
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, base, h) for i, (h, _) in enumerate(cases)],
        "i bigint, base string, href string",
    )
    got = {
        r["i"]: r["resolved"]
        for r in df.select(
            "i", resolve_url(F.col("base"), F.col("href")).alias("resolved")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
    # host-root base: relative resolves against '/'
    df2 = spark.createDataFrame(
        [("https://ex.org", "x.html"), ("not-a-url", "x.html")],
        "base string, href string",
    )
    r2 = [
        r["r"]
        for r in df2.select(
            resolve_url(F.col("base"), F.col("href")).alias("r")
        ).collect()
    ]
    assert r2[0] == "https://ex.org/x.html"
    assert r2[1] == "x.html"  # unresolvable base passes href through


def test_canonical_url_dedup_resolves_relative_hrefs(spark):
    """Relative canonical hrefs are extremely common on real crawls; the
    group key must be the RESOLVED target, or two unrelated sites that
    both declare href="/index.html" collapse onto one key (silent
    cross-site deletion)."""
    from textractssmlprocessor_spark.operators.weburl import canonical_url_dedup

    pages = spark.createDataFrame(
        [
            (1, "https://alpha.org/home?x=1", '<link rel="canonical" href="/index.html">'),
            (2, "https://beta.org/welcome", '<link rel="canonical" href="/index.html">'),
            (3, "https://alpha.org/home2", '<link rel="canonical" href="/index.html">'),
        ],
        "doc_id bigint, url string, html string",
    )
    got = {r["canonical_url"]: (r["keep_id"], r["n_dupes"])
           for r in canonical_url_dedup(pages).collect()}
    # same-host relative canonicals collapse; different hosts stay apart
    assert got["https://alpha.org/index.html"] == (1, 2)
    assert got["https://beta.org/index.html"] == (2, 1)


def test_url_suspect_tokens_need_boundaries(spark):
    from textractssmlprocessor_spark.operators.weburl import url_quality_columns

    urls = spark.createDataFrame(
        [
            (1, "https://example.com/downloads/file.zip"),   # not 'ads'
            (2, "https://gnome.org/backtracker"),             # not 'tracker'
            (3, "https://auth.org/cb?redirect_uri=x"),        # '_' joins words
            (4, "https://ads.example.org/page"),              # '.' delimits
            (5, "https://spam.org/cheap-ads-here"),           # '-' delimits
            (6, "https://x.org/a?popup=1"),                   # '?'/'=' delimit
        ],
        "id bigint, u string",
    )
    cols = url_quality_columns(F.col("u"))
    got = {
        r["id"]: r["url_suspect"]
        for r in urls.select("id", cols["url_suspect"].alias("url_suspect")).collect()
    }
    assert got == {1: None, 2: None, 3: None, 4: "ads", 5: "ads", 6: "popup"}


def test_verdicts_wildcard_and_anchor_rules(spark):
    """RFC 9309 wildcard matching: '*' spans any chars, trailing '$'
    anchors. Truncating at the first '*' instead turns 'Disallow: /*.php$'
    into 'Disallow: /' and blocks the whole host — silent corpus loss."""
    from textractssmlprocessor_spark.operators.robots import (
        parse_robots,
        robots_verdicts,
    )

    robots = spark.createDataFrame(
        [
            ("w.org", "User-agent: *\nDisallow: /*.php$\n"),
            ("x.org", "User-agent: *\nDisallow: *.pdf\n"),
            ("y.org", "User-agent: *\nDisallow: /exact$\n"),
            ("z.org", "User-agent: *\nDisallow: /a/*/secret\nAllow: /a/\n"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://w.org/index.php"),    # blocked ($ after .php)
            (2, "https://w.org/index.html"),   # NOT blocked
            (3, "https://w.org/index.php5"),   # NOT blocked ($ anchors)
            (4, "https://x.org/doc.pdf"),      # blocked
            (5, "https://x.org/doc.pdfx"),     # blocked (no anchor)
            (6, "https://x.org/page"),         # NOT blocked
            (7, "https://y.org/exact"),        # blocked (anchored)
            (8, "https://y.org/exactly"),      # NOT blocked
            (9, "https://z.org/a/b/secret"),   # wildcard beats shorter allow
            (10, "https://z.org/a/open"),      # allow, no wildcard match
        ],
        "doc_id long, url string",
    )
    out = {
        r["id"]: r["allowed"]
        for r in robots_verdicts(urls, parse_robots(robots)).collect()
    }
    assert out == {
        1: False, 2: True, 3: True, 4: False, 5: False,
        6: True, 7: False, 8: True, 9: False, 10: True,
    }


def test_parse_robots_null_host_row_dropped(spark):
    """A NULL-host row (malformed crawl record) must not flow into the
    non-nullable rules schema — the Arrow writer NPEs on the schema lie
    and kills the task. NULL hosts can never match the verdict equijoin,
    so the parser drops them; other hosts' rules are unaffected."""
    from pyspark.sql import functions as F

    from textractssmlprocessor_spark.operators.robots import (
        parse_robots,
        robots_verdicts,
    )

    tbl = spark.createDataFrame(
        [(None, "User-agent: *\nDisallow: /x\n"),
         ("h.example.org", "User-agent: *\nDisallow: /blocked\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(tbl)
    rows = rules.collect()
    assert {r["host"] for r in rows} == {"h.example.org"}

    urls = spark.createDataFrame(
        [(1, "https://h.example.org/blocked/p"), (2, None)],
        "doc_id bigint, url string",
    )
    out = robots_verdicts(urls, rules).toPandas()
    assert len(out) == 2  # NULL url row survives as allowed (no host match)
