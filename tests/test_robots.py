"""robots.txt parsing + crawl verdicts (operators/robots.py)."""

from __future__ import annotations

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
        [("a.org", POLICY), ("b.org", "User-agent: *\nDisallow: /\n")],
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
