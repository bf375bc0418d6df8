"""Page-metadata extraction (content.page_metadata): title / description /
lang / og:title over raw HTML, native regexp only."""

from __future__ import annotations

from pyspark.sql import functions as F

PAGES = [
    # full head: double quotes, title needs whitespace collapse, uppercase
    # lang folds, og:title present
    (
        1,
        '<html lang="EN-us"><head><title>  Doc one\n  and   more  </title>'
        '<meta name="description" content="Summary of doc one">'
        '<meta property="og:title" content="OG one">'
        '<meta property="article:published_time" '
        'content="2024-03-07T08:15:00Z"></head>'
        "<body><p>hi</p></body></html>",
    ),
    # no title; content-first meta ordering; single-quoted og attributes;
    # robots directive needing lower + comma/space normalization
    (
        2,
        "<html><head>"
        "<meta content=\"Reversed order two\" name='description'>"
        "<meta property='og:title' content='OG quoted two'>"
        '<meta content=" NOINDEX , nofollow " name="robots"></head>'
        "<body></body></html>",
    ),
    # unquoted + uppercase-cased lang attribute, title only; date falls
    # back to the first <time datetime> in the body
    (
        3,
        "<html LANG=fr-FR ><head><title>Solo</title></head>"
        '<body><time datetime="2023-12-01T00:00:00">then</time></body>',
    ),
    # no head at all
    (4, "<div>No head here</div>"),
    # NULL html
    (5, None),
    # empty title normalizes to NULL; xml:lang must NOT satisfy lang
    (6, '<html xml:lang="de"><head><title>   </title></head>'),
]

EXPECT = {
    1: (
        "Doc one and more",
        "Summary of doc one",
        "en-us",
        "OG one",
        "2024-03-07",
        None,
    ),
    2: (
        None,
        "Reversed order two",
        None,
        "OG quoted two",
        None,
        "noindex,nofollow",
    ),
    3: ("Solo", None, "fr-fr", None, "2023-12-01", None),
    4: (None, None, None, None, None, None),
    5: (None, None, None, None, None, None),
    # xml:lang ends in 'lang' but _RE requires a \s (or tag start) before
    # 'lang'; ':' is not \s, so it does not match — by design
    6: (None, None, None, None, None, None),
}


def test_page_metadata_columns(spark):
    from textractssmlprocessor_spark.operators.content import page_metadata

    df = spark.createDataFrame(PAGES, "doc_id bigint, html string")
    cols = page_metadata(F.col("html"))
    rows = {
        r["doc_id"]: (
            r["pg_title"],
            r["pg_description"],
            r["pg_lang"],
            r["pg_og_title"],
            r["pg_date"],
            r["pg_robots"],
        )
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in cols.items()]
        ).collect()
    }
    assert rows == EXPECT


def test_page_metadata_is_pure_codegen(spark):
    from textractssmlprocessor_spark.operators.content import page_metadata

    df = spark.createDataFrame(PAGES, "doc_id bigint, html string")
    cols = page_metadata(F.col("html"))
    plan = (
        df.select("doc_id", *[c.alias(k) for k, c in cols.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_unterminated_attribute_is_contained_to_the_element(spark):
    # a quotes-only capture class would run from the broken attribute to
    # the next quote anywhere in the page; '>' bounds it to the element
    from textractssmlprocessor_spark.operators.content import page_metadata

    html = (
        '<head><meta name="description" content="broken></head>'
        '<body><p>far away "quote" here</p></body>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    r = df.select(
        *[c.alias(k) for k, c in page_metadata(F.col("html")).items()]
    ).collect()[0]
    assert r["pg_description"] == "broken"
