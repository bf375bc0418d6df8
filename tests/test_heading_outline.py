"""Document outline extraction (content.heading_outline)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(spark, html):
    from textractssmlprocessor_spark.operators.content import heading_outline

    df = spark.createDataFrame([("u1", html)], "url string, html string")
    return [
        (r["pos"], r["level"], r["heading"])
        for r in heading_outline(df).orderBy("pos").collect()
    ]


def test_outline_order_levels_and_text_cleanup(spark):
    html = (
        "<h1>  Top\n  title </h1><p>body</p>"
        '<H2 class="s">Sub <em>part</em>  one</H2>'
        "<h6>deep</h6>"
    )
    assert _rows(spark, html) == [
        (0, 1, "Top title"),
        (1, 2, "Sub part one"),
        (2, 6, "deep"),
    ]


def test_empty_element_keeps_position_and_h7_is_not_a_heading(spark):
    assert _rows(spark, "<h3></h3><h7>nope</h7><h2>real</h2>") == [
        (0, 3, ""),
        (1, 2, "real"),
    ]


def test_null_html_and_no_headings_yield_no_rows(spark):
    from textractssmlprocessor_spark.operators.content import heading_outline

    df = spark.createDataFrame(
        [("u1", None), ("u2", "<p>flat</p>")], "url string, html string"
    )
    assert heading_outline(df).count() == 0


def test_plan_is_python_free(spark):
    from textractssmlprocessor_spark.operators.content import heading_outline

    df = spark.createDataFrame([("u", "<h1>x</h1>")], "url string, html string")
    plan = heading_outline(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
