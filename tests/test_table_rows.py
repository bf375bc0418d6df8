"""HTML table extraction (content.table_rows)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(spark, html):
    from textractssmlprocessor_spark.operators.content import table_rows

    df = spark.createDataFrame([("u1", html)], "url string, html string")
    return [
        (r["table_no"], r["row_no"], r["cells"])
        for r in table_rows(df).orderBy("table_no", "row_no").collect()
    ]


def test_header_and_data_rows_with_markup_cleanup(spark):
    html = (
        '<p>intro</p><table class="t"><tr><th> Name </th><th>Qty</th></tr>'
        "<tr><td>item <b>one</b></td><td>3</td></tr>"
        "<tr><td></td><td>empty kept</td></tr></table>"
    )
    assert _rows(spark, html) == [
        (0, 0, ["Name", "Qty"]),
        (0, 1, ["item one", "3"]),
        (0, 2, ["", "empty kept"]),
    ]


def test_multiple_tables_and_cell_free_rows_dropped(spark):
    html = (
        "<table><tr><td>a</td></tr></table>"
        "<table><tr></tr><tr><td>b</td><td>c</td></tr></table>"
    )
    assert _rows(spark, html) == [
        (0, 0, ["a"]),
        # the cell-free <tr></tr> is dropped but keeps its row_no slot
        (1, 1, ["b", "c"]),
    ]


def test_null_and_tableless_html_yield_no_rows(spark):
    from textractssmlprocessor_spark.operators.content import table_rows

    df = spark.createDataFrame(
        [("u1", None), ("u2", "<p>flat</p>")], "url string, html string"
    )
    assert table_rows(df).count() == 0


def test_plan_is_python_free(spark):
    from textractssmlprocessor_spark.operators.content import table_rows

    df = spark.createDataFrame(
        [("u", "<table><tr><td>x</td></tr></table>")],
        "url string, html string",
    )
    plan = table_rows(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
