"""C4 line/document cleaning rules (content.c4_line_columns)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run(spark, text: str) -> dict:
    from textractssmlprocessor_spark.operators.content import c4_line_columns

    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    cols = c4_line_columns(F.col("text"))
    return df.select(
        *[c.alias(name) for name, c in cols.items()]
    ).collect()[0].asDict()


def test_line_rules(spark):
    r = _run(
        spark,
        "A good long sentence stays here.\n"
        "too short.\n"
        "no terminal punctuation on this line\n"
        "Please enable JavaScript in your browser.\n"
        'A quoted ending also counts as terminal."\n'
        "Another keeper sentence right here!",
    )
    assert r["c4_text"].split("\n") == [
        "A good long sentence stays here.",
        'A quoted ending also counts as terminal."',
        "Another keeper sentence right here!",
    ]
    assert r["c4_n_lines_kept"] == 3


def test_doc_verdict_sentences(spark):
    ok = _run(spark, "One two three. Four five six! Seven eight nine? "
                     "Ten eleven twelve. Final sentence here.")
    assert ok["c4_n_sentences"] == 5 and ok["c4_keep"] == 1
    few = _run(spark, "Only one sentence lives here.")
    assert few["c4_keep"] == 0


def test_doc_verdict_lorem_and_brace(spark):
    base = "Aa bb cc. Dd ee ff. Gg hh ii. Jj kk ll. Mm nn oo."
    assert _run(spark, base)["c4_keep"] == 1
    assert _run(spark, base + "\nLorem Ipsum filler text here.")["c4_keep"] == 0
    # the brace can sit on a DROPPED line and still kill the page (the
    # rule inspects the raw document, not the kept text)
    assert _run(spark, base + "\nfunction() { return; }")["c4_keep"] == 0
