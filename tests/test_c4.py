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


# ---- bad-words document filter (content.badword_columns / _hits_join) ----

BW = ("BadWord!", "Crummy Stuff", "spamcontent")

DOCS = [
    (1, "A clean page. Nothing to see."),
    (2, "This has BadWord, in it."),
    (3, "totally Crummy   STUFF appears here"),
    (4, "crummy alone and stuff alone do not match"),
    (5, None),
    (6, "badword and crummy stuff both"),
    (7, "badwording is a different token"),
]

EXPECT = {
    1: (0, None, 1),
    2: (1, "badword", 0),        # punctuation-split token matches
    3: (1, "crummy stuff", 0),   # case + whitespace normalization
    4: (0, None, 1),             # phrase needs ADJACENT tokens
    5: (0, None, 1),             # NULL text behaves as empty
    6: (2, "badword", 0),        # distinct-entry count, alpha-first
    7: (0, None, 1),             # word boundary: no substring hits
}


def test_badword_columns_literal_form(spark):
    from textractssmlprocessor_spark.operators.content import badword_columns

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    cols = badword_columns(F.col("text"), BW)
    rows = {
        r["doc_id"]: (r["bw_hits"], r["bw_first"], r["bw_keep"])
        for r in df.select("doc_id", *[c.alias(k) for k, c in cols.items()]).collect()
    }
    assert rows == EXPECT


def test_badword_hits_join_matches_literal_form(spark):
    from textractssmlprocessor_spark.operators.content import badword_hits_join

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    wl = spark.createDataFrame([(w,) for w in BW], "word string")
    rows = {
        r["doc_id"]: (r["bw_hits"], r["bw_first"], r["bw_keep"])
        for r in badword_hits_join(df, wl, max_phrase_words=3).collect()
    }
    assert rows == EXPECT


def test_badword_join_form_is_broadcast_no_doc_side_wide_shuffle(spark):
    from textractssmlprocessor_spark.operators.content import badword_hits_join

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    wl = spark.createDataFrame([(w,) for w in BW], "word string")
    plan = badword_hits_join(df, wl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_badword_join_rejects_overlong_entries(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from textractssmlprocessor_spark.operators.content import badword_hits_join

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    wl = spark.createDataFrame(
        [("one two three four",)], "word string"
    )
    # construction is a pure plan builder — no job, no error yet
    lazy = badword_hits_join(df, wl, max_phrase_words=3)
    # the deferred guard fires at execution time, naming the entry
    with pytest.raises((PySparkException, Py4JJavaError)) as exc:
        lazy.collect()
    assert "can never match" in str(exc.value)
    assert "one two three four" in str(exc.value)
    # validate=False restores the documented silent-subset behavior
    rows = badword_hits_join(
        df, wl, max_phrase_words=3, validate=False
    ).collect()
    assert all(r["bw_hits"] == 0 for r in rows)
