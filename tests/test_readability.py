"""Readability metrics (textstats.readability_columns): Flesch reading
ease / FK grade over the portable alpha-word + vowel-run counting rules."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _run(spark, text):
    from textractssmlprocessor_spark.operators.textstats import (
        readability_columns,
    )

    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    cols = readability_columns(F.col("text"))
    return (
        df.select(*[c.alias(k) for k, c in cols.items()])
        .collect()[0]
        .asDict()
    )


def test_simple_sentence(spark):
    r = _run(spark, "The cat sat on the mat.")
    assert (r["rd_n_words"], r["rd_n_sentences"], r["rd_n_syllables"]) == (
        6,
        1,
        6,
    )
    assert r["rd_flesch"] == pytest.approx(206.835 - 1.015 * 6 - 84.6)
    assert r["rd_fk_grade"] == pytest.approx(0.39 * 6 + 11.8 - 15.59)


def test_vowel_free_word_counts_one_syllable(spark):
    r = _run(spark, "Mph.")
    assert (r["rd_n_words"], r["rd_n_syllables"]) == (1, 1)


def test_vowel_groups_not_vowel_letters(spark):
    # beautiful = eau/i/u -> 3, day = ay -> 1; no terminal punctuation
    # still counts one sentence
    r = _run(spark, "beautiful day")
    assert (r["rd_n_words"], r["rd_n_sentences"], r["rd_n_syllables"]) == (
        2,
        1,
        4,
    )


def test_multi_sentence_runs(spark):
    # '!?.' runs: three sentences; '...' is ONE run (ellipsis is not
    # three sentences)
    r = _run(spark, "Hi there! Are you well? Yes.")
    assert r["rd_n_sentences"] == 3
    assert _run(spark, "Wait... what?")["rd_n_sentences"] == 2


def test_wordless_text_yields_null_metrics(spark):
    for t in ("", "123 456 !!!", None):
        r = _run(spark, t)
        assert r["rd_n_words"] == 0
        assert r["rd_flesch"] is None and r["rd_fk_grade"] is None
