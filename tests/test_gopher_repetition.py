"""Full Gopher repetition battery (textstats.gopher_repetition) against
hand-computed character fractions."""

from __future__ import annotations


def _rows(spark, docs):
    from textractssmlprocessor_spark.operators.textstats import gopher_repetition

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {r["id"]: r.asDict() for r in gopher_repetition(df).collect()}


def test_dup_line_chars_and_top_bigram(spark):
    # lines: 'dup line' (8 ch, x2) + 'unique one' (10 ch)
    # words: dup,line,unique,one,dup,line -> total chars 23
    # top bigram 'dup line' (7 ch net of separator) occurs twice -> 14/23
    r = _rows(spark, [(1, "dup line\nunique one\ndup line")])[1]
    assert r["dup_line_char_frac"] == round(16 / 26, 6)
    assert r["dup_para_char_frac"] == 0.0  # single paragraph, no repeat
    assert r["top_2_gram_char_frac"] == round(14 / 23, 6)
    assert r["dup_5_gram_char_frac"] == 0.0  # both 5-grams unique


def test_dup_5_gram_full_coverage(spark):
    # 'p q r s t' repeated: the two 5-gram occurrences at positions 0 and 5
    # are equal, covering all 10 single-char words -> fraction 1.0
    r = _rows(spark, [(2, "p q r s t p q r s t")])[2]
    assert r["dup_5_gram_char_frac"] == 1.0
    # 10 words admit exactly one 10-gram -> cannot repeat
    assert r["dup_10_gram_char_frac"] == 0.0
    # top-2-gram: 'p q' occurs twice (as do the other wrap pairs; max
    # count 2, tie-broken to the lexicographically largest gram 't p');
    # chars = 2 * 2 / 10
    assert r["top_2_gram_char_frac"] == round(4 / 10, 6)


def test_overlap_counts_once(spark):
    # 'a a a a a a' (6 words): every 5-gram is 'a a a a a' (2 occurrences,
    # positions 0-4 and 1-5) -> covered positions = all 6, NOT 10
    r = _rows(spark, [(3, "a a a a a a")])[3]
    assert r["dup_5_gram_char_frac"] == 1.0


def test_duplicated_paragraphs(spark):
    text = "same para here\n\nother content now\n\nsame para here"
    r = _rows(spark, [(4, text)])[4]
    # paragraphs: 'same para here' (14 ch, x2), 'other content now' (17)
    assert r["dup_para_char_frac"] == round(28 / 45, 6)


def test_empty_and_null_docs(spark):
    rows = _rows(spark, [(5, ""), (6, None)])
    for k in (5, 6):
        assert rows[k]["top_2_gram_char_frac"] is None
        assert rows[k]["dup_5_gram_char_frac"] is None
        assert rows[k]["dup_line_char_frac"] is None
