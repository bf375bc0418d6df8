"""Engine-portable casing locks (fuzz seed 21 class).

Three cross-engine equivalences the contract relies on, each proven here
directly against DuckDB on an adversary set the fixture corpora never
contain:

1. ``textstats.fold_lower(col)`` == DuckDB ``lower(col)`` for ANY input
   — the fold pre-substitutes exactly the two Unicode SpecialCasing
   lowercase entries (U+0130 İ, U+03A3 Σ) with their simple-map targets,
   after which Java's full lower() equals utf8proc's simple map.
2. ASCII word-RUN membership == RE2's ASCII ``\b`` reading — so Spark's
   split-based stopword/single-letter formulations can keep RE2 ``\b``
   oracles unchanged.
3. The guarded ``_ascii_upper`` (F.upper on pure-ASCII rows, 26-letter
   translate otherwise) == DuckDB's plain 26-letter translate.

If CASEFOLD_SRC/DST ever drift (e.g. someone adds ς, which DuckDB's
simple map KEEPS, breaking equivalence 1), these tests fail before the
driver's oracle gate does.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.textstats import (
    ASCII_NONWORD_PLUS,
    CASEFOLD_DST,
    CASEFOLD_SRC,
    STOPWORDS,
    ascii_word_runs,
    fold_lower,
    stopword_hits,
)

ADVERSARIES = [
    "İstanbul ISPARTA ılık",            # Turkish dotted/dotless I
    "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΥΣ",                  # capital sigma, word-final position
    "ΟΔΥΣΣΕΥΣ τέλος ὈΔΥΣΣΕΎΣ",           # polytonic Greek
    "STRASSE straße ß ẞ",               # sharp s, capital sharp s
    "z̀́̂̃a̖̗̘l̙̚go zalgo",                  # combining-mark stacks
    "ＦＵＬＬＷＩＤＴＨ ｆｏｒｍｓ",       # fullwidth
    "\U00010400\U00010428 deseret",     # cased astral script
    "ﬁﬂﬆ ligatures ŉ ǅǄǆ",             # ligatures, digraph casing
    "mixed İΣς end Σ",                  # final sigma + already-final ς
    "café naïve Café",
    "ascii only text 123",
    "",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_casefold_constants_are_the_two_specialcasing_entries():
    assert CASEFOLD_SRC == "İΣ"
    assert CASEFOLD_DST == "iσ"


def test_fold_lower_equals_duckdb_lower(spark, duck):
    df = spark.createDataFrame([(s,) for s in ADVERSARIES], ["t"])
    got = [r[0] for r in df.select(fold_lower(F.col("t"))).collect()]
    for s, g in zip(ADVERSARIES, got):
        d = duck.execute("select lower(?)", [s]).fetchone()[0]
        assert g == d, f"fold_lower({s!r}) = {g!r} != duckdb {d!r}"


def test_word_runs_equal_re2_ascii_b_reading(duck):
    # RE2's \b is defined over ASCII \w: a stopword matches \bw\b exactly
    # when it is a maximal [A-Za-z0-9_] run. Prove count equality on the
    # adversaries + ASCII neighborhoods via DuckDB's RE2.
    texts = ADVERSARIES + [
        "the-and the,and thethe the1 the_x x the",
        "the中文 thèmark \U00010400the",
    ]
    for s in texts:
        runs = [w for w in re.split("[^A-Za-z0-9_]+", s.lower()) if w]
        for w in STOPWORDS["en"]:
            re2 = duck.execute(
                "select len(regexp_extract_all(lower(?), ?))",
                [s, rf"\b{w}\b"],
            ).fetchone()[0]
            assert runs.count(w) == re2, (s, w)


def test_stopword_hits_matches_re2_count(spark, duck):
    df = spark.createDataFrame(
        [(s,) for s in ADVERSARIES + ["the and of to in is that with the"]],
        ["t"],
    )
    got = [
        r[0] for r in df.select(stopword_hits(F.col("t"), "en")).collect()
    ]
    pat = r"\b(?:%s)\b" % "|".join(STOPWORDS["en"])
    for s, g in zip(ADVERSARIES + ["the and of to in is that with the"], got):
        re2 = duck.execute(
            "select len(regexp_extract_all(lower(?), ?))", [s, pat]
        ).fetchone()[0]
        assert g == re2, (s, g, re2)


def test_ascii_upper_guard_equals_plain_translate(spark, duck):
    from __spark_entry__ import _ascii_upper

    df = spark.createDataFrame([(s,) for s in ADVERSARIES], ["t"])
    got = [r[0] for r in df.select(_ascii_upper("t")).collect()]
    for s, g in zip(ADVERSARIES, got):
        d = duck.execute(
            "select translate(?, 'abcdefghijklmnopqrstuvwxyz',"
            " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ')",
            [s],
        ).fetchone()[0]
        assert g == d, (s, g, d)


# The ONE documented boundary of equivalence 1: codepoints whose case
# pairs POSTDATE the oracle engine's Unicode tables. Spark's casing is
# Unicode-16-era (ICU) while DuckDB/utf8proc here is ~13/14, so these
# lower() in Spark and pass through DuckDB unchanged. Enumerated by a
# FULL 0x20..0x10FFFF sweep (one char per row, both engines): Vithkuqi
# (U+10570.., Unicode 14), Garay (U+10D50.., Unicode 16), Latin
# Extended-D additions, U+1C89, U+2C2F. A pre-lower translate cannot
# close this (it cannot stop Spark's lower() from firing), and these
# historic-script codepoints do not occur in the fuzz vocabulary or any
# realistic crawl-dedup corpus; production is Spark-only — the skew
# only affects the TEST oracle. If DuckDB's utf8proc catches up, the
# exactness test below starts failing and the set shrinks.
UNICODE_VERSION_SKEW = sorted(
    [0x1C89, 0x2C2F, 0xA7C0, 0xA7C7, 0xA7C9, 0xA7CB, 0xA7CC, 0xA7D0,
     0xA7D6, 0xA7D8, 0xA7DA, 0xA7DC, 0xA7F5]
    + [c for c in range(0x10570, 0x10596)
       if c not in (0x1057B, 0x1058B, 0x10593)]
    + list(range(0x10D50, 0x10D66))
)


def test_unicode_version_skew_set_is_exact(spark, duck):
    # every listed codepoint diverges; every OTHER BMP codepoint (plus
    # the astral blocks around the listed ones) matches — so the
    # boundary is exactly this set, not an open-ended disclaimer
    assert len(UNICODE_VERSION_SKEW) == 70
    skew = set(UNICODE_VERSION_SKEW)
    bmp = [c for c in range(0x20, 0x10000) if not 0xD800 <= c <= 0xDFFF]
    astral_probe = list(range(0x10400, 0x10700)) + list(range(0x10D00, 0x10E00)) + \
        list(range(0x118A0, 0x11900)) + list(range(0x16E40, 0x16EC0)) + \
        list(range(0x1E900, 0x1E944))
    cps = bmp + astral_probe
    df = spark.createDataFrame([(c, chr(c)) for c in cps], ["cp", "c"])
    spark_lo = {
        r["cp"]: r["lo"]
        for r in df.select("cp", fold_lower(F.col("c")).alias("lo")).collect()
    }
    import pandas as pd

    duck.register(
        "sweep_t", pd.DataFrame({"cp": cps, "c": [chr(c) for c in cps]})
    )
    duck_lo = dict(duck.execute("select cp, lower(c) from sweep_t").fetchall())
    diverged = {c for c in cps if spark_lo[c] != duck_lo[c]}
    assert diverged == {c for c in cps if c in skew}, (
        sorted(hex(c) for c in diverged ^ (skew & set(cps)))
    )


def test_ascii_word_runs_drops_empty_and_folds(spark):
    df = spark.createDataFrame([("  İΣ the-AND  ",)], ["t"])
    runs = df.select(ascii_word_runs(F.col("t"))).collect()[0][0]
    # fold maps İΣ -> iσ; σ is ASCII-non-word, so only the 'i' run survives
    assert runs == ["i", "the", "and"]
    assert "" not in runs
    assert ASCII_NONWORD_PLUS == "[^A-Za-z0-9_]+"
