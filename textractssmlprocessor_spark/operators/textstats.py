"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are native ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python in the per-row path. Word-count semantics
mirror the reference validator (reference ssml_validator.py:95-98).

Operators:
- word/token counting (whitespace + BPE-ish regex token classes)
- language ID (stopword-hit heuristic over a fixed per-language lexicon)
- quality scoring (length / punctuation / stopword / alpha ratios)
- document fingerprinting (md5 of whitespace-normalized text — stable across
  engines, usable as an exact-dedup key)
- cost estimation (reference utils.py:441-478 linear models)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = r"\b[\w-]+\b"

# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols —
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_WORD_PY = re.compile(r"\b[\w-]+\b")


def count_words_py(text: str) -> int:
    """Pure-Python parity with reference ssml_validator.py:95-98."""
    return len(_WORD_PY.findall(text))


def count_words(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(WORD_RE), F.lit(0)))


def count_tokens_bpe(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


# --- language ID heuristic ----------------------------------------------------
# Tiny fixed stopword lexicons; the language with the most hits wins. At
# 100 TB this is a pure map-side scan — no shuffle, no UDF.

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "qui"],
    "la": ["et", "in", "est", "non", "cum", "ad", "quod", "sed"],
}


def stopword_hits(col: Column, lang: str) -> Column:
    pattern = r"\b(?:%s)\b" % "|".join(STOPWORDS[lang])
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def lang_id(col: Column) -> Column:
    """argmax over per-language stopword hits; deterministic tie-break by
    language code order. Encoded as min over ``zeropad(100000-hits)||lang``
    string keys — a form any SQL engine reproduces exactly (the DuckDB
    oracle uses the identical expression)."""
    keys = [
        F.concat(
            F.lpad((F.lit(100000) - stopword_hits(col, lang)).cast("string"), 6, "0"),
            F.lit(lang),
        )
        for lang in sorted(STOPWORDS)
    ]
    return F.substring(F.array_min(F.array(*keys)), 7, 2)


# --- quality scoring ----------------------------------------------------------


def quality_columns(col: Column) -> dict[str, Column]:
    """Ratio features used by web-corpus quality filters."""
    n_chars = F.length(col)
    words = count_words(col)
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    stop_en = stopword_hits(col, "en")
    nz = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(None))
    nzw = F.when(words > 0, words.cast("double")).otherwise(F.lit(None))
    return {
        "n_chars": n_chars,
        "n_words": words,
        "alpha_ratio": (alpha / nz),
        "punct_ratio": (punct / nz),
        "stopword_ratio": (stop_en / nzw),
        "mean_word_len": (alpha / nzw),
    }


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = quality_columns(F.col(text_col))
    for name, c in cols.items():
        df = df.withColumn(name, c)
    return df


# --- fingerprinting -------------------------------------------------------------


def normalize_for_fingerprint(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column) -> Column:
    """md5 hex of normalized text: engine-portable exact-dedup key."""
    return F.md5(normalize_for_fingerprint(col))


# --- cost estimation (reference utils.py:441-478) -------------------------------


def with_cost_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    n = F.length(F.col(text_col))
    return (
        df.withColumn("character_count", n)
        .withColumn("gpt_cost", n / 1000000 * 20)
        .withColumn("polly_cost_generative", n / 1000000 * 30)
        .withColumn("polly_cost_long_form", n / 1000000 * 100)
    )


def total_cost(df: DataFrame, text_col: str = "text") -> DataFrame:
    n = F.length(F.col(text_col))
    return df.agg(
        F.sum(n).alias("total_character_count"),
        F.sum(n / 1000000 * 20).alias("total_gpt_cost"),
        F.sum(n / 1000000 * 30).alias("total_polly_cost_generative"),
        F.sum(n / 1000000 * 100).alias("total_polly_cost_long_form"),
    )
