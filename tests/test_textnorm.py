"""Unicode hygiene (operators/textnorm.py): NFC normalization, mojibake
detection/repair — pure-Python semantics plus the Spark pandas-UDF path."""

from __future__ import annotations

import re
import unicodedata

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.textnorm import (
    MOJIBAKE_RE,
    MOJIBAKE_SAMPLE,
    MOJIBAKE_SAMPLE_FIXED,
    NFD_SAMPLE,
    NFD_SAMPLE_NFC,
    _repair_mojibake_str,
    mojibake_artifacts,
    repair_mojibake,
    with_nfc_text,
)


def _whatwg_mangle(s: str) -> str:
    """Browser-style decode of UTF-8 bytes as windows-1252 with the WHATWG
    control-char fallbacks for the five undefined bytes."""
    out = []
    for byte in s.encode("utf-8"):
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


def test_canonical_vectors_consistent():
    assert _whatwg_mangle(MOJIBAKE_SAMPLE_FIXED) == MOJIBAKE_SAMPLE
    assert _repair_mojibake_str(MOJIBAKE_SAMPLE) == MOJIBAKE_SAMPLE_FIXED
    assert unicodedata.normalize("NFC", NFD_SAMPLE) == NFD_SAMPLE_NFC
    assert len(re.findall(MOJIBAKE_RE, MOJIBAKE_SAMPLE)) == 5
    assert not re.findall(MOJIBAKE_RE, MOJIBAKE_SAMPLE_FIXED)


def test_repair_handles_double_encoding_and_never_mangles_clean():
    double = _whatwg_mangle(MOJIBAKE_SAMPLE)
    assert _repair_mojibake_str(double) == MOJIBAKE_SAMPLE_FIXED
    for clean in ["plain ascii", "café déjà vu", "łódź — ünïcode", ""]:
        assert _repair_mojibake_str(clean) == clean


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S", "Z")
        ),
        max_size=40,
    )
)
def test_repair_roundtrip_property(s):
    """mangle-then-repair recovers any printable string whose original is
    itself a repair fixed point. Strings that already LOOK mangled (e.g. a
    text literally discussing 'Ã©') are excluded — repair is allowed to
    keep unwinding those."""
    from hypothesis import assume

    assume(_repair_mojibake_str(s) == s)
    assert _repair_mojibake_str(_whatwg_mangle(s)) == s


def test_spark_nfc_and_gated_repair(spark):
    rows = [
        (0, MOJIBAKE_SAMPLE),
        (1, "clean text"),
        (2, _whatwg_mangle(_whatwg_mangle("déjà"))),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in repair_mojibake(
            df.withColumn("hits", mojibake_artifacts(F.col("text"))),
            text_col="text",
            out_col="fixed",
        ).collect()
    }
    assert out[0]["fixed"] == MOJIBAKE_SAMPLE_FIXED and out[0]["hits"] == 5
    assert out[1]["fixed"] == "clean text" and out[1]["hits"] == 0
    assert out[2]["fixed"] == "déjà"

    # the UDF branch must be FILTER-gated, not CASE-WHEN-gated: Spark
    # hoists pandas UDFs out of a projection's CASE WHEN into an
    # ArrowEvalPython node that runs on every row, so the only way clean
    # rows skip Arrow is a plan where the Python node sits above a Filter.
    # The union shape shows up as exactly one ArrowEvalPython in the
    # analyzed plan, with a Filter between it and the scan.
    plan = repair_mojibake(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    dirty_branch = plan[plan.index("ArrowEvalPython"):]
    assert "Filter" in dirty_branch, plan

    nfc = {
        r["id"]: r["nfc_text"]
        for r in with_nfc_text(
            spark.createDataFrame(
                [(0, NFD_SAMPLE), (1, "ascii")], "id long, text string"
            )
        ).collect()
    }
    assert nfc[0] == NFD_SAMPLE_NFC
    assert nfc[1] == "ascii"


# --- unicode script detection (textstats.script_columns) ---------------------


def test_script_columns_detects_scripts(spark):
    from textractssmlprocessor_spark.operators.textstats import (
        SCRIPT_SAMPLES,
        script_columns,
    )

    rows = [
        (1, "plain english text only"),
        (2, SCRIPT_SAMPLES["cyrillic"]),
        (3, SCRIPT_SAMPLES["cjk"]),
        (4, SCRIPT_SAMPLES["arabic"]),
        (5, SCRIPT_SAMPLES["greek"]),
        (6, SCRIPT_SAMPLES["cyrillic"] + " mixed with latin tail words"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    cols = script_columns(F.col("t"))
    got = {
        r["id"]: r
        for r in df.select("id", *[c.alias(k) for k, c in cols.items()]).collect()
    }
    assert got[1]["script_pred"] == "latin" and got[1]["latin_frac"] > 0.7
    assert got[2]["script_pred"] == "cyrillic" and got[2]["cyrillic_frac"] > 0.8
    assert got[3]["script_pred"] == "cjk"
    assert got[4]["script_pred"] == "arabic"
    assert got[5]["script_pred"] == "greek"
    # mixed: latin tail outweighs the short cyrillic sample
    assert got[6]["script_pred"] == "latin" and got[6]["cyrillic_frac"] > 0.2
    assert got[7]["script_pred"] is None


def test_char_entropy_and_compression_ratio(spark):
    import math

    from textractssmlprocessor_spark.operators.textstats import (
        repetition_stats,
        with_compression_ratio,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaa"),              # 1 symbol -> H = 0
            (2, "abababababababab"),              # 2 equiprobable -> H = ln 2
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "xyxy " * 200),                   # templated: compresses hard
        ],
        "doc_id bigint, text string",
    )
    ent = {r["id"]: r["char_entropy"] for r in repetition_stats(docs).collect()}
    assert ent[1] == 0.0
    assert ent[2] == round(math.log(2), 6)
    # natural text: entropy between ln 2 and ln(alphabet)
    assert 2.0 < ent[3] < 5.0
    cr = {
        r["doc_id"]: r["compression_ratio"]
        for r in with_compression_ratio(docs).collect()
    }
    assert cr[4] < 0.1 < cr[3]
    # deterministic across calls
    cr2 = {
        r["doc_id"]: r["compression_ratio"]
        for r in with_compression_ratio(docs).collect()
    }
    assert cr == cr2


def test_drop_repeated_lines_within(spark):
    from textractssmlprocessor_spark.operators.textnorm import (
        drop_repeated_lines_within,
    )

    docs = spark.createDataFrame(
        [
            (1, "nav\nbody one\nnav\n\nbody two\n  nav \nnav"),
            (2, "only\nunique\nlines"),
            (3, ""),
        ],
        "id bigint, t string",
    )
    got = {r["id"]: r["out"] for r in docs.select(
        "id", drop_repeated_lines_within(F.col("t")).alias("out")
    ).collect()}
    # repeats of the trimmed form drop (incl. the padded '  nav '); the
    # whitespace-only line survives
    assert got[1] == "nav\nbody one\n\nbody two"
    assert got[2] == "only\nunique\nlines"
    assert got[3] == ""


def test_drop_repeated_lines_megline_bypass(spark):
    """Crawl-spam guard: a 10^5-line document bypasses the O(lines^2)
    array expression (text returned unchanged) and completes in bounded
    time; a doc under the cap still dedupes; max_lines=None restores the
    unguarded behavior on small docs."""
    import time

    from textractssmlprocessor_spark.operators.textnorm import (
        drop_repeated_lines_within,
    )

    mega = "\n".join(f"line {i % 50000}" for i in range(100000))
    docs = spark.createDataFrame(
        [(1, mega), (2, "a\nb\na")], "id bigint, t string"
    )
    t0 = time.monotonic()
    got = {r["id"]: r["out"] for r in docs.select(
        "id", drop_repeated_lines_within(F.col("t")).alias("out")
    ).collect()}
    assert time.monotonic() - t0 < 60  # bypass, not 5*10^9 comparisons
    assert got[1] == mega          # keep-as-is verdict above the cap
    assert got[2] == "a\nb"        # under the cap: still dedupes
    small = {r["id"]: r["out"] for r in docs.filter("id = 2").select(
        "id", drop_repeated_lines_within(F.col("t"), max_lines=None).alias("out")
    ).collect()}
    assert small[2] == "a\nb"


def test_strip_invisible(spark):
    from textractssmlprocessor_spark.operators.textnorm import (
        INVISIBLE_SAMPLE,
        INVISIBLE_SAMPLE_CLEAN,
        strip_invisible,
    )

    docs = spark.createDataFrame(
        [
            (1, INVISIBLE_SAMPLE),
            (2, "tab\tand\nnewline survive"),
            (3, "plain"),
        ],
        "id bigint, t string",
    )
    got = {r["id"]: r["c"] for r in docs.select(
        "id", strip_invisible(F.col("t")).alias("c")
    ).collect()}
    assert got[1] == INVISIBLE_SAMPLE_CLEAN
    assert got[2] == "tab\tand\nnewline survive"  # structure preserved
    assert got[3] == "plain"
