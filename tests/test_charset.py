"""Charset sniffing + decode (operators/charset.py).

Tier 1: pure-function fixtures over real encodings (no Spark).
Tier 2: the Spark split operator — values match decode_payload row-for-row,
and the executed plan keeps the pandas UDF gated behind a Filter.
"""

from __future__ import annotations

import codecs

import pytest

from textractssmlprocessor_spark.operators.charset import (
    ENCODING_LABELS,
    FAST_PATH_LABELS,
    decode_payload,
    sniff_encoding,
)

JA = "こんにちは世界"  # こんにちは世界
KO = "안녕하세요"  # 안녕하세요
RU = "Привет"  # Привет
ZH = "你好世界"  # 你好世界
FR = "café résumé naïve ±"


# --- tier 1: pure sniff/decode ------------------------------------------------


@pytest.mark.parametrize(
    "text,codec,label",
    [
        (JA, "cp932", "shift_jis"),
        (JA, "cp932", "Shift-JIS"),
        (JA, "euc_jp", "euc-jp"),
        (KO, "cp949", "euc-kr"),
        (RU, "koi8-r", "koi8-r"),
        (RU, "cp1251", "windows-1251"),
        (ZH, "gb18030", "gbk"),
        (ZH, "gb18030", "gb2312"),
        (ZH, "big5hkscs", "big5"),
        (FR, "cp1252", "windows-1252"),
        (FR, "cp1252", "ISO-8859-1"),
        (FR, "iso8859-15", "latin9"),
    ],
)
def test_meta_declared_legacy_encodings_roundtrip(text, codec, label):
    prefix = f'<html><head><meta charset="{label}"></head><body>'.encode("ascii")
    payload = prefix + text.encode(codec) + b"</body></html>"
    assert sniff_encoding(payload) == codec
    decoded, detected = decode_payload(payload)
    assert detected == codec
    assert text in decoded


def test_http_equiv_content_type_form():
    payload = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">'
        + RU.encode("cp1251")
    )
    decoded, detected = decode_payload(payload)
    assert detected == "cp1251"
    assert RU in decoded


def test_undeclared_invalid_utf8_falls_back_to_cp1252():
    payload = b"<p>" + FR.encode("cp1252") + b"</p>"
    assert sniff_encoding(payload) == "cp1252"
    decoded, _ = decode_payload(payload)
    assert FR in decoded


def test_valid_utf8_wins_without_declaration():
    payload = ("<p>" + JA + FR + "</p>").encode("utf-8")
    decoded, detected = decode_payload(payload)
    assert detected == "utf-8"
    assert JA in decoded and FR in decoded


@pytest.mark.parametrize(
    "bom,codec",
    [
        (codecs.BOM_UTF8, "utf-8"),
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
    ],
)
def test_bom_overrides_meta_and_is_stripped(bom, codec):
    # meta declares koi8-r but the BOM wins (WHATWG precedence), and the
    # decoded text must NOT carry a leading U+FEFF
    body = f'<meta charset="koi8-r"><p>{FR}</p>'
    payload = bom + body.encode(codec)
    decoded, detected = decode_payload(payload)
    assert detected == codec
    assert not decoded.startswith("﻿")
    assert FR in decoded


def test_meta_declared_utf16_means_utf8():
    # spec quirk: bytes that survive an ASCII prescan cannot be utf-16
    payload = b'<meta charset="utf-16le"><p>plain ascii</p>'
    assert sniff_encoding(payload) == "utf-8"


def test_unknown_label_is_ignored():
    payload = b'<meta charset="klingon-8"><p>ascii body</p>'
    assert sniff_encoding(payload) == "utf-8"


def test_declaration_outside_prescan_window_is_ignored():
    payload = b"<!--" + b"x" * 1300 + b'--><meta charset="koi8-r">body'
    assert sniff_encoding(payload) == "utf-8"


def test_us_ascii_label_aliases_to_cp1252():
    # WHATWG: us-ascii -> windows-1252; utf-8 bytes declared us-ascii decode
    # as cp1252 (faithful browser mojibake, not silent correction)
    payload = b'<meta charset="us-ascii">' + FR.encode("utf-8")
    decoded, detected = decode_payload(payload)
    assert detected == "cp1252"
    assert "cafÃ©" in decoded  # é seen through cp1252 glasses


def test_x_user_defined_maps_high_bytes_to_private_use():
    payload = b'<meta charset="x-user-defined">ab\x80\xff'
    decoded, detected = decode_payload(payload)
    assert detected == "x-user-defined"
    assert decoded.endswith("ab")


def test_truncated_multibyte_replaces_instead_of_raising():
    payload = ('<meta charset="shift_jis">'.encode("ascii")
               + JA.encode("cp932")[:-1])
    decoded, detected = decode_payload(payload)
    assert detected == "cp932"
    assert "�" in decoded


def test_null_payload():
    assert decode_payload(None) == (None, None)


def test_label_table_resolves_to_real_codecs():
    for label, codec in ENCODING_LABELS.items():
        if codec == "x-user-defined":
            continue
        codecs.lookup(codec)
    assert "utf-8" in ENCODING_LABELS and "sjis" in ENCODING_LABELS
    assert "utf8" in FAST_PATH_LABELS and "utf-16" in FAST_PATH_LABELS


# --- tier 2: Spark split operator --------------------------------------------


@pytest.fixture(scope="module")
def spark():
    from textractssmlprocessor_spark.session import get_spark

    return get_spark("test-charset")


def _fixture_payloads():
    return [
        ("fast-ascii", b"<p>plain ascii page</p>"),
        ("fast-utf8", ("<p>" + JA + "</p>").encode("utf-8")),
        ("fast-meta-utf8", b'<meta charset="utf-8"><p>ok</p>'),
        ("meta-sjis", b'<meta charset="shift_jis">' + JA.encode("cp932")),
        ("meta-euckr", b'<meta charset="euc-kr">' + KO.encode("cp949")),
        ("fallback-1252", FR.encode("cp1252")),
        ("bom-utf8", codecs.BOM_UTF8 + ("<p>" + FR + "</p>").encode("utf-8")),
        ("bom-utf16le", codecs.BOM_UTF16_LE + FR.encode("utf-16-le")),
        ("null", None),
    ]


def test_sniffed_decode_matches_pure_function(spark):
    from textractssmlprocessor_spark.operators.charset import sniffed_decode

    rows = _fixture_payloads()
    df = spark.createDataFrame(rows, "id string, html binary")
    got = {
        r["id"]: (r["page_text"], r["charset"])
        for r in sniffed_decode(df).collect()
    }
    assert len(got) == len(rows)
    for rid, payload in rows:
        assert got[rid] == decode_payload(payload), rid


def test_sniffed_decode_plan_gates_the_udf(spark):
    """The pandas UDF must sit above a Filter (slow branch only); the fast
    branch carries no Python node. One ArrowEvalPython in the whole plan."""
    from textractssmlprocessor_spark.operators.charset import sniffed_decode

    df = spark.createDataFrame(_fixture_payloads(), "id string, html binary")
    out = sniffed_decode(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    arrow_at = plan.index("ArrowEvalPython")
    assert "Filter" in plan[arrow_at:], "UDF must be gated behind the slow-branch filter"


def test_fast_flag_routing(spark):
    """Every fast-eligible fixture routes fast (never crosses Arrow), every
    legacy/BOM fixture routes slow."""
    from pyspark.sql import functions as F

    from textractssmlprocessor_spark.operators.charset import fast_utf8_flag

    df = spark.createDataFrame(_fixture_payloads(), "id string, html binary")
    flagged = df.select(
        "id",
        (F.col("html").isNull() | fast_utf8_flag(F.col("html"))).alias("f"),
    )
    got = {r["id"]: r["f"] for r in flagged.collect()}
    for rid, want_fast in got.items():
        assert want_fast == rid.startswith(("fast", "null")), (rid, got)


def test_prescan_window_counts_bytes_not_chars(spark):
    """The {0,512} meta-attribute window is a BYTE budget in the spec and
    in decode_payload's byte-compiled prescan. The native fast flag must
    count the same way (latin-1 prefix decode): a meta tag whose
    multibyte attribute span fits 512 chars but exceeds 512 bytes must
    NOT fast-route on a label the Python prescan never sees."""
    from textractssmlprocessor_spark.operators.charset import (
        decode_payload,
        sniffed_decode,
    )

    pad = ("é" * 300).encode("utf-8")  # 300 chars, 600 bytes
    payload = (
        b'<meta x="' + pad + b'" charset=utf-8>'
        b"<meta charset=windows-1251>"
        + "café".encode("utf-8")
    )
    want_text, want_codec = decode_payload(payload)
    assert want_codec == "cp1251"  # python prescan skips meta#1
    df = spark.createDataFrame([(1, bytearray(payload))], "id bigint, html binary")
    row = sniffed_decode(df).collect()[0]
    assert row["charset"] == want_codec
    assert row["page_text"] == want_text
