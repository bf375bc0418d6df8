"""Single-process golden oracle for the UDF-backed contract queries.

The eight queries whose semantics are not RE2/SQL-expressible
(`extract_documents`, `extract_chunks`, `split_ssml`, `validate_corpus`,
`srt_generate`, `srt_variants`, `dup_sentences`,
`dedup_sentences_corpus`) get fixture-golden parquet oracles:
this module computes the EXPECTED output rows in one Python process — no
Spark — from the raw page payloads, and ``make_goldens.py`` writes them to
``goldens/<sf>/<query>.parquet`` for DuckDB to serve as ``oracle_sql()``.

Semantics sources (all reference-parity-tested in tests/):
- extraction chain: the pure functions in textractssmlprocessor_spark.functions
  (byte-parity vs /root/reference proven by test_function_parity.py and
  test_ssml_goldens.py; reference lifecycle utils.py:278-319);
- validator rules: pure-Python mirrors written here against reference
  pipeline_support/ssml_validator.py semantics. \\s/\\w are spelled as
  explicit ASCII classes (Java-regex defaults) while \\b keeps Python's
  Unicode semantics (matching Java's Unicode-aware \\b inconsistency);
  trims strip ' ' only (Spark F.trim strips spaces, not all whitespace);
- subtitles/SRT: the pure subtitle functions (reference timestamp.py:25-206)
  with the same sequential float fold the Spark window uses.

This is deliberately NOT the Spark code path: no DataFrame, no UDF object,
no window — a divergence in the distributed plan (explode order, first-wins
aggregation, join truncation, running-sum blocking) shows up as a hash
mismatch in the driver's correctness gate.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict
from typing import Dict, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textractssmlprocessor_spark.functions.chunking import (  # noqa: E402
    chunk_text_with_spans,
    split_ssml,
)
from textractssmlprocessor_spark.functions.cleaning import (  # noqa: E402
    format_time,
    is_html,
)
from textractssmlprocessor_spark.functions.dom import (  # noqa: E402
    convert_html_to_ssml,
)
from textractssmlprocessor_spark.functions.ssml import normalize_ssml  # noqa: E402
from textractssmlprocessor_spark.functions.subs import (  # noqa: E402
    expand_substitutions,
)
from textractssmlprocessor_spark.functions.subtitles import (  # noqa: E402
    chunk_subtitles,
)
from textractssmlprocessor_spark.operators.validate import (  # noqa: E402
    _balanced_findings,
    _english_word_findings,
    _nested_findings,
)

# --- extraction chain -------------------------------------------------------


def extract_documents_rows(pages: List[Tuple[str, str, str]]) -> List[dict]:
    """pages (url, payload, lang) -> [(url, lang, extracted_text)]."""
    return [
        {
            "url": url,
            "lang": lang,
            "extracted_text": convert_html_to_ssml(p) if is_html(p) else p,
        }
        for url, p, lang in pages
    ]


def extract_chunks_rows(pages: List[Tuple[str, str, str]]) -> List[dict]:
    """pages -> flagship rows (url, chunk_number, extracted_text, ssml,
    spans-as-JSON, matching Spark's to_json of array<struct<start,end,kind>>)."""
    out = []
    for url, p, _lang in pages:
        cleaned = convert_html_to_ssml(p) if is_html(p) else p
        for i, (chunk, s, e) in enumerate(chunk_text_with_spans(cleaned), 1):
            out.append(
                {
                    "url": url,
                    "chunk_number": i,
                    "extracted_text": chunk,
                    "ssml": normalize_ssml(expand_substitutions(chunk)),
                    "spans": '[{"start":%d,"end":%d,"kind":"chunk"}]' % (s, e),
                }
            )
    return out


def split_ssml_rows(chunk_rows: List[dict]) -> List[dict]:
    out = []
    for r in chunk_rows:
        for j, part in enumerate(split_ssml(r["ssml"]), 1):
            out.append(
                {
                    "url": r["url"],
                    "chunk_number": r["chunk_number"],
                    "part_number": j,
                    "ssml_part": part,
                }
            )
    return out


# --- validator rule mirrors -------------------------------------------------
# Java-regex (Spark) semantics, mirrored precisely: \s and \w are ASCII-only
# in Java by default -> spelled as explicit ASCII classes; but Java's \b is
# UNICODE-aware regardless (a documented Java inconsistency: 'déjà' is one
# word for \b even though é is not \w), matching Python's DEFAULT \b — so
# \b patterns compile WITHOUT re.ASCII.

_JS = r"[ \t\n\x0b\f\r]"  # Java \s
_TAG = re.compile(r"<[^>]+>")
_PUNCT_AFTER_TAG = re.compile(rf"(</?[^>]+>){_JS}*([.,:;])")
_MISPLACED = re.compile(rf"</[^>]+>{_JS}*[(.,:;!?)]")
_MALFORMED = re.compile(rf"</{_JS}*([A-Za-z0-9_]+)[^>]*[.,:;!?][^>]*>")
_NON_ASCII_RUN = re.compile(r"[^\x00-\x7F]+")
_SINGLE_LETTER = re.compile(r"\b[B-HJ-NP-Zb-hj-np-ru-z]\b")
_SENTENCE_SPLIT = re.compile(rf"(?<=\.|\?|!){_JS}+")
_EXCLUDED_PUNCT_TAGS = {"<phoneme>", "</phoneme>", "<lang>", "</lang>"}


def _rows(url, chunk_number, rule, messages) -> List[dict]:
    return [
        {"url": url, "chunk_number": chunk_number, "rule": rule, "message": m}
        for m in messages
    ]


def _punctuation(ssml: str) -> List[str]:
    out = []
    for m in _PUNCT_AFTER_TAG.finditer(ssml):
        tag = m.group(1)
        if tag in _EXCLUDED_PUNCT_TAGS:
            continue
        out.append(
            f"Suspicious punctuation: '{tag}' followed by '{m.group(0)[-1]}'"
        )
    return out


def _speak_tags(ssml: str) -> List[str]:
    opens = ssml.count("<speak>")
    closes = ssml.count("</speak>")
    if opens != 1 or closes != 1:
        return [
            f"Incorrect number of <speak> tags. Found {opens} opening and "
            f"{closes} closing tags."
        ]
    if ssml.find("<speak>") > ssml.find("</speak>"):
        return ["Closing </speak> tag appears before opening <speak> tag."]
    stripped = ssml.strip(" ")  # Spark F.trim strips spaces only
    if not (stripped.startswith("<speak>") and stripped.endswith("</speak>")):
        return ["<speak> tags are not at the start and end of the SSML."]
    return []


def _non_standard(ssml: str) -> List[str]:
    out = []
    for j, part in enumerate(_TAG.split(ssml)):
        if j % 2 != 0:  # reference quirk: even segments only
            continue
        for run in _NON_ASCII_RUN.findall(part):
            out.append(
                f"Non-standard character(s) found outside tags: '{run}'"
            )
    return out


def _misplaced(ssml: str) -> List[str]:
    return [
        f"Misplaced closing tag detected: '{m}'" for m in _MISPLACED.findall(ssml)
    ]


def _malformed(ssml: str) -> List[str]:
    return [
        f"Malformed closing tag detected: '{m.group(0)}'"
        for m in _MALFORMED.finditer(ssml)
    ]


def _single_letters(ssml: str) -> List[str]:
    out = []
    for part in _TAG.split(ssml):
        if part.strip(" ") == "":  # Spark F.trim strips spaces only
            continue
        for m in _SINGLE_LETTER.findall(part):
            out.append(f"Random single letter detected: '{m}'")
    return out


def duplicates_rows(chunks: List[Tuple[str, int, str]]) -> List[dict]:
    """Corpus-wide first-wins duplicate findings, mirroring the Spark
    min-struct aggregation (validate.rule_duplicates): for every cleaned
    line with total multiplicity > 1, the first (url, chunk_number, pos)
    occurrence emits count-1 findings and every other occurrence emits
    count findings."""
    occ: Dict[str, Dict[Tuple[str, int, int], int]] = defaultdict(
        lambda: defaultdict(int)
    )
    for url, chunk_number, ssml in chunks:
        if ssml is None:
            continue
        for pos, line in enumerate(_SENTENCE_SPLIT.split(ssml)):
            clean_line = _TAG.sub("", line).strip(" ")
            occ[clean_line][(url, chunk_number, pos)] += 1
    out = []
    for clean_line, occs in occ.items():
        total = sum(occs.values())
        if total <= 1:
            continue
        first = min(occs)
        for (url, chunk_number, _pos), m in occs.items():
            k = m - 1 if (url, chunk_number, _pos) == first else m
            out.extend(
                _rows(
                    url, chunk_number, "duplicates",
                    [f"Possible duplicate: '{clean_line}'"] * k,
                )
            )
    return out


def validate_rows(chunks: List[Tuple[str, int, str]]) -> List[dict]:
    """All 10 rule findings over the chunk table (url, chunk_number, ssml)."""
    out = []
    for url, n, ssml in chunks:
        if ssml is None:
            continue
        out += _rows(url, n, "punctuation", _punctuation(ssml))
        out += _rows(url, n, "speak_tags", _speak_tags(ssml))
        out += _rows(url, n, "non_standard_characters", _non_standard(ssml))
        out += _rows(url, n, "misplaced_closing_tags", _misplaced(ssml))
        out += _rows(url, n, "malformed_closing_tags", _malformed(ssml))
        out += _rows(url, n, "random_single_letters", _single_letters(ssml))
        out += _rows(url, n, "english_word", _english_word_findings(ssml))
        out += _rows(url, n, "balanced_tags", _balanced_findings(ssml))
        out += _rows(url, n, "nested_tags", _nested_findings(ssml))
    out += duplicates_rows(chunks)
    return out


def drop_duplicate_sentences_rows(
    chunks: List[Tuple[str, int, str]]
) -> List[dict]:
    """Mirror of dedup.drop_duplicate_sentences: corpus-wide first-wins by
    (url, chunk_number, pos) on the tag-stripped sentence; empty-clean
    sentences always survive; physically duplicated rows collapse; chunks
    rebuilt space-joined, with all-dropped/NULL chunks surviving as ''."""
    firsts: Dict[str, Tuple[str, int, int]] = {}
    split_rows = {}
    all_ids = []
    for url, chunk_number, ssml in chunks:
        if (url, chunk_number) not in {(u, c) for u, c in all_ids}:
            all_ids.append((url, chunk_number))
        if ssml is None:
            continue
        for pos, line in enumerate(_SENTENCE_SPLIT.split(ssml)):
            clean = _TAG.sub("", line).strip(" ")
            key = (url, chunk_number, pos)
            if key in split_rows:  # duplicated physical row collapses
                continue
            split_rows[key] = (line, clean)
            if clean != "" and (clean not in firsts or key < firsts[clean]):
                firsts[clean] = key
    rebuilt: Dict[Tuple[str, int], List[Tuple[int, str]]] = defaultdict(list)
    for (url, chunk_number, pos), (line, clean) in split_rows.items():
        if clean == "" or firsts[clean] == (url, chunk_number, pos):
            rebuilt[(url, chunk_number)].append((pos, line))
    return [
        {
            "url": url,
            "chunk_number": chunk_number,
            "ssml": " ".join(
                l for _pos, l in sorted(rebuilt.get((url, chunk_number), []))
            ),
        }
        for url, chunk_number in all_ids
    ]


# --- SRT generation ---------------------------------------------------------


SRT_VARIANTS = (
    "english_original", "english_shorter", "latin_original", "latin_shorter",
)


def srt_variant_rows(chunk_rows: List[dict]) -> List[dict]:
    """(url, english_original, english_shorter, latin_original,
    latin_shorter) mirroring align.srt_variants: one shared positional
    alignment, four subtitle/assembly passes (english reads ssml, latin
    reads extracted_text); a variant with zero subtitles is NULL."""
    by_url: Dict[str, List[dict]] = defaultdict(list)
    for r in chunk_rows:
        by_url[r["url"]].append(r)
    out = []
    for url, rows in by_url.items():
        rows.sort(key=lambda r: r["chunk_number"])
        aligned = []
        t = 0.0
        for r in rows:
            duration = len(r["extracted_text"]) * 0.06
            end = t + duration
            aligned.append((r, end - duration, end))
            t = end
        row: dict = {"url": url}
        any_variant = False
        for name in SRT_VARIANTS:
            language, shorter = name.split("_")
            shorter = shorter == "shorter"
            text_key = "ssml" if language == "english" else "extracted_text"
            subs = []
            for r, start, end in aligned:
                subs.extend(
                    chunk_subtitles(r[text_key], start, end, language, shorter)
                )
            if subs:
                row[name] = "".join(
                    f"{i}\n{format_time(s['start'])} --> "
                    f"{format_time(s['end'])}\n{s['text']}\n\n"
                    for i, s in enumerate(subs, 1)
                )
                any_variant = True
            else:
                row[name] = None
        if any_variant:
            out.append(row)
    return out


def srt_rows(chunk_rows: List[dict]) -> List[dict]:
    """(url, srt) mirroring generate_srt: positional align against the
    manifest (part_no=chunk_number, duration=len(extracted_text)*0.06),
    sequential running-sum start/end, english shorter subtitles, numbered
    blocks in subtitle order (reference timestamp.py:182-224)."""
    by_url: Dict[str, List[dict]] = defaultdict(list)
    for r in chunk_rows:
        by_url[r["url"]].append(r)
    out = []
    for url, rows in by_url.items():
        rows.sort(key=lambda r: r["chunk_number"])
        t = 0.0
        subs = []
        for r in rows:
            duration = len(r["extracted_text"]) * 0.06
            end = t + duration
            subs.extend(chunk_subtitles(r["ssml"], end - duration, end, "english", True))
            t = end
        blocks = [
            f"{i}\n{format_time(s['start'])} --> {format_time(s['end'])}\n"
            f"{s['text']}\n\n"
            for i, s in enumerate(subs, 1)
        ]
        if blocks:  # urls with zero subtitles produce no SRT row
            out.append({"url": url, "srt": "".join(blocks)})
    return out
