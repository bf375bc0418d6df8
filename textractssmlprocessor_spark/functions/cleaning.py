"""Line/regex cleaning semantics (reference parity).

Each function reimplements one deterministic transform of the reference,
cited by file:line into /root/reference. All are pure ``str -> str`` (or
scalar) functions so they can be wrapped into vectorized pandas UDFs and be
unit-tested against the reference functions directly.
"""

from __future__ import annotations

import re
from typing import List

# --- F1: header/page-title removal (reference utils.py:52-58) ---------------
# Python str.isupper() semantics matter: a line with no cased characters is
# NOT "upper", so "123 456" is kept; "CHAPTER I" (2 words, cased+upper) drops.


def remove_headers(text: str) -> str:
    """Drop lines that are ALL-CAPS (str.isupper) with fewer than 5 words."""
    kept = [
        line
        for line in text.split("\n")
        if not (line.isupper() and len(line.split()) < 5)
    ]
    return "\n".join(kept)


# --- F2: HTML detection (reference utils.py:334-336) ------------------------

_HTML_TAG = re.compile(r"<.*?>")


def is_html(text: str) -> bool:
    return bool(_HTML_TAG.search(text))


# --- F3: note removal (reference text_processing.py:6-16) -------------------
# The nested-bracket pattern supports 3 levels of nesting inside [Note: ...].

_NOTE = re.compile(
    r"\[Note:(?:[^\[\]]|\[(?:[^\[\]]|\[(?:[^\[\]]|\[[^\[\]]*\])*\])*\])*\]",
    re.DOTALL | re.IGNORECASE,
)
_EMPTY_P = re.compile(r"<p>\s*</p>")
_BR = re.compile(r"<br>\s*")
_EMPTY_SMALL = re.compile(r"<small>\s*</small>")


def remove_notes(text: str) -> str:
    text = _NOTE.sub("", text)
    text = _EMPTY_P.sub("", text)
    text = _BR.sub("", text)
    text = _EMPTY_SMALL.sub("", text)
    return text


# --- F4: residual bracket removal (reference text_processing.py:18-19) ------

_SQUARE = re.compile(r"\[.*?\]", re.DOTALL)


def remove_square_brackets(text: str) -> str:
    return _SQUARE.sub("", text)


# --- F5: subtitle text prep (reference timestamp.py:15-23) ------------------

_ANY_TAG = re.compile(r"<[^>]+>")
_MULTISPACE = re.compile(r" +")


def clean_text(text: str) -> str:
    """Strip tags, collapse runs of spaces, drop blank lines."""
    text = _ANY_TAG.sub("", text)
    text = _MULTISPACE.sub(" ", text)
    lines = [line.strip() for line in text.split("\n") if line.strip()]
    return "\n".join(lines)


# --- F6: validator tag strip (reference ssml_validator.py:86-92) ------------

_SUB_WITH_CONTENT = re.compile(r"<\s*sub\s+[^>]*>.*?</\s*sub\s*>", re.DOTALL)
_WS_RUN = re.compile(r"\s+")


def remove_ssml_tags_keep_words(text: str) -> str:
    """Drop <sub>...</sub> including content, then all tags, then squeeze ws."""
    text = _SUB_WITH_CONTENT.sub("", text)
    text = _ANY_TAG.sub("", text)
    return _WS_RUN.sub(" ", text).strip()


# --- F7: audio-side tag strip (reference audio_processing.py:52-53) ---------


def remove_ssml_tags(text: str) -> str:
    return _ANY_TAG.sub("", text).strip()


# --- F11: post-annotation HTML-wrapper strip (reference utils.py:266-267) ---
# Only BARE tags (no attributes) are stripped — `<p class="x">` survives.

_BARE_WRAPPERS = re.compile(r"<(/?)(h4|em|strong|p)>")


def strip_bare_wrapper_tags(text: str) -> str:
    return _BARE_WRAPPERS.sub("", text)


# --- F12: leading all-caps title run (reference text_processing.py:25-40) ---


def extract_all_caps_title(content: str) -> List[str]:
    """Leading run of non-empty str.isupper() lines (stripped)."""
    out: List[str] = []
    for line in content.split("\n"):
        line = line.strip()
        if line.isupper() and line:
            out.append(line)
        else:
            break
    return out


# --- X2: section split (reference text_processing.py:21-23) -----------------


def split_into_sections(text: str) -> List[str]:
    sections = re.split(r"<h4><center>", text)
    return [s.strip() for s in sections if s.strip() and s.strip() != "<br>"]


# --- section body cleanup (reference text_processing.py:48-49) --------------

_H4_CENTER_BLOCK = re.compile(r"<h4><center>.*?</center></h4>", re.DOTALL)
_ANY_TAG_DOTALL = re.compile(r"<.*?>", re.DOTALL)


def section_content(section: str) -> str:
    content = _H4_CENTER_BLOCK.sub("", section).strip()
    return _ANY_TAG_DOTALL.sub("", content)


# --- T5/T6: SRT time formatting (reference timestamp.py:227-231,
#     audio_processing.py:89-91) ---------------------------------------------


def format_time(seconds: float) -> str:
    """Float seconds -> ``HH:MM:SS,mmm`` with millisecond TRUNCATION."""
    hours, remainder = divmod(seconds, 3600)
    minutes, secs = divmod(remainder, 60)
    milliseconds = int((secs % 1) * 1000)
    return f"{int(hours):02d}:{int(minutes):02d}:{int(secs):02d},{milliseconds:03d}"


def time_to_seconds(time_str: str) -> float:
    h, m, s = time_str.replace(",", ".").split(":")
    return int(h) * 3600 + int(m) * 60 + float(s)


# --- T7: natural sort key (reference timestamp.py:233-234) ------------------


def natural_sort_key(s: str):
    return [int(c) if c.isdigit() else c.lower() for c in re.split(r"(\d+)", s)]


def natural_sort_rank_key(s: str) -> str:
    """Total-order string key equivalent to natural_sort_key for typical
    filenames: digit runs are zero-padded to 12, letters lowercased. Usable
    as a plain ORDER BY column in both Spark and SQL oracles."""
    return "".join(
        c.zfill(12) if c.isdigit() else c.lower() for c in re.split(r"(\d+)", s)
    )


# --- T13: SSML -> clean display text (reference file_processing.py:36-42) ---
# The reference parses with BeautifulSoup(content, 'xml').get_text('\n'); for
# our engine the equivalent is: newline between tag boundaries, then squeeze
# blank-line runs. Pinned by goldens (bs4 is not a dependency here).

_TAG_SPLIT = re.compile(r"<[^>]+>")
_BLANK_RUN = re.compile(r"\n\s*\n")
_BLANK_RUN2 = re.compile(r"(\n\s*){2,}")


def ssml_to_display_text(content: str) -> str:
    pieces = [p for p in _TAG_SPLIT.split(content)]
    text = "\n".join(p for p in pieces if p)
    text = _BLANK_RUN.sub("\n\n", text)
    text = _BLANK_RUN2.sub("\n\n", text)
    return text.strip()


# --- K6: title-file stub (reference utils.py:321-331) -----------------------
# The template is reproduced verbatim, including the reference's odd literal
# "[TITLE </speak>]" placeholder line.


def title_file_content() -> str:
    return (
        "<speak>\n"
        '<break time="1s"/>[TITLE </speak>]\n'
        '<break time="2s"/>\n'
        "</speak>"
    )


def title_file_name(base_name: str, chunk_num: int) -> str:
    return f"{base_name}_Title_voice_Ruth_chunk_{chunk_num}.txt"
