"""Deterministic sentence splitter.

The reference chunker (reference utils.py:60-84) delegates sentence
segmentation to ``nltk.sent_tokenize`` — a model download the reference's own
tests stub out trivially (reference tests/test_utils.py:23 injects a fake that
splits on a space). For a reproducible, dependency-free engine we pin a
regex-based splitter and use the *same* splitter both in our vectorized UDFs
and when running the reference's ``chunk_text`` as a parity oracle, so chunk
packing is tested byte-identically.

Rule: a sentence boundary is whitespace immediately preceded by one of
``.!?`` — the same shape the reference itself uses for its duplicate-sentence
check (reference ssml_validator.py:48). The separator whitespace is consumed;
sentence text is otherwise untouched, so chunk packing stays byte-stable.
"""

from __future__ import annotations

import re
from typing import List

_BOUNDARY = re.compile(r'(?<=[.!?])\s+')


def sentencize(text: str) -> List[str]:
    """Split ``text`` into sentences. Empty/whitespace-only input -> []."""
    if not text or not text.strip():
        return []
    parts = _BOUNDARY.split(text)
    return [p for p in parts if p.strip()]
