"""Subtitle splitting + SRT formatting (reference timestamp.py:25-206).

Pure functions of ``(text, start_time, end_time)`` — deterministic float
arithmetic, so results are identical on any executor given the same chunk
ordering (which the Spark side enforces with explicit window ordering).
"""

from __future__ import annotations

from typing import Dict, List

from .cleaning import clean_text, format_time


def _split_sentences_english(text: str) -> List[str]:
    """Char-scan splitter honoring ``([\"`` special blocks
    (reference timestamp.py:26-49)."""
    result: List[str] = []
    current = ""
    in_special = False
    special_char = None
    for ch in text:
        current += ch
        if ch in "([\"":
            in_special = True
            special_char = ch
        elif (
            (ch == ")" and special_char == "(")
            or (ch == "]" and special_char == "[")
            or (ch == '"' and special_char == '"')
        ):
            in_special = False
            special_char = None
        elif ch in ".!?" and not in_special and current.strip():
            result.append(current.strip())
            current = ""
    if current.strip():
        result.append(current.strip())
    return result


def split_into_subtitles(
    text: str,
    start_time: float,
    end_time: float,
    max_chars: int = 80,
    target_duration: float = 5.0,
) -> List[Dict]:
    """English subtitle packing with proportional timing
    (reference timestamp.py:25-90, including the emit-on-elapsed>=target rule)."""
    sentences = _split_sentences_english(text)
    total = end_time - start_time
    time_per_char = total / len(text)

    subtitles: List[Dict] = []
    current = ""
    current_start = start_time
    for sentence in sentences:
        if len(current) + len(sentence) <= max_chars:
            current += (" " if current else "") + sentence
        else:
            if current:
                dur = len(current) * time_per_char
                subtitles.append(
                    {"text": current, "start": current_start,
                     "end": min(current_start + dur, end_time)}
                )
                current_start += dur
            current = sentence
        if (current_start - start_time) >= target_duration:
            dur = len(current) * time_per_char
            subtitles.append(
                {"text": current, "start": current_start,
                 "end": min(current_start + dur, end_time)}
            )
            current_start += dur
            current = ""
    if current:
        subtitles.append({"text": current, "start": current_start, "end": end_time})
    return subtitles


def _split_sentences_latin(text: str) -> List[str]:
    """Split on '.' outside parentheses (reference timestamp.py:93-111)."""
    sentences: List[str] = []
    current = ""
    depth = 0
    for ch in text:
        current += ch
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "." and depth == 0 and current.strip():
            sentences.append(current.strip())
            current = ""
    if current.strip():
        sentences.append(current.strip())
    return sentences


def _split_long_sentence(sentence: str, max_chars: int) -> List[str]:
    """Word-level packing of an over-long sentence (timestamp.py:113-126)."""
    chunks: List[str] = []
    current = ""
    for word in sentence.split():
        if len(current) + len(word) + 1 <= max_chars:
            current += (" " if current else "") + word
        else:
            if current:
                chunks.append(current)
            current = word
    if current:
        chunks.append(current)
    return chunks


def split_latin_subtitles(
    text: str, start_time: float, end_time: float, max_chars: int = 300
) -> List[Dict]:
    """Latin subtitle packing (reference timestamp.py:92-180)."""
    sentences = _split_sentences_latin(text)
    total = end_time - start_time
    time_per_char = total / len(text)

    subtitles: List[Dict] = []
    current = ""
    current_start = start_time
    for sentence in sentences:
        if len(sentence) > max_chars:
            if current:
                dur = len(current) * time_per_char
                subtitles.append(
                    {"text": current, "start": current_start,
                     "end": min(current_start + dur, end_time)}
                )
                current_start += dur
                current = ""
            for piece in _split_long_sentence(sentence, max_chars):
                dur = len(piece) * time_per_char
                subtitles.append(
                    {"text": piece, "start": current_start,
                     "end": min(current_start + dur, end_time)}
                )
                current_start += dur
        elif len(current) + len(sentence) <= max_chars:
            current += (" " if current else "") + sentence
        else:
            dur = len(current) * time_per_char
            subtitles.append(
                {"text": current, "start": current_start,
                 "end": min(current_start + dur, end_time)}
            )
            current_start += dur
            current = sentence
    if current:
        subtitles.append({"text": current, "start": current_start, "end": end_time})
    return subtitles


def chunk_subtitles(
    text: str,
    start_time: float,
    end_time: float,
    language: str,
    use_shorter_subtitles: bool,
) -> List[Dict]:
    """Per-chunk subtitle records for one aligned chunk
    (reference timestamp.py:182-199, text already chosen per language)."""
    cleaned = clean_text(text)
    if not cleaned:
        # the reference would divide by zero (timestamp.py:53); empty chunks
        # are filtered upstream in our plan, this guard keeps UDFs total
        return []
    if not use_shorter_subtitles:
        return [{"text": cleaned, "start": start_time, "end": end_time}]
    if language == "english":
        return split_into_subtitles(cleaned, start_time, end_time)
    return split_latin_subtitles(cleaned, start_time, end_time)


def srt_block(index: int, start: float, end: float, text: str) -> str:
    """One numbered SRT block (reference timestamp.py:200-204)."""
    return f"{index}\n{format_time(start)} --> {format_time(end)}\n{text}\n\n"
