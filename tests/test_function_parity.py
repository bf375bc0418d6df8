"""Tier-1 parity: our pure functions vs the reference's, byte-for-byte.

Oracle = the reference's own functions imported with stubbed third-party deps
(see reference_oracle.py). Functions whose reference implementation requires
lxml/bs4 (unavailable) are pinned by goldens in test_ssml.py / test_dom.py.
"""

from __future__ import annotations

import pytest

from reference_oracle import (
    ref_ssml_processing,
    ref_ssml_validator,
    ref_text_processing,
    ref_timestamp,
    ref_utils,
)
from textractssmlprocessor_spark.functions import chunking, cleaning, ssml, subtitles

HEADER_TEXTS = [
    "CHAPTER ONE\nIt was a dark night.\nTHE END",
    "A TITLE WITH MANY WORDS IN IT\nbody line\nSHORT TITLE",
    "MIXED Case Line\n123 456\nALL CAPS FOUR WORD LINE EXTRA",
    "",
    "no headers here\njust text",
    "ÉTÉ CHAUD\nnormal line",  # unicode isupper semantics
    "A.B.C.\nkeep me",
]

NOTE_TEXTS = [
    "before [Note: simple] after",
    "x [Note: outer [inner [deep [deepest]]]] y",
    "keep [not a note] <p>  </p> <br> tail <small> </small> end",
    "multi\n[Note: spans\nlines] done",
    "[note: case insensitive] ok",
]

SSML_SAMPLES = [
    "<speak>Hello <em>world</em> &amp; good day</speak>",
    "plain text no tags",
    "<speak><sub alias='x'>y</sub> rest</speak>",
    "<div>drop me</div><p>keep</p><BREAK/><lang xml:lang='en'>hi</lang>",
    "a <phoneme ph='x'>b</phoneme> c &#8217; d &lt;escaped&gt;",
    "<speak>text</speak><script>bad()</script>",
]

CHUNK_TEXTS = [
    "One. Two. Three.",
    ("A sentence that is quite long indeed. " * 80).strip(),
    "",
    "No terminal punctuation at all just words " * 10,
    "Short. " + "x" * 2500 + ". Tail.",
    "Multi\nline. Text with\nbreaks. End.",
]


@pytest.mark.parametrize("text", HEADER_TEXTS)
def test_remove_headers_parity(text):
    assert cleaning.remove_headers(text) == ref_utils().remove_headers(text)


@pytest.mark.parametrize("text", HEADER_TEXTS + NOTE_TEXTS + SSML_SAMPLES)
def test_is_html_parity(text):
    assert cleaning.is_html(text) == ref_utils().is_html(text)


@pytest.mark.parametrize("text", NOTE_TEXTS)
def test_remove_notes_parity(text):
    assert cleaning.remove_notes(text) == ref_text_processing().remove_notes(text)


@pytest.mark.parametrize("text", NOTE_TEXTS)
def test_remove_square_brackets_parity(text):
    assert cleaning.remove_square_brackets(
        text
    ) == ref_text_processing().remove_square_brackets(text)


@pytest.mark.parametrize(
    "text",
    [
        "a<h4><center>T1</center></h4>b<h4><center>T2</center></h4>c",
        "<h4><center>only title</center></h4>",
        "no sections",
        "  <br>  <h4><center>X</center></h4> body ",
    ],
)
def test_split_into_sections_parity(text):
    assert cleaning.split_into_sections(
        text
    ) == ref_text_processing().split_into_sections(text)


@pytest.mark.parametrize("text", CHUNK_TEXTS)
def test_chunk_text_parity(text):
    # Reference chunk_text runs with nltk.sent_tokenize stubbed to OUR pinned
    # sentencizer, so packing must be byte-identical.
    assert chunking.chunk_text(text) == ref_utils().chunk_text(text)


@pytest.mark.parametrize("size", [30, 100, 2000])
@pytest.mark.parametrize("text", CHUNK_TEXTS)
def test_chunk_text_sizes_parity(text, size):
    assert chunking.chunk_text(text, size) == ref_utils().chunk_text(text, size)


@pytest.mark.parametrize("text", SSML_SAMPLES)
def test_preprocess_ssml_tags_parity(text):
    assert ssml.preprocess_ssml_tags(text) == ref_utils().preprocess_ssml_tags(text)


SPLIT_SSML_CASES = [
    ("<speak><p>" + "word " * 40 + "</p><p>" + "tail " * 40 + "</p></speak>", 100),
    ("<speak>" + "x" * 60 + "<break/>" + "y" * 60 + "</speak>", 50),
    ("<speak><lang xml:lang='la'>" + "z " * 100 + "</lang></speak>", 80),
    ("<speak><p>This is a test.</p><p>Another sentence here.</p></speak>", 30),
    ("plain without tags " * 20, 64),
    ("<speak><p>a</p></speak>", 2500),
]


@pytest.mark.parametrize("text,size", SPLIT_SSML_CASES)
def test_split_ssml_parity(text, size):
    assert chunking.split_ssml(text, size) == ref_ssml_processing().split_ssml(
        text, size
    )


def test_split_ssml_reference_unit_case():
    # The reference's own unit test shape (tests/test_ssml_processing.py:19-24)
    ssml_in = "<speak><p>Hello world.</p><p>Goodbye world.</p></speak>"
    chunks = chunking.split_ssml(ssml_in, max_chunk_size=30)
    assert len(chunks) == 2
    for c in chunks:
        assert c.startswith("<speak>") and c.endswith("</speak>")


SUBTITLE_CASES = [
    ("First sentence here. Second one follows! Third? Yes.", 0.0, 12.0),
    ("One long unbroken sentence with no punctuation at all", 3.5, 9.25),
    ('He said "stop. now." and left. (Pausing. Briefly.) Done.', 0.0, 30.0),
    ("Word " * 100, 0.0, 55.5),
]


@pytest.mark.parametrize("text,start,end", SUBTITLE_CASES)
def test_split_into_subtitles_parity(text, start, end):
    ours = subtitles.split_into_subtitles(text, start, end)
    refs = ref_timestamp().split_into_subtitles(text, start, end)
    assert ours == refs


@pytest.mark.parametrize("text,start,end", SUBTITLE_CASES)
def test_split_latin_subtitles_parity(text, start, end):
    ours = subtitles.split_latin_subtitles(text, start, end)
    refs = ref_timestamp().split_latin_subtitles(text, start, end)
    assert ours == refs


def test_split_latin_long_sentence_parity():
    text = "Lorem ipsum dolor " * 30 + ". Brevis."
    ours = subtitles.split_latin_subtitles(text, 0.0, 40.0, max_chars=100)
    refs = ref_timestamp().split_latin_subtitles(text, 0.0, 40.0, max_chars=100)
    assert ours == refs


@pytest.mark.parametrize(
    "seconds", [0.0, 1.5, 59.9994, 61.25, 3599.999, 3661.0078, 86399.5]
)
def test_format_time_parity(seconds):
    assert cleaning.format_time(seconds) == ref_timestamp().format_time(seconds)


@pytest.mark.parametrize(
    "text",
    [
        "<p>Tag</p> stripped   here\n\n\nmulti  space",
        "line1\n  \nline2",
        "",
    ],
)
def test_clean_text_parity(text):
    assert cleaning.clean_text(text) == ref_timestamp().clean_text(text)


@pytest.mark.parametrize(
    "name", ["file_part_2.txt", "a10b2", "chunk_100", "ABC", "x1y10z9"]
)
def test_natural_sort_key_parity(name):
    assert cleaning.natural_sort_key(name) == ref_timestamp().natural_sort_key(name)


def test_natural_sort_rank_key_total_order():
    names = [f"book_part_{i}.json" for i in (1, 2, 10, 11, 100, 20, 3)]
    by_ref = sorted(names, key=ref_timestamp().natural_sort_key)
    by_rank = sorted(names, key=cleaning.natural_sort_rank_key)
    assert by_ref == by_rank


@pytest.mark.parametrize(
    "text",
    [
        "<speak>words here</speak>",
        "<sub alias='x'>drop</sub> keep <w role='amazon:NN'>w</w>",
        "a   b\t c",
    ],
)
def test_remove_ssml_tags_keep_words_parity(text):
    assert cleaning.remove_ssml_tags_keep_words(
        text
    ) == ref_ssml_validator().remove_ssml_tags(text)


@pytest.mark.parametrize(
    "text", ["hyphen-word two three", "a-b c_d 1 2", "", "only   spaces"]
)
def test_count_words_parity(text):
    from textractssmlprocessor_spark.operators.textstats import count_words_py

    assert count_words_py(text) == ref_ssml_validator().count_words(text)


def test_title_file_template_parity(tmp_path):
    ref = ref_utils()
    name = ref.generate_title_file("T", str(tmp_path), "base", 1, 3)
    with open(tmp_path / name, encoding="utf-8") as f:
        ref_content = f.read()
    assert cleaning.title_file_content() == ref_content
    assert cleaning.title_file_name("base", 3) == name
