"""Broken-markup recovery parity for the bs4-modeled DOM (functions/dom.py).

The reference parses with BeautifulSoup(html, 'html.parser')
(reference utils.py:238). Real crawl HTML is mostly malformed, so the DOM's
recovery behavior — not just its happy path — is part of the extraction
contract. bs4 cannot execute in this sandbox (tests/reference_oracle.py
stubs it), so each expected byte string here is hand-derived from the
public bs4 source semantics (builder/_htmlparser.py, element.py,
formatter.py, 4.9+ line): the same stdlib html.parser tokenizer drives
both, bs4's _popToTag defines the unmatched/misnested end-tag recovery,
and bs4's minimal formatter defines the re-serialization. Every modeled
behavior in the dom.py module docstring has a pin below.

Serialization snapshots go through parse_html+serialize directly (the raw
bs4-equivalent str(soup)), and through convert_html_to_ssml where the
reference heuristics interact with the recovery.
"""

from __future__ import annotations

from textractssmlprocessor_spark.functions.dom import (
    convert_html_to_ssml,
    parse_html,
    serialize,
)


def roundtrip(html: str) -> str:
    """str(BeautifulSoup(html, 'html.parser')) equivalent."""
    buf: list[str] = []
    serialize(parse_html(html), buf)
    return "".join(buf)


# --- structural recovery -------------------------------------------------


def test_unmatched_end_tag_ignored():
    assert roundtrip("a</em>b") == "ab"
    assert roundtrip("<p>a</strong>b</p>") == "<p>ab</p>"


def test_misnested_end_pops_through_inner_tags():
    # </em> pops the open <strong> with it; the orphan </strong> is ignored
    assert (
        roundtrip("<em>a<strong>b</em>c</strong>")
        == "<em>a<strong>b</strong></em>c"
    )


def test_unclosed_tags_close_at_eof():
    assert roundtrip("<p>a<em>b") == "<p>a<em>b</em></p>"


def test_no_implicit_paragraph_close():
    # html.parser builder applies NO HTML5 auto-close: <p>s nest
    assert roundtrip("<p>a<p>b</p></p>") == "<p>a<p>b</p></p>"
    assert roundtrip("<p>a<p>b") == "<p>a<p>b</p></p>"


def test_end_tag_for_void_element_ignored():
    assert roundtrip("a<br></br>b") == "a<br/>b"


def test_self_closed_non_void_is_empty_element():
    # <p/> opens and immediately closes; following text is a sibling
    assert roundtrip("<p/>tail") == "<p></p>tail"


def test_extended_bs4_void_set_self_closes():
    assert roundtrip("<keygen><frame><basefont>x") == "<keygen/><frame/><basefont/>x"


# --- preserved non-element markup ----------------------------------------


def test_comment_preserved():
    assert roundtrip("a<!-- note -->b") == "a<!-- note -->b"


def test_conditional_comment_is_a_comment():
    html = "x<!--[if IE]><p>old</p><![endif]-->y"
    assert roundtrip(html) == html


def test_doctype_preserved_with_newline():
    # bs4 Doctype SUFFIX is '>\n'
    assert roundtrip("<!DOCTYPE html><p>x</p>") == "<!DOCTYPE html>\n<p>x</p>"


def test_lowercase_doctype_quirk():
    # bs4 strips the literal 'DOCTYPE ' prefix case-SENSITIVELY, then
    # re-serializes with the uppercase PREFIX — lowercase input doubles up
    assert roundtrip("<!doctype html>") == "<!DOCTYPE doctype html>\n"


def test_cdata_section_preserved():
    assert roundtrip("a<![CDATA[x < y]]>b") == "a<![CDATA[x < y]]>b"


def test_processing_instruction_roundtrips():
    assert roundtrip("<?php echo 1; ?>x") == "<?php echo 1; ?>x"


def test_specials_do_not_contribute_text():
    root = parse_html("<em>a<!--hidden-->b</em>")
    assert root.find_all("em")[0].text == "ab"


# --- raw-text elements ----------------------------------------------------


def test_script_content_not_escaped():
    html = '<script>if (a < b && c > d) { x = "&amp;"; }</script>'
    assert roundtrip(html) == html  # raw on parse AND on serialize


def test_style_content_not_escaped():
    html = "<style>a > b { content: '&'; }</style>"
    assert roundtrip(html) == html


def test_entities_outside_script_still_converted_and_reescaped():
    assert roundtrip("<p>a &lt; b &amp; c</p>") == "<p>a &lt; b &amp; c</p>"
    assert roundtrip("<p>a & b</p>") == "<p>a &amp; b</p>"


# --- attribute serialization ----------------------------------------------


def test_boolean_attribute_becomes_empty_string():
    assert roundtrip("<p hidden>x</p>") == '<p hidden="">x</p>'


def test_duplicate_attribute_first_position_last_value():
    assert (
        roundtrip('<p id="a" title="t" id="b">x</p>')
        == '<p id="b" title="t">x</p>'
    )


def test_attribute_value_entities_reescaped():
    assert (
        roundtrip('<p title="a &amp; b &lt; c">x</p>')
        == '<p title="a &amp; b &lt; c">x</p>'
    )


def test_attribute_with_double_quote_uses_single_quotes():
    assert roundtrip("<p title='say \"hi\"'>x</p>") == "<p title='say \"hi\"'>x</p>"


def test_attribute_with_both_quotes_escapes_double():
    html = "<p title='a \"b\" isn&#39;t'>x</p>"
    assert roundtrip(html) == '<p title="a &quot;b&quot; isn\'t">x</p>'


def test_class_is_whitespace_normalized_cdata_list():
    assert (
        roundtrip('<p class="  a   b ">x</p>') == '<p class="a b">x</p>'
    )


def test_non_cdata_list_attribute_keeps_whitespace():
    assert roundtrip('<p title="  a   b ">x</p>') == '<p title="  a   b ">x</p>'


# --- recovery interacting with the reference heuristics --------------------


LONG = "q" * 101


def test_unclosed_em_still_gets_break_prefix():
    # the unclosed <em> swallows the rest of the document; its .text
    # (including the strong's) drives the >100 branch, and the strong is a
    # CHILD, not a sibling, so no 250ms/500ms wrap is applied
    out = convert_html_to_ssml(f"<em>{LONG}<strong>cite</strong>")
    assert out == f"<speak>&lt;break time='500ms'/&gt;{LONG}cite</speak>"


def test_orphan_closers_vanish_from_output():
    out = convert_html_to_ssml("<h4>Title</h4></em></strong><p>Body.</p>")
    assert out == (
        "<speak>&lt;break time='500ms'/&gt;Title"
        "&lt;break time='2s'/&gt;Body.</speak>"
    )


def test_comment_survives_conversion():
    out = convert_html_to_ssml("<p>a<!-- keep -->b</p>")
    assert out == "<speak>a<!-- keep -->b</speak>"


def test_doctype_survives_conversion():
    out = convert_html_to_ssml("<!DOCTYPE html><p>x</p>")
    assert out == "<speak><!DOCTYPE html>\nx</speak>"


def test_bare_ampersand_in_text_reescaped():
    out = convert_html_to_ssml("<p>fish & chips</p>")
    assert out == "<speak>fish &amp; chips</speak>"


def test_attributed_wrapper_survives_bare_strip_with_bs4_attrs():
    # the utils.py:267 regex strips only BARE tags; the attributed opener
    # survives with bs4-normalized attribute bytes
    out = convert_html_to_ssml("<p class=' x  y '>kept</p><p>stripped</p>")
    assert out == '<speak><p class="x y">keptstripped</speak>'


# --- depth containment ----------------------------------------------------


def test_deep_nesting_does_not_hit_recursion_limit():
    """A hostile crawl page with thousands of nested tags (comment-spam
    and broken-generator markup do this in the wild) must parse,
    serialize, and convert without RecursionError: one such page would
    otherwise kill its task and - after Spark's retries - the whole job.
    The walkers (text/find_all/serialize) are explicit-stack iterative;
    depth is bounded by memory, not by Python's ~1000-frame limit."""
    import sys

    depth = sys.getrecursionlimit() * 4
    html = ("<em>" * depth) + "x" + ("</em>" * depth)
    rt = roundtrip(html)
    assert rt == html

    root = parse_html(html)
    assert root.text == "x"
    assert len(root.find_all("em")) == depth

    # the flagship conversion path end-to-end (em-heuristics walk every
    # <em> node; the outermost one's .text covers the whole spine)
    out = convert_html_to_ssml("<p>" + "<span>" * depth + "deep" + "</span>" * depth + "</p>")
    assert "deep" in out


def test_deep_ssml_nesting_does_not_hit_recursion_limit():
    """Same hazard one stage later: clean_ssml_tags parses chunk content
    with expat (iterative, no depth limit) and then walks the tree —
    well-formed allowed-tag nests ('<s>' is in ALLOWED_TAGS) thousands
    deep must splice+serialize, not RecursionError. Mixed case: a
    disallowed tag at the bottom still splices out."""
    import sys

    from textractssmlprocessor_spark.functions.ssml import clean_ssml_tags

    depth = sys.getrecursionlimit() * 4
    nest = ("<s>" * depth) + "<bad>x</bad>" + ("</s>" * depth)
    out = clean_ssml_tags(nest)
    assert out.startswith("<speak>")
    assert "<bad>" not in out
    assert "x" in out
    assert out.count("<s>") == depth


def test_nested_em_matches_bs4_detach_semantics():
    """Nested <em> through convert_html_to_ssml: bs4's .string setter runs
    clear() (immediate children EXTRACTED, parent=None) before appending,
    so the inner <em> found by the earlier find_all is detached when its
    turn comes — find_next_sibling returns None and its own mutation is
    invisible in the output. Hand-derived trace for
    '<em>a<em>b</em></em>c<strong>d</strong>':
    outer: text 'ab' (<=100) -> em.string='ab', strong sibling decomposed;
    inner (detached): no sibling, mutation off-tree;
    serialize '<em>ab</em>c' -> bare-wrapper strip -> '<speak>abc</speak>'."""
    out = convert_html_to_ssml("<em>a<em>b</em></em>c<strong>d</strong>")
    assert out == "<speak>abc</speak>"


def test_em_inside_h4_is_detached_not_fatal():
    """<h4><em>…</em></h4> — the single most common heading shape: the h4
    loop's set_string detaches the inner <em> BEFORE the em loop reaches
    it (bs4 clear() extraction), so the em's own mutation lands off-tree
    and the output equals the em-less heading byte-for-byte."""
    with_em = convert_html_to_ssml("<h4><em>Chapter</em></h4><p>Body.</p>")
    without = convert_html_to_ssml("<h4>Chapter</h4><p>Body.</p>")
    assert with_em == without
    assert with_em == (
        "<speak>&lt;break time='500ms'/&gt;Chapter"
        "&lt;break time='2s'/&gt;Body.</speak>"
    )
