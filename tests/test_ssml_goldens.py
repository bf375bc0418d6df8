"""Goldens pinning clean_ssml_tags / convert_html_to_ssml byte behavior.

The reference implements these with lxml/bs4 (unavailable in this
environment), so the oracle here is hand-derived expected bytes per the
reference semantics (utils.py:236-272, 370-416) — see FIXTURES.md §1.
"""

from textractssmlprocessor_spark.functions.dom import convert_html_to_ssml
from textractssmlprocessor_spark.functions.ssml import (
    clean_ssml_tags,
    normalize_ssml,
    preprocess_ssml_tags,
)

# --- clean_ssml_tags ---------------------------------------------------------


def test_plain_text_wrapped():
    assert clean_ssml_tags("Hello world") == "<speak>Hello world</speak>"


def test_disallowed_tag_spliced_keeps_text_and_tail():
    out = clean_ssml_tags("<speak>Hi <div>drop</div> there</speak>")
    assert out == "<speak>Hi drop there</speak>"


def test_disallowed_tag_descendants_dropped():
    # reference quirk: descendants of a removed element are lost
    out = clean_ssml_tags("<speak>a<div>b<s>c</s>d</div>e</speak>")
    assert out == "<speak>abe</speak>"


def test_text_promoted_to_previous_sibling_tail():
    out = clean_ssml_tags("<speak><p>x</p><div>y</div>z</speak>")
    assert out == "<speak><p>x</p>yz</speak>"


def test_bare_break_gets_time():
    assert clean_ssml_tags("<break> x") == '<speak><break time="1s"/> x</speak>'
    assert clean_ssml_tags("<break/> x") == '<speak><break time="1s"/> x</speak>'


def test_timed_break_untouched():
    assert (
        clean_ssml_tags('<break time="250ms"/> x')
        == '<speak><break time="250ms"/> x</speak>'
    )


def test_w_gets_role():
    assert (
        clean_ssml_tags("<w>word</w>")
        == '<speak><w role="amazon:NN">word</w></speak>'
    )


def test_w_with_role_untouched():
    assert (
        clean_ssml_tags('<w role="amazon:VB">run</w>')
        == '<speak><w role="amazon:VB">run</w></speak>'
    )


def test_malformed_xml_passthrough():
    # parse failure -> content returned unchanged, then wrapped
    assert clean_ssml_tags("a < b") == "<speak>a < b</speak>"


def test_entities_reescaped():
    assert (
        clean_ssml_tags("<speak>a &amp; b</speak>") == "<speak>a &amp; b</speak>"
    )


def test_already_wrapped_not_double_wrapped():
    assert clean_ssml_tags("<speak>x</speak>") == "<speak>x</speak>"


def test_single_quote_attrs_normalized_to_double():
    out = clean_ssml_tags("<speak><break time='500ms'/>T</speak>")
    assert out == '<speak><break time="500ms"/>T</speak>'


def test_empty_paragraph_self_closes():
    assert clean_ssml_tags("<speak><p></p>x</speak>") == "<speak><p/>x</speak>"


# --- preprocess -> clean chain (the final byte format, utils.py:300) ----------


def test_normalize_chain_unescapes_then_cleans():
    raw = "&lt;break time='500ms'/&gt;Title&lt;break time='2s'/&gt;Hello."
    assert (
        normalize_ssml(raw)
        == '<speak><break time="500ms"/>Title<break time="2s"/>Hello.</speak>'
    )


def test_preprocess_drops_disallowed_keeps_allowed():
    raw = "<div>x</div><p>keep</p><BREAK/><lang xml:lang='en'>hi</lang>"
    assert (
        preprocess_ssml_tags(raw)
        == "x<p>keep</p><BREAK/><lang xml:lang='en'>hi</lang>"
    )


# --- convert_html_to_ssml ------------------------------------------------------

LONG = "q" * 101  # > 100 chars triggers the break-injection branch
SHORT = "short quotation"


def test_h4_title_breaks():
    out = convert_html_to_ssml("<h4>Title</h4><p>Body text.</p>")
    assert out == (
        "<speak>&lt;break time='500ms'/&gt;Title"
        "&lt;break time='2s'/&gt;Body text.</speak>"
    )


def test_long_em_with_strong():
    out = convert_html_to_ssml(f"<em>{LONG}</em><strong>Attribution</strong>")
    assert out == (
        f"<speak>&lt;break time='500ms'/&gt;{LONG}"
        "&lt;break time='250ms'/&gt;Attribution&lt;break time='500ms'/&gt;</speak>"
    )


def test_short_em_deletes_strong():
    out = convert_html_to_ssml(f"<em>{SHORT}</em><strong>gone</strong> tail")
    assert out == f"<speak>{SHORT} tail</speak>"


def test_short_em_no_strong():
    out = convert_html_to_ssml(f"<p><em>{SHORT}</em> stays</p>")
    assert out == f"<speak>{SHORT} stays</speak>"


def test_attributed_p_survives_strip():
    # utils.py:267 strips only BARE tags: the attributed opener survives but
    # every bare </p> closer is removed.
    out = convert_html_to_ssml('<p class="x">kept</p><p>stripped</p>')
    assert out == '<speak><p class="x">keptstripped</speak>'


def test_entities_unescaped_then_minimal_escaped():
    out = convert_html_to_ssml("<p>Fish &amp; chips &#8217; done</p>")
    assert out == "<speak>Fish &amp; chips ’ done</speak>"


def test_full_html_pipeline_to_final_ssml():
    html_doc = f"<h4>Chapter I</h4><p>Intro.</p><em>{LONG}</em><strong>Cite</strong>"
    ssml = normalize_ssml(convert_html_to_ssml(html_doc))
    assert ssml == (
        '<speak><break time="500ms"/>Chapter I<break time="2s"/>Intro.'
        f'<break time="500ms"/>{LONG}'
        '<break time="250ms"/>Cite<break time="500ms"/></speak>'
    )
