"""SSML normalization: the deterministic tail of the reference pipeline.

``preprocess_ssml_tags`` -> reference utils.py:351-368
``clean_ssml_tags``      -> reference utils.py:370-416

The reference's ``clean_ssml_tags`` parses under a ``<root>`` wrapper with
lxml, recursively splices out elements whose tag is not in the allowed set
(keeping their ``text + tail`` but DROPPING their descendants — a reference
quirk we replicate), serializes, and runs the splice twice. lxml is not a
dependency here: we parse with ``xml.etree.ElementTree`` and serialize with a
small writer that matches lxml's conventions (``<tag/>`` self-closing without
a space, ``&amp; &lt; &gt;`` escaping in text, ``"``-quoted attributes).
Behavior is pinned by golden tests (tests/test_ssml.py).

Known reference bug NOT replicated: utils.py:375-376 passes a ``str`` method
as an ``re.sub`` callback, so any input containing ``<w ...>`` raises
TypeError in the reference (swallowed by its retry wrapper, utils.py:296-307).
We implement the documented intent: insert ``role="amazon:NN"`` when absent.
"""

from __future__ import annotations

import html
import re
import xml.etree.ElementTree as ET
from typing import List

ALLOWED_TAGS: List[str] = ["break", "lang", "p", "s", "speak", "sub", "w"]

_ALLOWED_PATTERN = re.compile(
    r"</?({})(\s[^>]*)?/?>".format("|".join(ALLOWED_TAGS)), re.IGNORECASE
)
_ANY_TAG = re.compile(r"</?[^>]+>")


def preprocess_ssml_tags(content: str) -> str:
    """Unescape HTML entities, then delete every tag whose name is not in the
    allowed SSML set (case-insensitive, attributes and self-closing allowed).
    Parity: reference utils.py:351-368."""
    content = html.unescape(content)

    def keep_if_allowed(match: re.Match) -> str:
        tag = match.group(0)
        return tag if _ALLOWED_PATTERN.match(tag) else ""

    return _ANY_TAG.sub(keep_if_allowed, content)


# --- clean_ssml_tags ---------------------------------------------------------

_BARE_BREAK = re.compile(r"<break\s*/?>")
_W_TAG = re.compile(r"<w([^>]*)>")


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def _serialize(elem: ET.Element, out: List[str]) -> None:
    """lxml-style serialization: attribute order preserved, empty elements
    self-closed as ``<tag/>`` (no space), text escaped minimally.

    Hybrid recursion (same rationale and switch depth as dom.serialize):
    plain recursion for real-content depths, explicit work stack past
    _ITERATIVE_DEPTH so a hostile page carrying well-formed allowed-tag
    nests thousands deep serializes instead of RecursionError-ing the
    task."""
    _serialize_from(elem, out, 0)


_ITERATIVE_DEPTH = 150


def _serialize_from(elem: ET.Element, out: List[str], depth: int) -> None:
    if depth < _ITERATIVE_DEPTH:
        out.append(f"<{elem.tag}")
        for k, v in elem.attrib.items():
            out.append(f' {k}="{_escape_attr(v)}"')
        if elem.text is None and len(elem) == 0:
            out.append("/>")
        else:
            out.append(">")
            if elem.text:
                out.append(_escape_text(elem.text))
            for child in elem:
                _serialize_from(child, out, depth + 1)
            out.append(f"</{elem.tag}>")
        if elem.tail:
            out.append(_escape_text(elem.tail))
        return
    stack: List[tuple] = [(elem, False)]
    while stack:
        e, closing = stack.pop()
        if closing:
            out.append(f"</{e.tag}>")
            if e.tail:
                out.append(_escape_text(e.tail))
            continue
        out.append(f"<{e.tag}")
        for k, v in e.attrib.items():
            out.append(f' {k}="{_escape_attr(v)}"')
        if e.text is None and len(e) == 0:
            out.append("/>")
            if e.tail:
                out.append(_escape_text(e.tail))
            continue
        out.append(">")
        if e.text:
            out.append(_escape_text(e.text))
        stack.append((e, True))
        for child in reversed(list(e)):
            stack.append((child, False))


def _splice_disallowed(element: ET.Element) -> None:
    """Remove children not in ALLOWED_TAGS, promoting ``text + tail`` into the
    previous sibling's tail (or the parent's text). Descendants of removed
    elements are dropped — reference utils.py:385-399 behavior."""
    # iterative walk (allowed-child subtrees are disjoint, so visit order
    # cannot change the result): depth is attacker-controlled — see
    # _serialize's containment note
    stack: List[ET.Element] = [element]
    while stack:
        el = stack.pop()
        for child in list(el):
            if child.tag not in ALLOWED_TAGS:
                text = (child.text or "") + (child.tail or "")
                idx = list(el).index(child)
                if idx > 0:
                    prev = list(el)[idx - 1]
                    prev.tail = (prev.tail or "") + text
                else:
                    el.text = (el.text or "") + text
                el.remove(child)
            else:
                stack.append(child)


def _clean_tags_once(content: str) -> str:
    try:
        root = ET.fromstring(f"<root>{content}</root>")
    except ET.ParseError:
        return content  # passthrough on malformed XML (utils.py:381-383)
    _splice_disallowed(root)
    buf: List[str] = []
    _serialize(root, buf)
    return "".join(buf).replace("<root>", "").replace("</root>", "").replace("<root/>", "")


def ensure_role_attribute(tag: str) -> str:
    return tag.replace("<w", '<w role="amazon:NN"', 1) if "role=" not in tag else tag


def clean_ssml_tags(content: str) -> str:
    """Normalize SSML: default bare breaks to 1s, ensure <w role=...>, splice
    out disallowed elements (twice, matching utils.py:407-410), and guarantee
    a <speak> wrapper. Parity: reference utils.py:370-416."""
    content = _BARE_BREAK.sub('<break time="1s"/>', content)
    content = _W_TAG.sub(lambda m: ensure_role_attribute(m.group(0)), content)
    once = _clean_tags_once(content)
    # the reference splices twice (utils.py:407-410); when the first pass is
    # a fixed point (no disallowed tags, clean serialization — the common
    # case) the second pass is the identity and its parse can be skipped
    final = once if once == content else _clean_tags_once(once)
    if not final.strip().startswith("<speak>"):
        final = f"<speak>{final}</speak>"
    return final


def normalize_ssml(content: str) -> str:
    """The deterministic post-LLM normalization chain the reference applies to
    every chunk: ``clean_ssml_tags(preprocess_ssml_tags(x))`` (utils.py:300).
    This defines the final byte-level SSML format."""
    return clean_ssml_tags(preprocess_ssml_tags(content))
