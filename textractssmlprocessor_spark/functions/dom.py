"""HTML -> SSML conversion via DOM heuristics (reference utils.py:236-272).

The reference uses BeautifulSoup(html.parser); bs4 is not available here, so
we build a minimal DOM on top of the stdlib ``html.parser`` tokenizer and
replicate the reference's semantics:

- every ``<h4>``: replace its children with the single string
  ``<break time='500ms'/>{title.text}<break time='2s'/>``
- every ``<em>`` (document order):
    * text > 100 chars: prefix ``<break time='500ms'/>``; if a following
      sibling ``<strong>`` exists, wrap its text in 250ms/500ms breaks
    * text <= 100 chars: flatten to plain text; DELETE the following
      sibling ``<strong>`` if any
- serialize (text nodes escaped ``& < >`` like bs4's minimal formatter —
  the injected ``<break .../>`` strings come out entity-escaped; the
  downstream ``preprocess_ssml_tags`` html.unescape restores them, exactly
  as in the reference pipeline)
- strip bare ``h4/em/strong/p`` wrapper tags (utils.py:267)
- wrap in ``<speak>...</speak>``

Behavior is pinned by golden tests; bs4 quirks outside these semantics
(e.g. broken-markup recovery) are out of scope for the fixture corpus.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Union

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: Optional[str], attrs=None, parent=None):
        self.tag = tag  # None for the document root
        self.attrs = attrs or []
        self.children: List[Union["Node", str]] = []
        self.parent = parent

    # -- bs4-like accessors ---------------------------------------------------
    @property
    def text(self) -> str:
        out: List[str] = []
        for c in self.children:
            out.append(c if isinstance(c, str) else c.text)
        return "".join(out)

    def set_string(self, s: str) -> None:
        self.children = [s]

    def find_all(self, tag: str) -> List["Node"]:
        found: List[Node] = []
        for c in self.children:
            if isinstance(c, Node):
                if c.tag == tag:
                    found.append(c)
                found.extend(c.find_all(tag))
        return found

    def next_sibling_tag(self, tag: str) -> Optional["Node"]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        i = sibs.index(self)
        for s in sibs[i + 1:]:
            if isinstance(s, Node) and s.tag == tag:
                return s
        return None

    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched closing tag: ignored (html.parser recovery)

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def parse_html(html_content: str) -> Node:
    b = _TreeBuilder()
    b.feed(html_content)
    b.close()
    return b.root


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def serialize(node: Node, out: List[str]) -> None:
    if node.tag is not None:
        attrs = "".join(
            f' {k}="{v}"' if v is not None else f" {k}" for k, v in node.attrs
        )
        if node.tag in VOID_ELEMENTS:
            out.append(f"<{node.tag}{attrs}/>")
            return
        out.append(f"<{node.tag}{attrs}>")
    for c in node.children:
        if isinstance(c, str):
            out.append(_escape(c))
        else:
            serialize(c, out)
    if node.tag is not None:
        out.append(f"</{node.tag}>")


_BARE_WRAPPERS = re.compile(r"<(/?)(h4|em|strong|p)>")


def convert_html_to_ssml(html_content: str) -> str:
    """Reference utils.py:236-272 semantics over our stdlib DOM."""
    root = parse_html(html_content)

    for title in root.find_all("h4"):
        title.set_string(f"<break time='500ms'/>{title.text}<break time='2s'/>")

    for em in root.find_all("em"):
        text = em.text
        nxt = em.next_sibling_tag("strong")
        if len(text) > 100:
            em.set_string(f"<break time='500ms'/>{text}")
            if nxt is not None:
                nxt.set_string(f"<break time='250ms'/>{nxt.text}<break time='500ms'/>")
        else:
            em.set_string(text)
            if nxt is not None:
                nxt.decompose()

    buf: List[str] = []
    serialize(root, buf)
    processed = _BARE_WRAPPERS.sub("", "".join(buf))
    return f"<speak>{processed}</speak>"
