"""Per-document main-content extraction via text/link-density block
classification (the jusText / Boilerpipe / trafilatura family).

The extraction pipeline's DOM path (reference utils.py:16-58 via
functions/dom.py) assumes book-like pages where everything is content.
Real Common-Crawl pages bury the main text in navigation, header, footer
and related-links chrome; the standard first-pass fix — used by the
corpora OSCAR and friends are built from — is block-level density
classification: split the page at block-level tags, score each block by
word count and link density (chars of anchor text / chars of text), and
keep only contentful blocks. This is the PER-DOCUMENT complement of
operators/boilerplate.py (which drops lines repeating ACROSS a host's
pages); the two compose.

Scale shape: pure map-side — ONE projection over (url, html), zero
shuffles, zero Python. Blocks live as an array column; features ride a
single `transform` whose lambda references only its own argument (the
higher-order re-evaluation rule, PLANS.md), classification is an array
`filter`, and the rebuild is `array_join`. At 10^12 docs this pipelines
with the scan and prunes to two columns.

Every regex is Java/RE2-portable (no lookbehind, ASCII classes in
ASCII-only contexts) and shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# split at block-level tag boundaries (open or close). No \b after the
# tag name: Java \b is Unicode-aware while RE2's is ASCII, so the two
# engines disagree when arbitrary document text puts a non-ASCII letter
# right after a tag-like prefix (e.g. '<año>') — and RE2 has no lookahead
# to express the boundary either. Instead the tag name must be followed
# by an explicit '>', '/>', or ASCII-whitespace attribute tail, which
# both engines read identically (ASCII \s) and which also keeps <p from
# eating <pre (pre is listed anyway, belt and braces).
_TAG_NAMES = (
    r"p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|"
    r"nav|header|footer|aside|section|article|main|blockquote|pre|form|"
    r"fieldset|figure|figcaption"
)
BLOCK_SPLIT_RE = rf"(?i)</?(?:{_TAG_NAMES})(?:\s[^>]*)?/?>|<br\s*/?>"
ANCHOR_TEXT_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
TAG_RE = r"(?is)<[^>]*>"
# script/style/noscript BODIES are not visible text: stripping only the
# tags would let JS/CSS source land in block text, pass the word-count
# gate, and pollute main_text (every jusText-family extractor removes
# these first). No backreferences — RE2 has none — so the close tag is
# spelled out per element.
SCRIPT_STYLE_RE = (
    r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>"
    r"|<style(?:\s[^>]*)?>.*?</style\s*>"
    r"|<noscript(?:\s[^>]*)?>.*?</noscript\s*>"
)


def _block_text(raw: Column) -> Column:
    """Visible text of one block: tags -> space, whitespace collapsed,
    space-trimmed (Spark trim and DuckDB trim both strip spaces only)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(raw, TAG_RE, " "), r"\s+", " ")
    )


def main_content(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_words: int = 10,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Classify block-level segments of ``html_col`` and keep contentful
    ones: at least ``min_words`` words AND link density (anchor-text chars
    over text chars) at most ``max_link_density``.

    Returns one row per input row (total): (url, main_text — kept blocks
    joined by blank lines in document order, n_blocks — non-empty blocks
    seen, n_kept, link_density — doc-level anchor-chars/text-chars,
    rounded 6). NULL html behaves as empty (main_text '', counts 0).
    """
    blocks = df.withColumn(
        "_blocks",
        F.split(
            F.regexp_replace(
                F.coalesce(F.col(html_col), F.lit("")), SCRIPT_STYLE_RE, " "
            ),
            BLOCK_SPLIT_RE,
            -1,
        ),
    )
    # one struct per block: visible text + anchor-text char count; the
    # lambda references ONLY its argument (re-evaluation rule)
    feats = blocks.withColumn(
        "_feats",
        F.transform(
            "_blocks",
            lambda b: F.struct(
                _block_text(b).alias("txt"),
                F.aggregate(
                    F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), F.lit(1)),
                    F.lit(0).cast("bigint"),
                    lambda acc, a: acc + F.length(_block_text(a)),
                ).alias("lc"),
            ),
        ),
    )
    # _kept is consumed twice (join + size) — materialize it as its own
    # column so the filter predicate runs once per row, not per consumer
    feats = feats.withColumn(
        "_kept",
        F.filter(
            "_feats",
            lambda s: (s["txt"] != "")
            & (F.size(F.split(s["txt"], " ")) >= F.lit(min_words))
            & (
                s["lc"]
                <= F.greatest(F.length(s["txt"]), F.lit(1))
                * F.lit(max_link_density)
            ),
        ),
    )
    kept = F.col("_kept")
    nonempty = F.filter("_feats", lambda s: s["txt"] != "")
    total_chars = F.aggregate(
        "_feats", F.lit(0).cast("bigint"), lambda acc, s: acc + F.length(s["txt"])
    )
    total_link = F.aggregate(
        "_feats", F.lit(0).cast("bigint"), lambda acc, s: acc + s["lc"]
    )
    return feats.select(
        F.col(url_col).alias("url"),
        F.array_join(F.transform(kept, lambda s: s["txt"]), "\n\n").alias(
            "main_text"
        ),
        F.size(nonempty).cast("bigint").alias("n_blocks"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.round(
            total_link / F.greatest(total_chars, F.lit(1)).cast("double"), 6
        ).alias("link_density"),
    )


# --------------------------------------------------------------------------
# C4 line/document cleaning rules (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning...", §2.2 — the public description of the
# C4 corpus filters). Line level: keep lines that end in a terminal
# punctuation mark (ASCII subset: . ! ? " ' — the paper says "terminal
# punctuation mark", quotes included), contain at least `min_words`
# words, and do not mention javascript (the enable-JS boilerplate rule).
# Document level: keep pages with >= 5 sentences whose text contains
# neither "lorem ipsum" nor "{" (the code-page rule). All native
# expressions — ONE map-side projection, zero shuffle, zero Python; the
# regexes are Java/RE2-portable and shared verbatim with the DuckDB
# oracle.
# --------------------------------------------------------------------------

C4_TERMINAL_RE = "[.!?\"']$"


def c4_line_columns(col: Column, min_words: int = 3) -> dict[str, Column]:
    """C4 cleaning as named columns over a raw-text column:

    - ``c4_text``: the line-filtered text (kept lines joined by \\n)
    - ``c4_n_lines_kept``: how many lines survived
    - ``c4_n_sentences``: terminal-punctuation count of the kept text
      (the paper's sentence proxy)
    - ``c4_keep``: document verdict as bigint 0/1 (>= 5 sentences, no
      "lorem ipsum", no "{") — bigint because the contract canonicalizer
      cannot hash nullable booleans portably (CLAUDE.md invariant).
    """
    # '\r+$' strip BEFORE trim: CRLF documents otherwise leave every
    # line ending in '\r', and the terminal-punct '$' then diverges
    # between engines (Java '$' matches before a trailing \r, RE2 does
    # not) — strip it explicitly so both see identical lines
    lines = F.transform(
        F.split(col, "\n", -1),
        lambda x: F.trim(F.regexp_replace(x, "\r+$", "")),
    )
    kept = F.filter(
        lines,
        lambda x: x.rlike(C4_TERMINAL_RE)
        & (
            F.size(F.filter(F.split(x, r"\s+", -1), lambda w: w != ""))
            >= F.lit(min_words)
        )
        & ~F.lower(x).contains("javascript"),
    )
    text = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(text, F.lit("[.!?]"), F.lit(0)))
    keep = (
        (n_sent >= 5)
        & ~F.lower(col).contains("lorem ipsum")
        & ~col.contains("{")
    ).cast("bigint")
    return {
        "c4_text": text,
        "c4_n_lines_kept": F.size(kept).cast("bigint"),
        "c4_n_sentences": n_sent.cast("bigint"),
        "c4_keep": keep,
    }
