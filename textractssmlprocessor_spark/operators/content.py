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

from .textstats import WS_CLASS, WS_PLUS, fold_lower

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
BLOCK_SPLIT_RE = rf"(?i)</?(?:{_TAG_NAMES})(?:[ \t\n\x0b\f\r][^>]*)?/?>|<br[ \t\n\x0b\f\r]*/?>"
ANCHOR_TEXT_RE = r"(?is)<a(?:[ \t\n\x0b\f\r][^>]*)?>(.*?)</a>"
TAG_RE = r"(?is)<[^>]*>"
# script/style/noscript BODIES are not visible text: stripping only the
# tags would let JS/CSS source land in block text, pass the word-count
# gate, and pollute main_text (every jusText-family extractor removes
# these first). No backreferences — RE2 has none — so the close tag is
# spelled out per element.
SCRIPT_STYLE_RE = (
    r"(?is)<script(?:[ \t\n\x0b\f\r][^>]*)?>.*?</script[ \t\n\x0b\f\r]*>"
    r"|<style(?:[ \t\n\x0b\f\r][^>]*)?>.*?</style[ \t\n\x0b\f\r]*>"
    r"|<noscript(?:[ \t\n\x0b\f\r][^>]*)?>.*?</noscript[ \t\n\x0b\f\r]*>"
)


def _block_text(raw: Column) -> Column:
    """Visible text of one block: tags -> space, whitespace collapsed,
    space-trimmed (Spark trim and DuckDB trim both strip spaces only)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(raw, TAG_RE, " "), WS_PLUS, " ")
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
            F.size(F.filter(F.split(x, WS_PLUS, -1), lambda w: w != ""))
            >= F.lit(min_words)
        )
        & ~fold_lower(x).contains("javascript"),
    )
    text = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(text, F.lit("[.!?]"), F.lit(0)))
    # coalesce: a VERDICT must be total — NULL text three-values the
    # conjunction to NULL, but "no document" is "not kept" (0), exactly
    # what the oracle's CASE WHEN ... ELSE 0 emits (curate_corpus'
    # quality-gate rule, applied here)
    keep = F.coalesce(
        (
            (n_sent >= 5)
            & ~fold_lower(col).contains("lorem ipsum")
            & ~col.contains("{")
        ).cast("bigint"),
        F.lit(0),
    )
    return {
        "c4_text": text,
        "c4_n_lines_kept": F.size(kept).cast("bigint"),
        "c4_n_sentences": n_sent.cast("bigint"),
        "c4_keep": keep,
    }


# --------------------------------------------------------------------------
# C4 bad-words document filter (Raffel et al. 2020 §2.2: "We removed any
# page that contained any word on the 'List of Dirty, Naughty, Obscene or
# Otherwise Bad Words'"). The public C4 pipeline matches list entries on
# word boundaries, phrases as contiguous word sequences. Both engines see
# the same normalization: lowercase, split on ASCII [^a-z0-9]+ (ASCII-only
# so Java and RE2 agree), rejoin with single spaces, pad with one space on
# each side; an entry hits iff ' entry ' is a substring. Single words and
# multi-word phrases thus share one code path.
#
# Scale shapes:
#   * `badword_columns` — the literal-list form: the list rides the plan
#     as an array literal scanned per row by a higher-order filter. Pure
#     map-side, zero shuffle, zero Python; right for lists up to a few
#     thousand entries (the real LDNOOBW en list is ~400).
#   * `badword_hits_join` — the broadcast-join form for big lists (all
#     languages of LDNOOBW is ~25k entries, or org-specific blocklists):
#     explode each doc's distinct 1..max_phrase_words token n-grams once,
#     broadcast-join the wordlist table, aggregate hits per doc. The doc
#     side never shuffles on data volume — one explode + one partial agg.
#
# The default list is a deterministic PLACEHOLDER (tests and the contract
# query seed their own hits); production callers pass the LDNOOBW list
# (or any blocklist) via `words=` / `words_df`.
# --------------------------------------------------------------------------

BADWORD_TOKEN_RE = "[^a-z0-9]+"

DEFAULT_BADWORDS = ("badword", "crummy stuff", "spamcontent")


def _normalize_entry(entry: str) -> str:
    """Python-side mirror of the column normalization, applied to list
    entries at plan-build time (lowercase, token-split, single spaces)."""
    import re as _re

    return " ".join(
        t for t in _re.split(BADWORD_TOKEN_RE, entry.lower()) if t
    )


def badword_tokens(col: Column) -> Column:
    """Normalized token array of a text column (shared by both forms)."""
    return F.filter(
        F.split(fold_lower(F.coalesce(col, F.lit(""))), BADWORD_TOKEN_RE, -1),
        lambda x: x != "",
    )


def badword_columns(
    col: Column, words: tuple[str, ...] = DEFAULT_BADWORDS
) -> dict[str, Column]:
    """Bad-words verdict as named columns over a raw-text column:

    - ``bw_hits``: bigint — number of DISTINCT list entries present
    - ``bw_first``: alphabetically first matched entry (NULL if none)
    - ``bw_keep``: bigint 0/1 document verdict (C4 drops on any hit)

    bigint verdicts because the contract canonicalizer cannot hash
    nullable booleans portably (CLAUDE.md invariant).
    """
    normalized = sorted({w for w in (_normalize_entry(w) for w in words) if w})
    padded = F.concat(
        F.lit(" "), F.array_join(badword_tokens(col), " "), F.lit(" ")
    )
    # matched is consumed twice (size + first) — but it is a pure
    # expression over one row, so materialize it once via a struct-free
    # local: both consumers reference the same Column object and Spark's
    # subexpression elimination collapses them inside one projection.
    matched = F.filter(
        F.array(*[F.lit(w) for w in normalized]),
        lambda w: padded.contains(F.concat(F.lit(" "), w, F.lit(" "))),
    )
    return {
        "bw_hits": F.size(matched).cast("bigint"),
        "bw_first": F.get(F.array_sort(matched), 0),
        "bw_keep": (F.size(matched) == 0).cast("bigint"),
    }


def badword_hits_join(
    df: DataFrame,
    words_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_phrase_words: int = 3,
    validate: bool = True,
) -> DataFrame:
    """Broadcast-join form for big lists: returns (id_col, bw_hits,
    bw_first, bw_keep) with the SAME semantics as `badword_columns`
    (distinct-entry hit count) for lists whose phrases are at most
    ``max_phrase_words`` tokens.

    Shape: docs explode their distinct 1..max_phrase_words token n-grams
    (one explode), inner-join the BROADCAST normalized wordlist, then one
    partial-agg groupBy(id) — plus a left join back to the doc spine so
    zero-hit docs keep a row. No corpus-side shuffle beyond the final
    keyed agg; the wordlist never exceeds driver memory by contract
    (blocklists are human-curated, << executor RAM).

    ``words_df`` needs one string column ``word`` (raw entries; they are
    normalized here). An entry LONGER than ``max_phrase_words`` tokens
    can never match (the doc side only generates grams up to that
    length); ``validate=True`` (default) folds a lazy guard into the
    wordlist plan that raises at EXECUTION time on the first such entry
    instead of silently never matching — construction stays a pure plan
    builder (no job is triggered until the caller runs an action). Pass
    ``validate=False`` only when the caller has already vetted the list.
    """
    wl = words_df.select(
        F.array_join(badword_tokens(F.col("word")), " ").alias("w")
    ).where(F.col("w") != "").distinct()
    if validate:
        # deferred guard: raise_error fires when the (small, broadcast)
        # wordlist is actually evaluated — never a collect() at
        # DataFrame-construction time
        wl = wl.select(
            F.when(
                F.size(F.split("w", " ", -1)) > max_phrase_words,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "badword_hits_join(max_phrase_words="
                            f"{max_phrase_words}) can never match longer "
                            "entry: "
                        ),
                        F.col("w"),
                        F.lit(
                            " — raise max_phrase_words or drop it from "
                            "the list"
                        ),
                    )
                ).cast("string"),
            )
            .otherwise(F.col("w"))
            .alias("w")
        )
    toks = df.select(id_col, badword_tokens(F.col(text_col)).alias("_t"))

    def _gram_lambda(n: int):
        # factory closure, NOT `lambda i, n=n`: F.transform inspects the
        # lambda's arity and a defaulted second parameter silently becomes
        # the (element, index) form (textstats._gram_lambda pattern)
        return lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, n))

    def _grams(n: int) -> Column:
        return F.when(
            F.size("_t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - (n - 1)),
                _gram_lambda(n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = toks.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.array(*[_grams(n) for n in range(1, max_phrase_words + 1)])
                )
            )
        ).alias("g"),
    )
    hits = (
        grams.join(F.broadcast(wl), grams["g"] == wl["w"], "inner")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("bw_hits"),
            F.min("w").alias("bw_first"),
        )
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("bw_hits", F.lit(0).cast("bigint")).alias("bw_hits"),
            "bw_first",
            (F.coalesce("bw_hits", F.lit(0)) == 0).cast("bigint").alias(
                "bw_keep"
            ),
        )
    )


# --------------------------------------------------------------------------
# Page metadata extraction: <title>, <meta name="description">, the <html>
# lang attribute, and <meta property="og:title">. The standard head-level
# signals a web corpus keeps alongside main content (indexing, language
# routing, quality rollups). Pure native regexp columns — zero Python,
# zero shuffle; at 10^12 docs this fuses into the same scan projection as
# `main_content`.
#
# Portability rules (shared verbatim with the DuckDB oracle):
#   * quotes are matched as ["\x27] — \x27 is the apostrophe in BOTH Java
#     and RE2, and keeps the pattern single-quote-free so it can embed in
#     a SQL string literal without doubling;
#   * attribute values stop at the first quote of EITHER kind (an
#     apostrophe inside a double-quoted content truncates the extract) —
#     the same documented subset as `weburl._OG_URL_RE`;
#   * meta description is matched in both attribute orders (name-first
#     and content-first) and coalesced; og:title conventionally leads
#     with property= so only that order is matched;
#   * '' normalizes to NULL on both engines (Spark regexp_extract returns
#     '' on no match).
# --------------------------------------------------------------------------

PG_TITLE_RE = r"(?is)<title(?:[ \t\n\x0b\f\r][^>]*)?>([^<]*)"
PG_LANG_RE = r"(?is)<html[^>]*?[ \t\n\x0b\f\r]lang[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]?([a-zA-Z-]+)"
# content captures also exclude '>' (not just quotes): on a malformed
# page with an unterminated attribute, a quotes-only class would run to
# the next quote ANYWHERE in the document — '>' bounds the capture to
# the element (a legit '>' in content should be &gt; anyway)
PG_DESC_NAME_FIRST_RE = (
    r"(?is)<meta[ \t\n\x0b\f\r][^>]*?name[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]description[\"\x27]"
    r"[^>]*?content[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]([^\"\x27>]*)"
)
PG_DESC_CONTENT_FIRST_RE = (
    r"(?is)<meta[ \t\n\x0b\f\r][^>]*?content[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]([^\"\x27>]*)[\"\x27]"
    r"[^>]*?name[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]description[\"\x27]"
)
# robots meta directive (noindex/nofollow/...): the in-page complement
# to robots.txt (operators/robots.py governs FETCHING; this governs
# indexing/link-following of an already-fetched page — a corpus that
# honors publisher intent filters on it)
PG_ROBOTS_NAME_FIRST_RE = (
    r"(?is)<meta[ \t\n\x0b\f\r][^>]*?name[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]robots[\"\x27]"
    r"[^>]*?content[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]([^\"\x27>]*)"
)
PG_ROBOTS_CONTENT_FIRST_RE = (
    r"(?is)<meta[ \t\n\x0b\f\r][^>]*?content[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]([^\"\x27>]*)[\"\x27]"
    r"[^>]*?name[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]robots[\"\x27]"
)
PG_OG_TITLE_RE = (
    r"(?is)<meta[ \t\n\x0b\f\r][^>]*?property[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]og:title[\"\x27]"
    r"[^>]*?content[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27]([^\"\x27>]*)"
)
# publication date: the two leading head-level sources, captured as the
# bare YYYY-MM-DD prefix (time-of-day/zone tails vary too much to carry;
# \d is ASCII in both Java's default mode and RE2)
PG_PUBLISHED_RE = (
    r"(?is)<meta[ \t\n\x0b\f\r][^>]*?property[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*"
    r"[\"\x27]article:published_time[\"\x27]"
    r"[^>]*?content[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27](\d{4}-\d{2}-\d{2})"
)
PG_TIME_TAG_RE = (
    r"(?is)<time[ \t\n\x0b\f\r][^>]*?datetime[ \t\n\x0b\f\r]*=[ \t\n\x0b\f\r]*[\"\x27](\d{4}-\d{2}-\d{2})"
)


def page_metadata(col: Column) -> dict[str, Column]:
    """Head-level page metadata as named columns over a raw-HTML column:

    - ``pg_title``: first <title> text, whitespace-collapsed + trimmed
    - ``pg_description``: meta description content (either attr order)
    - ``pg_lang``: <html lang> attribute, lowercased (BCP-47 case folds)
    - ``pg_og_title``: og:title content
    - ``pg_date``: publication date as 'YYYY-MM-DD' —
      article:published_time meta first, then the first <time datetime>
      (freshness filtering / dated-corpus routing)
    - ``pg_robots``: the robots meta directive, lowercased +
      whitespace-stripped around commas ('noindex,nofollow') — the
      publisher-intent filter for an already-fetched page

    All NULL when absent/empty. Values are the raw attribute/body bytes
    (entities like &amp; are NOT decoded — decoding is a per-consumer
    choice and `functions.dom` owns the SSML-path entity semantics)."""
    h = F.coalesce(col, F.lit(""))

    def _x(pattern: str) -> Column:
        return F.nullif(F.regexp_extract(h, pattern, 1), F.lit(""))

    title = F.nullif(
        F.trim(
            F.regexp_replace(
                F.regexp_extract(h, PG_TITLE_RE, 1), WS_PLUS, " "
            )
        ),
        F.lit(""),
    )
    return {
        "pg_title": title,
        "pg_description": F.coalesce(
            _x(PG_DESC_NAME_FIRST_RE), _x(PG_DESC_CONTENT_FIRST_RE)
        ),
        "pg_lang": fold_lower(_x(PG_LANG_RE)),
        "pg_og_title": _x(PG_OG_TITLE_RE),
        "pg_date": F.coalesce(
            _x(PG_PUBLISHED_RE), _x(PG_TIME_TAG_RE)
        ),
        "pg_robots": F.nullif(
            F.trim(
                F.regexp_replace(
                    fold_lower(
                        F.coalesce(
                            _x(PG_ROBOTS_NAME_FIRST_RE),
                            _x(PG_ROBOTS_CONTENT_FIRST_RE),
                            F.lit(""),
                        )
                    ),
                    WS_CLASS + "*," + WS_CLASS + "*",
                    ",",
                )
            ),
            F.lit(""),
        ),
    }


# --------------------------------------------------------------------------
# Document outline: exploded h1-h6 headings in document order. The web
# complement of the reference's chapter-heading detection (cleaning.py
# all-caps title extraction works on flat text; real pages declare the
# outline in markup). Feeds section-aware chunking, TOC construction and
# heading-based quality signals. Pure map-side: one regexp_extract_all +
# posexplode, zero Python.
#
# Documented subset (shared verbatim with the DuckDB oracle): the close
# tag accepts ANY h-level (RE2 has no backreferences to demand the same
# digit), and nested headings end at the FIRST close tag (lazy body).
# --------------------------------------------------------------------------

HEADING_RE = r"(?is)<h([1-6])(?:[ \t\n\x0b\f\r][^>]*)?>(.*?)</h[1-6][ \t\n\x0b\f\r]*>"
HEADING_LEVEL_RE = r"(?is)<h([1-6])"


def heading_outline(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Exploded (url, pos, level, heading) outline rows: pos is 0-based
    document order (the extract_links link_no convention), level 1-6,
    heading text tag-stripped and whitespace-collapsed ('' for empty
    elements — position still carries outline information)."""
    h = F.coalesce(F.col(html_col), F.lit(""))
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(h, F.lit(HEADING_RE), F.lit(0))
        ).alias("pos", "frag"),
    )
    return ex.select(
        "url",
        F.col("pos").cast("bigint").alias("pos"),
        F.regexp_extract("frag", HEADING_LEVEL_RE, 1)
        .cast("bigint")
        .alias("level"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace("frag", TAG_RE, " "), WS_PLUS, " "
            )
        ).alias("heading"),
    )


# --------------------------------------------------------------------------
# HTML table extraction: (url, table_no, row_no, cells) rows from raw
# pages. Density-based main-content extractors classify table chrome as
# boilerplate, so tabular data either vanishes or smears into run-on
# text; pipelines that want tables (QA pairs, entity grids, markdown
# serialization for LLM corpora) extract them as STRUCTURE first. Pure
# map-side: three nested regexp_extract_all + two posexplodes, zero
# Python.
#
# Documented subset (same family as heading_outline): lazy bodies end at
# the FIRST close tag, so a nested table's rows surface under the inner
# extraction and the outer body truncates there; colspan/rowspan are not
# expanded.
# --------------------------------------------------------------------------

TABLE_RE = r"(?is)<table(?:[ \t\n\x0b\f\r][^>]*)?>(.*?)</table[ \t\n\x0b\f\r]*>"
TABLE_TR_RE = r"(?is)<tr(?:[ \t\n\x0b\f\r][^>]*)?>(.*?)</tr[ \t\n\x0b\f\r]*>"
TABLE_CELL_RE = r"(?is)<t[dh](?:[ \t\n\x0b\f\r][^>]*)?>(.*?)</t[dh][ \t\n\x0b\f\r]*>"


def table_rows(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Exploded (url, table_no, row_no, cells) — 0-based table and
    within-table row order, cells as an array of tag-stripped,
    whitespace-collapsed strings (th and td alike; '' cells kept so
    column positions stay aligned). Rows with no cells are dropped."""
    h = F.coalesce(F.col(html_col), F.lit(""))
    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(h, F.lit(TABLE_RE), F.lit(1))
        ).alias("table_no", "tbody"),
    )
    rows = tables.select(
        "url",
        F.col("table_no").cast("bigint").alias("table_no"),
        F.posexplode(
            F.regexp_extract_all("tbody", F.lit(TABLE_TR_RE), F.lit(1))
        ).alias("row_no", "rowhtml"),
    )
    cells = F.transform(
        F.regexp_extract_all("rowhtml", F.lit(TABLE_CELL_RE), F.lit(1)),
        lambda c: F.trim(
            F.regexp_replace(F.regexp_replace(c, TAG_RE, " "), WS_PLUS, " ")
        ),
    )
    return rows.select(
        "url",
        "table_no",
        F.col("row_no").cast("bigint").alias("row_no"),
        cells.alias("cells"),
    ).where(F.size("cells") > 0)
