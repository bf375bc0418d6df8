"""Unicode hygiene for web-crawl text: NFC normalization and mojibake
(UTF-8-read-as-Latin-1/cp1252) detection and repair.

Crawled pages mix normalization forms (NFD from Mac-origin content, NFC
elsewhere), so fingerprint/dedup keys computed on raw text miss
canonically-equal documents; and a long tail of pages is double-encoded
("Ã©" where "é" was meant). Detection is a NATIVE regex over the
characteristic artifact sequences (map-side, codegen, oracle-portable);
normalization and repair are Arrow-batched pandas UDFs (there is no JVM
builtin for either), applied AFTER the cheap flag filters so the Python
path only ever sees the rows that need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Characteristic UTF-8-bytes-shown-as-Latin-1/cp1252 artifacts: a 2-byte
# UTF-8 lead byte rendered as 'Ã'/'Â' followed by a continuation-byte
# glyph, and the 3-byte punctuation family rendered as 'â€?'. Literal
# char classes only — identical semantics in Java regex and RE2 (the
# DuckDB oracle embeds the same pattern).
MOJIBAKE_RE = "\u00c3[\u0080-\u00ff]|\u00e2\u20ac.|\u00c2[\u00a0-\u00bf]"

# The three lead characters every MOJIBAKE_RE alternation starts with.
# Stripping these from a probe input makes it provably repair-free
# (mojibake_artifacts == 0, so the gated repair UDF is the identity) \u2014
# used by dual-engine probes whose oracle branch cannot mirror the
# iterative repair on ORGANIC mojibake in fuzz text (fuzz seed 13:
# a corpus doc whose first 8 chars contained 'caf\u00c3\u00a9' made Spark repair
# what the oracle's pass-through branch left untouched).
MOJIBAKE_LEAD_CLASS = "[\u00c2\u00c3\u00e2]"


def mojibake_artifacts(col: Column) -> Column:
    """Count of mojibake artifact sequences (0 = clean). Native regex —
    use as the cheap pre-filter so the pandas repair UDF only runs on
    ``mojibake_artifacts(text) > 0`` rows."""
    return F.size(F.regexp_extract_all(col, F.lit(MOJIBAKE_RE), F.lit(0)))


def nfc_normalize_udf():
    """Arrow-batched pandas UDF: Unicode NFC normalization (canonical
    composition). Vectorized via pandas ``str.normalize`` — one C-level
    pass per batch, no per-row Python."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return s.str.normalize("NFC")

    return _nfc


def with_nfc_text(
    df: DataFrame, text_col: str = "text", out_col: str = "nfc_text"
) -> DataFrame:
    return df.withColumn(out_col, nfc_normalize_udf()(F.col(text_col)))


def _register_sloppy_cp1252() -> None:
    """WHATWG windows-1252 maps the five undefined bytes (81 8D 8F 90 9D)
    to the SAME-VALUED C1 control codepoints, and that is what every
    browser and most lenient decoders produced when the original mangling
    happened — so the repair's re-encode must map those controls back to
    their byte values or it gives up on exactly the strings that contain
    a 0x9D continuation byte (e.g. a right double quote U+201D)."""
    import codecs

    ctrl = {0x81, 0x8D, 0x8F, 0x90, 0x9D}

    def _handler(err):
        chunk = err.object[err.start : err.end]
        if all(ord(c) in ctrl for c in chunk):
            return (bytes(ord(c) for c in chunk), err.end)
        raise err

    try:
        codecs.lookup_error("cp1252_sloppy")
    except LookupError:
        codecs.register_error("cp1252_sloppy", _handler)


def _repair_mojibake_str(s: str, max_rounds: int = 3) -> str:
    """Iteratively undo UTF-8-decoded-as-cp1252: re-encode with (sloppy)
    cp1252 and decode as UTF-8 while that round-trip is exact, up to
    ``max_rounds`` (handles double and triple encoding). Any failure
    leaves the input unchanged — the repair never destroys clean text."""
    _register_sloppy_cp1252()
    prev = s
    for _ in range(max_rounds):
        try:
            cand = prev.encode("cp1252", "cp1252_sloppy").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return prev
        if cand == prev:
            return cand
        prev = cand
    return prev


def fix_mojibake_udf(max_rounds: int = 3):
    """Arrow-batched pandas UDF wrapping :func:`_repair_mojibake_str`.
    Per-string Python inside the batch is unavoidable (codec round-trip),
    which is why callers must gate it behind ``mojibake_artifacts > 0`` —
    on a web corpus that prunes the Python path to the sub-percent tail."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fix(s):
        return s.map(
            lambda x: _repair_mojibake_str(x, max_rounds) if x is not None else None
        )

    return _fix


def repair_mojibake(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Repair mojibake in ``text_col`` (in place unless ``out_col`` given).

    The native artifact flag gates the pandas UDF with a FILTER + UNION,
    not ``F.when``: Spark hoists every pandas UDF referenced in a
    projection into its own ArrowEvalPython node and evaluates it on EVERY
    row regardless of the surrounding CASE WHEN (verified in the executed
    plan), so a when-gated UDF still pays the Arrow transfer and the
    per-row codec round-trip for the whole corpus. Splitting the rows
    first means clean rows (the overwhelming majority on a web corpus)
    never leave the JVM; only the flagged tail crosses Arrow. The filter
    predicate is a native regex, evaluated twice (once per branch) —
    microscopic next to one Arrow round trip of the full corpus."""
    out = out_col or text_col
    # coalesce: size() of a NULL array is conf-dependent (-1 or NULL) —
    # pin NULL text to the clean branch on every config
    dirty_flag = F.coalesce(
        mojibake_artifacts(F.col(text_col)) > 0, F.lit(False)
    )
    dirty = df.filter(dirty_flag).withColumn(
        out, fix_mojibake_udf()(F.col(text_col))
    )
    clean = df.filter(~dirty_flag).withColumn(out, F.col(text_col))
    return clean.unionByName(dirty)


# Canonical test vectors (WHATWG-cp1252 mangling of MOJIBAKE_SAMPLE_FIXED):
# shared by the contract query and its DuckDB oracle so both engines seed
# the exact same bytes.
MOJIBAKE_SAMPLE = "caf\u00c3\u00a9 \u00e2\u20ac\u201c \u00e2\u20ac\u0153ok\u00e2\u20ac\u009d \u00c2\u00a9"
MOJIBAKE_SAMPLE_FIXED = "caf\u00e9 \u2013 \u201cok\u201d \u00a9"
NFD_SAMPLE = "Cafe\u0301 nai\u0308ve "
NFD_SAMPLE_NFC = "Caf\u00e9 na\u00efve "


def drop_repeated_lines_within(col, max_lines: int = 20000):
    """First-occurrence-wins removal of repeated lines WITHIN one document
    (the intra-doc half of repetition handling — the corpus-wide half is
    dedup.drop_duplicate_sentences): a line whose trimmed form already
    appeared earlier in the same document is dropped; whitespace-only
    lines always survive (they are structure, not content). Returns the
    rebuilt text (newline-joined).

    Pure map-side array expression — no shuffle, no Python. The keys
    array is MATERIALIZED via a single transform before the filter so the
    positional lookup reads a bound value (the higher-order re-evaluation
    discipline); array_position makes the filter O(lines^2) per document —
    fine at the hundreds-to-thousands of lines real pages have, quadratic
    on crawl-spam megline documents. Docs above ``max_lines`` therefore
    BYPASS the expression (text returned unchanged — the keep-as-is
    verdict, mirroring dedup_paragraphs' min_chars bypass): at 20k lines
    the worst case is ~4*10^8 comparisons in one task; past that the task
    would stall the stage. Set ``max_lines=None`` to disable the guard."""
    from pyspark.sql import functions as F

    lines = F.split(col, "\n", -1)
    if max_lines is not None:
        return F.when(
            F.size(lines) > F.lit(max_lines), col
        ).otherwise(drop_repeated_lines_within(col, max_lines=None))
    keys = F.transform(lines, lambda x: F.trim(x))
    kept = F.zip_with(
        lines,
        F.transform(
            F.sequence(F.lit(1), F.size(lines)),
            lambda i: (F.element_at(keys, i) == "")
            | (F.array_position(keys, F.element_at(keys, i)) == i.cast("long")),
        ),
        lambda line, keep: F.when(keep, line),
    )
    return F.array_join(F.filter(kept, lambda x: x.isNotNull()), "\n")


# Invisible codepoints web text drags in (Dolma/C4-style hygiene): zero-width
# space/joiners, word-joiner, BOM-as-ZWNBSP, soft hyphen, directional marks,
# plus C0/C1 controls EXCEPT tab/newline/CR (document structure). The class
# and samples are built from integer codepoints (never raw literals) so the
# DuckDB oracle re-derives character-identical patterns (SCRIPT_RANGES'
# escape-dialect discipline).
INVISIBLE_CODEPOINTS = (
    0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD, 0x200E, 0x200F,
)
INVISIBLE_CONTROL_RANGES = ((0x00, 0x08), (0x0B, 0x0C), (0x0E, 0x1F), (0x7F, 0x7F))
INVISIBLE_CLASS = "".join(chr(c) for c in INVISIBLE_CODEPOINTS) + "".join(
    chr(lo) + "-" + chr(hi) for lo, hi in INVISIBLE_CONTROL_RANGES
)
# deterministic seeding sample for contract/test use: letters interleaved
# with ZWSP, soft hyphen, BOM, LRM, and a BEL control
INVISIBLE_SAMPLE = (
    "a" + chr(0x200B) + "b" + chr(0x00AD) + "c" + chr(0xFEFF)
    + "d" + chr(0x200E) + "e" + chr(0x07) + "f"
)
INVISIBLE_SAMPLE_CLEAN = "abcdef"


def strip_invisible(col):
    """Remove zero-width/invisible codepoints and non-structural control
    characters -- the characters that break tokenizers, inflate dedup
    fingerprints (cafe with an embedded ZWSP != cafe), and smuggle through
    content filters. Tab/newline/CR survive (they are document structure).
    One map-side regexp_replace; the class is built from shared integer
    codepoints so the oracle RE2 pattern is character-identical."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "[" + INVISIBLE_CLASS + "]", "")
