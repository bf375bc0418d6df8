"""PII redaction for web-corpus text (CCNet/Dolma-class preprocessing).

Pattern-based scrubbing of the high-volume identifier classes (emails,
phone numbers, IPv4 addresses) as native regexp chains — map-side, no UDF,
no shuffle — with per-class counts so the redaction is auditable. The
patterns avoid lookarounds so the identical expressions run under Java
regex (Spark) and RE2 (the DuckDB oracle); recall-first (a few false
positives in junk text beat leaked identifiers at 10^12 docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# country code OPTIONAL as a group: national formats like 555-123-4567 and
# (555) 123-4567 must match, not just +1-prefixed numbers
PHONE_RE = r"(?:\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
# boundary-FREE: '\b' is Unicode-aware in Java but ASCII in RE2, so a
# digit abutting a CJK letter or combining mark flips the match between
# engines (the fuzz seed-21 class). Dropping the anchors over-matches
# digit runs embedded in longer tokens ('v1.2.3.45' redacts '1.2.3.45')
# — for a PII scrubber that errs toward MORE redaction, the safe side.
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

REDACTIONS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def redact_pii(col: Column) -> dict[str, Column]:
    """-> {'redacted_text', 'n_email', 'n_phone', 'n_ip'}. Counts are taken
    BEFORE replacement (email first, so an address is never double-counted
    as a phone-like digit run). NULL text coalesces to '' (counts 0,
    redacted '') so downstream audit-counter sums never silently turn
    NULL-propagating — the same totality rule boilerplate follows."""
    out: dict[str, Column] = {}
    redacted = F.coalesce(col, F.lit(""))
    for name, pattern, token in REDACTIONS:
        out[f"n_{name}"] = (
            F.size(F.regexp_extract_all(redacted, F.lit(pattern), F.lit(0)))
            .cast("bigint")
        )
        redacted = F.regexp_replace(redacted, pattern, token)
    out["redacted_text"] = redacted
    return out


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = redact_pii(F.col(text_col))
    for name in ("n_email", "n_phone", "n_ip", "redacted_text"):
        df = df.withColumn(name, cols[name])
    return df
