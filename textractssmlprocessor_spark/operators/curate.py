"""End-to-end corpus curation: the filter chain a training-data pipeline
runs over raw documents, composed from this engine's operators.

Order matters and is the standard one (cheap map-side filters before
shuffling dedup):

1. language allowlist        — scan-pushed filter (textstats.lang_id is
                               available when the column is absent);
2. Gopher quality rules      — map-side flags (textstats.gopher_columns);
3. exact dedup               — fingerprint groupBy, min-id survivor.

Every document gets a verdict row (kept + first drop_reason), so the
output is an auditable curation manifest, not just the survivor list —
the shape lineage/reporting needs at 10^12 docs. Near-dup removal
(minhash/simhash/embedding) composes downstream on the survivors; it is
kept out of this operator because its pair tables are corpus-size-
dependent choices (bits/bands/thresholds), not fixed policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import fingerprint, gopher_columns


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    languages: list[str] | None = None,
) -> DataFrame:
    """-> (id, kept, drop_reason) curation manifest.

    drop_reason is the FIRST failing stage: 'language', 'quality', or
    'duplicate'; NULL for kept rows. Exact-dedup survivorship is min-id
    within a fingerprint group, computed with a partitioned window over
    the fingerprint key — group sizes are bounded by duplicate
    multiplicity, and AQE splits a skewed boilerplate group's sort."""
    col = F.col(text_col)
    g = gopher_columns(col)
    # NULL text makes every gopher ratio NULL -> gopher_pass NULL; a
    # verdict row must never be NULL/NULL (same three-valued-logic trap as
    # the lang allowlist below), so the quality gate coalesces to False
    quality_ok = F.coalesce(g["gopher_pass"], F.lit(False))
    if languages:
        if lang_col not in df.columns:
            # silently skipping the allowlist would ship unfiltered data
            raise ValueError(
                f"languages={languages} given but column {lang_col!r} is "
                f"not in the input ({df.columns})"
            )
        # NULL lang (routine lang-id failure in web corpora) must FAIL the
        # allowlist, not produce a NULL verdict: coalesce the three-valued
        # isin to false
        lang_ok = F.coalesce(F.col(lang_col).isin(languages), F.lit(False))
    else:
        lang_ok = F.lit(True)
    base = df.select(
        F.col(id_col).alias("id"),
        lang_ok.alias("_lang_ok"),
        quality_ok.alias("_quality_ok"),
        fingerprint(col).alias("_fp"),
    )
    # duplicates are judged among documents that survived the earlier
    # stages (a dropped low-quality copy must not shadow a clean one)
    w = Window.partitionBy("_fp")
    min_sur = F.min(F.when(F.col("_lang_ok") & F.col("_quality_ok"), F.col("id"))).over(w)
    return base.select(
        "id",
        (F.col("_lang_ok") & F.col("_quality_ok") & (F.col("id") == min_sur)).alias(
            "kept"
        ),
        F.when(~F.col("_lang_ok"), F.lit("language"))
        .when(~F.col("_quality_ok"), F.lit("quality"))
        .when(F.col("id") != min_sur, F.lit("duplicate"))
        .alias("drop_reason"),
    )
