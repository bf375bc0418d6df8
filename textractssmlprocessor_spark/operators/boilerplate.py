"""Host-scoped boilerplate-line removal (CCNet-style line frequency).

Web templates repeat the same navigation/footer/cookie-banner lines on
every page of a host; body text does not. CCNet (Wenzek et al. 2020) and
the Common Crawl processing lineage drop a line when it occurs in a large
fraction of the host's pages. This is the corpus-level complement of the
per-document DOM heuristics in the extraction pipeline (reference
utils.py:52-58 strips running heads WITHIN one document; this operator
strips what repeats ACROSS documents of a host).

Plan shape (scales to 10^12 docs):
- one explode of (url, line) with positions — map-side, no shuffle;
- one aggregation keyed (host, line_fp) counting distinct urls — the only
  corpus-sized exchange; line_fp is an 8-byte-prefix md5, not the line
  text, so the shuffle stays narrow;
- the per-host doc totals ride a tiny (host) aggregate joined back
  (AQE-broadcast while small);
- a left_anti join drops flagged lines; the rebuild is one groupBy(url)
  with an array_sort(collect_list(struct(pos, line))) ordered fold — no
  corpus-wide window anywhere. Fully-boilerplate documents are restored as
  empty strings via a final right join (totality, like
  dedup.drop_duplicate_sentences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .weburl import url_host


def remove_boilerplate_lines(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_docs: int = 2,
    min_frac: float = 0.5,
) -> DataFrame:
    """Drop lines that appear (trim-normalized) in >= ``min_frac`` of a
    host's documents (and at least ``min_docs`` of them). Returns
    (url, cleaned_text, n_dropped); line order is preserved, blank lines
    never count as boilerplate."""
    base = df.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        # NULL text behaves as empty (totality: the output keeps one row
        # per input url with cleaned_text='' and n_dropped=0, instead of a
        # NULL n_dropped from size(split(NULL)))
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
        # per-doc line total computed map-side here, NOT by re-exploding and
        # re-aggregating the lines table a second time (saves one full
        # explode pass + one url-keyed aggregation)
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)).alias(
            "n_lines"
        ),
    )
    lines = base.select(
        "url",
        "host",
        F.posexplode(F.split("text", "\n", -1)).alias("pos", "line"),
    ).withColumn("fp", F.md5(F.trim("line")))

    host_docs = base.groupBy("host").agg(
        F.countDistinct("url").alias("n_docs")
    )
    freq = (
        lines.filter(F.trim("line") != "")
        .groupBy("host", "fp")
        .agg(F.countDistinct("url").alias("n_with"))
        .join(host_docs, "host")
        .filter(
            (F.col("n_with") >= F.lit(min_docs))
            & (F.col("n_with") >= F.col("n_docs") * F.lit(min_frac))
        )
        .select("host", "fp")
    )

    kept = lines.join(freq, ["host", "fp"], "left_anti")
    rebuilt = kept.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos").alias("p"),
                                            F.col("line").alias("l")))
                ),
                lambda s: s["l"],
            ),
            "\n",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        rebuilt.join(base.select("url", "n_lines"), "url", "right")
        .select(
            "url",
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
