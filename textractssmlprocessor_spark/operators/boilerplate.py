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
  corpus-sized exchange; line_fp is a FULL md5 (32 hex chars), not the
  line text: dropping a line is irreversible deletion, so this is a
  set-membership decision and gets the full-width hash (dedup.gram_hash's
  doctrine), still far narrower than shuffling line text;
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
    host's documents (and at least ``min_docs`` of them). Returns one row
    PER INPUT ROW: (url, cleaned_text, n_dropped); line order is
    preserved, blank lines never count as boilerplate.

    Duplicate-url inputs (re-crawled pages) are safe: the rebuild is
    keyed (url, text-fingerprint), so two copies with different text
    rebuild independently, exact copies' doubled exploded lines collapse
    via array_distinct on the (pos, line) structs, and the frequency
    statistics already countDistinct urls — a url-only rebuild key would
    interleave the copies' lines and emit negative n_dropped."""
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
    ).withColumn("tfp", F.md5("text"))
    lines = base.select(
        "url",
        "host",
        "tfp",
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
    # array_distinct: exact-duplicate input rows explode their (pos, line)
    # structs twice; distinct collapses them (within ONE document pos is
    # unique, so nothing legitimate is removed). n_kept counts the
    # distinct structs, not the raw collected rows, for the same reason.
    survivors = F.array_distinct(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("pos").alias("p"), F.col("line").alias("l"))
            )
        )
    )
    rebuilt = kept.groupBy("url", "tfp").agg(
        F.array_join(F.transform(survivors, lambda s: s["l"]), "\n").alias(
            "cleaned_text"
        ),
        F.size(survivors).alias("n_kept"),
    )
    return (
        rebuilt.join(base.select("url", "tfp", "n_lines"), ["url", "tfp"], "right")
        .select(
            "url",
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
