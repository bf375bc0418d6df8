"""Count-Min sketch: fixed-size token-frequency summaries.

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"): a depth x width counter grid;
every item increments ONE counter per row (row i's bucket is
h_i(item) mod width), and the frequency estimate for a probe is the MIN
of its depth counters — an upper-biased estimate (never undercounts;
overcounts by <= e*N/width with probability >= 1 - (1/e)^depth, N =
total stream length).

This completes the engine's sketch family (MinHash bands, SimHash,
Bloom sketch-then-verify, dHash, winnowing) with the frequency
estimator: the summary that answers "roughly how often does this token
appear corpus-wide?" without an exact census.

Scale shape — the reason the sketch exists at 10^12 docs: an exact
token census (`textstats.top_ngrams`) shuffles a key space as large as
the vocabulary; the sketch's groupBy key space is FIXED at depth*width
cells regardless of corpus size. Map-side partial aggregation collapses
each partition's contribution to <= depth*width rows before the
exchange, so the shuffle moves O(partitions * depth * width) rows, not
the token stream. Merging two sketches is cell-wise addition — the
same groupBy — which is what makes the summary cross-shard mergeable
and streamable (a micro-batch's cells fold into the running table the
way `streaming/dedup_near_stream.py` accumulates MinHash bands). In
fact `count_min_cells` runs UNCHANGED as a Structured Streaming
complete-mode aggregation — the bounded key space is exactly what makes
complete mode viable on an unbounded stream — with stream==batch cell
equality pinned by tests/test_sketch.py.

Hashing is the repo's portable md5-prefix bucket (sampling.hash_bucket
discipline; never xxhash64 in oracle-compared values), so a DuckDB
oracle replays every cell bit-for-bit. Tokenization is lm.tokens_column
(lowercase, [^a-z0-9]+ — identical byte semantics in Java regex and
RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.lm import tokens_column


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row `row`'s bucket for a token column: sampling.hash_bucket with a
    per-row salt — ONE definition of the engine-portability-critical
    md5->conv->pmod recipe, kept in sync with the oracle by construction."""
    from textractssmlprocessor_spark.operators.sampling import hash_bucket

    return hash_bucket(col, salt=f"cms{row}:", buckets=width)


def count_min_cells(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: (row, bucket, c) with at most depth*width rows.
    One explode over the token stream, one posexplode to depth rows per
    token, one fixed-key-space aggregation (map-side partials carry the
    whole reduction)."""
    toks = df.select(
        F.explode(tokens_column(F.col(text_col))).alias("tok")
    )
    cells = toks.select(
        F.posexplode(
            F.array(
                *[cms_bucket(F.col("tok"), i, width) for i in range(depth)]
            )
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(
        F.count("*").cast("bigint").alias("c")
    )


def count_min_estimate(
    cells: DataFrame,
    probes: DataFrame,
    probe_col: str = "probe",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each probe's stream frequency from a cells table built
    with the SAME depth/width: min over rows of the probe's counter,
    0 for never-seen probes (an absent cell means nothing hashed there).
    Returns (probe, cms_est). Probes must be pre-normalized the way the
    tokenizer emits them (lowercase alphanumeric runs).

    The cells side is <= depth*width rows — broadcast it; the probe side
    is typically a handful of rows. Nothing corpus-sized moves."""
    pc = probes.select(
        F.col(probe_col).alias("probe"),
        F.posexplode(
            F.array(
                *[
                    cms_bucket(F.col(probe_col), i, width)
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        pc.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy("probe")
        .agg(
            F.min(F.coalesce("c", F.lit(0))).cast("bigint").alias("cms_est")
        )
    )
