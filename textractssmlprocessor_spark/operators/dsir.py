"""DSIR-style importance scoring for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

DSIR picks pretraining documents that *look like* a small high-quality
target corpus (Wikipedia/books) by estimating importance weights
p_target(x)/p_raw(x) under hashed bag-of-n-grams models — a bucketed
multinomial over md5-hashed n-grams, so the "model" is just two count
vectors of ``buckets`` cells. Re-expressed as DataFrame algebra:

1. FEATURIZE (map-side): tokenize (the shared lm.py tokenizer — identical
   bytes in Java regex and RE2), form word bigrams, hash each gram into
   one of ``buckets`` cells with the repo's engine-portable md5 bucket
   (sampling.hash_bucket semantics with an empty salt).
2. FIT (one aggregation each, map-side partials): per-cell gram counts
   for the raw corpus and for the target corpus. Both tables are at most
   ``buckets`` rows — broadcastable by construction, independent of
   corpus size. At 10^12 docs the raw side is fit on a deterministic
   hash-sample; the scoring side below is unchanged.
3. SCORE (broadcast joins, one per-doc agg): every document gram probes
   the two Laplace-smoothed cell distributions and contributes
   ln(p_target(cell)/p_raw(cell)); the per-document mean (rounded to 6,
   the repo convention absorbing summation-order ulp) is the document's
   importance log-ratio. Selection = keep the top fraction, or resample
   with :func:`sampling.subsample_by_group`-style hash Gumbel draws.

No windows, no collect, no corpus-sized shuffle: the only shuffles are
the two bounded count aggregations and the per-document mean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _spread
from .lm import TOKEN_DELIM_RE, tokens_column


def _gram_buckets(toks: Column, buckets: int) -> Column:
    """Hashed bigram cells as an array column: sampling.hash_bucket over
    'w1 w2' (one definition of the md5->conv->pmod recipe, oracle-synced
    by construction). zip_with over the materialized token array
    (attribute-bound lambda — not the higher-order re-evaluation trap)."""
    from textractssmlprocessor_spark.operators.sampling import hash_bucket

    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, 1 << 30),
        lambda a, b: hash_bucket(F.concat_ws(" ", a, b), "", buckets),
    )


def hashed_gram_cells(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10000,
) -> DataFrame:
    """(id, cell) — one row per document bigram occurrence."""
    base = _spread(df, id_col).select(
        F.col(id_col).alias("id"), tokens_column(F.col(text_col)).alias("toks")
    )
    return base.select(
        "id", F.explode(_gram_buckets(F.col("toks"), buckets)).alias("cell")
    )


def _cell_counts(cells: DataFrame, name: str) -> DataFrame:
    return cells.groupBy("cell").agg(F.count(F.lit(1)).cast("bigint").alias(name))


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10000,
    alpha: float = 1.0,
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR importance columns over the raw corpus:
    (id, dsir_logratio, dsir_n_grams). ``dsir_logratio`` is the mean over
    the document's hashed bigrams of ln(p_target/p_raw) under
    Laplace(alpha)-smoothed cell multinomials — positive means the
    document reads more like ``target`` than like the raw average.
    Documents with no bigrams keep their row with 0 grams and NULL score.

    ``model``: a prefit (cell, c_raw, c_tgt) table from
    :func:`dsir_model` (at most ``buckets`` rows — collect/replay it for
    the train-once idiom); default refits from ``raw``/``target``. Totals
    derive from the model table itself (a bounded agg), so a replayed
    model never touches the training corpora.
    """
    raw_cells = hashed_gram_cells(raw, id_col, text_col, buckets)
    if model is None:
        model = dsir_model(raw, target, id_col, text_col, buckets)
    totals = model.agg(
        F.sum("c_raw").cast("double").alias("n_raw"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
    )
    b = float(buckets)
    scored = (
        raw_cells.join(F.broadcast(model), "cell", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.log(
                (
                    (F.coalesce(F.col("c_tgt"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (F.col("n_tgt") + F.lit(alpha * b))
                )
                / (
                    (F.coalesce(F.col("c_raw"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (F.col("n_raw") + F.lit(alpha * b))
                )
            ).alias("lr"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dsir_n_grams"),
        F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias("dsir_logratio"),
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("dsir_n_grams", F.lit(0).cast("bigint")).alias(
                "dsir_n_grams"
            ),
            "dsir_logratio",
        )
    )


def dsir_model(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10000,
) -> DataFrame:
    """The DSIR cell-count model: (cell, c_raw, c_tgt), at most ``buckets``
    rows — one aggregation per corpus with map-side partials. Bounded by
    construction, so it collects/replays like any trained-weights table."""
    raw_counts = _cell_counts(
        hashed_gram_cells(raw, id_col, text_col, buckets).select("cell"), "c_raw"
    )
    tgt_counts = _cell_counts(
        hashed_gram_cells(target, id_col, text_col, buckets).select("cell"), "c_tgt"
    )
    return raw_counts.join(tgt_counts, "cell", "full_outer").select(
        "cell",
        F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
        F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
    )


def train_nb_weights(
    pos: DataFrame,
    neg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10000,
    alpha: float = 1.0,
) -> DataFrame:
    """REAL trained weights for :func:`linear_text_classifier`:
    multinomial naive-Bayes log-count-ratios (the NBSVM "r" vector, Wang
    & Manning 2012) over hashed-bigram cells —

        weight(cell) = ln((c_pos+a)/(n_pos+aB)) - ln((c_neg+a)/(n_neg+aB))

    The closed form makes training ONE aggregation per class (map-side
    partials, each output at most ``buckets`` rows): deterministic — no
    SGD order dependence, identical trajectories on any engine or cluster
    size — yet a genuine trained linear model of the corpus, not seeded
    toy weights. Scoring rides the unchanged broadcast (cell, weight)
    plan, so swapping in offline fastText weights later is a table swap.
    Weights round to 6 decimals (the repo's cross-engine float
    discipline). Recommended ``bias``: ln(n_pos_docs / n_neg_docs)."""
    pc = _cell_counts(
        hashed_gram_cells(pos, id_col, text_col, buckets).select("cell"), "c_pos"
    )
    nc = _cell_counts(
        hashed_gram_cells(neg, id_col, text_col, buckets).select("cell"), "c_neg"
    )
    model = pc.join(nc, "cell", "full_outer").select(
        "cell",
        F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
        F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
    )
    totals = model.agg(
        F.sum("c_pos").cast("double").alias("n_pos"),
        F.sum("c_neg").cast("double").alias("n_neg"),
    )
    b = float(buckets)
    return model.crossJoin(F.broadcast(totals)).select(
        "cell",
        F.round(
            F.log(
                (F.col("c_pos").cast("double") + F.lit(alpha))
                / (F.col("n_pos") + F.lit(alpha * b))
            )
            - F.log(
                (F.col("c_neg").cast("double") + F.lit(alpha))
                / (F.col("n_neg") + F.lit(alpha * b))
            ),
            6,
        ).alias("weight"),
    )


def linear_text_classifier(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10000,
    bias: float = 0.0,
) -> DataFrame:
    """fastText-style linear quality classifier scoring at corpus scale —
    the "looks like references / educational content" filter (LLaMA 1,
    FineWeb-Edu) applied map-side: a document's hashed-bigram cells probe
    a broadcast (cell, weight) table, the per-document logit is
    bias + sum(weights), and ``clf_prob`` is its sigmoid.

    Returns (id, clf_n_grams, clf_logit, clf_prob); documents with no
    bigrams keep their row with NULL scores. Weights come from
    :func:`train_nb_weights` (the in-repo deterministic trainer) or any
    offline trainer (fastText, sklearn) hashed into the same cells; the
    table is at most ``buckets`` rows, broadcast, so scoring shuffles
    nothing but the per-document aggregation."""
    cells = hashed_gram_cells(df, id_col, text_col, buckets)
    scored = cells.join(
        F.broadcast(weights.select("cell", "weight")), "cell", "left"
    ).select("id", F.coalesce("weight", F.lit(0.0)).alias("w"))
    logit = F.sum("w") + F.lit(bias)
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("clf_n_grams"),
        F.round(logit, 6).alias("clf_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("clf_prob"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("clf_n_grams", F.lit(0).cast("bigint")).alias(
                "clf_n_grams"
            ),
            "clf_logit",
            "clf_prob",
        )
    )
