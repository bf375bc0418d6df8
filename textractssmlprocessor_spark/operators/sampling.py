"""Deterministic, engine-portable sampling and split assignment for corpus
curation: reproducible train/val/test splits and fractional subsampling
keyed on a stable id column.

Why not ``df.sample()``: Spark's sampler draws per-partition from a seeded
RNG, so the selected rows change with partition layout, AQE decisions, and
input file order — a re-run of the same pipeline on the same data can ship
a different training set. A hash split depends only on (salt, id): stable
across engines, reruns, partitionings, and cluster sizes, and any engine
can reproduce membership for audit (the DuckDB oracle does exactly that).

The key is the first 8 hex chars of md5(salt || id) — a uniform 32-bit
integer — taken modulo 10,000 fixed-width buckets; split fractions become
contiguous bucket ranges, so splits are disjoint and total by
construction. All map-side, codegen'd, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10000


def hash_bucket(col: Column, salt: str = "", buckets: int = _BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets): first 8 md5 hex chars
    of (salt || id) parsed as an integer, mod buckets. Engine-portable
    (md5 only — the repo's oracle-hash rule)."""
    key = F.md5(F.concat(F.lit(str(salt)), col.cast("string")))
    return F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint"), F.lit(buckets)
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Add a split-label column with the given fractions (insertion order
    fixes the bucket layout — document the dict order with the salt when
    publishing a split). Fractions are quantized to 1/10000; the LAST
    split absorbs rounding remainder so assignment is total.

    LEAKAGE-SAFE SPLITS: ``id_col`` is the unit of co-location, not
    necessarily the row id. Keying on the content fingerprint
    (textstats.fingerprint) puts every exact duplicate in the same
    split; keying on a near-dup cluster representative
    (graph.dedup_clusters' cluster_rep) puts whole near-dup clusters in
    the same split — the guard against train/test contamination that a
    row-id split silently lacks. Either way the assignment stays one
    map-side expression (the cluster_rep case pays dedup_clusters'
    join, which the caller already ran to get the column)."""
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not splits or any(w < 0 for w in splits.values()):
        raise ValueError("splits must be non-empty with non-negative weights")
    total = sum(splits.values())
    if total <= 0:
        raise ValueError(
            "splits weights sum to 0 — at least one must be positive"
        )
    b = hash_bucket(F.col(id_col), salt)
    names = list(splits)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        hi = int(round(acc / total * _BUCKETS))
        expr = (F.when if expr is None else expr.when)(b < hi, F.lit(name))
    label = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn(out_col, label)


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` subsample (quantized to 1/10000). The
    SAME (salt, fraction') with fraction' < fraction selects a SUBSET —
    nested subsamples for scaling-law runs come free from the bucket
    ordering."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    hi = int(round(fraction * _BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), salt) < hi)


def subsample_by_group(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default: float = 1.0,
    out_col: str = "keep",
) -> DataFrame:
    """Per-group deterministic subsampling — the mixture-reweighting
    primitive (Pile/Dolma-style source mixing): keep each row of group g
    with probability ``fractions.get(g, default)``, decided by the same
    engine-portable hash bucket as :func:`split_assign` so membership is
    stable across reruns, partitionings, and engines. Downsampling only
    (fractions > 1, i.e. upsampling/repetition, is a different operator —
    shard packing repeats sources explicitly). Adds a boolean ``out_col``;
    filter on it to materialize the mix. All map-side, zero shuffles."""
    if any(not (0.0 <= f <= 1.0) for f in fractions.values()) or not (
        0.0 <= default <= 1.0
    ):
        raise ValueError("fractions must be within [0, 1]")
    b = hash_bucket(F.col(id_col), salt)
    thresh = None
    for name, frac in fractions.items():
        hi = int(round(frac * _BUCKETS))
        # eqNullSafe: temperature_mixture_rates keys NULL groups as None,
        # and `col == None` is SQL NULL (never true) — a plain == would
        # silently route NULL-group rows to `default` instead of their
        # computed rate
        t = (F.when if thresh is None else thresh.when)(
            F.col(group_col).eqNullSafe(F.lit(name)), F.lit(hi)
        )
        thresh = t
    thresh = (
        F.lit(int(round(default * _BUCKETS)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default * _BUCKETS))))
    )
    return df.withColumn(out_col, b < thresh)


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    target_total: float | None = None,
) -> dict[str, float]:
    """Temperature-based source mixing (the mT5/Pile rule): sample source
    g proportionally to count(g)^alpha — alpha 1.0 keeps natural
    proportions, 0.0 uniformizes, the usual 0.2-0.7 lifts small
    high-quality sources without drowning in the big crawl. Returns
    {group: keep_fraction} ready for subsample_by_group; fractions are
    capped at 1.0 (sampling can only downsample — oversampling small
    sources is an epoch-repetition decision, not a filter).

    ``target_total`` is the desired fraction of the TOTAL corpus to keep
    (defaults to the largest value that needs no >1.0 rate). Driver-side
    by design: one groupBy(group) count lands #sources rows on the
    driver — the IVF-centroid/ppl-threshold precedent for inlining
    corpus-derived scalars into the plan."""
    rows = df.groupBy(group_col).count().collect()
    counts = {r[group_col]: r["count"] for r in rows}
    n = sum(counts.values())
    if n == 0:
        return {}
    weights = {g: c ** alpha for g, c in counts.items()}
    wsum = sum(weights.values())
    # keep_frac(g) = kept_total * (w_g / wsum) / count_g; the no-oversample
    # cap binds at the group with the largest w_g/count_g ratio
    max_ratio = max(weights[g] / counts[g] for g in counts)
    max_total = wsum / max_ratio / n
    # `is not None`, not truthiness: target_total=0.0 must mean "keep
    # nothing", not "no target given"
    total = (
        min(target_total, max_total) if target_total is not None else max_total
    )
    return {
        g: min(1.0, total * n * (weights[g] / wsum) / counts[g])
        for g in counts
    }


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    salt: str = "v1",
    out_col: str = "epoch_pos",
) -> DataFrame:
    """Reproducible global training order for one epoch: 1-based position
    ordered by md5(salt | epoch | id).

    Why not orderBy(rand(seed)): Spark's rand draws per-partition, so the
    order changes with partition layout and AQE decisions — a trainer
    cannot replay epoch 17 of a previous run after the input was
    compacted. This position depends ONLY on (salt, epoch, id) and corpus
    membership: stable across engines, partitionings, reruns, and cluster
    sizes; any engine can reproduce it for audit (the DuckDB oracle
    does). Different epochs give independent orders — epoch reshuffling
    without RNG state.

    No global window: the 16-bit key prefix buckets rows into 65536
    ordered blocks and ordering.blocked_row_number composes per-block
    row_number with exclusive cumulative block counts (prefix order is
    consistent with full-key order by construction). ``id_col``
    tie-breaks duplicate ids so the order stays total."""
    from .ordering import blocked_row_number

    key = F.md5(
        F.concat(F.lit(f"{salt}|{epoch}|"), F.col(id_col).cast("string"))
    )
    block = F.conv(F.substring(key, 1, 4), 16, 10).cast("bigint")
    return blocked_row_number(
        df.withColumn("_ekey", key),
        block,
        [F.col("_ekey"), F.col(id_col)],
        out=out_col,
    ).drop("_ekey")
