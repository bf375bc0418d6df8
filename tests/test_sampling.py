"""Deterministic hash-split / subsample operator (operators/sampling.py).

The contract these tests pin down: assignment depends ONLY on (salt, id) —
never on partition layout — splits are total and disjoint, and a smaller
sample fraction under the same salt selects a strict subset (nested
subsamples for scaling-law runs).
"""

import pytest
from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.sampling import (
    hash_bucket,
    sample_fraction,
    split_assign,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )


def test_split_total_and_disjoint(ids):
    out = split_assign(ids).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # total: every row gets exactly one label
    # fractions roughly honored (hash is uniform; 2000 rows, loose bounds)
    assert counts["train"] > 1600
    assert counts["val"] + counts["test"] < 400


def test_split_invariant_under_partitioning(ids):
    a = split_assign(ids).collect()
    b = split_assign(ids.repartition(13, "doc_id")).collect()
    assert {(r["doc_id"], r["split"]) for r in a} == {
        (r["doc_id"], r["split"]) for r in b
    }


def test_split_changes_with_salt(ids):
    a = {(r["doc_id"], r["split"]) for r in split_assign(ids, salt="v1").collect()}
    b = {(r["doc_id"], r["split"]) for r in split_assign(ids, salt="v2").collect()}
    assert a != b


def test_split_matches_python_md5(ids):
    """Row-for-row agreement with a plain-Python md5 reimplementation — the
    same computation the DuckDB oracle replays in q_doc_stats."""
    import hashlib

    for r in split_assign(ids, salt="v1").limit(64).collect():
        bucket = int(hashlib.md5(("v1" + r["doc_id"]).encode()).hexdigest()[:8], 16) % 10000
        want = "train" if bucket < 9000 else ("val" if bucket < 9500 else "test")
        assert r["split"] == want, r["doc_id"]


def test_sample_fraction_nested(ids):
    small = {r["doc_id"] for r in sample_fraction(ids, 0.1).collect()}
    big = {r["doc_id"] for r in sample_fraction(ids, 0.3).collect()}
    assert small <= big
    assert 100 < len(small) < 300 and 400 < len(big) < 800
    assert len({r["doc_id"] for r in sample_fraction(ids, 0.0).collect()}) == 0
    assert len({r["doc_id"] for r in sample_fraction(ids, 1.0).collect()}) == 2000


def test_split_single_and_validation(ids):
    only = split_assign(ids, splits={"all": 1.0}).select("split").distinct().collect()
    assert [r["split"] for r in only] == ["all"]
    with pytest.raises(ValueError):
        split_assign(ids, splits={})
    with pytest.raises(ValueError):
        split_assign(ids, splits={"a": -0.1, "b": 1.1})
    with pytest.raises(ValueError):
        sample_fraction(ids, 1.5)


def test_hash_bucket_range(ids):
    mm = ids.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] < 10000


# --- Bloom-gated dedup-against-history (operators/delta.py) -----------------


def test_bloom_gate_matches_exact_anti_join(spark):
    from textractssmlprocessor_spark.operators.delta import (
        new_against_history,
        new_against_history_bloom,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(200)],
        "doc_id bigint, text string",
    )
    history_src = docs.filter(F.col("doc_id") % 3 == 0)
    from textractssmlprocessor_spark.operators.textstats import fingerprint

    history = history_src.select(fingerprint(F.col("text")).alias("fingerprint"))
    exact = {r["doc_id"] for r in new_against_history(docs, history).collect()}
    # tiny m forces real false positives through the verify join; result
    # must still be EXACT (no false negatives by Bloom construction)
    for m_bits, k in [(1 << 8, 2), (1 << 12, 3), (1 << 20, 4)]:
        got = {
            r["doc_id"]
            for r in new_against_history_bloom(
                docs, history, m_bits=m_bits, k=k
            ).collect()
        }
        assert got == exact, (m_bits, k)


def test_bloom_bitmap_is_set_function(spark):
    """Bitmap depends only on the fingerprint SET: duplicates and order
    must not change any word."""
    from textractssmlprocessor_spark.operators.delta import bloom_bitmap

    fps = spark.createDataFrame(
        [(f"fp{i:03d}",) for i in range(50)], "fingerprint string"
    )
    dup_shuffled = fps.unionByName(fps).orderBy(F.rand(seed=7))
    a = {(r["word_idx"], r["bits"]) for r in bloom_bitmap(fps, 1 << 10, 3).collect()}
    b = {
        (r["word_idx"], r["bits"])
        for r in bloom_bitmap(dup_shuffled, 1 << 10, 3).collect()
    }
    assert a == b


def test_split_assign_on_fingerprint_is_leakage_safe(spark):
    """Keying the split on the content fingerprint co-locates exact
    duplicates in one split; keying on row id does not (for some pair)."""
    from textractssmlprocessor_spark.operators.sampling import split_assign
    from textractssmlprocessor_spark.operators.textstats import fingerprint

    docs = spark.createDataFrame(
        [(i, f"shared body {i % 25}") for i in range(200)],
        "doc_id bigint, text string",
    ).withColumn("fp", fingerprint(F.col("text")))
    by_fp = split_assign(docs, id_col="fp").collect()
    groups = {}
    for r in by_fp:
        groups.setdefault(r["fp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in groups.values())
    by_id = split_assign(docs, id_col="doc_id").collect()
    id_groups = {}
    for r in by_id:
        id_groups.setdefault(r["fp"], set()).add(r["split"])
    assert any(len(s) > 1 for s in id_groups.values())


def test_temperature_mixture_rates(spark):
    from textractssmlprocessor_spark.operators.sampling import (
        subsample_by_group,
        temperature_mixture_rates,
    )

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id bigint, source string",
    )
    # alpha=0.5: small source keeps everything (cap), big source downsamples
    rates = temperature_mixture_rates(docs, alpha=0.5)
    assert rates["small"] == 1.0 and 0.0 < rates["big"] < 1.0
    # kept proportions approach the w_g/wsum targets
    import math

    w_big, w_small = math.sqrt(900), math.sqrt(100)
    expect_big_share = w_big / (w_big + w_small)
    kept_big = 900 * rates["big"]
    kept_small = 100 * rates["small"]
    assert abs(kept_big / (kept_big + kept_small) - expect_big_share) < 1e-9
    # alpha=1.0 is natural proportions: every rate identical (and capped 1.0)
    nat = temperature_mixture_rates(docs, alpha=1.0)
    assert nat["big"] == nat["small"] == 1.0
    # rates feed subsample_by_group directly; kept counts land near target
    kept = subsample_by_group(docs, rates, group_col="source").filter("keep").count()
    assert abs(kept - (kept_big + kept_small)) < 60


def test_epoch_shuffle_reproducible_total_order(spark):
    """epoch_shuffle: a total contiguous 1..N order that depends only on
    (salt, epoch, id) — invariant under repartitioning, different across
    epochs, replayable from the pure formula."""
    import hashlib

    from textractssmlprocessor_spark.operators.sampling import epoch_shuffle

    ids = list(range(200))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")

    got = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs, epoch=3).collect()
    }
    # total contiguous order
    assert sorted(got.values()) == list(range(1, 201))
    # pure replay: rank of md5('v1|3|id')
    expect = {
        i: r + 1
        for r, i in enumerate(
            sorted(ids, key=lambda i: hashlib.md5(f"v1|3|{i}".encode()).hexdigest())
        )
    }
    assert got == expect
    # partition-layout invariance (the df.sample()/rand() failure mode)
    re = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs.repartition(17), epoch=3).collect()
    }
    assert re == got
    # epochs give different orders
    other = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs, epoch=4).collect()
    }
    assert other != got and sorted(other.values()) == list(range(1, 201))


def test_temperature_target_total_zero_means_zero(spark):
    from textractssmlprocessor_spark.operators.sampling import (
        temperature_mixture_rates,
    )

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        "doc_id bigint, source string",
    )
    # 0.0 is a real target (keep nothing), not "no target given"
    rates = temperature_mixture_rates(docs, alpha=0.5, target_total=0.0)
    assert rates and all(v == 0.0 for v in rates.values())


def test_subsample_by_group_null_group_key(spark):
    """NULL group values must take their OWN rate (eqNullSafe), not fall
    through to `default` — temperature_mixture_rates keys them as None."""
    from textractssmlprocessor_spark.operators.sampling import (
        subsample_by_group,
        temperature_mixture_rates,
    )

    docs = spark.createDataFrame(
        [(i, None if i % 2 else "a") for i in range(200)],
        "doc_id bigint, source string",
    )
    rates = temperature_mixture_rates(docs, alpha=0.5)
    assert None in rates
    out = subsample_by_group(docs, {None: 0.0, "a": 1.0}, group_col="source")
    kept = out.filter("keep")
    assert kept.filter(F.col("source").isNull()).count() == 0
    assert kept.filter(F.col("source") == "a").count() == 100


def test_split_assign_rejects_all_zero_weights(ids):
    with pytest.raises(ValueError, match="sum to 0"):
        split_assign(ids, splits={"train": 0.0, "test": 0.0})
