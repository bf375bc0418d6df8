"""ANN quality evidence: the approximate indexes must actually retrieve
neighbors, not just match their own oracle. Recall@10 vs brute-force cosine
on the driver-provided embeddings — multi-probe LSH and k-means IVF each
probe ~1/8 of the corpus, so recall well above that fraction demonstrates
the buckets carry signal. Thresholds are deliberately loose (deterministic
data, but the operators' geometry is axis-aligned): they catch a structural
regression (probe set wrong, centroids degenerate), not tuning drift."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


@pytest.fixture(scope="module")
def exact10(emb):
    from textractssmlprocessor_spark.operators.similarity import cosine_topk

    return set(_ids(cosine_topk(emb, query_id=0, k=10)))


def test_lsh_recall_beats_scan_fraction(emb, exact10):
    from textractssmlprocessor_spark.operators.similarity import ann_lsh_topk

    got = set(_ids(ann_lsh_topk(emb, query_id=0, k=10)))
    recall = len(got & exact10) / 10
    # multi-probe scans ~9/256 of buckets (~3.5% of corpus); random chance
    # of hitting a true neighbor would be ~0.035
    assert recall >= 0.3, f"LSH recall@10 = {recall}"


def test_ivf_recall_beats_scan_fraction(emb, exact10):
    from textractssmlprocessor_spark.operators.similarity import ann_ivf_topk

    got = set(_ids(ann_ivf_topk(emb, query_id=0, k=10, n_cells=8)))
    recall = len(got & exact10) / 10
    # one of 8 cells probed (~12.5% of corpus)
    assert recall >= 0.3, f"IVF recall@10 = {recall}"


def test_kmeans_improves_or_matches_seed_centroids(emb, exact10):
    """The trained index must not retrieve WORSE than the degenerate
    first-k-seed layout it replaced."""
    from textractssmlprocessor_spark.operators.similarity import ann_ivf_topk

    trained = set(_ids(ann_ivf_topk(emb, query_id=0, k=10, n_cells=8)))
    seeds = set(_ids(ann_ivf_topk(emb, query_id=0, k=10, n_cells=8, train_iters=0)))
    assert len(trained & exact10) >= len(seeds & exact10)
