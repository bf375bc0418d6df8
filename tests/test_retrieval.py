"""Lexical retrieval: term_frequencies / inverted_index / BM25 (single +
batch) against an independent pure-Python BM25, plus corpus heavy
hitters. The contract-level oracle lives in __spark_entry__ (ann_topk's
bm25 branch, corpus_report's top_term columns); these tests pin the
operator semantics directly on seeded corpora."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles the quick data across the cluster"),
    (2, "a lazy dog sleeps; the dog dreams of foxes"),
    (3, "BM25 ranks Spark documents by term frequency"),
    (4, "completely unrelated text about gardening tulips"),
    (5, ""),  # empty doc: 0 tokens, must not break avgdl or scoring
]


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]


def _bm25_py(corpus, query, k1=1.2, b=0.75):
    """Independent reference: dict-and-loop BM25 (Lucene idf)."""
    docs = {i: _toks(t) for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    qterms = sorted(set(_toks(query)))
    df = {
        t: sum(1 for v in docs.values() if t in v) for t in qterms
    }
    scores = {}
    for i, toks in docs.items():
        s = 0.0
        for t in qterms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return scores


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string").cache()


def test_term_frequencies(corpus):
    from textractssmlprocessor_spark.operators.retrieval import term_frequencies

    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_frequencies(corpus).collect()
    }
    assert rows[(0, "the")] == (2, 9)
    assert rows[(2, "dog")] == (2, 9)
    assert rows[(3, "bm25")] == (1, 7)
    assert not any(doc_id == 5 for doc_id, _ in rows)  # empty doc: no terms


def test_inverted_index_postings_sorted_and_df(corpus):
    from textractssmlprocessor_spark.operators.retrieval import inverted_index

    idx = {r["term"]: r for r in inverted_index(corpus).collect()}
    dog = idx["dog"]
    assert dog["df"] == 2
    assert [(p["doc_id"], p["tf"]) for p in dog["postings"]] == [(0, 1), (2, 2)]
    assert idx["the"]["df"] == 3


def test_inverted_index_df_caps(corpus):
    from textractssmlprocessor_spark.operators.retrieval import inverted_index

    # max_df_frac: 'the' appears in 3/6 docs -> dropped at 0.4, kept at 0.5
    terms_capped = {r["term"] for r in inverted_index(corpus, max_df_frac=0.4).collect()}
    assert "the" not in terms_capped and "dog" in terms_capped
    # min_df: hapaxes die
    terms_min2 = {r["term"] for r in inverted_index(corpus, min_df=2).collect()}
    assert "tulips" not in terms_min2 and "dog" in terms_min2


def test_bm25_topk_matches_pure_python(corpus):
    from textractssmlprocessor_spark.operators.retrieval import bm25_topk

    query = "lazy dog spark"
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(corpus, query, k=10).collect()]
    ref = _bm25_py(CORPUS, query)
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [i for i, _ in got] == [i for i, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert a == pytest.approx(b, abs=2e-6)


def test_bm25_topk_empty_and_unmatched_query(corpus):
    from textractssmlprocessor_spark.operators.retrieval import bm25_topk

    assert bm25_topk(corpus, "", k=5).count() == 0
    assert bm25_topk(corpus, "zzzqqq", k=5).count() == 0


def test_bm25_knn_join_matches_single(corpus, spark):
    from textractssmlprocessor_spark.operators.retrieval import (
        bm25_knn_join,
        bm25_topk,
    )

    queries = spark.createDataFrame(
        [(0, "lazy dog spark"), (1, "gardening tulips")],
        "q_id bigint, text string",
    )
    batch = bm25_knn_join(corpus, queries, k=3).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["q_id"], []).append((r["doc_id"], r["score"]))
    for q_id, qtext in [(0, "lazy dog spark"), (1, "gardening tulips")]:
        single = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(corpus, qtext, k=3).collect()
        ]
        assert sorted(by_q[q_id], key=lambda t: (-t[1], t[0])) == single


def test_top_ngrams_heavy_hitters(corpus):
    from textractssmlprocessor_spark.operators.textstats import top_ngrams

    uni = [(r["gram"], r["n_occurrences"]) for r in top_ngrams(corpus, n=1, k=3).collect()]
    assert uni[0] == ("the", 5)
    # result is ordered: count desc, then gram asc on ties (total order)
    keys = [(-c, g) for g, c in uni]
    assert keys == sorted(keys)
    # bigrams: 'lazy dog' and 'the quick' both occur twice; the tie breaks
    # on ascending gram, so 'lazy dog' leads
    bi = [(r["gram"], r["n_occurrences"]) for r in top_ngrams(corpus, n=2, k=2).collect()]
    assert bi == [("lazy dog", 2), ("the quick", 2)]


# --- property: BM25 vs the pure-Python reference on random corpora ----------

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=12, deadline=None)  # each example runs a Spark job
@given(
    texts=st.lists(_doc, min_size=2, max_size=8),
    query=st.lists(_words, min_size=1, max_size=3).map(" ".join),
)
def test_bm25_property_matches_reference(spark, texts, query):
    from textractssmlprocessor_spark.operators.retrieval import bm25_topk

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(df, query, k=20).collect()]
    ref = _bm25_py(corpus, query)
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [i for i, _ in got] == [i for i, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert a == pytest.approx(b, abs=2e-6)


def test_bm25_empty_query_keeps_id_type(spark):
    """The empty-query frame must derive doc_id's type from the input: a
    hardcoded bigint schema makes the result schema depend on query
    content for string-id corpora (unions break only on this edge)."""
    from textractssmlprocessor_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [("u1", "alpha beta"), ("u2", "beta gamma")], "doc_id string, text string"
    )
    empty = bm25_topk(df, "!!!", id_col="doc_id")
    assert empty.count() == 0
    assert dict(empty.dtypes) == {"doc_id": "string", "score": "double"}
    nonempty = bm25_topk(df, "beta", id_col="doc_id")
    assert dict(nonempty.dtypes) == dict(empty.dtypes)
    # unionable across the edge
    assert nonempty.unionByName(empty).count() == nonempty.count()
