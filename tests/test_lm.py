"""CCNet-style n-gram LM scoring (operators/lm.py): model thresholds,
interpolated probabilities vs hand computation, totality, reference-corpus
training."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b c"),
            (3, "x"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )


def test_train_tables_thresholded(spark, tiny):
    from textractssmlprocessor_spark.operators.lm import train_ngram_lm

    vocab, bigrams = train_ngram_lm(tiny)
    v = {r["tok"]: r["c"] for r in vocab.collect()}
    # c and x appear once each -> below min_count=2
    assert v == {"a": 3, "b": 3}
    bg = {(r["w1"], r["w2"]): r["c12"] for r in bigrams.collect()}
    # (b,a) and (b,c) appear once; only (a,b) survives, both words in vocab
    assert bg == {("a", "b"): 3}


def test_perplexity_matches_hand_computation(spark, tiny):
    from textractssmlprocessor_spark.operators.lm import lm_perplexity

    rows = {r["id"]: r for r in lm_perplexity(tiny).collect()}
    # totality: every input row present, including NULL text and 1-token doc
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3]["lm_n_bigrams"] == 0 and rows[3]["lm_avg_logprob"] is None
    assert rows[4]["lm_n_bigrams"] == 0 and rows[4]["lm_oov_frac"] is None

    # model (see test above): vocab {a:3, b:3}, n_tok=6, V=2, bigram {(a,b):3}
    n_tok, v = 6.0, 2.0
    floor = 0.05 / (v + 1.0)
    p_ab = 0.7 * (3 / 3) + 0.25 * (3 / n_tok) + floor  # seen bigram
    p_oov_to_vocab = 0.25 * (3 / n_tok) + floor  # (b,a): unseen pair, b,a in vocab
    p_to_oov = floor  # (b,c): c not in vocab

    # doc 1: bigrams (a,b),(b,a),(a,b)
    exp1 = (2 * math.log(p_ab) + math.log(p_oov_to_vocab)) / 3
    assert rows[1]["lm_n_bigrams"] == 3
    assert rows[1]["lm_avg_logprob"] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert rows[1]["lm_oov_frac"] == pytest.approx(round(1 / 3, 6), abs=1e-6)

    # doc 2: bigrams (a,b),(b,c)
    exp2 = (math.log(p_ab) + math.log(p_to_oov)) / 2
    assert rows[2]["lm_n_bigrams"] == 2
    assert rows[2]["lm_avg_logprob"] == pytest.approx(round(exp2, 6), abs=1e-6)
    assert rows[2]["lm_oov_frac"] == pytest.approx(0.5, abs=1e-6)


def test_reference_corpus_training(spark, tiny):
    """CCNet trains on a fixed reference corpus (Wikipedia); train_df swaps
    the model without touching the scoring side."""
    from textractssmlprocessor_spark.operators.lm import lm_perplexity

    ref = spark.createDataFrame(
        [(100, "p q p q p q")], "doc_id bigint, text string"
    )
    rows = {r["id"]: r for r in lm_perplexity(tiny, train_df=ref).collect()}
    # every bigram of doc 1 is absent from the reference model
    assert rows[1]["lm_oov_frac"] == pytest.approx(1.0)
    # scores still defined (vocabulary floor keeps p > 0)
    assert rows[1]["lm_avg_logprob"] is not None


def test_tokenizer_is_ascii_alnum(spark):
    """Tokenizer must mean the same bytes in Java regex and RE2 (oracle
    portability): punctuation and unicode letters are delimiters."""
    from textractssmlprocessor_spark.operators.lm import tokens_column
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Don't stop—it's 42, café",)], "text string"
    ).select(tokens_column(F.col("text")).alias("t"))
    assert df.collect()[0]["t"] == ["don", "t", "stop", "it", "s", "42", "caf"]


def test_perplexity_buckets_terciles(spark):
    from textractssmlprocessor_spark.operators.lm import perplexity_buckets

    scored = spark.createDataFrame(
        [(i, float(-i)) for i in range(9)],  # scores 0..-8, higher = better
        "id bigint, lm_avg_logprob double",
    )
    got = {r["id"]: r["ppl_bucket"] for r in perplexity_buckets(scored).collect()}
    assert [got[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # boundary ties take the better bucket
    tied = spark.createDataFrame(
        [(0, -1.0), (1, -2.0), (2, -2.0), (3, -2.0), (4, -3.0), (5, -4.0)],
        "id bigint, lm_avg_logprob double",
    )
    g2 = {r["id"]: r["ppl_bucket"] for r in perplexity_buckets(tied).collect()}
    # k1 = 2 -> t1 = -2.0; k2 = 4 -> t2 = -2.0 too: every -2.0 takes the
    # better bucket and the middle band collapses (documented tie rule)
    assert g2[0] == "head" and g2[1] == g2[2] == g2[3] == "head"
    assert g2[4] == "tail" and g2[5] == "tail"
    # empty input: NULL labels, no crash
    empty = spark.createDataFrame([], "id bigint, lm_avg_logprob double")
    assert perplexity_buckets(empty).count() == 0


def test_threshold_fit_label_split_matches_composed(spark):
    """fit_perplexity_thresholds + label_perplexity_buckets must equal the
    composed perplexity_buckets byte-for-byte (the memoized replay path is
    the same scalars inlined), and the empty-sample edge stays NULL."""
    from textractssmlprocessor_spark.operators.lm import (
        fit_perplexity_thresholds,
        label_perplexity_buckets,
        perplexity_buckets,
    )

    scored = spark.createDataFrame(
        [(i, float(-i)) for i in range(30)], "id long, lm_avg_logprob double"
    )
    th = fit_perplexity_thresholds(scored)
    assert th is not None
    split = {
        r["id"]: r["ppl_bucket"]
        for r in label_perplexity_buckets(scored, th).collect()
    }
    composed = {
        r["id"]: r["ppl_bucket"] for r in perplexity_buckets(scored).collect()
    }
    assert split == composed
    assert set(split.values()) == {"head", "middle", "tail"}

    empty = scored.filter("id < 0")
    assert fit_perplexity_thresholds(empty) is None
    labeled = label_perplexity_buckets(empty, None)
    assert labeled.columns[-1] == "ppl_bucket"
