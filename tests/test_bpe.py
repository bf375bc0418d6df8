"""Real merges-table BPE (operators/textstats.py): training determinism,
apply-algorithm parity vs an independent sequential reference, and the
distinct-word Spark formulation (Python only ever sees the vocabulary)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.textstats import (
    bpe_piece_count,
    count_tokens_bpe,
    train_bpe_merges,
)


def _apply_merges_sequential(word: str, merges) -> list[str]:
    """Independent reference: apply the merge list IN TRAINING ORDER, each
    exhaustively (subword-nmt's apply). Equivalent to greedy
    lowest-rank-first because a merge can only create symbols that feed
    LATER-trained merges — so agreement here checks the greedy
    implementation's rank handling, not a shared code path."""
    pieces = list(word) + ["</w>"]
    for left, right in merges:
        out, i = [], 0
        while i < len(pieces):
            if i + 1 < len(pieces) and pieces[i] == left and pieces[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(pieces[i])
                i += 1
        pieces = out
    return pieces


def _ref_count(word: str, merges) -> int:
    pieces = _apply_merges_sequential(word, merges)
    return len(pieces) - (1 if pieces[-1] == "</w>" else 0)


CORPUS = [
    "the cathedral weathered the weather in the north",
    "weathering northern weather makes northern cathedrals weathered",
    "the theory of the northern weather is the theory of thermals",
    "thermal northern mornings, the weather 123 !! cooling",
]


def test_train_merges_deterministic_and_useful(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id bigint, text string")
    m1 = train_bpe_merges(df, n_merges=40)
    m2 = train_bpe_merges(df, n_merges=40)
    assert m1 == m2 and len(m1) == 40
    # 'the' is the dominant word: its full merge chain must appear, so the
    # trained tokenizer spends 1 piece on it, not 3
    ranks = {p: i for i, p in enumerate(m1)}
    assert bpe_piece_count("the", ranks) == 1
    # rarer structure still splits: an unseen word falls back toward chars
    assert bpe_piece_count("zyxw", ranks) == 4


def test_piece_count_matches_sequential_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id bigint, text string")
    merges = train_bpe_merges(df, n_merges=60)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = sorted({w for t in CORPUS for w in re.findall("[a-z]+", t.lower())})
    vocab += ["unseen", "weatherproofing", "a", "zz"]
    for w in vocab:
        assert bpe_piece_count(w, ranks) == _ref_count(w, merges), w


def test_count_tokens_bpe_spark_vs_python(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS)] + [
        (90, ""), (91, "12345 ... ok"), (92, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = train_bpe_merges(df, n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}

    def py_count(t):
        if t is None:
            return 0
        alpha = sum(
            bpe_piece_count(w.lower(), ranks) for w in re.findall("[A-Za-z]+", t)
        )
        other = len(re.findall(r"[0-9]+|[^A-Za-z0-9\s]", t))
        return alpha + other

    got = {r["id"]: r["n_tokens_bpe"] for r in count_tokens_bpe(df, merges).collect()}
    assert len(got) == len(rows)
    for i, t in rows:
        assert got[i] == py_count(t), (i, t)
    # pretok is the documented upper-bound-ish proxy: BPE >= pretok on
    # alpha text only when words split; 'the'-heavy text compresses to
    # close to the pretok count
    assert got[0] >= 1


def test_count_tokens_bpe_plan_shape(spark):
    """The Python (Arrow) node must sit above the DISTINCT word table,
    never the corpus: exactly one ArrowEvalPython in the plan, with an
    Aggregate (the distinct) below it feeding vocabulary rows."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id bigint, text string")
    merges = train_bpe_merges(df, n_merges=10)
    plan = count_tokens_bpe(df, merges)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    below = plan[plan.index("ArrowEvalPython"):]
    assert "Aggregate" in below, plan  # the distinct feeds the UDF
