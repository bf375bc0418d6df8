"""Differential-fuzz regression gate: the dual-engine contract must hold
on a seeded adversarial corpus (unicode edge classes, NULL/empty text,
duplicates, NULL/zero embeddings), not just the fixture testdata. One
seed as a pytest gate; tools/fuzz_contract.py runs more seeds ad hoc.

This pinned the round-5 haul: 4 ANSI crash classes (divide-by-zero on
empty text, '' casts), the NOT-IN-NULL anti-join trap, DuckDB's -1.0
zero-norm cosine vs Spark's 0.0 guard, NULL vectors assigned to the last
k-means cell, crawl-delta presence-vs-digest confusion, format_string
rendering NULL as 'null', and the Java-vs-RE2 \\b word-count divergence.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fuzz_contract_seed1():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_contract.py"), "1", "120"],
        cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    tail = (r.stdout or "").strip().splitlines()[-1:]
    assert r.returncode == 0, f"fuzz contract failed: {tail}\n{r.stderr[-2000:]}"
