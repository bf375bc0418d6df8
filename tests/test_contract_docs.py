"""Doc-rot guards: the coverage map and driver contract must stay in sync."""

from __future__ import annotations

import re


def test_coverage_md_query_names_exist():
    import __spark_entry__ as e

    qs = set(e.queries())
    text = open("COVERAGE.md").read()
    referenced = set(re.findall(r"(\w+) \[(?:sql|rows)\]", text))
    missing = referenced - qs
    assert not missing, f"COVERAGE.md references unknown queries: {sorted(missing)}"


def test_every_query_has_oracle_or_documented_rows_only():
    import __spark_entry__ as e

    qs, oracles = set(e.queries()), set(e.oracle_sql())
    assert not oracles - qs, f"oracles without queries: {sorted(oracles - qs)}"
    rows_only = qs - oracles
    # rows-only set is deliberate and small (UDF-byte-parity paths covered
    # by pytest); growing it silently weakens the driver's correctness gate
    assert rows_only <= {
        "extract_documents", "extract_chunks", "split_ssml",
        "validate_corpus", "srt_generate", "dup_sentences",
    }, f"unexpected rows-only queries: {sorted(rows_only)}"


def test_bench_queries_exist():
    import __spark_entry__ as e

    src = open("bench.py").read()
    listed = re.findall(r'^\s+"(\w+)",$', src.split("bench_queries = [")[1].split("]")[0], re.M)
    missing = set(listed) - set(e.queries())
    assert not missing, f"bench.py lists unknown queries: {sorted(missing)}"
