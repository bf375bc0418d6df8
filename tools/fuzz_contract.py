"""Differential fuzz of the dual-engine contract on randomized corpora.

The driver's gate (tools/check_correctness.py) proves Spark == DuckDB on
the FIXED testdata corpora. This tool re-proves it on seeded ADVERSARIAL
corpora — unicode edge classes, NULL/empty/whitespace mixes, exact and
near duplicates, mojibake, html-ish text, zero/NULL embedding vectors —
so an engine-semantics divergence (Java vs RE2 regex class, collation,
float formatting, three-valued logic) that the fixture corpus happens to
dodge still surfaces.

Scope: every queries() entry whose oracle is pure SQL. The eight
fixture-golden queries (extract_*/split_ssml/validate_corpus/srt_*/
dup_sentences/dedup_sentences_corpus) are excluded — their oracles are
precomputed parquet keyed to the testdata corpora; their pure functions
are covered by the reference-parity + hypothesis tiers instead.

Usage: python tools/fuzz_contract.py [seed] [n_docs]
Exit 0 iff every checked query matches.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UNICODE_BITS = [
    "café naïve",            # latin-1 accents
    "中文文档",        # CJK
    "العربية",  # Arabic (RTL)
    "Привет",        # Cyrillic
    "Café",                      # combining accent (NFD)
    "\U0001f600\U0001f680",            # astral emoji
    "​­﻿",              # invisibles
    "cafÃ© â€“",  # mojibake
    "–—‘’“”",  # smart punctuation
    # case-folding adversaries: Java toLowerCase vs utf8proc on the
    # classic divergence set (Turkish dotted/dotless I, Greek capital
    # sigma -> final sigma position rules, German sharp s)
    "İstanbul ISPARTA ılık",
    "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΥΣ",
    "STRASSE straße ß",
    # combining-char stack (Zalgo): multiple combining marks per base —
    # stresses \b, script classes, and grapheme-naive slicing
    "z̀́̂̃a̖̗̘l̙̚go",
    # bidi controls (RLO/LRO/PDF embedding marks) around ASCII
    "abc‮ DEF ‬‪ ghi ‬xyz",
    # fullwidth forms + NBSP/narrow-NBSP word separators
    "ＦＵＬＬＷＩＤＴＨ nbsp narrow",
    # astral beyond emoji: Deseret letters (cased astral script) + CJK-B
    "\U00010400\U00010428 \U00020000\U0002a700",
    # caps line carrying a SpecialCasing-upper char (ß): upper(x)==x is
    # TRUE in utf8proc (simple map keeps ß) but FALSE in Java (full map
    # expands ß -> SS) — probes the ASCII-anchored title predicates
    "STRASSE ß HEAD\nMIXED Straße Line\nbody text after.",
    # PII abutting non-ASCII word chars: Java's Unicode \b saw no boundary
    # between 中/combining-mark and a digit where RE2's ASCII \b did —
    # probes the boundary-free IPV4_RE
    "中10.0.0.1 mark̀127.0.0.1 v1.2.3.45 done",
]
ASCII_BITS = [
    "The quick brown fox jumps over the lazy dog.",
    "chapter one THE BEGINNING",
    "email me at a.b+c@example.org or call 555-123-4567",
    "visit https://example.org/path?q=1&utm_source=x#frag",
    "<h4>Heading</h4><p>para</p><em>emph</em>",
    "[note 12] (c) 2024 All rights reserved",
    "word " * 40,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "1 2 3 4 5 6 7 8 9 10",
    "x|y|z\tpipe\ttab",
    'quotes "double" \'single\' back\\slash',
    "",
    "   ",
    "\n\n\n",
    "line one\nline one\nline two\n",
    "crlf one.\r\ncrlf two.\r\n",        # CRLF endings (c4 '\r+$' strip)
    "supercalifragilistic" * 40,         # one 800-char token, no spaces
    "ALL CAPS TITLE LINE\nbody text follows here.",
    "- bullet one\n- bullet two\n* bullet three",
    "vt\x0bsep\x0bwords",                # \x0b: in Java \s, NOT in RE2 \s
    "form\x0cfeed here",                 # \f: in both engines' \s
    "nul\x00byte mid-string",            # NUL inside a valid UTF-8 string
    "ctrl\x01\x1f\x7fchars",             # C0/DEL controls
]


def _doc_text(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.06:
        return None
    if r < 0.10:
        return rng.choice(["", " ", "\n", "\t \n"])
    n = rng.randrange(1, 8)
    bits = [
        rng.choice(ASCII_BITS if rng.random() < 0.7 else UNICODE_BITS)
        for _ in range(n)
    ]
    sep = rng.choice([" ", "\n", ". ", "\n\n"])
    return sep.join(bits)


def make_corpus(base: str, seed: int, n_docs: int) -> None:
    import datetime

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(base, f"{name}.parquet"))

    # documents: adversarial text + exact duplicates + sparse huge ids
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for i in range(n_docs):
        did = i if rng.random() < 0.9 else (1 << 40) + i
        t = _doc_text(rng)
        if texts and rng.random() < 0.12:
            t = rng.choice(texts)  # exact duplicate of an earlier doc
        ids.append(did)
        texts.append(t)
        langs.append(rng.choice(["en", "de", "zh", "fr", None, "xx", ""]))
        # source stays IN the testdata domain ('srcN', non-NULL): it is a
        # SYNTHESIS column — contract queries build fixture urls/hosts/
        # robots policies from it, and the dual-engine constructions are
        # only specified over that domain (payload columns above are the
        # fuzzed surface). The one operator-level NULL-host hazard this
        # hid (robots parse NPE) is pinned by test_robots directly.
        sources.append(f"src{rng.randrange(20)}")
        nchars.append(len(t) if t is not None else None)
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(nchars, pa.int64()),
            }
        ),
    )

    # embeddings: unit-ish, zero, and NULL vectors (NaN is excluded:
    # cross-engine NaN aggregation parity is out of the contract; NaN
    # crash-safety is pinned by the similarity tests directly)
    vecs, vids, labels = [], [], []
    for i in range(max(64, n_docs // 2)):
        r = rng.random()
        if r < 0.05:
            v = None
        elif r < 0.10:
            v = [0.0] * 64
        else:
            v = [rng.uniform(-1, 1) for _ in range(64)]
        vecs.append(v)
        vids.append(i)
        labels.append(rng.randrange(8) if rng.random() < 0.9 else None)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )

    # events: bursty sessions + NULL payloads
    t0 = datetime.datetime(2024, 3, 1)
    eids, tss, uids, etypes, vals, props = [], [], [], [], [], []
    cur = t0
    for i in range(n_docs * 2):
        cur += datetime.timedelta(
            seconds=rng.choice([1, 5, 30, 120, 3600, 90000])
        )
        eids.append(i)
        tss.append(cur)
        uids.append(rng.randrange(max(2, n_docs // 20)))
        etypes.append(rng.choice(["view", "click", "buy", None]))
        vals.append(round(rng.uniform(0, 100), 3) if rng.random() < 0.9 else None)
        props.append(rng.choice(['{"a":1}', "", None]))
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(etypes, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
    )

    # TPC-H-ish dimension tables: small, valid, uninteresting (the
    # contract queries read documents/embeddings/events)
    write("region", pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                              "r_name": pa.array(["R0", "R1"])}))
    write("nation", pa.table({"n_nationkey": pa.array([0, 1], pa.int32()),
                              "n_name": pa.array(["N0", "N1"]),
                              "n_regionkey": pa.array([0, 1], pa.int32())}))
    write("customer", pa.table({
        "c_custkey": pa.array([0, 1], pa.int64()),
        "c_name": pa.array(["c0", None]),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_acctbal": pa.array([1.5, None], pa.float64()),
        "c_mktsegment": pa.array(["A", "B"]),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array([0], pa.int64()),
        "s_name": pa.array(["s0"]),
        "s_nationkey": pa.array([0], pa.int32()),
        "s_acctbal": pa.array([2.0], pa.float64()),
    }))
    write("part", pa.table({
        "p_partkey": pa.array([0], pa.int64()),
        "p_name": pa.array(["p0"]),
        "p_brand": pa.array(["b"]),
        "p_type": pa.array(["t"]),
        "p_size": pa.array([1], pa.int32()),
        "p_retailprice": pa.array([9.99], pa.float64()),
    }))
    write("orders", pa.table({
        "o_orderkey": pa.array([0], pa.int64()),
        "o_custkey": pa.array([0], pa.int64()),
        "o_orderstatus": pa.array(["O"]),
        "o_totalprice": pa.array([10.0], pa.float64()),
        "o_orderdate": pa.array([t0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"]),
    }))
    write("lineitem", pa.table({
        "l_orderkey": pa.array([0], pa.int64()),
        "l_partkey": pa.array([0], pa.int64()),
        "l_suppkey": pa.array([0], pa.int64()),
        "l_linenumber": pa.array([1], pa.int32()),
        "l_quantity": pa.array([1.0], pa.float64()),
        "l_extendedprice": pa.array([9.99], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
        "l_tax": pa.array([0.0], pa.float64()),
        "l_returnflag": pa.array(["N"]),
        "l_linestatus": pa.array(["O"]),
        "l_shipdate": pa.array([t0], pa.timestamp("us")),
    }))


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    sql_queries = sorted(
        k for k, v in oracles.items() if "goldens/" not in v
    )

    with tempfile.TemporaryDirectory(prefix="fuzz_sf_") as base:
        make_corpus(base, seed, n_docs)
        print(f"fuzz corpus: seed={seed} n_docs={n_docs} at {base}")
        print(f"checking {len(sql_queries)} SQL-oracle queries")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"),
             base, *sql_queries],
            cwd=REPO,
        )
        return r.returncode


if __name__ == "__main__":
    sys.exit(main())
