"""Generate fixture-golden parquet oracles for the UDF-backed queries.

Usage: python tools/make_goldens.py [sf_dir ...]
(default: /root/testdata/sf0.001 /root/testdata/sf0.01)

For each scale factor, reads documents.parquet, mirrors the deterministic
page decoration (corpus.pages_from_documents) in pure Python — asserting
byte equality against the Spark generator once, so the mirror can never
drift silently — then computes expected outputs with tools/golden_oracle.py
(no Spark in the computation path) and writes them to
``goldens/<sfname>/<query>.parquet`` with dtypes matching the Spark query
outputs. ``oracle_sql()`` serves them to DuckDB via read_parquet.

Deterministic: same input parquet -> byte-identical goldens.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import golden_oracle as G  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def decorate_py(text: str, doc_id: int) -> str:
    """Pure-Python mirror of corpus._decorate (kept in lockstep by the
    assertion in main())."""
    case = doc_id % 8
    title = f"Section {doc_id % 97}"
    if case == 0:
        return (
            f"<h4>{title}</h4><p>{text}</p><em>{text[:120]}</em>"
            "<strong>Attribution</strong>"
        )
    if case == 1:
        return (
            f"<p>{text}</p><em>brief quote</em>"
            "<strong>dropped cite</strong><p>tail text.</p>"
        )
    if case == 2:
        return f"CHAPTER HEADING\n{text}\nTHE RUNNING HEAD\nfinal line."
    if case == 3:
        return f"intro [Note: drop [nested [deep]]] {text} outro [stray bracket]"
    if case == 4:
        return f"<p>Fish &amp; chips &#8217; {text}</p>"
    return text


def pages_py(docs: list[dict]) -> list[tuple[str, str, str]]:
    """documents rows -> (url, payload, lang), mirroring pages_from_documents
    + the extract operators' payload coalesce (html decoded else text)."""
    out = []
    for d in docs:
        if d["text"] is None:
            continue  # both html and text end up NULL -> filtered by extract
        url = f"https://{d['source']}.example.org/doc/{d['doc_id']}"
        out.append((url, decorate_py(d["text"], d["doc_id"]), d["lang"]))
    return out


def _write(sf_name: str, query: str, rows: list[dict], schema: pa.schema) -> None:
    out_dir = os.path.join(REPO, "goldens", sf_name)
    os.makedirs(out_dir, exist_ok=True)
    cols = {
        f.name: [r[f.name] for r in rows] for f in schema
    }
    table = pa.Table.from_pydict(cols, schema=schema)
    path = os.path.join(out_dir, f"{query}.parquet")
    pq.write_table(table, path)
    print(f"  {query}: {len(rows)} rows -> {path}")


S = pa.string()
I32 = pa.int32()

SCHEMAS = {
    "extract_documents": pa.schema(
        [("url", S), ("lang", S), ("extracted_text", S)]
    ),
    "extract_chunks": pa.schema(
        [("url", S), ("chunk_number", I32), ("extracted_text", S),
         ("ssml", S), ("spans", S)]
    ),
    "split_ssml": pa.schema(
        [("url", S), ("chunk_number", I32), ("part_number", I32),
         ("ssml_part", S)]
    ),
    "validate_corpus": pa.schema(
        [("url", S), ("chunk_number", I32), ("rule", S), ("message", S)]
    ),
    "dup_sentences": pa.schema(
        [("url", S), ("chunk_number", I32), ("rule", S), ("message", S)]
    ),
    "srt_generate": pa.schema([("url", S), ("srt", S)]),
    "dedup_sentences_corpus": pa.schema(
        [("url", S), ("chunk_number", I32), ("ssml", S)]
    ),
    "srt_variants": pa.schema(
        [("url", S), ("english_original", S), ("english_shorter", S),
         ("latin_original", S), ("latin_shorter", S)]
    ),
}


def assert_mirror_matches_spark(sf_dir: str, mirrored) -> None:
    """One-time lockstep check: the Python page mirror must byte-match the
    Spark corpus generator for this input."""
    from pyspark.sql import functions as F

    from textractssmlprocessor_spark.corpus import pages_from_documents
    from textractssmlprocessor_spark.session import get_spark

    spark = get_spark(app_name="goldens-check", cores=8, shuffle_partitions=8)
    rows = (
        pages_from_documents(spark, sf_dir)
        .filter(F.col("html").isNotNull() | F.col("text").isNotNull())
        .select(
            "url",
            F.coalesce(
                F.make_valid_utf8(F.col("html").cast("string")), F.col("text")
            ).alias("payload"),
            "lang",
        )
        .collect()
    )
    spark_pages = sorted((r["url"], r["payload"], r["lang"]) for r in rows)
    assert spark_pages == sorted(mirrored), (
        f"page mirror drifted from corpus.pages_from_documents at {sf_dir}"
    )


def main() -> None:
    import duckdb

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for sf_dir in sf_dirs:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        print(f"{sf_name}:")
        docs = (
            duckdb.sql(
                "SELECT doc_id, text, lang, source FROM "
                f"'{sf_dir}/documents.parquet' ORDER BY doc_id"
            )
            .df()
            .to_dict("records")
        )
        pages = pages_py(docs)
        assert_mirror_matches_spark(sf_dir, pages)

        chunk_rows = G.extract_chunks_rows(pages)
        _write(sf_name, "extract_documents", G.extract_documents_rows(pages),
               SCHEMAS["extract_documents"])
        _write(sf_name, "extract_chunks", chunk_rows, SCHEMAS["extract_chunks"])
        _write(sf_name, "split_ssml", G.split_ssml_rows(chunk_rows),
               SCHEMAS["split_ssml"])
        _write(
            sf_name, "validate_corpus",
            G.validate_rows(
                [(r["url"], r["chunk_number"], r["ssml"]) for r in chunk_rows]
            ),
            SCHEMAS["validate_corpus"],
        )
        _write(sf_name, "srt_generate", G.srt_rows(chunk_rows),
               SCHEMAS["srt_generate"])
        _write(sf_name, "srt_variants", G.srt_variant_rows(chunk_rows),
               SCHEMAS["srt_variants"])

        sentinel = "A repeated sentinel sentence. Unique tail."
        dup_input = [
            (
                f"doc://{d['doc_id']}",
                1,
                sentinel if d["doc_id"] % 8 == 0 else d["text"],
            )
            for d in docs
        ]
        _write(sf_name, "dup_sentences", G.duplicates_rows(dup_input),
               SCHEMAS["dup_sentences"])
        _write(sf_name, "dedup_sentences_corpus",
               G.drop_duplicate_sentences_rows(dup_input),
               SCHEMAS["dedup_sentences_corpus"])


if __name__ == "__main__":
    main()
