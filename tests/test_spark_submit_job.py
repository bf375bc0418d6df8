"""North-rule deployment shape, actually executed: `spark-submit --py-files
<package zip> extract_job.py` in a FRESH JVM, with the job file copied
OUTSIDE the repo so only the zip provides the package (the real cluster
layout — driver and python workers must both resolve the package from the
distributed zip, the exact path where worker-PYTHONPATH bugs hide)."""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_zip(dest: str) -> str:
    zpath = os.path.join(dest, "textractssmlprocessor_spark.zip")
    pkg = os.path.join(REPO, "textractssmlprocessor_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _spark_submit_path() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    python = shutil.which("python")
    assert python, "neither spark-submit nor python found on PATH"
    return os.path.join(os.path.dirname(python), "spark-submit")


def _clean_env() -> dict:
    """Environment without PYTHONPATH: the job must resolve the package
    from the distributed zip alone (the real cluster layout)."""
    return {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from textractssmlprocessor_spark.corpus import pages_from_documents
    from textractssmlprocessor_spark.operators.extract import extract_chunks

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").limit(60)
    input_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(input_path)
    expected = {
        (r["url"], r["chunk_number"]): (r["extracted_text"], r["ssml"])
        for r in extract_chunks(spark.read.parquet(input_path), num_partitions=4).collect()
    }

    stage = tmp_path / "deploy"
    stage.mkdir()
    zpath = _package_zip(str(stage))
    job = str(stage / "extract_job.py")
    shutil.copy(
        os.path.join(REPO, "textractssmlprocessor_spark", "jobs", "extract_job.py"),
        job,
    )
    out = str(tmp_path / "chunks")
    lin = str(tmp_path / "lineage")
    spark_submit = _spark_submit_path()
    env = _clean_env()
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            job,
            "--input", input_path,
            "--output", out,
            "--lineage", lin,
            "--buckets", "4",
            "--partitions", "8",
        ],
        cwd=str(stage),  # NOT the repo root: the zip must provide the package
        env=env,
        capture_output=True,
        text=True,
        timeout=360,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "extract_run metrics:" in proc.stdout
    assert "'n_chunks':" in proc.stdout  # observed during the write action

    got = {
        (r["url"], r["chunk_number"]): (r["extracted_text"], r["ssml"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected
    # lineage recorded every bucket as done
    done = spark.read.parquet(lin).select("bucket").distinct().count()
    assert done == 4


def test_spark_submit_stream_job_end_to_end(spark, tmp_path):
    """The streaming entrypoint in the same fresh-JVM deployment shape:
    drain a landing-dir drop into a snapshot table, then a SECOND run
    with a new drop — the checkpoint skips the drained batch and the
    table gains exactly one version per run."""
    from textractssmlprocessor_spark import snapshots as snap
    from textractssmlprocessor_spark.corpus import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    land = str(tmp_path / "landing")
    # materialize the two drops up front (limit() is not deterministic
    # across re-evaluations); expectations come from the landing files
    pages.limit(25).coalesce(1).write.mode("append").parquet(land)
    drop1_urls = {
        r["url"] for r in spark.read.parquet(land).select("url").collect()
    }

    stage = tmp_path / "deploy"
    stage.mkdir()
    zpath = _package_zip(str(stage))
    job = str(stage / "stream_job.py")
    shutil.copy(
        os.path.join(REPO, "textractssmlprocessor_spark", "jobs", "stream_job.py"),
        job,
    )
    table = str(tmp_path / "chunk_table")
    ckpt = str(tmp_path / "ckpt")

    def run():
        return subprocess.run(
            [
                _spark_submit_path(),
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zpath,
                job,
                "--input", land,
                "--table", table,
                "--checkpoint", ckpt,
                "--partitions", "8",
            ],
            cwd=str(stage),
            env=_clean_env(),
            capture_output=True,
            text=True,
            timeout=360,
        )

    proc = run()
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "snapshot version 1" in proc.stdout
    v1_urls = {
        r["url"] for r in snap.read_snapshot(spark, table).select("url").collect()
    }
    assert v1_urls == drop1_urls

    # second drop, second run: only the new batch lands (one new version)
    existing = spark.read.parquet(land)
    pages.join(existing.select("url"), "url", "left_anti").limit(
        15
    ).coalesce(1).write.mode("append").parquet(land)
    landed_urls = {
        r["url"] for r in spark.read.parquet(land).select("url").collect()
    }
    proc2 = run()
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    assert snap.current_version(table) == 2
    all_urls = {
        r["url"] for r in snap.read_snapshot(spark, table).select("url").collect()
    }
    assert all_urls == landed_urls
    # incremental consumer sees exactly the second run's rows
    inc_urls = {
        r["url"]
        for r in snap.read_changes(spark, table, since_version=1)
        .select("url")
        .collect()
    }
    assert inc_urls == all_urls - v1_urls
