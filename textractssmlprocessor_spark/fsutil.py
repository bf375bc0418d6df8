"""Hadoop-FileSystem helpers for driver-side metadata checks.

Spark's readers/writers resolve paths through the Hadoop FileSystem API,
so a lineage table or dedup-history directory can live on any supported
store (file:, hdfs://, s3a://, gs://, abfs://...). Driver-side
existence/listing checks MUST go through the same API: `os.path` only
sees the driver's local disk, so on a real cluster an `os.path.exists`
guard on an `s3a://` lineage path silently reports "absent" — resume
state and dedup history vanish without an error (the exact
silent-wrong-at-scale failure the lineage/history designs exist to
prevent). These helpers resolve the filesystem FROM the path's scheme
via the session's Hadoop configuration, matching what the executors'
scans will see.

Cost note: each call is one namenode/object-store metadata RPC from the
driver — O(1) per call, O(children) for listings — the same class of
call Spark's own file-source listing performs; never used per-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists on ITS OWN filesystem (scheme-resolved)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Child basenames of a directory, [] if it doesn't exist. The
    Hadoop-API analogue of ``os.listdir`` minus the FileNotFoundError."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]
