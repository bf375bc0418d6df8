"""Write-audit-publish snapshot commits over plain parquet.

SURVEY §1.3/§4 target an Iceberg lakehouse; this sandbox has no catalog
jar, so jobs/iceberg.py ships the swap as deployment CONFIG. This module
closes the remaining semantic gap in code: the core transactional
behaviors Iceberg provides — atomic publish, snapshot-isolated readers,
idempotent re-commit, time travel, rollback, and snapshot expiry with
safe data-file GC — implemented over any POSIX-rename filesystem with
zero dependencies beyond Spark's parquet writer. It is the same commit
protocol Iceberg/Delta use at their core (immutable data files + an
atomically published manifest naming the live set), scoped to one table
and one manifest level.

Layout under a table root:

    <table>/data/<snapshot_id>/part-*.parquet   immutable data files
    <table>/_manifests/v%012d.json              one manifest per version

A manifest names the COMPLETE live file set for its version (relative
paths, so the table relocates with a plain copy), its parent version,
the op, and the Spark schema JSON (so an empty snapshot still reads with
the right schema). Version numbers are claimed atomically: the manifest
body is written to a private tmp file and ``os.link``ed to the version
path — link fails with EEXIST if a concurrent committer claimed the
version first, and the loser REBASES (recomputes the parent file set)
and retries at the next version. Readers resolve the latest (or a
pinned) version and read exactly the named files; a concurrent commit
can never change the file set under them because data files are
immutable and manifests are never rewritten.

Scale shape: commit cost is one manifest write — O(live files) JSON,
kilobytes-to-megabytes — independent of data volume; reads list files
from the manifest, never from a directory scan (the object-store
LIST-consistency trap this protocol exists to avoid). At real lakehouse
scale you would shard the manifest (Iceberg's manifest-list level); the
single-level variant here is honest about that bound in
``commit``'s docstring.

Idempotency contract: ``snapshot_id`` is the unit. A re-run of a failed
or duplicated job with the same snapshot_id either finds its manifest
already published (returns that version, writes nothing) or re-stages
its data dir with mode=overwrite (crash-before-publish leaves only an
orphaned staging dir, which the re-run reclaims in place).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR, "v%012d.json" % version)


def _versions(table: str) -> list[int]:
    mdir = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def current_version(table: str) -> int:
    """Latest committed version, 0 if the table has no snapshot yet."""
    vs = _versions(table)
    return vs[-1] if vs else 0


def _load_manifest(table: str, version: int) -> dict[str, Any]:
    with open(_manifest_path(table, version), encoding="utf-8") as f:
        return json.load(f)


def history(table: str) -> list[dict[str, Any]]:
    """All committed manifests, oldest first (time-travel index)."""
    return [_load_manifest(table, v) for v in _versions(table)]


def snapshot_files(table: str, version: int | None = None) -> list[str]:
    """Absolute data-file paths live at ``version`` (default: latest)."""
    v = current_version(table) if version is None else version
    if v == 0:
        raise ValueError(f"{table!r} has no committed snapshot")
    m = _load_manifest(table, v)
    return [os.path.join(table, rel) for rel in m["files"]]


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read: the file set is fixed by the manifest at
    plan time, so concurrent commits (including overwrites) cannot change
    or corrupt this DataFrame's data. ``version`` pins time travel."""
    v = current_version(table) if version is None else version
    if v == 0:
        raise ValueError(f"{table!r} has no committed snapshot")
    m = _load_manifest(table, v)
    schema = StructType.fromJson(json.loads(m["schema"]))
    files = [os.path.join(table, rel) for rel in m["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def _publish(table: str, manifest: dict[str, Any], snapshot_id: str) -> int:
    """Claim the next version atomically; on a lost race, the caller
    rebases. Returns the committed version."""
    mdir = os.path.join(table, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    version = manifest["version"]
    tmp = os.path.join(mdir, f".{snapshot_id}.v{version}.tmp")
    body = json.dumps(manifest, sort_keys=True)
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(body)
        f.flush()
        os.fsync(f.fileno())
    try:
        # link = atomic claim WITH full content (a reader can never see a
        # half-written manifest; rename would silently clobber a winner)
        os.link(tmp, _manifest_path(table, version))
    except FileExistsError:
        raise
    finally:
        os.unlink(tmp)
    # fsync the directory so the publish survives power loss (the data
    # file contents were fsynced above; without this the dirent itself
    # can be lost and a committed snapshot silently vanish)
    dfd = os.open(mdir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return version


def commit(
    df: DataFrame,
    table: str,
    snapshot_id: str,
    mode: str = "append",
    max_retries: int = 20,
) -> int:
    """Commit ``df`` as one atomic snapshot; returns the version.

    ``mode``: "append" unions the parent's live set with the new files;
    "overwrite" replaces it. Idempotent on ``snapshot_id``: if a manifest
    with this id is already published the call is a no-op returning its
    version. Concurrent committers race on the version file; losers
    rebase (append re-reads the new parent's file set; overwrite is
    declared last-writer-wins) and retry. Single-level manifests bound
    this table at ~10^6 live files (a ~100 MB JSON) — compact with an
    ``overwrite`` rewrite, or move to Iceberg (jobs/iceberg.py) past
    that."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode: {mode!r}")
    for m in history(table):
        if m["snapshot_id"] == snapshot_id:
            return m["version"]
    staging = os.path.join(table, _DATA_DIR, snapshot_id)
    # overwrite mode on the staging dir reclaims a crashed prior attempt
    df.write.mode("overwrite").parquet(staging)
    new_files = sorted(
        os.path.join(_DATA_DIR, snapshot_id, name)
        for name in os.listdir(staging)
        if name.endswith(".parquet")
    )
    schema_json = df.schema.json()
    for _ in range(max_retries):
        parent = current_version(table)
        if mode == "append" and parent:
            parent_files = _load_manifest(table, parent)["files"]
            files = sorted(set(parent_files) | set(new_files))
        else:
            files = new_files
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "snapshot_id": snapshot_id,
            "op": mode,
            "files": files,
            "schema": schema_json,
        }
        try:
            return _publish(table, manifest, snapshot_id)
        except FileExistsError:
            continue  # lost the race: rebase on the new parent
    raise RuntimeError(
        f"commit {snapshot_id!r} lost the publish race {max_retries} times"
    )


def rollback(table: str, to_version: int, snapshot_id: str) -> int:
    """Publish a NEW version whose live set is ``to_version``'s (history
    is append-only — a rollback never deletes manifests or data)."""
    target = _load_manifest(table, to_version)
    for m in history(table):
        if m["snapshot_id"] == snapshot_id:
            return m["version"]
    while True:
        parent = current_version(table)
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "snapshot_id": snapshot_id,
            "op": f"rollback:{to_version}",
            "files": target["files"],
            "schema": target["schema"],
        }
        try:
            return _publish(table, manifest, snapshot_id)
        except FileExistsError:
            continue


def expire_snapshots(table: str, keep_last: int = 1) -> int:
    """Drop all but the newest ``keep_last`` manifests and delete data
    files no retained version references. Returns deleted-file count.

    Safe GC rule: a file is deleted only if some EXPIRED manifest
    references it AND no retained manifest does — never by directory
    scan, so an in-flight committer's staged-but-unpublished files are
    untouched (its publish will still win or rebase normally)."""
    vs = _versions(table)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if len(vs) <= keep_last:
        return 0
    expired, retained = vs[:-keep_last], vs[-keep_last:]
    live: set[str] = set()
    for v in retained:
        live.update(_load_manifest(table, v)["files"])
    dead: set[str] = set()
    for v in expired:
        dead.update(f for f in _load_manifest(table, v)["files"] if f not in live)
    for rel in dead:
        path = os.path.join(table, rel)
        if os.path.exists(path):
            os.unlink(path)
        parent = os.path.dirname(path)
        if os.path.isdir(parent) and not os.listdir(parent):
            shutil.rmtree(parent)
    for v in expired:
        os.unlink(_manifest_path(table, v))
    return len(dead)
