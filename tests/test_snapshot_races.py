"""REAL-thread concurrency over the snapshot commit protocol.

test_snapshots.py proves the race rules by simulation (publish between a
loser's staging and its retry loop); these tests run actual concurrent
committers in threads against one table — the closest a single process
gets to two jobs racing on a shared filesystem. Spark is driver-side
here only to produce DataFrames; the contention is all in snapshots.py's
version-file link race.
"""

from __future__ import annotations

import threading

from textractssmlprocessor_spark import snapshots as snap


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc{i}") for i in ids], "id int, text string"
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _run_threads(fns):
    errs: list[BaseException] = []

    def wrap(fn):
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 - surfaced to the test
            errs.append(e)

    ts = [threading.Thread(target=wrap, args=(fn,)) for fn in fns]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert errs == []


def test_concurrent_distinct_commits_all_land(spark, tmp_path):
    """N threads, N distinct snapshot_ids: every committer must win some
    version (losers rebase), the final live set is the union, and every
    version's file set is readable (no torn manifests)."""
    table = str(tmp_path / "t")
    n = 6
    results: dict[int, int] = {}

    def committer(i):
        def run():
            results[i] = snap.commit(
                _df(spark, [i]), table, f"job-{i}", mode="append"
            )

        return run

    _run_threads([committer(i) for i in range(n)])
    assert sorted(results.values()) == list(range(1, n + 1))
    assert _ids(snap.read_snapshot(spark, table)) == list(range(n))
    for v in range(1, n + 1):
        snap.read_snapshot(spark, table, version=v).count()


def test_concurrent_same_id_commits_converge_to_one_version(spark, tmp_path):
    """N threads replaying ONE snapshot_id (a duplicated job): exactly
    one version publishes, all callers return it, and losers' staging
    dirs are orphans that a GC-safe expire never touches."""
    table = str(tmp_path / "t")
    barrier = threading.Barrier(4)
    got: list[int] = []

    def run():
        barrier.wait(60)
        got.append(snap.commit(_df(spark, [1, 2]), table, "job-x"))

    _run_threads([run] * 4)
    assert got == [1, 1, 1, 1]
    assert snap.current_version(table) == 1
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]
    # every loser staged under its own suffix: 0-3 orphans, none live
    orphans = snap.orphan_dirs(table)
    assert len(orphans) <= 3
    live = set(snap.snapshot_files(table))
    import os

    assert all(
        not any(f.startswith(o + os.sep) for f in live) for o in orphans
    )


def test_stale_empty_marker_from_crashed_claimant_heals(spark, tmp_path):
    """A crash after _id_lock created the marker but before publish
    leaves an EMPTY marker file (flock died with the process). The next
    attempt must lock it, find no version anywhere, and publish."""
    import os

    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "other")  # table exists
    marker = snap._id_marker_path(table, "job-x")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    open(marker, "w").close()  # crashed claimant's leftover
    assert snap.commit(_df(spark, [2]), table, "job-x") == 2
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]
    # and the marker now records the version for O(1) replays
    assert snap.commit(_df(spark, [7]), table, "job-x") == 2


def test_crash_between_publish_and_marker_heals_via_history(spark, tmp_path):
    """Publish succeeded, marker write never happened (crash window):
    the replay's in-lock history scan must find the manifest and return
    its version instead of double-publishing."""
    import os

    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "job-x")
    os.unlink(snap._id_marker_path(table, "job-x"))  # simulate the crash
    assert snap.commit(_df(spark, [9]), table, "job-x") == 1
    assert snap.current_version(table) == 1
    assert _ids(snap.read_snapshot(spark, table)) == [1]


def test_hostile_snapshot_ids_route_to_hashed_markers(spark, tmp_path):
    """Ids that are not safe filenames ('.', '..', slashes, leading
    dots) must not traverse out of the .ids dir or collide with other
    marker files — they hash to fixed-width names."""
    table = str(tmp_path / "t")
    v = {}
    for i, sid in enumerate([".", "..", "a/b", ".hidden", "x" * 200]):
        v[sid] = snap.commit(_df(spark, [i]), table, sid)
    assert sorted(v.values()) == [1, 2, 3, 4, 5]
    # replays converge per id, and every marker lives inside .ids
    for sid, ver in v.items():
        assert snap.commit(_df(spark, [99]), table, sid) == ver
        import os

        p = snap._id_marker_path(table, sid)
        assert os.path.dirname(p).endswith(os.path.join("_manifests", ".ids"))
        assert os.path.basename(p) not in (".", "..")
    assert _ids(snap.read_snapshot(spark, table)) == [0, 1, 2, 3, 4]
    # staging dirs are FLAT under data/ with hashed-safe names (an 'a/b'
    # id must not nest — orphan_dirs would misreport the parent dir of
    # LIVE data as deletable — and '..' must not escape the table root)
    import os
    import re

    data = os.path.join(table, "data")
    assert all(
        re.fullmatch(r"[A-Za-z0-9_-][A-Za-z0-9._-]*\.[0-9a-f]{8}", d)
        for d in os.listdir(data)
    )
    assert snap.orphan_dirs(table) == []


def test_id_lock_timeout_backstop(tmp_path):
    """A held lock times a second claimant out with a clear error (the
    deadlock backstop; real contention is metadata-fast and never hits
    it). Same-process double-flock needs two distinct fds — which
    _id_lock opens — so this exercises the real wait loop."""
    import os

    import pytest

    table = str(tmp_path / "t")
    fd = snap._id_lock(table, "job-x")
    try:
        with pytest.raises(RuntimeError, match="publish lock"):
            snap._id_lock(table, "job-x", timeout=0.2)
    finally:
        os.close(fd)
    # released: the next claim succeeds instantly
    os.close(snap._id_lock(table, "job-x", timeout=0.2))
