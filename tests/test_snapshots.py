"""Write-audit-publish snapshot commits (snapshots.py): the transactional
behaviors the Iceberg deployment config (jobs/iceberg.py) promises, proven
over plain parquet — atomic publish, idempotent re-commit, snapshot-isolated
readers, time travel, rollback, lost-race rebase, and GC safety."""

import json
import os

import pytest

from textractssmlprocessor_spark import snapshots as snap


def _df(spark, ids):
    return spark.createDataFrame([(i, f"doc{i}") for i in ids], "id int, text string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_commits_and_reads(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = snap.commit(_df(spark, [1, 2]), table, "s1")
    v2 = snap.commit(_df(spark, [3]), table, "s2")
    assert (v1, v2) == (1, 2)
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2, 3]
    # time travel: v1 still reads its original file set
    assert _ids(snap.read_snapshot(spark, table, version=1)) == [1, 2]


def test_commit_is_idempotent_on_snapshot_id(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "job-a")
    # replay of the same job id: no new version, no new data
    assert snap.commit(_df(spark, [1]), table, "job-a") == 1
    assert snap.current_version(table) == 1
    assert _ids(snap.read_snapshot(spark, table)) == [1]


def test_overwrite_replaces_live_set_but_keeps_history(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1, 2]), table, "s1")
    snap.commit(_df(spark, [9]), table, "s2", mode="overwrite")
    assert _ids(snap.read_snapshot(spark, table)) == [9]
    assert _ids(snap.read_snapshot(spark, table, version=1)) == [1, 2]
    ops = [m["op"] for m in snap.history(table)]
    assert ops == ["append", "overwrite"]


def test_reader_is_isolated_from_concurrent_overwrite(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1, 2]), table, "s1")
    pinned = snap.read_snapshot(spark, table)  # plan fixes the file set
    snap.commit(_df(spark, [9]), table, "s2", mode="overwrite")
    # the pre-overwrite DataFrame still reads v1's files, uncorrupted
    assert _ids(pinned) == [1, 2]


def test_lost_publish_race_rebases_onto_winner(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "s1")
    # simulate a concurrent winner claiming v2 between stage and publish:
    # publish v2 by hand with a distinct file set
    winner = {
        "version": 2,
        "parent": 1,
        "snapshot_id": "rival",
        "op": "append",
        "files": snap._load_manifest(table, 1)["files"],
        "schema": snap._load_manifest(table, 1)["schema"],
    }
    snap._publish(table, winner)
    v = snap.commit(_df(spark, [3]), table, "s3")
    assert v == 3  # rebased past the rival's v2
    assert _ids(snap.read_snapshot(spark, table)) == [1, 3]


def test_empty_snapshot_reads_with_schema(spark, tmp_path):
    table = str(tmp_path / "t")
    empty = _df(spark, []).filter("id > 0")
    snap.commit(empty, table, "s1", mode="overwrite")
    out = snap.read_snapshot(spark, table)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "text"]


def test_rollback_publishes_new_version_with_old_files(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1, 2]), table, "s1")
    snap.commit(_df(spark, [9]), table, "s2", mode="overwrite")
    v3 = snap.rollback(table, 1, "undo-s2")
    assert v3 == 3
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]
    # rollback is itself idempotent on its snapshot_id
    assert snap.rollback(table, 1, "undo-s2") == 3


def test_expire_deletes_only_unreferenced_files(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "s1")
    snap.commit(_df(spark, [2]), table, "s2")  # v2 references s1's files too
    snap.commit(_df(spark, [9]), table, "s3", mode="overwrite")  # drops both
    removed = snap.expire_snapshots(table, keep_last=1)
    assert removed > 0
    # the retained head still reads; the expired versions are gone
    assert _ids(snap.read_snapshot(spark, table)) == [9]
    assert snap._versions(table) == [3]
    with pytest.raises(FileNotFoundError):
        snap._load_manifest(table, 1)


def test_expire_keeps_files_shared_with_retained_versions(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "s1")
    snap.commit(_df(spark, [2]), table, "s2")  # v2 = s1 files + s2 files
    removed = snap.expire_snapshots(table, keep_last=1)
    # v1's files are all still live in v2: nothing deleted
    assert removed == 0
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]


def test_manifest_files_are_relative_so_table_relocates(spark, tmp_path):
    import shutil

    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1, 2]), table, "s1")
    for m in snap.history(table):
        assert all(not os.path.isabs(f) for f in m["files"])
    moved = str(tmp_path / "moved")
    shutil.copytree(table, moved)
    assert _ids(snap.read_snapshot(spark, moved)) == [1, 2]


def test_crashed_stage_becomes_orphan_and_rerun_succeeds(spark, tmp_path):
    table = str(tmp_path / "t")
    # simulate crash-after-stage-before-publish: data dir exists, no manifest
    _df(spark, [1]).write.parquet(os.path.join(table, "data", "s1.deadbeef"))
    assert snap.current_version(table) == 0
    v = snap.commit(_df(spark, [1, 2]), table, "s1")
    assert v == 1
    # the re-run staged fresh: only ITS rows are live, the crashed
    # attempt's dir is a listed orphan (never silently deleted)
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]
    orphans = snap.orphan_dirs(table)
    assert len(orphans) == 1 and orphans[0].endswith("s1.deadbeef")


def test_duplicate_commit_converges_even_after_staging(spark, tmp_path):
    """Two attempts of the same snapshot_id: the second discovers the
    winner on its publish-loop recheck (simulated by publishing between
    its staging and its loop via the marker), returns the winner's
    version, and never clobbers the winner's files."""
    table = str(tmp_path / "t")
    v1 = snap.commit(_df(spark, [1]), table, "job-x")
    winner_files = set(snap.snapshot_files(table))
    # a replay with DIFFERENT (buggy-duplicate) content still converges
    # on the committed version and leaves the live file set untouched
    v2 = snap.commit(_df(spark, [7, 8]), table, "job-x")
    assert (v1, v2) == (1, 1)
    assert set(snap.snapshot_files(table)) == winner_files
    assert _ids(snap.read_snapshot(spark, table)) == [1]


def test_expire_forgets_markers_with_their_manifests(spark, tmp_path):
    """After expiry, a replayed snapshot_id must NOT resolve to the
    deleted version — the marker dies with the manifest."""
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "s1")
    snap.commit(_df(spark, [9]), table, "s2", mode="overwrite")
    snap.expire_snapshots(table, keep_last=1)
    v = snap.commit(_df(spark, [1]), table, "s1")  # replay of expired id
    assert v == 3  # a NEW version, not the dead v1
    assert _ids(snap.read_snapshot(spark, table)) == [1, 9]


def test_pages_source_sink_snapshot_seam(spark, tmp_path):
    """read_pages/write_pages_output dispatch on format='snapshot': the
    same seam jobs/iceberg.py documents for the catalog swap."""
    from textractssmlprocessor_spark import sources
    from textractssmlprocessor_spark.schema import PAGES_SCHEMA

    table = str(tmp_path / "pages")
    pages = spark.createDataFrame(
        [("http://a", None, None, "hello", "en")], PAGES_SCHEMA
    )
    snap.commit(pages, table, "ingest-1")
    out = sources.read_pages(spark, table, format="snapshot")
    assert out.columns == [f.name for f in PAGES_SCHEMA.fields]
    assert out.count() == 1

    sink = str(tmp_path / "chunks")
    sources.write_pages_output(out, sink, format="snapshot:run-1")
    # idempotent rerun: same run id, still one version / one row
    sources.write_pages_output(out, sink, format="snapshot:run-1")
    assert snap.current_version(sink) == 1
    assert snap.read_snapshot(spark, sink).count() == 1


def test_manifest_publish_is_full_content_atomic(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "s1")
    # every published manifest parses as complete JSON (link-not-rename
    # publish means no reader can ever observe a partial body)
    with open(snap._manifest_path(table, 1), encoding="utf-8") as f:
        m = json.load(f)
    assert set(m) == {"version", "parent", "snapshot_id", "op", "files", "schema"}


# --- streaming sink (streaming/snapshot_sink.py) -------------------------


def _drop(spark, path, ids):
    _df(spark, ids).coalesce(1).write.mode("append").parquet(path)


def test_stream_to_snapshots_drains_into_versioned_table(spark, tmp_path):
    from textractssmlprocessor_spark.streaming.snapshot_sink import (
        stream_to_snapshots,
    )

    land = str(tmp_path / "land")
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _drop(spark, land, [1, 2])
    stream = spark.readStream.schema("id int, text string").parquet(land)
    stream_to_snapshots(stream, table, ckpt, "ingest").awaitTermination(120)
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]
    assert snap.history(table)[0]["snapshot_id"].startswith("ingest-b")

    # restart with the SAME checkpoint after a new file drop: only the
    # new batch commits — the drained batch is not replayed, no dupes
    _drop(spark, land, [3])
    stream2 = spark.readStream.schema("id int, text string").parquet(land)
    stream_to_snapshots(stream2, table, ckpt, "ingest").awaitTermination(120)
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2, 3]


def test_snapshot_sink_body_replay_is_exactly_once(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between commit and
    checkpoint advance replays the batch with the SAME batch_id. The
    replay must be a no-op at the table."""
    from textractssmlprocessor_spark.streaming.snapshot_sink import (
        snapshot_sink_body,
    )

    table = str(tmp_path / "t")
    body = snapshot_sink_body(table, "run")
    body(_df(spark, [1, 2]), 0)
    body(_df(spark, [1, 2]), 0)  # replayed batch
    body(_df(spark, [3]), 1)
    assert snap.current_version(table) == 2
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2, 3]
    # the replay short-circuited on the marker BEFORE staging: it wrote
    # nothing at all (orphans only arise from concurrent duplicates that
    # stage before the winner publishes — covered above)
    assert snap.orphan_dirs(table) == []


def test_read_changes_is_exact_cdc_on_append_only(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = snap.commit(_df(spark, [1, 2]), table, "b0")
    v2 = snap.commit(_df(spark, [3]), table, "b1")
    snap.commit(_df(spark, [4, 5]), table, "b2")
    # consumer processed v1: sees exactly the rows landed after it
    assert _ids(snap.read_changes(spark, table, since_version=v1)) == [3, 4, 5]
    assert _ids(snap.read_changes(spark, table, since_version=v2)) == [4, 5]
    # caught up: empty WITH the table schema
    head = snap.current_version(table)
    caught = snap.read_changes(spark, table, since_version=head)
    assert caught.count() == 0
    assert [f.name for f in caught.schema.fields] == ["id", "text"]
    # since 0 = the full snapshot; bounded window via version=
    assert _ids(snap.read_changes(spark, table, 0)) == [1, 2, 3, 4, 5]
    assert _ids(snap.read_changes(spark, table, v1, version=v2)) == [3]


def test_compact_preserves_content_and_shrinks_file_count(spark, tmp_path):
    table = str(tmp_path / "t")
    all_ids = list(range(15))
    for b in range(5):  # a streaming sink's worth of small appends
        ids = all_ids[3 * b : 3 * b + 3]
        snap.commit(_df(spark, ids).repartition(3), table, f"b{b}")
    before = len(snap.snapshot_files(table))
    assert before >= 10
    v = snap.compact(spark, table, "compact-1", num_files=1)
    assert len(snap.snapshot_files(table)) == 1
    assert _ids(snap.read_snapshot(spark, table)) == all_ids
    # time travel to the pre-compaction head still works...
    assert _ids(snap.read_snapshot(spark, table, version=v - 1)) == all_ids
    # ...until expiry reclaims the small files
    removed = snap.expire_snapshots(table, keep_last=1)
    assert removed == before
    assert _ids(snap.read_snapshot(spark, table)) == all_ids
    # compaction is an ordinary idempotent commit
    assert snap.compact(spark, table, "compact-1", num_files=1) == v


def test_require_parent_conflicts_instead_of_rebasing(spark, tmp_path):
    """A read-modify-write commit pinned to a stale parent must raise,
    never silently drop the concurrent append's rows."""
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "b0")
    snap.commit(_df(spark, [2]), table, "b1")  # table advances to v2
    with pytest.raises(snap.SnapshotConflict):
        snap.commit(
            _df(spark, [1]), table, "rewrite", mode="overwrite",
            require_parent=1,
        )
    # nothing was lost or published by the failed attempt
    assert snap.current_version(table) == 2
    assert _ids(snap.read_snapshot(spark, table)) == [1, 2]
    # with the CURRENT head it commits fine
    assert (
        snap.commit(
            _df(spark, [1, 2]), table, "rewrite", mode="overwrite",
            require_parent=2,
        )
        == 3
    )


def test_compact_replay_after_target_expiry_and_rollback_replay(spark, tmp_path):
    """Replays of rollback and compact stay idempotent even after the
    versions they referenced were expired."""
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "s1")
    snap.commit(_df(spark, [9]), table, "s2", mode="overwrite")
    v3 = snap.rollback(table, 1, "undo")
    snap.expire_snapshots(table, keep_last=1)  # v1 (undo's target) is gone
    # replay of the committed rollback: returns v3, does NOT reload v1
    assert snap.rollback(table, 1, "undo") == v3
    v4 = snap.compact(spark, table, "compact-x", num_files=1)
    snap.expire_snapshots(table, keep_last=1)
    assert snap.compact(spark, table, "compact-x") == v4


def test_read_changes_expired_since_version_is_a_clear_error(spark, tmp_path):
    table = str(tmp_path / "t")
    snap.commit(_df(spark, [1]), table, "b0")
    snap.commit(_df(spark, [2]), table, "b1")
    snap.expire_snapshots(table, keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        snap.read_changes(spark, table, since_version=1)
