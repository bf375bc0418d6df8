"""Model-based property test for the snapshot protocol.

Hypothesis drives random operation sequences (append / overwrite /
duplicate replay / rollback / expire) against one table, mirrored into a
pure-Python model of the expected state. After every step the table's
live rows, version count, and idempotency map must match the model —
the protocol-level complement of the scenario tests in
test_snapshots.py / test_snapshot_races.py.

Spark is only the row carrier here; tiny single-partition DataFrames
keep each step ~100 ms so the whole property run stays bounded.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from textractssmlprocessor_spark import snapshots as snap

# ops: (kind, payload)
#   ("append", job_key, rows) ("overwrite", job_key, rows)
#   ("replay", job_index)     — re-commit an earlier op's id w/ junk rows
#   ("rollback", version_frac) ("expire", keep_last)
_OP = st.one_of(
    st.tuples(
        st.just("append"),
        st.integers(0, 5),
        st.lists(st.integers(0, 99), min_size=0, max_size=3),
    ),
    st.tuples(
        st.just("overwrite"),
        st.integers(0, 5),
        st.lists(st.integers(0, 99), min_size=0, max_size=3),
    ),
    st.tuples(st.just("replay"), st.integers(0, 10), st.just(None)),
    st.tuples(st.just("rollback"), st.integers(0, 10), st.just(None)),
    st.tuples(st.just("expire"), st.integers(1, 3), st.just(None)),
    st.tuples(st.just("compact"), st.just(None), st.just(None)),
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, f"doc{i}") for i in rows], "id int, text string"
    ).coalesce(1)


def _live(spark, table):
    if snap.current_version(table) == 0:
        return None
    return sorted(r["id"] for r in snap.read_snapshot(spark, table).collect())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=8))
def test_snapshot_protocol_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("snapmodel") / "t")
    # model state
    live_at: dict[int, list[int]] = {}  # version -> sorted row ids
    committed: dict[str, int] = {}  # snapshot_id -> version
    versions: list[int] = []  # retained versions, ascending
    seq = 0  # unique id counter for fresh ops

    for kind, a, b in ops:
        if kind in ("append", "overwrite"):
            sid = f"job-{seq}-{a}"
            seq += 1
            got = snap.commit(_df(spark, b), table, sid, mode=kind)
            parent = versions[-1] if versions else 0
            base = live_at.get(parent, []) if kind == "append" else []
            v = (max(versions) if versions else 0) + 1
            # rows are a MULTISET: a table stores what was committed,
            # duplicates included (dedup is an operator, not the store)
            live_at[v] = sorted(base + list(b))
            committed[sid] = v
            versions.append(v)
            assert got == v
        elif kind == "replay":
            if not committed:
                continue
            sid = sorted(committed)[a % len(committed)]
            if committed[sid] not in versions:
                continue  # id expired: a replay would mint a NEW version
            got = snap.commit(_df(spark, [7, 8, 9]), table, sid)
            assert got == committed[sid]  # no-op at the recorded version
        elif kind == "rollback":
            if len(versions) < 1:
                continue
            target = versions[a % len(versions)]
            sid = f"undo-{seq}"
            seq += 1
            got = snap.rollback(table, target, sid)
            v = max(versions) + 1
            live_at[v] = live_at[target]
            committed[sid] = v
            versions.append(v)
            assert got == v
        elif kind == "expire":
            if not versions:
                continue
            snap.expire_snapshots(table, keep_last=a)
            versions = versions[-a:]
        elif kind == "compact":
            if not versions:
                continue
            sid = f"compact-{seq}"
            seq += 1
            got = snap.compact(spark, table, sid, num_files=1)
            v = max(versions) + 1
            live_at[v] = live_at[versions[-1]]  # content preserved exactly
            committed[sid] = v
            versions.append(v)
            assert got == v

        # invariants after EVERY step
        assert snap._versions(table) == versions
        head = versions[-1] if versions else 0
        assert snap.current_version(table) == head
        assert _live(spark, table) == (live_at[head] if head else None)
        # time travel agrees with the model on every retained version
        for v in versions:
            got_rows = sorted(
                r["id"]
                for r in snap.read_snapshot(spark, table, version=v).collect()
            )
            assert got_rows == live_at[v]
