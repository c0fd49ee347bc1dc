"""Property-based CDC merge testing (hypothesis).

Random event streams — arbitrary key collisions, op sequences, seq
orderings, batch splits — must always reconverge to the pandas replay
oracle's state with per-row sha256 equality. This is the generalization
of the fixed scenarios in test_cdc_merge.py: instead of four hand-picked
cases, hypothesis searches the space of interleavings for one the merge
semantics get wrong.

Sessions are expensive, so examples are kept small and deadline=None;
the value is in the *shape* coverage (duplicate seqs, delete-first
streams, single-key floods), not row volume.
"""

import hashlib

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from encode_ingest_spark.lake import LakeTable, merge_into
from tests.test_cdc_merge import KEYS, SCHEMA, replay_oracle, table_state

# a tiny key universe forces heavy collisions
_KEY = st.tuples(
    st.sampled_from(["o/a", "o/b"]),
    st.sampled_from(["p1", "p2", "p3"]),
    st.sampled_from(["c" * 40]),
)

_EVENT = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(min_value=0, max_value=50),  # seq — duplicates likely
    _KEY,
    st.text(alphabet="abXY", min_size=0, max_size=6),  # content
)

_STREAM = st.lists(_EVENT, min_size=1, max_size=25)


def _to_rows(stream):
    rows = []
    for op, seq, (repo, path, commit), content in stream:
        rows.append(
            (
                op,
                seq,
                repo,
                path,
                commit,
                None if op == "delete" else "py",
                None if op == "delete" else content,
            )
        )
    return rows


def _oracle(rows):
    pdf = pd.DataFrame(
        rows, columns=["op", "event_seq", "repo", "path", "commit", "lang", "content"]
    )
    # replay semantics with ties: among equal (key, seq) the engine keeps
    # an arbitrary one of the tied events — restrict the oracle to streams
    # where ties are content-identical by deduping exact duplicates and
    # asserting hypothesis only generates tie-free-or-identical cases via
    # the filter in the test body.
    return replay_oracle(pdf)


SCH = "op string, event_seq long, repo string, path string, commit string, lang string, content string"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_STREAM, split=st.integers(min_value=1, max_value=3))
def test_merge_matches_replay_oracle(spark, tmp_path_factory, stream, split):
    # drop seq ties within a key (engine tie-break is deliberately
    # unspecified across different payloads; see merge.py order struct)
    seen = set()
    filtered = []
    for ev in stream:
        k = (ev[2], ev[1])
        if k in seen:
            continue
        seen.add(k)
        filtered.append(ev)
    rows = _to_rows(filtered)

    tmp = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(spark, str(tmp / "t"), SCHEMA, KEYS, num_buckets=4)
    chunks = [rows[i::split] for i in range(split)]
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        merge_into(table, spark.createDataFrame(chunk, SCH), batch_id=i + 1)

    got = table_state(table)
    want = _oracle(rows)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_like=True
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_STREAM, split=st.integers(min_value=2, max_value=3),
       mode=st.sampled_from(["cow", "mor"]))
def test_changelog_composes_to_state_diff(spark, tmp_path_factory, stream, split,
                                          mode):
    """Property: for ANY event stream split into batches, applying
    read_changes(v_i, v_j) onto the state at v_i reproduces the state at
    v_j — i.e. the changelog is exactly the state diff, for every
    adjacent AND spanning version pair. Runs under BOTH write modes, so
    the manifest-diff bucket pruning is exercised over COW rewrites and
    MOR delta appends alike."""
    seen = set()
    filtered = []
    for ev in stream:
        k = (ev[2], ev[1])
        if k in seen:
            continue
        seen.add(k)
        filtered.append(ev)
    rows = _to_rows(filtered)

    tmp = tmp_path_factory.mktemp("chg")
    table = LakeTable.create(spark, str(tmp / "t"), SCHEMA, KEYS, num_buckets=4)
    versions = [table.current_version()]
    chunks = [rows[i::split] for i in range(split)]
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        merge_into(table, spark.createDataFrame(chunk, SCH), batch_id=i + 1,
                   mode=mode)
        versions.append(table.current_version())

    def live(version):
        df = table.read(version=version)
        return {
            (r.repo, r.path, r.commit): (r.lang, r.content) for r in df.collect()
        }

    pairs = [(versions[i], versions[j])
             for i in range(len(versions)) for j in range(i + 1, len(versions))]
    for v_from, v_to in pairs:
        state = dict(live(v_from))
        for r in table.read_changes(v_from, v_to).collect():
            key = (r.repo, r.path, r.commit)
            if r._change_type == "delete":
                state.pop(key, None)
            else:
                state[key] = (r.lang, r.content)
        assert state == live(v_to), (v_from, v_to)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_STREAM, split=st.integers(min_value=1, max_value=3),
       compact_after=st.integers(min_value=0, max_value=2))
def test_mor_merge_matches_replay_oracle(spark, tmp_path_factory, stream, split,
                                         compact_after):
    """Merge-on-read with an arbitrarily-timed compaction must converge
    to the same replay-oracle state as copy-on-write."""
    seen = set()
    filtered = []
    for ev in stream:
        k = (ev[2], ev[1])
        if k in seen:
            continue
        seen.add(k)
        filtered.append(ev)
    rows = _to_rows(filtered)

    tmp = tmp_path_factory.mktemp("mor")
    table = LakeTable.create(spark, str(tmp / "t"), SCHEMA, KEYS, num_buckets=4)
    chunks = [rows[i::split] for i in range(split)]
    applied = 0
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        merge_into(table, spark.createDataFrame(chunk, SCH), batch_id=i + 1,
                   mode="mor")
        applied += 1
        if applied == compact_after:
            table.compact_deltas()

    got = table_state(table)
    want = _oracle(rows)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_like=True
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_STREAM, split=st.integers(min_value=2, max_value=3))
def test_broadcast_strategy_matches_replay_oracle(spark, tmp_path_factory,
                                                  stream, split):
    """The staged broadcast sub-strategy under arbitrary interleavings
    (including equal-seq batch-vs-table ties) must converge to the
    replay oracle like the agg path does."""
    seen = set()
    filtered = []
    for ev in stream:
        k = (ev[2], ev[1])
        if k in seen:
            continue
        seen.add(k)
        filtered.append(ev)
    rows = _to_rows(filtered)

    tmp = tmp_path_factory.mktemp("bc")
    table = LakeTable.create(spark, str(tmp / "t"), SCHEMA, KEYS, num_buckets=4)
    chunks = [rows[i::split] for i in range(split)]
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        merge_into(table, spark.createDataFrame(chunk, SCH), batch_id=i + 1,
                   stage_batch=True, merge_strategy="broadcast")

    got = table_state(table)
    want = _oracle(rows)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_like=True
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_STREAM, split=st.integers(min_value=1, max_value=3))
def test_incremental_file_refresh_matches_full(spark, tmp_path_factory, stream, split):
    """Property: refreshing the derived file table from each batch's
    changelog converges to the same state as deriving it from the final
    source snapshot — for arbitrary interleavings, deletes, and replays."""
    from pyspark.sql import types as T

    from encode_ingest_spark.entities import split_all
    from encode_ingest_spark.entities.incremental import incremental_split_refresh

    seen = set()
    filtered = []
    for ev in stream:
        k = (ev[2], ev[1])
        if k in seen:
            continue
        seen.add(k)
        filtered.append(ev)
    rows = _to_rows(filtered)

    tmp = tmp_path_factory.mktemp("incr")
    source = LakeTable.create(spark, str(tmp / "src"), SCHEMA, KEYS, num_buckets=4)
    file_ddl = (
        "file_id string, label string, file_format string, xref array<string>, "
        "size_bytes long, content_sha256 string, repo_id string, "
        "commit_activity_id string, part_of_dataset_id string"
    )
    file_t = LakeTable.create(
        spark, str(tmp / "file"), T._parse_datatype_string(file_ddl),
        ["file_id"], num_buckets=4,
    )
    prev_v = source.current_version()
    chunks = [rows[i::split] for i in range(split)]
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        merge_into(source, spark.createDataFrame(chunk, SCH), batch_id=i + 1)
        v = source.current_version()
        incremental_split_refresh(source, {"file": file_t},
                                  from_version=prev_v, to_version=v, batch_id=v)
        prev_v = v

    cols = ["file_id", "file_format", "content_sha256", "repo_id"]
    got = {tuple(r) for r in file_t.read().select(*cols).collect()}
    want = {tuple(r)
            for r in split_all(source.read())["file"].select(*cols).collect()}
    assert got == want
