"""Property-based CDC semantics: hypothesis-generated op sequences.

Beyond the seeded generator's fixed distributions, hypothesis explores
adversarial interleavings — delete/re-insert churn on one key, duplicate
LSNs, arbitrary epoch split points — and asserts the engine's final state
always equals the sequential-replay oracle. Each example replays through
the REAL path (apply_batch → merge → read), split into two epochs at a
drawn boundary.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import replay_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# (conv 0-3, turn 0-2, op) — tiny key space forces heavy key churn
op_seq = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 2),
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=30,
)


def _mk_events(seq, shuffle_salt: int):
    """Events with lsn = 2*position (stable), payload a pure fn of (key, lsn);
    arrival order scrambled by the salt (engine must not depend on it)."""
    base = datetime.datetime(2026, 1, 1)
    rows = []
    for i, (conv, turn, op) in enumerate(seq):
        lsn = i * 2
        is_del = op == "delete"
        rows.append(
            (
                lsn,
                op,
                f"c{conv}",
                turn,
                None if is_del else "user",
                None if is_del else f"text c{conv}/{turn} @{lsn}",
                None,
                base + datetime.timedelta(seconds=lsn),
            )
        )
    rows.sort(key=lambda r: hash((r[0], shuffle_salt)))
    return rows


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(seq=op_seq, split=st.integers(0, 29), salt=st.integers(0, 7))
def test_replay_matches_sequential_oracle(spark, tmp_path_factory, seq, split, salt):
    rows = _mk_events(seq, salt)
    events = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    table = LakeTable.create(
        spark,
        str(tmp_path_factory.mktemp("prop") / "t"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=4,
    )
    cut = min(split, len(rows)) * 2  # epoch boundary in LSN space
    e1 = events.filter(f"lsn < {cut}")
    e2 = events.filter(f"lsn >= {cut}")
    if e1.count():
        apply_batch(spark, table, e1, epoch=0)
    if e2.count():
        apply_batch(spark, table, e2, epoch=1)

    expected = replay_oracle(
        [dict(zip(["lsn", "op", *PAYLOAD], r)) for r in rows], PAYLOAD
    )
    actual = {
        (r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()
    }
    assert set(actual) == set(expected)
    for k in expected:
        assert actual[k]["text"] == expected[k]["text"], f"text mismatch at {k}"
