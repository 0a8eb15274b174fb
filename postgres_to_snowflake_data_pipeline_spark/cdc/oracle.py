"""Naive driver-side replay oracle for correctness tests (FIXTURES.md §4).

Applies the change stream sequentially in LSN order into a plain dict keyed
by (conv_id, turn_idx) — insert/update = put, delete = remove — exactly the
semantics the reference's clear-and-reload + PK-conflict pipeline produces
after a full run (/root/reference/scripts/load_data.py:119-131,160-164).
O(n) driver memory: tests only, never the engine path.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replay_oracle(events_rows: list[dict[str, Any]], payload_cols: list[str]) -> dict[tuple, dict]:
    """events_rows: list of dicts with lsn/op/conv_id/turn_idx + payload.
    Ties on LSN (duplicate emissions): delete applied after non-delete,
    matching the engine's deterministic tie-break."""
    events = sorted(events_rows, key=lambda r: (r["lsn"], r["op"] == "delete"))
    state: dict[tuple, dict] = {}
    for r in events:
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {c: r.get(c) for c in payload_cols}
    return state


def lww_state_oracle(
    events: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Distributed twin of :func:`replay_oracle` for sizes the driver
    can't collect (the soaks): LWW winner per key via
    ``max(struct(lsn, delete-flag, payload...))``, deletes dropped.
    The ``_dr`` flag replays the same lsn-tie rule as replay_oracle's
    sort (delete applied after non-delete at equal lsn). Compare with
    :func:`diff_count` — independent of the engine's merge path."""
    other = [c for c in events.columns if c not in key_cols and c != "lsn"]
    ordered = F.struct(
        F.col("lsn"),
        (F.col("op") == "delete").cast("int").alias("_dr"),
        *[F.col(c) for c in other],
    )
    return (
        events.groupBy(*key_cols)
        .agg(F.max(ordered).alias("_w"))
        .select(*key_cols, "_w.*")
        .filter(F.col("op") != "delete")
        .select(*payload_cols)
    )


def diff_count(a: DataFrame, b: DataFrame) -> int:
    """Symmetric multiset difference row count (0 == exactly equal)."""
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def assert_matches_oracle(
    table_df: DataFrame,
    events_df: DataFrame,
    payload_cols: list[str],
    full_row: bool = True,
) -> None:
    """Row-for-row comparison under stable (conv_id, turn_idx) ordering.

    Primary invariant (BASELINE.json input_hint): per-turn *text* equality.
    ``full_row=True`` additionally checks every payload column."""
    expected = replay_oracle([r.asDict() for r in events_df.collect()], payload_cols)
    actual_rows = table_df.orderBy("conv_id", "turn_idx").collect()
    actual = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in actual_rows}

    assert len(actual_rows) == len(actual), "duplicate (conv_id, turn_idx) keys in table"
    missing = set(expected) - set(actual)
    extra = set(actual) - set(expected)
    assert not missing and not extra, (
        f"key mismatch: {len(missing)} missing (e.g. {sorted(missing)[:3]}), "
        f"{len(extra)} extra (e.g. {sorted(extra)[:3]})"
    )
    for key in expected:
        exp, act = expected[key], actual[key]
        assert act["text"] == exp["text"], f"text mismatch at {key}: {act['text']!r} != {exp['text']!r}"
        if full_row:
            for c in payload_cols:
                if c in ("conv_id", "turn_idx"):
                    continue
                assert act.get(c) == exp.get(c), f"{c} mismatch at {key}: {act.get(c)!r} != {exp.get(c)!r}"
