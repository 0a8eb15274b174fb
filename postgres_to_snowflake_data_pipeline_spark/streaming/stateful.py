"""Custom stateful streaming operator via applyInPandasWithState.

Per-conversation running progress over the change feed: each micro-batch
updates a GroupState per conv_id (events seen, distinct turns touched,
max LSN, last role) and emits the updated row. This is the engine's
example of a stateful operator the built-in aggregations can't express
(the state object is arbitrary Python data evolving across batches) —
the pattern for session summaries, per-entity rate counters, conversation
quality trackers, etc.

Scale notes: state is partitioned by conv_id across executors and
persisted in the checkpoint's state store; each batch touches only the
groups present in that batch (Arrow-batched, no per-row Python dispatch
outside the grouped pandas call). A GroupStateTimeout would bound state
for inactive conversations; kept NoTimeout here because the feed is
finite in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("events_seen", T.LongType(), False),
        T.StructField("distinct_turns", T.IntegerType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("last_role", T.StringType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("turns", T.ArrayType(T.IntegerType())),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_role", T.StringType()),
    ]
)


def _update_progress(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        events_seen, turns, max_lsn, last_role = state.get
        turns = set(turns)
    else:
        events_seen, turns, max_lsn, last_role = 0, set(), -1, None
    for pdf in pdfs:  # vectorized per Arrow batch
        events_seen += len(pdf)
        turns.update(int(t) for t in pdf["turn_idx"].unique())
        batch_max = int(pdf["lsn"].max())
        if batch_max > max_lsn:
            max_lsn = batch_max
            winner = pdf.loc[pdf["lsn"].idxmax()]
            last_role = winner["role"] if pd.notna(winner["role"]) else None
    state.update((events_seen, sorted(turns), max_lsn, last_role))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "events_seen": [events_seen],
            "distinct_turns": [len(turns)],
            "max_lsn": [max_lsn],
            "last_role": [last_role],
        }
    )


def conversation_progress(events: DataFrame) -> DataFrame:
    """Attach the stateful progress operator to a *streaming* change-event
    DataFrame; emits one updated row per conversation per batch."""
    return events.groupBy("conv_id").applyInPandasWithState(
        _update_progress,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
