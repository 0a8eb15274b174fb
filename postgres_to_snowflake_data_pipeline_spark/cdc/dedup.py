"""Last-writer-wins (LWW) dedup by max LSN per key.

This is the streaming replacement for the reference's snapshot freshness
semantics — clear-and-reload (/root/reference/scripts/load_data.py:119-131)
plus ``INSERT ... ON CONFLICT DO NOTHING`` PK dedup
(/root/reference/scripts/load_data.py:160-164). After replaying all change
events, the surviving row per (conv_id, turn_idx) must be the one with the
highest LSN (deletes leave a tombstone).

Physical shape
--------------
``max_by(struct(payload...), struct(lsn, op_rank))`` in a hash aggregate:
Catalyst plans this as **partial aggregation before the shuffle** (map-side
combine), so a hot conversation's millions of events collapse to at most one
candidate row per input partition before any data moves — the primary skew
defense. An optional explicit **salted two-stage** reduction is provided for
the pathological case where even a single key's per-partition partials are
too many (1000-executor guidance: leave salting off; partial agg + AQE skew
handling cover the common cases, and the salt stage adds a shuffle).

Tie-break: equal LSNs only arise from exact duplicate emissions (FIXTURES.md
§4), but we still order deterministically by (lsn, op != 'delete') so a
duplicated delete/upsert pair at the same LSN resolves identically on every
replay — deletes win ties, matching a sequential replay where the delete is
applied after the upsert it duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import KEY_COLS, ORDER_COL


def _order_struct() -> F.Column:
    # delete ranks above non-delete at equal LSN (tie-break, see module doc)
    return F.struct(
        F.col(ORDER_COL),
        (F.col("op") == "delete").cast("int").alias("_del_rank"),
    )


def lww_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Reduce a change-event DataFrame to one winning event per key.

    Returns a DataFrame with the same columns as the input (one row per
    distinct key), where each row is the event with the greatest
    (lsn, delete-rank) for its key.
    """
    other = [c for c in events.columns if c not in key_cols]
    winner = F.max_by(F.struct(*[F.col(c) for c in other]), _order_struct()).alias("_w")

    if salt_buckets and salt_buckets > 1:
        # Stage 1: reduce within (key, salt) groups — the salt spreads a hot
        # key across `salt_buckets` reducers; stage 2 merges the survivors.
        salt = F.pmod(F.xxhash64(F.col(ORDER_COL)), F.lit(salt_buckets)).alias("_salt")
        partial = events.groupBy(*key_cols, salt).agg(winner)
        partial = partial.select(*key_cols, "_w.*")
        deduped = partial.groupBy(*key_cols).agg(winner)
    else:
        deduped = events.groupBy(*key_cols).agg(winner)

    return deduped.select(*key_cols, "_w.*").select(*events.columns)
