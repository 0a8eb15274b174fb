"""Last-writer-wins (LWW) dedup by max LSN per key.

This is the streaming replacement for the reference's snapshot freshness
semantics — clear-and-reload (/root/reference/scripts/load_data.py:119-131)
plus ``INSERT ... ON CONFLICT DO NOTHING`` PK dedup
(/root/reference/scripts/load_data.py:160-164). After replaying all change
events, the surviving row per (conv_id, turn_idx) must be the one with the
highest LSN (deletes leave a tombstone).

Physical shape
--------------
``max(struct(lsn, delete_rank, payload...))`` in a **Tungsten hash
aggregate** (HashAggregateExec): ``max`` over a struct is a declarative
aggregate, so the whole reduction stays in whole-stage codegen with
UnsafeRow-backed aggregation buffers that spill gracefully under memory
pressure. (The seemingly-equivalent ``max_by`` plans as
ObjectHashAggregateExec, whose sort-based fallback triggers after only
``spark.sql.objectHashAggregate.sortBased.fallbackThreshold`` = 128
distinct keys — with CDC's nearly-unique keys that degenerates to a
map-side sort of every partition and was measured 2-3× slower at 8M
events.) Catalyst still plans **partial aggregation before the shuffle**
(map-side combine), so a hot conversation's millions of events collapse to
at most one candidate row per input partition before any data moves — the
primary skew defense. An optional explicit **salted two-stage** reduction
is provided for the pathological case where even a single key's
per-partition partials are too many (1000-executor guidance: leave salting
off; partial agg + AQE skew handling cover the common cases, and the salt
stage adds a shuffle).

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


def _ordered_struct(events: DataFrame, key_cols: tuple[str, ...]) -> F.Column:
    """Payload struct with the comparison prefix (lsn, delete-rank) leading,
    so a plain declarative ``max`` selects the LWW winner. Struct comparison
    is field-order lexicographic; fields beyond the prefix only break ties
    between *identical duplicate emissions*, where any choice is the same
    row. Delete ranks above non-delete at equal LSN (see module doc)."""
    other = [c for c in events.columns if c not in key_cols and c != ORDER_COL]
    return F.struct(
        F.col(ORDER_COL),
        (F.col("op") == "delete").cast("int").alias("_del_rank"),
        *[F.col(c) for c in other],
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
    winner = F.max(_ordered_struct(events, key_cols)).alias("_w")

    if salt_buckets and salt_buckets > 1:
        # Stage 1: reduce within (key, salt) groups — the salt spreads a hot
        # key across `salt_buckets` reducers; stage 2 merges the survivors.
        salt = F.pmod(F.xxhash64(F.col(ORDER_COL)), F.lit(salt_buckets)).alias("_salt")
        partial = events.groupBy(*key_cols, salt).agg(winner)
        deduped = partial.groupBy(*key_cols).agg(F.max("_w").alias("_w"))
    else:
        deduped = events.groupBy(*key_cols).agg(winner)

    return deduped.select(*key_cols, "_w.*").drop("_del_rank").select(*events.columns)


def lww_patch_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...],
    patch_columns: tuple[str, ...],
    patch_sentinel: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Partial-update (TOAST-aware) within-batch reduction — the feed-side
    half of the lake's patch merge engine (lake/table.py::_resolve_patch).

    Postgres logical decoding omits unchanged TOASTed values from UPDATE
    row images; the feed marks them with the table's in-band sentinel
    string. This reduction collapses a batch to one storage row per key:

    - whole-row winner (max (lsn, delete-rank) struct) decides existence,
      op and every NON-patch column — identical to :func:`lww_dedup`;
    - each patch column keeps its latest in-batch SET value (sentinel and
      delete rows skipped) together with the LSN that set it
      (``_plsn_{col}``, NULL = this batch never set it);
    - ``_dlsn`` records the batch's max delete LSN, so a later read can
      tell "carried forward" from "destroyed by the folded-in delete".

    Values are stored RAW (no in-batch kill): read-time resolution compares
    ``_plsn_{col}`` against the max ``_dlsn`` across ALL storage rows, and
    applying the kill early would break that associativity. Output columns:
    the input's, plus the per-column LSNs and ``_dlsn`` appended.

    Still one Tungsten hash aggregate with map-side partials (every added
    aggregate is a NULL-skipping declarative ``max``); the optional salted
    two-stage mirrors :func:`lww_dedup` (all aggregates are associative,
    so stage 2 just maxes the stage-1 partials)."""
    non_patch = [
        c
        for c in events.columns
        if c not in key_cols and c != ORDER_COL and c not in patch_columns
    ]
    base = F.struct(
        F.col(ORDER_COL),
        (F.col("op") == "delete").cast("int").alias("_del_rank"),
        *[F.col(c) for c in non_patch],
    )
    aggs = [
        F.max(base).alias("_w"),
        F.max(F.when(F.col("op") == "delete", F.col(ORDER_COL))).alias("_dlsn"),
    ]
    for c in patch_columns:
        set_cond = (
            (F.col("op") != "delete")
            & F.col(c).isNotNull()
            & (F.col(c) != F.lit(patch_sentinel))
        )
        aggs.append(
            F.max(
                F.when(
                    set_cond,
                    F.struct(F.col(ORDER_COL).alias("p"), F.col(c).alias("v")),
                )
            ).alias(f"_s_{c}")
        )
    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(ORDER_COL)), F.lit(salt_buckets)).alias(
            "_salt"
        )
        partial = events.groupBy(*key_cols, salt).agg(*aggs)
        grouped = partial.groupBy(*key_cols).agg(
            F.max("_w").alias("_w"),
            F.max("_dlsn").alias("_dlsn"),
            *[F.max(f"_s_{c}").alias(f"_s_{c}") for c in patch_columns],
        )
    else:
        grouped = events.groupBy(*key_cols).agg(*aggs)
    out = []
    for name in events.columns:
        if name in key_cols:
            out.append(F.col(name))
        elif name in patch_columns:
            out.append(F.col(f"_s_{name}.v").alias(name))
        elif name == ORDER_COL:
            out.append(F.col(f"_w.{ORDER_COL}").alias(ORDER_COL))
        else:
            out.append(F.col(f"_w.{name}").alias(name))
    out += [F.col(f"_s_{c}.p").alias(f"_plsn_{c}") for c in patch_columns]
    out.append(F.col("_dlsn"))
    return grouped.select(*out)
