"""Multi-table CDC routing: one WAL feed → N lake tables.

The reference replicates FIVE tables per run (banco/programa/usuario/
cardholder/tarjeta_puntos — /root/reference/scripts/load_data.py:49-64,
/root/reference/dags/s3_to_snowflake_dag.py:265-273, one parallel COPY
task per table). A real Postgres logical-decoding stream likewise tags
every record with its relation. This module routes a tagged change feed
to per-table merges inside ONE epoch.

Scale/consistency notes:
- The feed is persisted once for the epoch, then each table's slice is a
  `_table = 'x'` filter over the cached partitions — N per-table applies
  cost one feed materialization, not N full upstream re-scans (at 100 TB
  the feed would additionally be written partitioned by `_table`, making
  the filter partition pruning on the cold read too).
- Rows routed to unknown tables are tolerated (like the reference's
  ON_ERROR='CONTINUE') but COUNTED and surfaced on the result, matching
  the reference's load reports — silent drops hide producer bugs.
- Per-(table, epoch) commit keys: a crash mid-epoch replays only the
  tables that had not committed — each table independently exactly-once,
  which is also the reference's guarantee (per-table COPY tasks retry
  independently).
- FK ordering (the reference loads parents before children,
  load_data.py:49-64) is unnecessary under snapshot semantics: readers see
  each table atomically at its own snapshot; cross-table consistency is
  re-established by reading all tables as of the same epoch via
  ``snapshot_for_epoch``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
    ApplyResult,
    StagedAudit,
    apply_audited_batch,
    apply_batch,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import ORDER_COL
from postgres_to_snowflake_data_pipeline_spark.lake.metadata import atomic_write_json
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

TABLE_COL = "_table"


class MultiApplyResult(dict):
    """Per-table ApplyResults (dict API preserved) plus the count of rows
    routed to unknown tables — tolerated, never silently invisible."""

    unknown_rows: int = 0


def apply_multi_table(
    spark: SparkSession,
    tables: dict[str, LakeTable],
    events: DataFrame,
    epoch: int,
    salt_buckets: int | None = None,
    frontier_root: str | None = None,
    table_columns: dict[str, set[str]] | None = None,
    audits: dict[str, StagedAudit] | None = None,
) -> MultiApplyResult:
    """Apply one epoch of a table-tagged change feed to every target table.

    ``events`` must carry a ``_table`` column naming the destination; rows
    tagged with unknown tables are skipped (tolerant routing, like the
    reference's ON_ERROR='CONTINUE') and reported via
    ``result.unknown_rows``.

    ``audits`` routes named tables through the write-audit-publish gate
    (:func:`apply_audited_batch`): their slice is staged, audited, then
    published or rejected — both fold the epoch key, so the frontier below
    advances either way; ``on_fail='fail'`` instead raises with the batch
    left staged, halting the epoch at that table.

    ``table_columns`` scopes each table's slice to its own payload columns
    (plus op/lsn). A heterogeneous multi-source union carries the SUPERSET
    of all sources' columns; without scoping, apply_batch's additive
    schema evolution would permanently append every other source's
    columns (all NULL) to every table. Omit it (None) when the feed's
    columns are genuinely common to all tables.

    With ``frontier_root``, a cross-table ATOMIC-VISIBILITY marker is
    written after (and only after) every table's epoch commit succeeds:
    one JSON per epoch naming each participating table's snapshot id.
    Per-table commits are individually atomic and exactly-once, but a
    crash between table A's commit and table B's leaves the lake torn
    (A at epoch N, B at N-1) for anyone reading "current" state; the
    marker gives readers a mechanical consistent frontier —
    ``latest_frontier`` + ``read_at_frontier`` never observe the torn
    window, because the epoch-N marker only exists once N is fully
    applied everywhere. Markers are tiny, idempotent (replay of a
    fully-applied epoch rewrites identical content), and atomic
    (same-directory rename)."""
    events = events.persist()
    try:
        results = MultiApplyResult()
        for name, table in tables.items():
            slice_df = events.filter(F.col(TABLE_COL) == name).drop(TABLE_COL)
            if table_columns is not None:
                keep = [
                    c
                    for c in slice_df.columns
                    if c in table_columns[name] or c in ("op", ORDER_COL)
                ]
                slice_df = slice_df.select(*keep)
            if audits and name in audits:
                # write-audit-publish gate: the slice is staged (invisible),
                # audited against declarative checks, then published or
                # rejected — either way the epoch key folds, so the frontier
                # below still advances. on_fail='fail' raises instead,
                # leaving the batch staged and the epoch (hence the
                # frontier) halted at this table until an operator acts.
                a = audits[name]
                results[name] = apply_audited_batch(
                    spark, table, slice_df, epoch=epoch,
                    audit_fn=a.audit_fn, on_fail=a.on_fail,
                    salt_buckets=salt_buckets,
                )
            else:
                results[name] = apply_batch(
                    spark, table, slice_df, epoch=epoch,
                    salt_buckets=salt_buckets,
                )
        # null-safe: ~isin(...) evaluates to NULL (not TRUE) for NULL tags,
        # which filter() would drop — exactly the silent loss this counter
        # exists to surface
        results.unknown_rows = events.filter(
            ~F.col(TABLE_COL).isin(list(tables)) | F.col(TABLE_COL).isNull()
        ).count()
        if frontier_root is not None:
            sids: dict[str, int] = {}
            for name, table in tables.items():
                r = results[name]
                sid = (
                    r.snapshot_id
                    if r.snapshot_id is not None
                    # skipped replay (or racer-applied): recover the id of
                    # the commit that carries this epoch's key
                    else snapshot_for_epoch(table, epoch)
                )
                if sid is None:
                    raise RuntimeError(
                        f"epoch {epoch} applied but table {name!r} has no "
                        "commit for it — frontier would pin a torn state"
                    )
                sids[name] = sid
            write_frontier(frontier_root, epoch, sids)
        return results
    finally:
        events.unpersist()


@dataclass(frozen=True)
class Frontier:
    """A cross-table-consistent read point: every listed table read at its
    recorded snapshot id reflects exactly epochs <= ``epoch``."""

    epoch: int
    snapshot_ids: dict[str, int]


def write_frontier(root: str, epoch: int, snapshot_ids: dict[str, int]) -> str:
    """Atomically publish the epoch marker (write-temp + same-dir rename).
    Idempotent: concurrent replayers of a fully-applied epoch derive the
    same snapshot ids from the tables' commit keys, so double-publishing
    rewrites identical content."""
    path = os.path.join(root, f"epoch-{epoch}.json")
    atomic_write_json(path, {"epoch": epoch, "tables": snapshot_ids}, sort_keys=True)
    return path


def latest_frontier(root: str) -> Frontier | None:
    """The newest fully-applied epoch's marker, or None before the first.
    Frontier pins are valid within the tables' snapshot-retention horizon
    (``expire_snapshots``); pinning past it fails loudly at read time."""
    best = -1
    if os.path.isdir(root):
        for name in os.listdir(root):
            if name.startswith("epoch-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[len("epoch-"):-len(".json")]))
                except ValueError:
                    continue
    if best < 0:
        return None
    with open(os.path.join(root, f"epoch-{best}.json")) as f:
        d = json.load(f)
    return Frontier(d["epoch"], {k: int(v) for k, v in d["tables"].items()})


def read_at_frontier(
    tables: dict[str, LakeTable], frontier: Frontier
) -> dict[str, DataFrame]:
    """Every table's state pinned to the frontier's snapshot ids — the
    multi-table analog of time travel; never observes a torn epoch."""
    return {
        name: tables[name].read(snapshot_id=sid)
        for name, sid in frontier.snapshot_ids.items()
    }


def snapshot_for_epoch(table: LakeTable, epoch: int) -> int | None:
    """Snapshot id of the commit that applied ``epoch`` to this table —
    lets a reader pin ALL tables to the same epoch for a cross-table-
    consistent view (the multi-table analog of time travel)."""
    for snap in table.snapshots():
        if snap.summary.get("epoch") == epoch:
            return snap.snapshot_id
    return None
