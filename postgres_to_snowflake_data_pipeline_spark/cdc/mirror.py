"""Changefeed-driven table replication: a follower LakeTable kept in sync
from a source LakeTable's OWN changefeed.

This is the engine's CDC-out closure property, made load-bearing: the
change rows ``LakeTable.changes()`` emits are themselves a complete,
replayable CDC feed — replaying them through the same LWW merge machinery
that built the source reconverges a follower to the source's exact state.
Downstream sync (read replicas, cross-region copies, re-layout replicas)
then moves O(delta) bytes per cycle, never O(table).

Reference analog: the reference replicates Postgres → Snowflake by a full
clear-and-reload on every run (/root/reference/scripts/load_data.py:119-131,
TRUNCATE + COPY INTO). The mirror is the incremental form of the same job:
the full reload survives only as the bootstrap / repair path
(``LakeTable.overwrite``), and steady state ships deltas.

Semantics and guarantees
------------------------

- **Position** = the source snapshot id the follower reflects. It rides
  every mirror commit's summary (``mirror_src_snapshot``) and is recovered
  by scanning the follower's LIVE chain (``live_snapshots()`` — a stale
  position from a rolled-back follower era can never win), so the mirror
  is resumable from the follower alone: no offset files, no third store.
  A crash before the follower commit replays the window (position
  unchanged); a crash after skips it (position advanced) — exactly-once
  effect. A raced duplicate sync commits identical rows that read-time
  LWW collapses, the same contract as the view refreshes.
- **Incremental sync** applies ``source.changes(pos, until,
  skip_rolled_back=True)`` through the exact dedup+write path
  ``apply_batch`` uses (patch-aware, single fused shuffle), pinned at
  ``until`` so a source commit racing the sync lands in the next window.
- **Source rollbacks propagate**: when the source position was rewound
  past the mirror's position (the mirror consumed merges that a rollback
  killed), the mirror rolls the FOLLOWER back to its newest commit whose
  recorded source position is still live, then resumes incrementally —
  a metadata-only recovery on both sides. Only when no such commit is
  retained does it fall back to a rebuild.
- **Full rebuild** (bootstrap, source history expired past the position,
  source overwrite, non-additive source schema change, no propagation
  point): ``follower.overwrite(source.read(include_internal=True,
  include_tombstones=True))`` — tombstones are carried so late lower-LSN
  rows arriving through later windows still lose, exactly as in
  ``compact``.
- **Re-layout replicas**: the follower may use a different ``n_buckets``
  than the source — every write path re-clusters under the follower's own
  layout, so a mirror doubles as a physical-design tool (e.g. a
  read-optimized replica with more buckets than the hot ingest table).
- **Schema evolution**: additive source changes flow through the merge
  (the follower widens, old rows NULL-fill). A source rename/drop leaves
  the follower with columns the source no longer has — detected by name
  and resolved by rebuild (the replica re-baselines; field-id archaeology
  is the source's job, not the copy's).
- **Properties** (patch declarations, index specs, ANN quantizers…) sync
  from the source snapshot BEFORE each data commit, so a
  ``patch.columns`` declaration reaches the follower before the first
  patch-shaped window is deduped.

At 100 TB: a sync cycle reads only the window's delta manifests' files
(O(1) metadata per commit), shuffles one deduped window, and appends
one delta file per follower bucket — cost ∝ change volume. The rebuild
path is the only O(table) operation and every trigger for it is an
explicitly rare event (expiry misconfiguration, rollback past retention,
re-baseline).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
    _dedup_storage,
    _normalize_batch,
)
from postgres_to_snowflake_data_pipeline_spark.lake.metadata import Snapshot
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable


class TableMirror:
    """Maintain ``follower`` (a LakeTable at ``root``) as a replica of
    ``source``, synced from the source changefeed. See module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        n_buckets: int | None = None,
    ):
        self.spark = spark
        self.root = root
        self.source = source
        self.n_buckets = n_buckets
        self._follower: LakeTable | None = None
        try:
            self._follower = LakeTable.load(spark, root)
        except FileNotFoundError:
            pass  # created on first sync

    # ------------------------------------------------------------------
    @property
    def follower(self) -> LakeTable:
        if self._follower is None:
            raise FileNotFoundError(
                f"mirror at {self.root} has never synced"
            )
        return self._follower

    def read(self, **kwargs):
        """The follower's state (same options as ``LakeTable.read``)."""
        return self.follower.read(**kwargs)

    def position(self) -> int:
        """Source snapshot id the follower reflects — newest LIVE mirror
        commit's recorded position (a follower rollback rewinds it)."""
        if self._follower is None:
            return 0
        for snap in reversed(self._follower.live_snapshots()):
            if "mirror_src_snapshot" in snap.summary:
                return int(snap.summary["mirror_src_snapshot"])
        return 0

    # ------------------------------------------------------------------
    def _covers(self, pos: int) -> bool:
        """True iff the source's retained chain reaches back to ``pos``
        (same rule as the view maintainers)."""
        hist = self.source.snapshots()
        return bool(hist) and hist[0].snapshot_id <= pos + 1

    def _propagation_point(self, safe_pos: int) -> Snapshot | None:
        """Newest LIVE follower commit whose recorded source position is
        ≤ ``safe_pos`` — the rollback-propagation target."""
        assert self._follower is not None
        for snap in reversed(self._follower.live_snapshots()):
            p = snap.summary.get("mirror_src_snapshot")
            if p is not None and int(p) <= safe_pos:
                return snap
        return None

    def _sync_props(self, src_snap: Snapshot) -> None:
        """Fold the source snapshot's table properties onto the follower
        (additions, changes, deletions) ahead of the data commit."""
        assert self._follower is not None
        src_props = dict(src_snap.props)
        cur = self._follower.props
        if cur == src_props:
            return
        updates: dict[str, Any] = {
            k: v for k, v in src_props.items() if cur.get(k) != v
        }
        updates.update({k: None for k in cur if k not in src_props})
        self._follower.update_props(updates)

    # ------------------------------------------------------------------
    def sync(self) -> dict[str, Any] | None:
        """Bring the follower up to the source's current snapshot. Returns
        a stats dict, or None when already current. Safe to call on any
        cadence; resumable after any crash (see module docstring)."""
        src_snap = self.source.current()
        until = src_snap.snapshot_id
        if self._follower is None:
            self._follower = LakeTable.create(
                self.spark,
                self.root,
                src_snap.schema,
                key_cols=list(src_snap.key_cols),
                n_buckets=self.n_buckets or src_snap.n_buckets,
            )
        pos = self.position()
        if until <= pos:
            return None

        mode = "incremental"
        rebuild = False
        fol_names = {f.name for f in self._follower.schema().fields}
        src_names = {f.name for f in src_snap.schema.fields}
        if not fol_names <= src_names:
            # source rename/drop: the follower holds columns the source no
            # longer has — re-baseline instead of guessing the mapping
            mode, rebuild = "rebuild-schema", True
        elif not self._covers(pos):
            mode, rebuild = "rebuild-expired", True
        else:
            # newly dead = merges the mirror INGESTED that a source
            # rollback since its last sync rewound (dead at `until` but
            # not already dead at the mirror's position — those never
            # entered the follower; same criterion as changes())
            dead = self.source.dead_merge_ids(until)
            dead_at_pos = self.source.dead_merge_ids(pos)
            newly_dead = {
                d for d in dead if d <= pos and d not in dead_at_pos
            }
            live_overwrites = [
                s.snapshot_id
                for s in self.source.live_snapshots(until)
                if s.summary.get("operation") == "overwrite"
                and pos < s.snapshot_id <= until
            ]
            if live_overwrites:
                mode, rebuild = "rebuild-overwrite", True
            elif newly_dead:
                # the mirror consumed merges a source rollback killed —
                # propagate the rollback to the follower, then resume
                safe_pos = min(newly_dead) - 1
                target = self._propagation_point(safe_pos)
                if target is None:
                    mode, rebuild = "rebuild-rollback", True
                else:
                    try:
                        self._follower.rollback_to(target.snapshot_id)
                    except ValueError:
                        # follower target no longer reconstructible
                        mode, rebuild = "rebuild-rollback", True
                    else:
                        pos = int(target.summary["mirror_src_snapshot"])
                        mode = "rollback+incremental"

        self._sync_props(src_snap)
        pos_summary = {
            "mirror_src_snapshot": until,
            "mirror_since": pos,
            "mirror_mode": mode,
        }
        if rebuild:
            state = self.source.read(
                snapshot_id=until,
                include_internal=True,
                include_tombstones=True,
            )
            snap = self._follower.overwrite(
                state, schema=src_snap.schema, summary=pos_summary
            )
            rows_in = None
        else:
            feed = self.source.changes(
                pos, until_snapshot_id=until, skip_rolled_back=True
            )
            table_schema, events, obs_fn = _normalize_batch(
                self._follower, feed, f"mirror-{until}"
            )
            storage = _dedup_storage(
                events, table_schema, self._follower.current(), 0
            )
            snap = self._follower.merge(
                storage,
                schema=table_schema,
                summary=pos_summary,
                summary_fn=obs_fn,
            )
            assert snap is not None  # no commit_key -> always commits
            rows_in = snap.summary.get("rows_in")
        return {
            "mode": mode,
            "src_snapshot": until,
            "since": pos,
            "rows_in": rows_in,
            "follower_snapshot": snap.snapshot_id,
        }
