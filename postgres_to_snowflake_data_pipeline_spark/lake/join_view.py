"""Incrementally-maintained JOIN views over two LakeTable changefeeds.

The missing mart shape next to ``IncrementalAggView`` (grouped aggregates)
and ``DeltaAggView`` (retraction math): a fact⋈dim equi-join kept current
as BOTH sides change. The reference computes its silver report by
re-joining the full tables every run
(/root/reference/dags/silver_layer_dag.py:82-127 DELETE + re-INSERT);
at 10^10 rows a refresh must instead cost O(changed keys), not O(table).

``IncrementalJoinView`` maintains ``left ⋈ right ON on_cols`` by
*dirty-join-key recompute*:

1. Each refresh reads only the delta files committed on either source
   since the view's last positions (``changes()``, manifest-indirected).
2. The distinct ``on_cols`` values in the two deltas are the *dirty join
   keys*. Because ``on_cols`` must be a subset of the LEFT key and exactly
   the RIGHT key (the fact⋈dim contract), a row can never move between
   join keys — no pre-image lookup is needed (contrast
   ``IncrementalAggView``, whose groups can move).
3. The join is recomputed for dirty keys ONLY: both sources are read
   pinned at their current snapshots with the dirty set pushed BELOW the
   LWW resolution (``read(semi_keys=...)``) and, when ``on_cols[0]`` is a
   source's leading bucket key, bucket-pruned to the ≤ n_buckets the dirty
   keys hash into — so a refresh after one conversation changed opens one
   bucket's files on each side, not the table.
4. Recomputed rows are merged into the view (itself a LakeTable keyed by
   the left key); view rows under a dirty join key that the new join no
   longer produces get tombstones — this is how a dim-side DELETE fans out
   to every fact row of that key under ``how="inner"``.

Cost per refresh ∝ data of the join keys that changed. The recompute is
absolute (current state of both sides), so updates, deletes, late events
and partial-update (patch) sources are all handled by construction — the
patch resolution lives inside ``read()`` and the changefeed always carries
the key columns.

Exactly-once mirrors ``IncrementalAggView``: the view's positions in BOTH
source histories ride the commit summary (monotone watermarks, resumable
from the view alone); a crashed-and-replayed refresh no-ops, a raced
duplicate commits identical rows that read-time LWW collapses. The view
row LSN is ``left_sid + right_sid`` — strictly monotone across refreshes
because snapshot ids only advance (rollback too commits a NEW snapshot,
lake/table.py::rollback_to) and every refresh advances at least one side.
If either source expired history past the view's position (or rewound
state via rollback), refresh falls back to a full rebuild instead of
silently missing changes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable, bucket_expr


class IncrementalJoinView:
    """An equi-join view of two LakeTables, stored as its own LakeTable
    and refreshed incrementally from both sources' changefeeds.

    Contract (the fact⋈dim shape):

    - ``on_cols ⊆ left.key_cols`` and ``tuple(right.key_cols) ==
      tuple(on_cols)`` — the right side is unique per join key, so the
      view is keyed by the LEFT key columns and join keys are immutable
      per row (validated on every refresh, so key renames fail loudly).
    - ``how`` is ``"inner"`` (dim delete removes the fact rows from the
      view) or ``"left"`` (fact rows survive with NULL dim columns).
    - ``left_cols`` / ``right_cols`` select the payload columns carried
      from each side (defaults: every non-key column); names must not
      collide.
    """

    #: dirty-key sets up to this size are broadcast into the recompute
    #: semi-joins (a few MB of keys); larger sets shuffle
    BROADCAST_DIRTY_MAX = 500_000

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        left: LakeTable,
        right: LakeTable,
        on_cols: tuple[str, ...],
        how: str = "inner",
        left_cols: list[str] | None = None,
        right_cols: list[str] | None = None,
        n_buckets: int = 16,
    ):
        if how not in ("inner", "left"):
            raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
        self.spark = spark
        self.root = root
        self.left = left
        self.right = right
        self.on_cols = tuple(on_cols)
        self.how = how
        self.n_buckets = n_buckets
        l_snap, r_snap = left.current(), right.current()
        self._validate_keys(l_snap, r_snap)
        self.view_key_cols = tuple(l_snap.key_cols)
        self.left_cols = (
            list(left_cols)
            if left_cols is not None
            else [
                f.name
                for f in l_snap.schema.fields
                if f.name not in l_snap.key_cols
            ]
        )
        self.right_cols = (
            list(right_cols)
            if right_cols is not None
            else [
                f.name
                for f in r_snap.schema.fields
                if f.name not in self.on_cols
            ]
        )
        clash = (set(self.view_key_cols) | set(self.left_cols)) & set(
            self.right_cols
        )
        if clash:
            raise ValueError(
                f"column name collision between sides: {sorted(clash)} — "
                "rename or restrict left_cols/right_cols"
            )
        self._table: LakeTable | None = None
        try:
            self._table = LakeTable.load(spark, root)
        except FileNotFoundError:
            pass  # created on first refresh

    # ------------------------------------------------------------------
    def _validate_keys(self, l_snap, r_snap) -> None:
        if not set(self.on_cols) <= set(l_snap.key_cols):
            raise ValueError(
                f"on_cols {self.on_cols} must be a subset of the left key "
                f"{tuple(l_snap.key_cols)} (join keys must be immutable "
                "per row — non-key join columns can move between keys, "
                "which dirty-key recompute cannot see)"
            )
        if tuple(r_snap.key_cols) != self.on_cols:
            raise ValueError(
                f"right key {tuple(r_snap.key_cols)} must equal on_cols "
                f"{self.on_cols} (the dim side is unique per join key, so "
                "the view stays keyed by the left key)"
            )

    def last_positions(self) -> tuple[int, int]:
        """(left, right) source snapshot ids the view reflects — recovered
        from the view's own commit log, no offset file."""
        if self._table is None:
            return (0, 0)
        for snap in reversed(self._table.snapshots()):
            if "left_snapshot" in snap.summary:
                return (
                    int(snap.summary["left_snapshot"]),
                    int(snap.summary["right_snapshot"]),
                )
        return (0, 0)

    def read(self) -> DataFrame:
        if self._table is None:
            raise FileNotFoundError(f"view at {self.root} has never refreshed")
        return self._table.read()

    # ------------------------------------------------------------------
    @staticmethod
    def _covers(source: LakeTable, last: int) -> bool:
        """True iff the source's retained chain reaches back to ``last``
        (mirrors IncrementalAggView._history_covers)."""
        hist = source.snapshots()
        return bool(hist) and hist[0].snapshot_id <= last + 1

    def _view_schema(self, l_snap, r_snap) -> T.StructType:
        """Key columns keep the left types; every payload column is forced
        nullable (tombstones carry NULLs; ``how='left'`` carries NULL dim
        columns)."""
        l_by_name = {f.name: f for f in l_snap.schema.fields}
        r_by_name = {f.name: f for f in r_snap.schema.fields}
        fields = [
            T.StructField(k, l_by_name[k].dataType, l_by_name[k].nullable)
            for k in self.view_key_cols
        ]
        for c in self.left_cols:
            fields.append(T.StructField(c, l_by_name[c].dataType, True))
        for c in self.right_cols:
            fields.append(T.StructField(c, r_by_name[c].dataType, True))
        return T.StructType(fields)

    def _dirty_buckets(self, dirty: DataFrame, snap) -> list[int] | None:
        """Buckets the dirty join keys hash into under ``snap``'s layout —
        the file-pruning handle (≤ n_buckets ints, bounded driver state).
        Only available when the join key leads the source's bucket key."""
        if self.on_cols[0] != snap.key_cols[0]:
            return None
        return sorted(
            r["b"]
            for r in dirty.select(
                bucket_expr(self.on_cols[0], snap.n_buckets).alias("b")
            )
            .distinct()
            .collect()
        )

    def refresh(self) -> dict[str, Any] | None:
        """Bring the view up to both sources' current snapshots. Returns a
        stats dict (with file-level pruning evidence), or None if already
        current. Watermark-idempotent — see the module docstring."""
        l_snap, r_snap = self.left.current(), self.right.current()
        self._validate_keys(l_snap, r_snap)
        l_sid, r_sid = l_snap.snapshot_id, r_snap.snapshot_id
        last_l, last_r = self.last_positions()
        if l_sid <= last_l and r_sid <= last_r:
            return None
        on = list(self.on_cols)

        full_rebuild = (
            not self._covers(self.left, last_l)
            or not self._covers(self.right, last_r)
            or self.left.rollback_in_range(last_l)
            or self.right.rollback_in_range(last_r)
        )
        dirty = None
        dirty_n = -1
        l_buckets = r_buckets = v_buckets = None
        if not full_rebuild:
            # dirty join keys: distinct on_cols across BOTH deltas. The
            # changefeed always carries the key columns (tombstones and
            # patch rows included), and on_cols ⊆ both keys, so the dirty
            # set is exact — checkpointed so the delta files are scanned
            # once, not re-read by each semi-join and bucket collect.
            d_l = self.left.changes(last_l).select(*on)
            d_r = self.right.changes(last_r).select(*on)
            dirty = d_l.unionByName(d_r).distinct().localCheckpoint()
            dirty_n = dirty.count()
            l_buckets = self._dirty_buckets(dirty, l_snap)
            r_buckets = self._dirty_buckets(dirty, r_snap)
            if self._table is not None:
                v_buckets = self._dirty_buckets(dirty, self._table.current())
            if dirty_n <= self.BROADCAST_DIRTY_MAX:
                dirty = F.broadcast(dirty)

        # recompute reads PINNED at (l_sid, r_sid): a commit racing the
        # refresh lands in the next watermark window. semi_keys pushes the
        # dirty filter BELOW each source's LWW resolution — only dirty
        # keys' rows are shuffled and resolved.
        if full_rebuild:
            lrows = self.left.read(snapshot_id=l_sid, columns=self.left_cols)
            rrows = self.right.read(snapshot_id=r_sid, columns=self.right_cols)
        else:
            lrows = self.left.read(
                snapshot_id=l_sid,
                buckets=l_buckets,
                semi_keys=dirty,
                columns=self.left_cols,
            )
            rrows = self.right.read(
                snapshot_id=r_sid,
                buckets=r_buckets,
                semi_keys=dirty,
                columns=self.right_cols,
            )
        # file-level pruning evidence (plan resolution only, no job)
        left_files = sorted(lrows.inputFiles())
        right_files = sorted(rrows.inputFiles())
        joined = lrows.join(rrows, on=on, how=self.how)

        if self._table is None:
            self._table = LakeTable.create(
                self.spark,
                self.root,
                self._view_schema(l_snap, r_snap),
                key_cols=self.view_key_cols,
                n_buckets=self.n_buckets,
            )
        schema = self._table.schema()
        payload = [c for c in self.left_cols] + [c for c in self.right_cols]
        new = joined.select(*self.view_key_cols, *payload)

        # view rows under dirty keys the new join no longer produces →
        # tombstones (dim delete fan-out under how='inner'; fact delete on
        # both). The old-keys read is itself bucket-pruned + semi-filtered.
        if full_rebuild:
            old = (
                self._table.read(columns=[])
                if self._table.snapshots()
                else None
            )
        elif dirty_n > 0:
            old = self._table.read(
                buckets=v_buckets, semi_keys=dirty, columns=[]
            )
        else:
            old = None
        vk = list(self.view_key_cols)
        if old is not None:
            gone = old.join(new.select(*vk), on=vk, how="left_anti")
        else:
            gone = self.spark.createDataFrame(
                [], T.StructType([schema[k] for k in vk])
            )

        # left_sid + right_sid: strictly monotone view LSN (see module
        # docstring) — replays/races resolve by read-time LWW exactly like
        # CDC rows
        lsn = l_sid + r_sid
        live = new.select(
            "*",
            F.lit(False).alias("_deleted"),
            F.lit(lsn).cast("long").alias("_lsn"),
        )
        dead = gone.select(
            *vk,
            *[
                F.lit(None).cast(schema[c].dataType).alias(c)
                for c in payload
            ],
            F.lit(True).alias("_deleted"),
            F.lit(lsn).cast("long").alias("_lsn"),
        )
        snap = self._table.merge(
            live.unionByName(dead),
            summary={
                "left_snapshot": l_sid,
                "right_snapshot": r_sid,
                "since_left": last_l,
                "since_right": last_r,
                "full_rebuild": full_rebuild,
            },
        )
        assert snap is not None  # merge without a commit key always commits
        return {
            "left_snapshot": l_sid,
            "right_snapshot": r_sid,
            "since_left": last_l,
            "since_right": last_r,
            "full_rebuild": full_rebuild,
            "dirty_keys": dirty_n,
            "left_files_read": left_files,
            "right_files_read": right_files,
            "view_snapshot": snap.snapshot_id,
        }
