"""Incrementally-maintained aggregate views over a LakeTable changefeed.

The CDC-consumer half of the engine: downstream marts (the reference's
silver/gold reports, /root/reference/dags/silver_layer_dag.py) should not
recompute a 100 TB table every epoch. ``IncrementalAggView`` maintains a
grouped aggregate by *dirty-group recompute*:

1. ``source.changes(last_refreshed)`` — only the delta files committed
   since the last refresh are scanned (manifest-indirected, O(batch)).
2. The distinct group keys in the delta are the *dirty groups*; when the
   leading group column IS the source's bucketing key, the buckets they
   hash into (≤ n_buckets integers — bounded driver state, never a key
   list) prune the source read. Other groupings prune via a persisted
   group→bucket inverted hint (a bounded sidecar maintained from the
   same delta scans, monotone-OR so always a sound superset — see
   ``_hint_buckets_for``): the recompute reads only the buckets the
   dirty groups' rows can live in, and the semi-join still bounds the
   aggregation itself to dirty groups. For groupings
   NOT contained in the source key, the post-image alone is not enough:
   an update can move a row from group A to B (and a tombstone carries
   NULL payload), leaving A stale — so the changed keys' *pre-image*
   groups (their state at the view's last source snapshot, a bucket-
   pruned time-travel point read) are unioned into the dirty set.
3. The aggregate is recomputed for dirty groups ONLY — a bucket-pruned
   scan semi-joined on the dirty keys — and upserted into the view, which
   is itself a LakeTable keyed by the group columns. Groups whose rows all
   disappeared (full-conversation delete) get tombstones.

Cost per refresh ∝ data of the groups that changed, not table size: at
10^10 events in 10^3 epochs, each refresh touches ~10^7 events' worth of
conversations instead of re-aggregating 10^10 rows — and because the group
key shares a prefix with the source's bucket key, the recompute scan reads
only the dirty buckets.

Exactly-once: the view's position in the source history rides in the
commit summary (``source_snapshot``) — a monotone watermark, resumable
from the view alone with no side-channel offset file; a crashed-and-
replayed refresh re-checks it and no-ops (per-refresh commit *keys* are
deliberately not used — they would grow view metadata O(refreshes); see
``refresh``). If source history was expired past the view's position,
refresh detects the gap and falls back to a full rebuild rather than
silently missing expired commits. Works with arbitrary non-decomposable
aggregates (max, percentile, count-distinct) because dirty groups are
recomputed from base data, not patched via retractions.

This is the engine's analog of the reference's recomputed silver layer
(DELETE + re-INSERT of report rows per run, silver_layer_dag.py:82-127),
upgraded to incremental maintenance with exactly-once refresh.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.lake.metadata import atomic_write_json
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable, bucket_expr

#: sidecar file: group -> source-bucket bitmap (the non-key pruning hint)
_HINT_FILE = "group_buckets.json"
_NULL_SENTINEL = "\x00null"


def _hint_key(vals: tuple) -> str:
    """Deterministic string key for a group-value tuple (JSON map key)."""
    return "\x1f".join(_NULL_SENTINEL if v is None else str(v) for v in vals)


class IncrementalAggView:
    """A grouped-aggregate view of ``source``, stored as its own LakeTable
    and refreshed incrementally from the source changefeed.

    ``agg_fn(rows) -> DataFrame`` receives payload rows (current state,
    tombstones excluded) and must return exactly one row per group with
    the ``group_cols`` plus the aggregate columns. It is re-applied only
    to dirty groups, so it may use any aggregate — including ones with no
    retraction rule.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        group_cols: tuple[str, ...],
        agg_fn: Callable[[DataFrame], DataFrame],
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.root = root
        self.source = source
        self.group_cols = tuple(group_cols)
        self.agg_fn = agg_fn
        self.n_buckets = n_buckets
        self._table: LakeTable | None = None
        try:
            self._table = LakeTable.load(spark, root)
        except FileNotFoundError:
            pass  # created lazily on first refresh (schema comes from agg_fn)

    #: dirty-group key sets up to this size are broadcast into the
    #: recompute semi-join (a few MB of keys); larger sets shuffle
    BROADCAST_DIRTY_MAX = 500_000

    #: group->bucket hint caps: beyond MAX_HINT_GROUPS distinct groups the
    #: sidecar marks itself overflowed (a high-cardinality grouping gains
    #: little from bucket pruning anyway); dirty sets beyond
    #: HINT_DIRTY_LOOKUP_MAX skip the driver-side hint lookup
    MAX_HINT_GROUPS = 4096
    HINT_DIRTY_LOOKUP_MAX = 10_000

    # ------------------------------------------------------------------
    # group->bucket inverted hint (non-key groupings). Soundness contract:
    # the sidecar claims "for every row present in any source snapshot
    # <= watermark, the row's (group tuple, source bucket) pair is in
    # `groups`" — a SUPERSET of the current table's pairs (rows only ever
    # change via commits, and every commit's pairs are OR'd in when its
    # delta window is processed; removals leave stale bits, which only
    # widen the pruned read). The sidecar is written BEFORE the view's
    # merge commit: a crash in between leaves watermark > view position,
    # i.e. an overstated hint — still sound. Invalidated wholesale when
    # the source's bucket count changes (rebucket rehashes everything).
    # ------------------------------------------------------------------
    def _hint_path(self) -> str:
        return os.path.join(self.root, _HINT_FILE)

    def _load_hint(self) -> dict[str, Any] | None:
        try:
            with open(self._hint_path()) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _persist_hint(self, hint: dict[str, Any]) -> None:
        atomic_write_json(self._hint_path(), hint)

    def _drop_unrepresentable(self, df: DataFrame, src_snap) -> DataFrame:
        """Drop changefeed rows whose group values name no real group:
        NULLs (tombstone payloads) and, on partial-update sources, the
        patch sentinel in a patch-typed group column. Their true groups
        are dirtied through the pre-image union instead."""
        spec = LakeTable._patch_spec(src_snap)
        pcols = set(spec[0]) if spec is not None else set()
        for g in self.group_cols:
            df = df.filter(F.col(g).isNotNull())
            if g in pcols:
                df = df.filter(F.col(g) != F.lit(spec[1]))
        return df

    def _pairs_of(self, df: DataFrame, key0: str, n_buckets: int) -> list | None:
        """Distinct (group..., bucket) pairs of ``df`` — bounded collect
        (caps at MAX_HINT_GROUPS × n_buckets rows; None = too many)."""
        cap = self.MAX_HINT_GROUPS * n_buckets + 1
        pairs = (
            df.select(
                *self.group_cols, bucket_expr(key0, n_buckets).alias("_b")
            )
            .distinct()
            .limit(cap)
            .collect()
        )
        return None if len(pairs) >= cap else pairs

    def _hint_buckets_for(
        self, src_snap, delta: DataFrame, dirty: DataFrame, dirty_n: int
    ) -> list[int] | None:
        """Update the sidecar with this delta window's (group, bucket)
        pairs, persist it, and return the union of the dirty groups'
        buckets — or None when the hint cannot prune (overflowed /
        oversized dirty set / stale beyond retained history)."""
        key0 = src_snap.key_cols[0]
        nb = src_snap.n_buckets
        hint = self._load_hint()
        if hint is not None and hint.get("n_buckets") != nb:
            hint = None  # rebucketed source: every pair is rehashed
        if (
            hint is not None
            and not hint.get("overflow")
            and int(hint["watermark"]) < self.last_source_snapshot()
            and (
                not self._history_covers(int(hint["watermark"]))
                or self.source.rollback_in_range(int(hint["watermark"]))
            )
        ):
            # gap: the pairs between the hint's watermark and the view's
            # position were expired from the changefeed (or a rollback
            # rewound state — changes() refuses to span it) — the
            # incremental update can't close it, so re-bootstrap from a
            # full scan below
            hint = None
        if hint is None:
            # bootstrap: one column-pruned scan of (groups + key) — the
            # only O(table) pass this hint ever costs
            base = self.source.read(
                snapshot_id=src_snap.snapshot_id, columns=list(self.group_cols)
            )
            pairs = self._pairs_of(base, key0, nb)
            hint = {"watermark": src_snap.snapshot_id, "n_buckets": nb,
                    "overflow": pairs is None, "groups": {}}
            if pairs is not None:
                for r in pairs:
                    k = _hint_key(tuple(r[g] for g in self.group_cols))
                    hint["groups"].setdefault(k, []).append(r["_b"])
            self._persist_hint(hint)
        elif not hint.get("overflow"):
            w = int(hint["watermark"])
            upd = delta if w >= self.last_source_snapshot() else (
                self.source.changes(w)
            )
            live = self._drop_unrepresentable(upd, src_snap)
            pairs = self._pairs_of(live, key0, nb)
            if pairs is None:
                hint["overflow"] = True
                hint["groups"] = {}
            else:
                for r in pairs:
                    k = _hint_key(tuple(r[g] for g in self.group_cols))
                    b = hint["groups"].setdefault(k, [])
                    if r["_b"] not in b:
                        b.append(r["_b"])
                if len(hint["groups"]) > self.MAX_HINT_GROUPS:
                    hint["overflow"] = True
                    hint["groups"] = {}
            hint["watermark"] = src_snap.snapshot_id
            self._persist_hint(hint)
        if hint.get("overflow") or dirty_n > self.HINT_DIRTY_LOOKUP_MAX:
            return None
        groups = hint["groups"]
        out: set[int] = set()
        for r in dirty.collect():
            k = _hint_key(tuple(r[g] for g in self.group_cols))
            got = groups.get(k)
            if got is None:
                # a group the hint has never seen holds no rows anywhere —
                # nothing to read for it (its dirty mark can only produce
                # a tombstone, which needs no source rows)
                continue
            out.update(got)
        return sorted(out)

    # ------------------------------------------------------------------
    def last_source_snapshot(self) -> int:
        """The source snapshot id this view reflects — recovered from the
        view's own commit log (newest refresh summary), no offset file."""
        if self._table is None:
            return 0
        for snap in reversed(self._table.snapshots()):
            if "source_snapshot" in snap.summary:
                return int(snap.summary["source_snapshot"])
        return 0

    def read(self) -> DataFrame:
        if self._table is None:
            raise FileNotFoundError(f"view at {self.root} has never refreshed")
        return self._table.read()

    # ------------------------------------------------------------------
    def _view_schema(self, agg_df: DataFrame) -> T.StructType:
        """View table schema from the aggregate output: group columns keep
        their types; aggregate columns are forced nullable (tombstoned
        group rows carry NULLs)."""
        fields = []
        for f in agg_df.schema.fields:
            nullable = f.nullable or f.name not in self.group_cols
            fields.append(T.StructField(f.name, f.dataType, nullable))
        return T.StructType(fields)

    def _history_covers(self, last: int) -> bool:
        """True iff the source's retained snapshot chain reaches back to
        ``last`` — i.e. ``changes(last)`` can enumerate every commit since
        the view's position. After aggressive ``expire_snapshots`` the
        chain may start later; refreshing from the truncated feed would
        silently miss the expired commits' groups."""
        hist = self.source.snapshots()
        return bool(hist) and hist[0].snapshot_id <= last + 1

    def refresh(self) -> dict[str, Any] | None:
        """Bring the view up to the source's current snapshot. Returns a
        stats dict, or None if already current.

        Idempotency is watermark-based: the view's position
        (``source_snapshot`` in its newest commit summary) is monotone, so
        a crashed-and-replayed refresh re-checks the watermark and no-ops.
        Two refreshers racing past the check both commit, but the rows are
        identical (same ``_lsn`` = source snapshot id), so read-time LWW
        collapses them — exactly-once in effect, at-least-once in commits.
        A deliberately unbounded commit-key list is NOT used: per-refresh
        keys would grow the view's snapshot metadata O(refreshes).

        If the source expired history past the view's position, the
        refresh detects the gap and falls back to a FULL rebuild (every
        current source group ∪ every view group marked dirty) instead of
        silently missing the expired commits' changes."""
        src_snap = self.source.current()
        src_sid = src_snap.snapshot_id
        last = self.last_source_snapshot()
        if src_sid <= last:
            return None

        gcol0 = self.group_cols[0]
        src_keys = set(src_snap.key_cols)
        non_key_grouping = not (set(self.group_cols) <= src_keys)
        # a rollback between the view's position and now rewound source
        # state — the changefeed cannot express it (changes() would raise);
        # rebuild from the current truth
        full_rebuild = not self._history_covers(last) or (
            self.source.rollback_in_range(last)
        )
        if non_key_grouping and not full_rebuild and last > 0:
            # the pre-image lookup below needs snapshot `last` itself to be
            # retained, not just the commits after it …
            hist = self.source.snapshots()
            if hist[0].snapshot_id > last:
                full_rebuild = True
            else:
                # … and to still expose the key/group columns under their
                # current-era names: a rename/drop since `last` breaks the
                # time-travel read (old-era schema) — rebuild once instead
                # of wedging every subsequent incremental refresh
                old_snap = self.source.log.load(last)
                old_names = {f.name for f in old_snap.schema.fields}
                if (
                    tuple(old_snap.key_cols) != tuple(src_snap.key_cols)
                    or not set(self.group_cols) <= old_names
                ):
                    full_rebuild = True
        if full_rebuild:
            changed = self.source.read(snapshot_id=src_sid).select(*self.group_cols)
            if self._table is not None:
                changed = changed.unionByName(
                    self._table.read().select(*self.group_cols)
                )
        else:
            delta = self.source.changes(last)
            changed = delta.select(*self.group_cols)
            if non_key_grouping and last > 0:
                # a group column outside the source key can CHANGE value: an
                # update moving a row from group A to B (or a delete whose
                # tombstone carries NULL payload) dirties the OLD group too.
                # Read the changed keys' prior state at the view's last
                # source snapshot — bucket-pruned by the keys' hash buckets,
                # pre-LWW-filtered by the key set — and mark those groups.
                pre = self.source.point_read_keys(
                    delta.select(*src_snap.key_cols).distinct(),
                    snapshot_id=last,
                )
                changed = changed.unionByName(pre.select(*self.group_cols))
            # NULL group values are not representable as view keys (the
            # dirty semi-join and the view's own bucketing are equality-
            # based): tombstone change rows carry NULL payload columns and
            # would otherwise fabricate a spurious NULL dirty group — their
            # true (pre-image) groups were unioned in above. Same for the
            # patch sentinel on partial-update sources: a changefeed row's
            # "unchanged" marker names no group (the real group was either
            # set by an earlier commit's delta — already dirtied then — or
            # is this key's pre-image, unioned in above).
            if non_key_grouping:
                changed = self._drop_unrepresentable(changed, src_snap)
        # the dirty-group key set is small (distinct changed groups) —
        # checkpoint it so the delta files are scanned ONCE, not re-read by
        # the semi-join, the anti-join, and the bucket collect below
        dirty = changed.distinct().localCheckpoint()
        # Catalyst sees a checkpointed RDD as stats-less and would plan the
        # semi-join as a full sort-merge (shuffling the entire source scan
        # — worse than a recompute). The count is free post-checkpoint;
        # broadcast the key set whenever it plausibly fits, fall back to
        # the shuffle join only for genuinely huge dirty sets.
        dirty_n = dirty.count()

        # dirty buckets: a bounded (≤ n_buckets) driver-side list — the
        # pruning handle for the recompute scan. Never collect group keys.
        # When the view groups by the source's bucketing key the buckets
        # come straight from hashing the dirty groups; for any OTHER
        # grouping the persisted group->bucket hint (sidecar, see
        # _hint_buckets_for) answers "which source buckets can hold these
        # groups' rows" — so even a median/percentile view on a non-key
        # grouping reads only the buckets its dirty groups live in.
        if full_rebuild:
            dirty_buckets = None
        elif gcol0 == src_snap.key_cols[0]:
            dirty_buckets = sorted(
                r["b"]
                for r in dirty.select(
                    bucket_expr(gcol0, src_snap.n_buckets).alias("b")
                )
                .distinct()
                .collect()
            )
        elif non_key_grouping:
            dirty_buckets = self._hint_buckets_for(src_snap, delta, dirty, dirty_n)
        else:
            dirty_buckets = None
        if dirty_n <= self.BROADCAST_DIRTY_MAX:
            dirty = F.broadcast(dirty)
        # recompute reads are PINNED to src_sid: a commit racing the
        # refresh must land in the NEXT watermark window, not leak into
        # this one (recompute is absolute per group, so a leak would
        # self-correct next refresh — the pin just makes each refresh
        # deterministic and the watermark exact)
        if not non_key_grouping:
            # grouping by a key prefix: push the dirty filter BELOW the
            # source's LWW resolution — only dirty conversations' rows are
            # shuffled and resolved, instead of LWW-aggregating the whole
            # bucket and discarding most of it afterwards
            src_read = self.source.read(
                snapshot_id=src_sid, buckets=dirty_buckets, semi_keys=dirty
            )
            rows = src_read
        else:
            src_read = self.source.read(snapshot_id=src_sid, buckets=dirty_buckets)
            rows = src_read.join(dirty, on=list(self.group_cols), how="left_semi")
        # file-level pruning evidence (plan resolution only, no job): what
        # the recompute scan actually opens — soaks and tests assert on it
        source_files_read = sorted(src_read.inputFiles())
        agg = self.agg_fn(rows)
        missing = [c for c in self.group_cols if c not in agg.columns]
        if missing:
            raise ValueError(f"agg_fn output lacks group columns {missing}")

        if self._table is None:
            schema = self._view_schema(agg)
            self._table = LakeTable.create(
                self.spark, self.root, schema,
                key_cols=self.group_cols, n_buckets=self.n_buckets,
            )
        schema = self._table.schema()
        agg_cols = [f.name for f in schema.fields if f.name not in self.group_cols]

        # groups that vanished since the last refresh (every row deleted):
        # dirty but absent from the recomputed aggregate -> tombstones
        gone = dirty.join(
            agg.select(*self.group_cols), on=list(self.group_cols), how="left_anti"
        )
        live = agg.select(
            *self.group_cols,
            *[F.col(c) for c in agg_cols],
            F.lit(False).alias("_deleted"),
        )
        dead = gone.select(
            *self.group_cols,
            *[
                F.lit(None).cast(schema[c].dataType).alias(c)
                for c in agg_cols
            ],
            F.lit(True).alias("_deleted"),
        )
        # source snapshot id as the view LSN: monotone across refreshes, so
        # view-level LWW resolves replays/races exactly like CDC rows. No
        # _bucket column here — merge assigns buckets and owns the single
        # bucket-clustering exchange (one delta file per bucket).
        winners = live.unionByName(dead).select(
            "*", F.lit(src_sid).cast("long").alias("_lsn")
        )
        # no commit key (see docstring): watermark idempotency, and a raced
        # duplicate commit carries identical (key, _lsn) rows — harmless
        snap = self._table.merge(
            winners,
            summary={"source_snapshot": src_sid, "since_snapshot": last,
                     "full_rebuild": full_rebuild},
        )
        assert snap is not None  # merge without a commit key always commits
        return {
            "source_snapshot": src_sid,
            "since_snapshot": last,
            "full_rebuild": full_rebuild,
            "dirty_buckets": (
                len(dirty_buckets) if dirty_buckets is not None
                else src_snap.n_buckets
            ),
            "source_files_read": source_files_read,
            "view_snapshot": snap.snapshot_id,
        }
