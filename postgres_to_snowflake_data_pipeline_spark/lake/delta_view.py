"""Delta-aggregated materialized views: decomposable aggregates maintained
from the changefeed ALONE — no source rescan.

``IncrementalAggView`` (lake/view.py) recomputes dirty groups from base
data, which supports arbitrary aggregates but scans every source bucket
when the grouping is not the source's bucket key. For *decomposable*
aggregates (sum / count / avg — the ones with a retraction rule) that
rescan is unnecessary: the view can be patched algebraically,

    new_total(g) = old_total(g) + agg(post-image rows of g)
                                - agg(pre-image rows of g)

so a refresh costs O(delta), independent of both table size and grouping.

Where the images come from:

- **post-image**: the closed window ``source.changes(last, until=now)`` —
  exactly the epoch's delta files (manifest-indirected).
- **pre-image** (``append_only=False``, the general CDC case): the changed
  KEYS' prior state at the view's last source snapshot — a bucket-pruned,
  pre-LWW semi-joined time-travel point read, O(changed keys) not O(table).
  The current state of those keys is then LWW over (pre-image ∪ delta) —
  no second base read.
- **append-only sources** (``append_only=True``: every change row is a new
  key, no updates/deletes — e.g. an event stream keyed by (conv_id, lsn)):
  the pre-image is empty by contract, so a refresh reads ONLY the epoch's
  delta files (pinned by tests/test_delta_view.py via ``inputFiles``).
  Deletes in the window are detected and rejected loudly; updates to
  pre-existing keys are the caller's contract (they would double-count),
  the same trust level as ``merge()``'s ``_bucket`` fast path.

A group an update MOVED a row out of gets a negative adjustment from its
pre-image row — the staleness class ADVICE r02 flagged for dirty-set
maintenance cannot occur here by construction. Groups whose implicit
``n_rows`` count reaches zero are tombstoned.

Exactly-once: watermark idempotency exactly as lake/view.py (the closed
``until_snapshot_id`` window additionally makes the adjustment immune to
commits racing the refresh — they land in the NEXT window). View rows are
ABSOLUTE totals (old + adjustment), so replayed/raced refreshes write
identical rows and read-time LWW collapses them.

At 100 TB: refresh work = one shuffle of the delta keyed by group, one
point read of the changed keys (none when append-only), one bucket-pruned
read of the view's dirty groups. min/max are additionally maintainable on
APPEND-ONLY sources (an extremum can never be invalidated there; merged
via least/greatest); over updating sources min/max/percentile have no
retraction rule — use IncrementalAggView for those.

count-distinct is the classic non-decomposable aggregate — exact distinct
state per group is O(cardinality), so an exact incremental view degrades
to a rescan. The ``approx_distinct`` measure makes it mergeable the way
every large engine does: per-group DataSketches HLL state (a few KB,
bounded by lgConfigK, NOT by cardinality) stored as a binary view column,
built with ``hll_sketch_agg`` over each window's post-images and merged
into the stored sketch with ``hll_union``; ``read()`` surfaces
``hll_sketch_estimate`` (~1.6% std error at the default lgConfigK=12)
under the measure name. Sketches cannot retract either, so the same
append-only contract as min/max applies.

PERCENTILES are non-decomposable too (the other O(table) refresh the
round-3 verdict flagged), but unlike min/max a HISTOGRAM of them is fully
retractable: the ``approx_p{N}`` measures (``approx_p50``, ``approx_p95``,
1 ≤ N ≤ 99) maintain a per-group log-binned histogram as a sparse
``map<bin,count>`` column — bin counts are plain signed sums, so updates
AND deletes retract exactly and the measure works on general CDC sources
(no append-only contract). ``read()`` walks the cumulative counts to the
requested rank and surfaces the hit bin's midpoint: the answer is the true
percentile to within one bin's width (bins subdivide each power-of-two
octave in 8 linear steps — worst-case ±6.25% relative). Everything is
EXACT integer/dyadic arithmetic (octave from the bit length of the value,
sub-bin from an integer shift-divide, midpoint = 2^e·(17+2s)/16 — all
exactly-representable doubles), so the maintained state, a from-scratch
recompute, and a DuckDB oracle agree bit-for-bit; the contract is that the
measure expression is INTEGER-VALUED (lengths, counts, micros, cents —
enforced per row), the same money-in-cents discipline the oracle gate
already taught us for sums.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.lake.table import (
    LakeTable,
    bucket_expr,
    resolve_lww,
)

#: measure spec: view column ->
#:   ("sum"|"avg"|"var"|"stddev", <sql expr>) | ("count", "*" | <sql expr>)
#:   | ("min"|"max"|"approx_distinct", <sql expr>)   [append-only only]
MeasureSpec = dict[str, tuple[str, str]]

#: DataSketches HLL precision for approx_distinct state: 2^12 buckets,
#: ~1.6% relative standard error, sketch <= ~4 KB per group
HLL_LG_K = 12

#: approx_p{N} histogram geometry: each power-of-two octave splits into 8
#: linear sub-bins -> worst-case relative half-width (2^{1/8}-ish) 6.25%;
#: a 64-bit integer domain spans <= 63*8 = 504 positive bins and only
#: NON-ZERO bins are stored (map<long,long> per group)
HIST_SUB_BINS = 8
#: bin id for exact zero — below every positive bin (those are >= 0)
HIST_ZERO_BIN = -1_000_000_000
#: negative values mirror below the zero bin, ordered so the bin id stays
#: monotone in the value: bin = HIST_NEG_BASE - posbin(-v)
HIST_NEG_BASE = -2_000_000_000


def parse_hist_op(op: str) -> int | None:
    """``approx_p{N}`` -> N (1..99), else None."""
    if not op.startswith("approx_p"):
        return None
    tail = op[len("approx_p"):]
    if not tail.isdigit():
        return None
    pct = int(tail)
    return pct if 1 <= pct <= 99 else None


def hist_bin(v: F.Column) -> F.Column:
    """Histogram bin of an integer-valued column, in EXACT arithmetic:
    octave e = bit_length(|v|) - 1 (via ``bin()``'s string length — no
    floating log whose last ulp could disagree across engines), sub-bin
    s = |v|*8 div 2^e - 8 ∈ [0, 8). Monotone in v across the negative /
    zero / positive ranges. Non-integer or overflowing values raise (the
    measure contract is integer-valued expressions; quantize upstream)."""
    d = v.cast("double")
    checked = F.when(
        (d != F.floor(d)) | (F.abs(d) >= F.lit(float(2**53))),
        F.raise_error(
            F.lit(
                "approx_p measures need integer-valued expressions "
                "(|v| < 2^53): lengths, counts, micros, cents"
            )
        ).cast("double"),
    ).otherwise(d)
    a = F.abs(checked).cast("long")
    e = (F.length(F.bin(a)) - 1).cast("long")
    # a / 2^(e-3) ∈ [8, 16): a is < 2^53 so exact as a double, and scaling
    # by a power of two only moves the exponent — the quotient is exact
    sub = a.cast("double") / F.pow(F.lit(2.0), (e - 3).cast("double"))
    posbin = e * 8 + F.floor(sub).cast("long") - 8
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(checked == 0, F.lit(HIST_ZERO_BIN))
        .when(checked > 0, posbin)
        .otherwise(F.lit(HIST_NEG_BASE) - posbin)
    )


def hist_bin_value(b: F.Column) -> F.Column:
    """Midpoint of a histogram bin — 2^e · (17 + 2s)/16, an EXACTLY
    representable double (power of two × dyadic), so every engine
    computing it from the same bin id gets the same bits."""

    def mid(bb: F.Column) -> F.Column:
        e = F.floor(bb / F.lit(8.0)).cast("long")
        s = bb - e * 8
        return (
            F.pow(F.lit(2.0), e.cast("double"))
            * (F.lit(17.0) + s.cast("double") * 2)
            / F.lit(16.0)
        )

    return (
        F.when(b == HIST_ZERO_BIN, F.lit(0.0))
        .when(b > HIST_ZERO_BIN, mid(b))
        .otherwise(-mid(F.lit(HIST_NEG_BASE) - b))
    )

#: implicit live-row count per group — the group-death detector, always
#: maintained and exposed as a view column
N_ROWS = "n_rows"


class DeltaAggView:
    """A sum/count/avg aggregate view of ``source`` maintained by retraction
    math over the changefeed, stored as its own LakeTable keyed by
    ``group_cols``.

    ``payload_cols`` names the non-key source columns the measures and
    grouping reference — the projection pushed through the source's LWW
    resolution (without it a 2-measure view would shuffle every payload
    column of a 100 TB table on the pre-image read).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        group_cols: tuple[str, ...],
        measures: MeasureSpec,
        payload_cols: list[str] | None = None,
        append_only: bool = False,
        n_buckets: int = 16,
    ):
        bad = {
            name: op
            for name, (op, _) in measures.items()
            if op not in (
                "sum", "count", "avg", "var", "stddev",
                "min", "max", "approx_distinct",
            )
            and parse_hist_op(op) is None
        }
        if bad:
            raise ValueError(
                f"unknown measure ops {bad}: sum/count/avg/var/stddev/"
                "approx_p{1..99} always; min/max/approx_distinct on "
                "append-only sources"
            )
        monotone = {
            n for n, (op, _) in measures.items()
            if op in ("min", "max", "approx_distinct")
        }
        if monotone and not append_only:
            raise ValueError(
                f"measures {sorted(monotone)} have no retraction rule — "
                "min/max (old extrema can never be invalidated) and "
                "approx_distinct (HLL sketches only union) are only "
                "maintainable on append_only sources; use "
                "IncrementalAggView over updating sources"
            )
        if N_ROWS in measures or N_ROWS in group_cols:
            raise ValueError(f"column name {N_ROWS!r} is reserved")
        if LakeTable._patch_spec(source.current()) is not None:
            # the retraction math unions event-shaped deltas with pre-images
            # and resolves whole-row LWW — on a partial-update table a patch
            # delta's unset columns would wrongly beat the pre-image values.
            # IncrementalAggView recomputes dirty groups from the (patch-
            # resolved) table and stays exact there.
            raise ValueError(
                "DeltaAggView is not supported on partial-update tables "
                "(patch.columns declared) — use IncrementalAggView, whose "
                "dirty-group recompute reads the patch-resolved state"
            )
        self.spark = spark
        self.root = root
        self.source = source
        self.group_cols = tuple(group_cols)
        self.measures = dict(measures)
        self.payload_cols = list(payload_cols) if payload_cols is not None else None
        self.append_only = append_only
        self.n_buckets = n_buckets
        self._table: LakeTable | None = None
        try:
            self._table = LakeTable.load(spark, root)
        except FileNotFoundError:
            pass

    # ------------------------------------------------------------------
    def last_source_snapshot(self) -> int:
        if self._table is None:
            return 0
        for snap in reversed(self._table.snapshots()):
            if "source_snapshot" in snap.summary:
                return int(snap.summary["source_snapshot"])
        return 0

    def read(self) -> DataFrame:
        """View rows: group columns, ``n_rows``, and the measures. A sum
        whose group currently has NO non-null contribution reads as NULL
        (matching a full recompute / SQL ``sum`` semantics): totals are
        stored 0-based for the retraction arithmetic alongside a hidden
        non-null contribution counter ``_nn_{name}``, and the NULL-ness
        is re-derived here."""
        if self._table is None:
            raise FileNotFoundError(f"view at {self.root} has never refreshed")
        df = self._table.read()
        for name in self._null_tracked():
            op = self.measures[name][0]
            nn = F.col(f"_nn_{name}")
            if op == "avg":
                val, cond = F.col(name) / nn, nn > 0
            elif op in ("var", "stddev"):
                # stored state is Chan central moments: name = M2 (sum of
                # squared deviations), _mu = mean — var_samp = M2/(n-1).
                # clamp: float noise can leave a tiny negative where the
                # true variance is 0 (constant group)
                var = F.greatest(F.col(name) / (nn - 1), F.lit(0.0))
                val = F.sqrt(var) if op == "stddev" else var
                cond = nn >= 2  # var_samp/stddev_samp need n-1 > 0
            else:
                val, cond = F.col(name), nn > 0
            df = df.withColumn(name, F.when(cond, val))
        for name in self._sketched():
            # count(distinct x) over an all-NULL group is 0, and an empty
            # sketch estimates 0 — coalesce only covers legacy NULL storage
            df = df.withColumn(
                name,
                F.coalesce(F.hll_sketch_estimate(F.col(name)), F.lit(0)),
            )
        for name, pct in self._hist_tracked().items():
            # percentile from the stored histogram: walk the bins in order
            # to rank ceil(n·pct/100) and surface the hit bin's midpoint.
            # All arithmetic is exact (integer counts; the rank division is
            # a multiple-of-100 divide; the midpoint is a dyadic double),
            # so any engine recomputing from the same rows agrees exactly.
            m = F.col(name)
            entries = F.array_sort(m)  # key-sorted invariant, kept anyway
            n = F.aggregate(
                entries,
                F.lit(0).cast("long"),
                lambda acc, e: acc + e["count"],
            )
            num = n * pct + 99
            rank = ((num - F.pmod(num, 100)) / 100).cast("long")
            acc0 = F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("long").alias("bin"),
            )
            hit = F.aggregate(
                entries,
                acc0,
                lambda acc, e: F.struct(
                    (acc["cum"] + e["count"]).alias("cum"),
                    F.when(acc["bin"].isNotNull(), acc["bin"])
                    .when(acc["cum"] + e["count"] >= rank, e["bin"])
                    .alias("bin"),
                ),
            )["bin"]
            df = df.withColumn(
                name,
                F.when(m.isNotNull() & (n > 0), hist_bin_value(hit)),
            )
        return df.select(*self.group_cols, *[N_ROWS, *self.measures])

    # ------------------------------------------------------------------
    def _null_tracked(self) -> list[str]:
        """Measures needing a non-null contribution counter: sums (whose
        SQL semantics are NULL over an all-NULL group, a state plain
        retraction arithmetic cannot distinguish from a zero total) and
        avgs (the counter doubles as the denominator — SQL ``avg`` is
        sum over the NON-NULL contributions divided by their count), and
        var/stddev (denominator and the n in the moment formula)."""
        return [
            n for n, (op, _) in self.measures.items()
            if op in ("sum", "avg", "var", "stddev")
        ]

    def _chan_tracked(self) -> list[str]:
        """var/stddev measures, maintained as CHAN-STYLE CENTRAL MOMENTS
        (n, mean, M2): storage columns are ``{name}`` = M2 (sum of squared
        deviations from the mean), ``_mu_{name}`` = mean, and the shared
        ``_nn_{name}`` = n. Each refresh window aggregates its post-image
        rows and its pre-image rows into SEPARATE (n, mu, m2) states via
        built-in count/avg/var_pop (all Tungsten declarative aggregates),
        and the per-group merge join applies remove-then-add:

            remove pre-images R from stored O (the exact inverse of
            Chan's pairwise combine), then add post-images A:
            mu' = mu + (mu - mu_r)*n_r/n';  M2' = M2 - M2_r - d^2*n_r*n'/n
            then the standard combine with A.

        The remove-step mean is computed as a CORRECTION to the stored
        mean (mu + (mu - mu_r)*n_r/n'), never as a difference of raw-sum
        products ((n*mu - n_r*mu_r)/n') — the products round at eps*|mu|*n
        and their difference cancels, whereas (mu - mu_r) cancels the
        large offset first; in particular a constant group whose per-set
        means are exact (integer-valued doubles — lsn, epoch micros,
        lengths — i.e. sums below 2^53) has mu == mu_r exactly, so mu',
        d and M2' stay exactly 0.0.

        Central moments keep the error relative to M2 itself — the
        raw-moment form this replaced (S2 - S1^2/n) cancels
        catastrophically when mean^2 >> variance (relative error ~
        (mean^2/var) * 2^-52), which made huge-offset near-constant
        columns (epoch-micros timestamps, raw lsn) untrustworthy. Those
        now work up to the REPRESENTATION's noise floor: a stored double
        mean carries absolute rounding ~eps*|mu|, so a group whose true
        spread is below ~eps*|mu| (values ~1e15 agreeing to within a few
        units) reads a maintained variance dominated by that noise —
        a storage-precision limit no update order can beat, not a
        cancellation bug. Requesting var AND stddev of the same
        expression stores each measure's moments independently (derive
        stddev from var downstream to halve the state)."""
        return [
            n for n, (op, _) in self.measures.items()
            if op in ("var", "stddev")
        ]

    def _sketched(self) -> list[str]:
        """approx_distinct measures — stored as binary HLL sketches,
        estimated at read time."""
        return [
            n for n, (op, _) in self.measures.items()
            if op == "approx_distinct"
        ]

    def _hist_tracked(self) -> dict[str, int]:
        """approx_p{N} measures -> percentile (1..99). Stored as sparse
        ``map<bin,count>`` histograms (see module docstring): fully
        retractable, so allowed on general CDC sources (stored as key-sorted
        entry arrays — MapType is not orderable for the view table)."""
        out: dict[str, int] = {}
        for n, (op, _) in self.measures.items():
            pct = parse_hist_op(op)
            if pct is not None:
                out[n] = pct
        return out

    def _agg_exprs(self) -> list[F.Column]:
        """Signed adjustment aggregates over rows carrying the measures'
        source expressions as ``_v_{name}`` (see ``_payload_select``): each
        live pre-image row enters with sign -1, each live post-image row
        with +1 — one aggregation yields exactly agg(post) - agg(pre).
        Sum adjustments are coalesced to typed 0 (an all-NULL window is a
        zero adjustment) and paired with a ``_nn_{name}`` contribution
        count so ``read`` can restore NULL semantics."""
        sign = F.col("_sign")
        hist = self._hist_tracked()
        out = [F.sum(sign).cast("long").alias(N_ROWS)]
        for name, (op, expr) in self.measures.items():
            if name in hist:
                continue  # maps need a per-bin pre-agg: built in _signed_agg
            v = F.col(f"_v_{name}")
            if op in ("sum", "avg"):
                # avg is maintained AS its sum; read() divides by _nn
                out.append(F.coalesce(F.sum(sign * v), F.lit(0)).alias(name))
            elif op in ("var", "stddev"):
                # Chan moments need the window's ADD set (post-images,
                # sign +1) and REMOVE set (pre-images, sign -1) as
                # separate (n, mu, m2) states — a net signed mixture has
                # no meaningful M2. count/avg/var_pop are declarative
                # Tungsten aggregates; the structs merge in
                # _apply_adjustment's remove-then-add.
                vd = v.cast("double")
                for tag, side in (("_add_", F.when(sign > 0, vd)),
                                  ("_rem_", F.when(sign < 0, vd))):
                    n_ = F.count(side)
                    out.append(
                        F.struct(
                            n_.cast("long").alias("n"),
                            F.coalesce(F.avg(side), F.lit(0.0)).alias("mu"),
                            F.coalesce(
                                F.var_pop(side) * n_, F.lit(0.0)
                            ).alias("m2"),
                        ).alias(f"{tag}{name}")
                    )
            elif op in ("min", "max"):
                # append-only contract (enforced in __init__): every window
                # row carries sign +1, so the window extremum merges with
                # the stored one via least/greatest in _apply_adjustment
                out.append((F.min(v) if op == "min" else F.max(v)).alias(name))
            elif op == "approx_distinct":
                # append-only contract again: the window sketch unions into
                # the stored sketch in _apply_adjustment. NULL inputs are
                # skipped by the agg; an all-NULL window yields an EMPTY
                # (non-NULL) sketch, a no-op under union.
                out.append(F.hll_sketch_agg(v, HLL_LG_K).alias(name))
            elif expr == "*":
                out.append(F.sum(sign).cast("long").alias(name))
            else:
                out.append(
                    F.sum(F.when(v.isNotNull(), sign).otherwise(F.lit(0)))
                    .cast("long")
                    .alias(name)
                )
        for name in self._null_tracked():
            v = F.col(f"_v_{name}")
            out.append(
                F.sum(F.when(v.isNotNull(), sign).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"_nn_{name}")
            )
        return out

    def _signed_agg(self, signed: DataFrame) -> DataFrame:
        """Aggregate signed rows to per-group adjustments (or, when every
        row has sign +1, absolute totals). NULL group values cannot be view
        keys (equality joins + bucketing) and are excluded consistently.

        approx_p histograms aggregate separately — (group, bin) first,
        then bins fold into one ``map<bin,count>`` row per group (the
        collect_list is over the group's NON-ZERO bins, <= 504 per sign
        by construction, not over its rows) — and join back on the group
        key. Zero net counts are dropped so windows that merely MOVE a
        value within a bin leave no entry."""
        gcols = list(self.group_cols)
        for g in gcols:
            signed = signed.filter(F.col(g).isNotNull())
        hist = self._hist_tracked()
        if hist:
            signed = signed.localCheckpoint()  # scanned once per agg below
        base = signed.groupBy(*gcols).agg(*self._agg_exprs())
        for name in hist:
            m = (
                signed.select(
                    *gcols,
                    hist_bin(F.col(f"_v_{name}")).alias("_b"),
                    F.col("_sign"),
                )
                .filter(F.col("_b").isNotNull())
                .groupBy(*gcols, "_b")
                .agg(F.sum("_sign").cast("long").alias("_c"))
                .filter(F.col("_c") != 0)
                .groupBy(*gcols)
                .agg(
                    # stored as a key-sorted entry ARRAY, not a map: the
                    # view table's LWW dedup orders rows by a struct of
                    # every column and Spark cannot order MapType
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_b").alias("bin"),
                                F.col("_c").alias("count"),
                            )
                        )
                    ).alias(name)
                )
            )
            base = base.join(m, on=gcols, how="left")
        return base

    def _columns(self) -> list[str] | None:
        if self.payload_cols is None:
            return None
        src_keys = set(self.source.current().key_cols)
        extra = [g for g in self.group_cols if g not in src_keys]
        return sorted(set(self.payload_cols) | set(extra))

    def _measure_cols(self) -> list[str]:
        return [
            N_ROWS,
            *self.measures,
            *[f"_mu_{n}" for n in self._chan_tracked()],
            *[f"_nn_{n}" for n in self._null_tracked()],
        ]

    # ------------------------------------------------------------------
    def refresh(self, evidence: bool = False) -> dict[str, Any] | None:
        """Advance the view to the source's current snapshot; None if
        already current. ``evidence=True`` adds ``source_files_read`` to
        the stats (the inputFiles of every source scan in the refresh) —
        test/audit hook for the reads-only-the-delta contract."""
        src_snap = self.source.current()
        src_sid = src_snap.snapshot_id
        last = self.last_source_snapshot()
        if src_sid <= last:
            return None

        hist = self.source.snapshots()
        covers = bool(hist) and hist[0].snapshot_id <= last + 1
        if covers and self.source.rollback_in_range(last, src_sid):
            # a rollback rewound source state inside the window — not
            # expressible as retractions; rebuild from the current truth
            covers = False
        needs_preimage = not self.append_only and last > 0
        if covers and needs_preimage:
            # the pre-image read needs snapshot `last` itself retained
            covers = hist[0].snapshot_id <= last
        if not covers:
            return self._full_rebuild(src_sid, last)
        if needs_preimage and not self._era_compatible(last, src_snap):
            # a rename/drop between `last` and now: the old-era snapshot's
            # column/key names no longer line up with the current-era
            # delta — the incremental path cannot run; rebuild once
            return self._full_rebuild(src_sid, last)

        delta = self.source.changes(last, until_snapshot_id=src_sid)
        if self.append_only:
            if not delta.filter(F.col("op") == "delete").isEmpty():
                raise ValueError(
                    "append_only=True but the change window contains "
                    "deletes — retraction needs the pre-image; rebuild the "
                    "view with append_only=False"
                )
            pre_live = None
            post_all = resolve_lww(
                delta.select(*self._delta_cols(src_snap)),
                src_snap.key_cols,
            )
            files_read = delta.inputFiles() if evidence else None
        elif last == 0:
            # nothing pre-existed at the creation snapshot — the pre-image
            # is empty by definition, and snapshot 0 itself may already be
            # expired: never time-travel to it. Deletes in the window just
            # resolve to tombstones that the live filter drops.
            pre_live = None
            post_all = resolve_lww(
                delta.select(*self._delta_cols(src_snap)),
                src_snap.key_cols,
            )
            files_read = delta.inputFiles() if evidence else None
        else:
            pre_all = self.source.point_read_keys(
                delta.select(*src_snap.key_cols).distinct(),
                snapshot_id=last,
                include_internal=True,
                include_tombstones=True,
                columns=self._columns(),
            ).drop("_bucket")
            files_read = (
                sorted(set(delta.inputFiles()) | set(pre_all.inputFiles()))
                if evidence
                else None
            )
            pre_all = pre_all.localCheckpoint()  # scanned by pre AND post
            pre_live = pre_all.filter(~F.col("_deleted"))
            post_all = resolve_lww(
                pre_all.unionByName(delta.select(*self._delta_cols(src_snap))),
                src_snap.key_cols,
            )
        post_live = post_all.filter(~F.col("_deleted"))

        signed = post_live.select(
            *self.group_cols, *self._payload_select(), F.lit(1).alias("_sign")
        )
        if pre_live is not None:
            signed = signed.unionByName(
                pre_live.select(
                    *self.group_cols,
                    *self._payload_select(),
                    F.lit(-1).alias("_sign"),
                )
            )
        adj = self._signed_agg(signed).localCheckpoint()
        return self._apply_adjustment(
            adj, src_sid, last, full_rebuild=False, files_read=files_read
        )

    def _delta_cols(self, src_snap) -> list[F.Column]:
        cols = self._columns()
        names = (
            list(src_snap.key_cols) + cols
            if cols is not None
            else [f.name for f in src_snap.schema.fields]
        )
        # dict-dedup keeps key columns once when payload_cols overlaps keys
        names = list(dict.fromkeys(names))
        return [
            *[F.col(c) for c in names],
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "delete").alias("_deleted"),
        ]

    def _payload_select(self) -> list[F.Column]:
        """Measure source expressions, evaluated once per image row."""
        out = []
        for name, (op, expr) in self.measures.items():
            if not (op == "count" and expr == "*"):
                out.append(F.expr(expr).alias(f"_v_{name}"))
        return out

    def _era_compatible(self, old_sid: int, src_snap) -> bool:
        """True iff the old-era snapshot still exposes the key columns and
        payload columns under the names the current-era refresh will use
        (a rename/drop in between breaks the pre-image read)."""
        old = self.source.log.load(old_sid)
        if tuple(old.key_cols) != tuple(src_snap.key_cols):
            return False
        cols = self._columns()
        need = set(src_snap.key_cols) | set(
            cols if cols is not None else [f.name for f in src_snap.schema.fields]
        )
        return need <= {f.name for f in old.schema.fields}

    # ------------------------------------------------------------------
    def _full_rebuild(self, src_sid: int, last: int) -> dict[str, Any]:
        """Source history no longer reaches the view's position: recompute
        absolute totals from the current state and tombstone vanished
        groups — identical fallback contract to IncrementalAggView.

        The read is PINNED to ``src_sid``: this view's arithmetic is not
        idempotent, so aggregating an unpinned current state while
        recording ``src_sid`` as the watermark would double-count any
        commit racing the rebuild (the next refresh would re-apply its
        window as an adjustment)."""
        rows = self.source.read(snapshot_id=src_sid, columns=self._columns())
        totals = self._signed_agg(
            rows.select(
                *self.group_cols, *self._payload_select(), F.lit(1).alias("_sign")
            )
        ).localCheckpoint()
        return self._apply_adjustment(
            totals, src_sid, last, full_rebuild=True, files_read=None
        )

    def _apply_adjustment(
        self,
        adj: DataFrame,
        src_sid: int,
        last: int,
        full_rebuild: bool,
        files_read: list[str] | None,
    ) -> dict[str, Any]:
        gcols = list(self.group_cols)
        mcols = self._measure_cols()
        chan = set(self._chan_tracked())

        hist = set(self._hist_tracked())

        def storage_type(c: str) -> T.DataType:
            # Chan state columns (M2, mean) are not adj columns — adj
            # carries them inside the _add_/_rem_ structs
            if c in chan or (c.startswith("_mu_") and c[4:] in chan):
                return T.DoubleType()
            if c in hist:
                # canonical FULLY-NULLABLE entry-array type: collect_list
                # infers non-nullable struct fields, but the merged
                # higher-order expression is nullable — casting nullable
                # to non-nullable is rejected, so store nullable
                return T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("bin", T.LongType(), True),
                            T.StructField("count", T.LongType(), True),
                        ]
                    ),
                    True,
                )
            return adj.schema[c].dataType

        if self._table is None:
            fields = [adj.schema[g] for g in gcols] + [
                T.StructField(c, storage_type(c), True) for c in mcols
            ]
            self._table = LakeTable.create(
                self.spark, self.root, T.StructType(fields),
                key_cols=self.group_cols, n_buckets=self.n_buckets,
            )
        schema = self._table.schema()

        def storage_from_window(c: str) -> F.Column:
            """adj column -> storage shape: a full-rebuild (or brand-new
            group) window is all post-images, so the Chan state IS the
            _add struct (the _rem struct is provably empty)."""
            if c in chan:
                return F.col(f"_add_{c}")["m2"].alias(c)
            if c.startswith("_mu_") and c[4:] in chan:
                return F.col(f"_add_{c[4:]}")["mu"].alias(c)
            return F.col(c)

        if full_rebuild:
            # totals are absolute; every existing view group not in them died
            new = adj.select(*gcols, *[storage_from_window(c) for c in mcols])
            old_groups = self._table.read().select(*gcols)
            gone = old_groups.join(adj.select(*gcols), on=gcols, how="left_anti")
        else:
            dirty = adj.select(*gcols)
            view_buckets = sorted(
                r["b"]
                for r in dirty.select(
                    bucket_expr(gcols[0], self._table.current().n_buckets).alias("b")
                )
                .distinct()
                .collect()
            )
            old = self._table.read(buckets=view_buckets, semi_keys=F.broadcast(dirty))
            joined = adj.alias("d").join(old.alias("o"), on=gcols, how="left")
            ops = {n: op for n, (op, _) in self.measures.items()}

            def chan_exprs(n: str) -> dict[str, F.Column]:
                """Remove-then-add central-moment merge for var measure
                ``n`` (see _chan_tracked): subtract the window's pre-image
                state R from the stored state O (exact inverse of Chan's
                pairwise combine), then combine with the post-image state
                A. Every division is guarded by its count; M2 clamps at 0
                (constant groups can land epsilon-negative)."""
                o_n = F.coalesce(F.col(f"o._nn_{n}"), F.lit(0))
                o_mu = F.coalesce(F.col(f"o._mu_{n}"), F.lit(0.0))
                o_m2 = F.coalesce(F.col(f"o.{n}"), F.lit(0.0))
                r, a = F.col(f"d._rem_{n}"), F.col(f"d._add_{n}")
                n1 = o_n - r["n"]
                # correction form, NOT (o_n*o_mu - r.n*r.mu)/n1: the raw
                # products round at eps*|mu|*n and their difference
                # cancels; (o_mu - r.mu) cancels the offset first, and a
                # constant integer-valued group (exact means, so
                # o_mu == r.mu) stays exactly 0
                mu1 = F.when(
                    n1 > 0, o_mu + (o_mu - r["mu"]) * r["n"] / n1
                ).otherwise(F.lit(0.0))
                m2_1 = F.when(
                    (n1 > 0) & (o_n > 0),
                    F.greatest(
                        o_m2 - r["m2"]
                        - F.pow(r["mu"] - mu1, 2) * r["n"] * n1 / o_n,
                        F.lit(0.0),
                    ),
                ).otherwise(F.lit(0.0))
                n2 = n1 + a["n"]
                delta = a["mu"] - mu1
                mu2 = F.when(
                    n2 > 0, mu1 + delta * a["n"] / n2
                ).otherwise(F.lit(0.0))
                m2_2 = F.when(
                    n2 > 0,
                    F.greatest(
                        m2_1 + a["m2"] + delta * delta * n1 * a["n"] / n2,
                        F.lit(0.0),
                    ),
                ).otherwise(F.lit(0.0))
                return {n: m2_2, f"_mu_{n}": mu2}

            chan_merged: dict[str, F.Column] = {}
            for n in chan:
                chan_merged.update(chan_exprs(n))

            def merge_expr(c: str) -> F.Column:
                if c in chan_merged:
                    return chan_merged[c]
                o, d = F.col(f"o.{c}"), F.col(f"d.{c}")
                op = ops.get(c)
                if op == "min":
                    return F.least(o, d)  # least/greatest skip NULLs
                if op == "max":
                    return F.greatest(o, d)
                if op == "approx_distinct":
                    # hll_union(x, NULL) is NULL (probed on this Spark
                    # build) — a brand-new group has no stored sketch
                    return (
                        F.when(o.isNull(), d)
                        .when(d.isNull(), o)
                        .otherwise(F.hll_union(o, d))
                    )
                if op is not None and parse_hist_op(op) is not None:
                    # histogram retraction: per-bin signed addition, bins
                    # whose net count reaches 0 drop out (state stays
                    # sparse). Stored as sorted entry arrays; zipped as
                    # maps transiently (all built-in higher-order fns)
                    zipped = F.map_filter(
                        F.map_zip_with(
                            F.map_from_entries(o),
                            F.map_from_entries(d),
                            lambda _k, a, b: F.coalesce(a, F.lit(0))
                            + F.coalesce(b, F.lit(0)),
                        ),
                        lambda _k, c: c != 0,
                    )
                    summed = F.array_sort(
                        F.transform(
                            F.map_entries(zipped),
                            lambda e: F.struct(
                                e["key"].alias("bin"),
                                e["value"].alias("count"),
                            ),
                        )
                    )
                    return (
                        F.when(o.isNull(), d)
                        .when(d.isNull(), o)
                        .otherwise(summed)
                    )
                # additive (sums/counts/_nn_ counters): d.c is never NULL
                # for freshly-aggregated windows, but coalesce keeps stored
                # totals 0-based even if an old stored row carried NULL
                # (full-rebuild rows of all-NULL groups)
                zero = F.lit(0).cast(schema[c].dataType)
                return F.coalesce(o, zero) + F.coalesce(d, zero)

            new = joined.select(
                *gcols,
                *[merge_expr(c).cast(schema[c].dataType).alias(c) for c in mcols],
            )
            gone = None

        live = new.filter(F.col(N_ROWS) > 0).select(
            *gcols,
            *[F.col(c) for c in mcols],
            F.lit(False).alias("_deleted"),
        )
        dead = new.filter(F.col(N_ROWS) <= 0).select(*gcols)
        if gone is not None:
            dead = dead.unionByName(gone)
        dead = dead.select(
            *gcols,
            *[F.lit(None).cast(schema[c].dataType).alias(c) for c in mcols],
            F.lit(True).alias("_deleted"),
        )
        winners = live.unionByName(dead).select(
            "*", F.lit(src_sid).cast("long").alias("_lsn")
        )
        snap = self._table.merge(
            winners,
            summary={
                "source_snapshot": src_sid,
                "since_snapshot": last,
                "full_rebuild": full_rebuild,
            },
        )
        assert snap is not None
        stats: dict[str, Any] = {
            "source_snapshot": src_sid,
            "since_snapshot": last,
            "full_rebuild": full_rebuild,
            "view_snapshot": snap.snapshot_id,
        }
        if files_read is not None:
            stats["source_files_read"] = files_read
        return stats
