"""Offline invariant checker for a LakeTable — the ops-grade ``fsck``.

A lake table's correctness rests on invariants no single read exercises:
manifest entries must point at files that exist, per-file pruning stats
must match what the footers actually say (a stale range silently turns
zone-map/key pruning into WRONG RESULTS, not slow ones), every row must
live in the bucket its key hashes to (the ``merge()`` ``_bucket`` fast
path trusts the caller — the one foot-gun this engine documents), and
declared table properties must reference real columns. ``fsck`` checks
all of it without ever collecting row data to the driver.

Two levels:

- **metadata** (default): snapshot chain loads, current-snapshot files
  exist on disk, orphan data files (unreferenced by any retained snapshot
  or staged WAP batch — GC candidates, reported not failed), property
  declarations (``patch.*``, ``index.*``, ``ann``) against the schema.
  Cost: O(metadata) + one directory walk.
- **deep** (``deep=True``): adds (a) a footer re-read of every current
  data file compared against its manifest entry's lsn/key/ts ranges —
  the pruning-soundness check; (b) a distributed bucket-honesty pass
  (``bucket_expr(key) == manifest bucket`` for every row — only the key
  column crosses the scan); (c) an LSN-tie scan (distinct storage rows
  sharing a (key, _lsn) — LWW resolves them deterministically by payload
  comparison, but a tie means an upstream feed assigned one LSN twice,
  worth surfacing). Cost: O(files) parallel footer reads + two
  narrow-column scans; no shuffle wider than (key, lsn).

Errors (missing files, stats drift, bucket misplacement, invalid
declarations) fail the report; orphans and LSN ties are warnings.

Reference analog: the reference pipeline has no integrity tooling at all
— a bad load is discovered by the report consumer
(/root/reference/dags/s3_to_snowflake_dag.py's verification queries count
rows only). At 100 TB an unsound prune or a misplaced bucket is
invisible to row counts; this is the check that finds it.
"""

from __future__ import annotations

import os
from typing import Any, TYPE_CHECKING

from pyspark.sql import functions as F, types as T

if TYPE_CHECKING:  # pragma: no cover
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

#: cap on per-issue path samples carried in the report
_SAMPLE = 8


def _err(report: dict, check: str, detail: str) -> None:
    report["errors"].append({"check": check, "detail": detail})


def _warn(report: dict, check: str, detail: str) -> None:
    report["warnings"].append({"check": check, "detail": detail})


def _check_chain(table: "LakeTable", report: dict) -> list:
    """Every retained snapshot must load and resolve its file map."""
    snaps = []
    for snap in table.log.history():
        try:
            snap.files
            snaps.append(snap)
        except FileNotFoundError as e:
            _err(
                report,
                "chain",
                f"snapshot {snap.snapshot_id} cannot resolve its "
                f"manifests: {e}",
            )
    report["snapshots"] = len(snaps)
    return snaps


def _check_files_exist(table: "LakeTable", snap, report: dict) -> int:
    missing = []
    n = 0
    for entries in snap.files.values():
        for e in entries:
            n += 1
            if not os.path.exists(os.path.join(table.root, e["path"])):
                missing.append(e["path"])
    if missing:
        _err(
            report,
            "missing_files",
            f"{len(missing)} manifest-referenced data files absent "
            f"(sample: {missing[:_SAMPLE]})",
        )
    report["files"] = n
    return n


def _check_orphans(table: "LakeTable", snaps: list, report: dict) -> None:
    """Data files no retained snapshot or staged WAP batch references —
    legitimate GC candidates (expire_snapshots owns deletion, with its
    grace period); fsck only surfaces the count."""
    referenced: set[str] = set()
    for snap in snaps:
        for entries in snap.files.values():
            referenced.update(e["path"] for e in entries)
    for st in table.log.staged_list().values():
        try:
            staged = table.log._load_manifest(st["manifest"])
        except FileNotFoundError:
            continue
        for entries in staged.values():
            referenced.update(e["path"] for e in entries)
    data_root = os.path.join(table.root, "data")
    orphans = []
    for full in table.fs.walk_files(data_root):
        if not full.endswith(".parquet"):
            continue
        rel = os.path.relpath(full, table.root)
        if rel not in referenced:
            orphans.append(rel)
    report["orphan_files"] = len(orphans)
    if orphans:
        _warn(
            report,
            "orphans",
            f"{len(orphans)} unreferenced data files (GC candidates; "
            f"sample: {orphans[:_SAMPLE]})",
        )


def _check_props(table: "LakeTable", snap, report: dict) -> None:
    schema = {f.name: f.dataType for f in snap.schema.fields}
    props = snap.props
    patch_cols = props.get("patch.columns")
    if patch_cols is not None:
        if not isinstance(patch_cols, list) or not all(
            isinstance(c, str) for c in patch_cols
        ):
            _err(report, "props", f"patch.columns not a string list: {patch_cols!r}")
        else:
            for c in patch_cols:
                # absent columns are legal (declared ahead of evolution);
                # present ones must be string-typed for the sentinel rule
                if c in schema and not isinstance(schema[c], T.StringType):
                    _err(
                        report,
                        "props",
                        f"patch column {c!r} is {schema[c]} — the in-band "
                        "sentinel contract requires a string column",
                    )
    sets = props.get("index.sets")
    if sets is not None and (
        not isinstance(sets, list)
        or not all(isinstance(c, str) for c in sets)
    ):
        _err(report, "props", f"index.sets not a string list: {sets!r}")
    tok = props.get("index.tokens")
    if tok is not None:
        if not isinstance(tok, str):
            _err(report, "props", f"index.tokens not a column name: {tok!r}")
        elif tok in schema and not isinstance(schema[tok], T.StringType):
            _err(
                report,
                "props",
                f"index.tokens column {tok!r} is {schema[tok]} — token "
                "indexes tokenize strings",
            )
    ann = props.get("ann")
    if ann is not None:
        for field in ("vec_col", "key_col"):
            col = ann.get(field)
            if col not in schema:
                _err(
                    report,
                    "props",
                    f"ann.{field} {col!r} not in the schema — the index "
                    "cannot reopen",
                )


def _check_stat_liveness(table: "LakeTable", snap, report: dict) -> None:
    """Zone-map LIVENESS: when a table evidently maintains ts (or key)
    per-file stats — some entries carry them — entries missing them make
    pruning silently degrade to reading those files on every window/point
    read (correct answers, dead pruning). The round-4 foreign-session bug
    (INT96 parquet timestamps carry no footer stats) produced exactly
    this shape; the engine now recovers such stats at commit time
    (``LakeTable._ts_footer_or_scan``), so a statless entry today means a
    legacy/third-party manifest worth re-compacting. Warning-level: the
    table still answers correctly."""
    ts_have, ts_miss, key_have, key_miss = 0, [], 0, []
    for entries in snap.files.values():
        for e in entries:
            if e.get("rows", 0) <= 0:
                continue
            if e.get("ts_min") is not None:
                ts_have += 1
            elif e.get("ts_nulls") is None:
                # entries that are all-null ts carry ts_nulls == rows;
                # total stat absence is the dead-pruning signature
                ts_miss.append(e["path"])
            if e.get("key_min") is not None:
                key_have += 1
            else:
                key_miss.append(e["path"])
    if ts_have and ts_miss:
        _warn(
            report,
            "ts_stats_dead",
            f"{len(ts_miss)} data files lack ts zone-map stats while "
            f"{ts_have} carry them — time-window pruning and expire_rows "
            f"read these files unconditionally; compact() re-stamps them "
            f"(sample: {ts_miss[:_SAMPLE]})",
        )
    if key_have and key_miss:
        _warn(
            report,
            "key_stats_dead",
            f"{len(key_miss)} data files lack key range stats while "
            f"{key_have} carry them — point lookups open these files "
            f"unconditionally; compact() re-stamps them "
            f"(sample: {key_miss[:_SAMPLE]})",
        )


def _deep_stats(table: "LakeTable", snap, report: dict) -> None:
    """Footer re-read vs manifest entries: a drifted range makes key/ts/
    lsn pruning skip files that hold matching rows — wrong results."""
    paths = [
        os.path.join(table.root, e["path"])
        for entries in snap.files.values()
        for e in entries
        if os.path.exists(os.path.join(table.root, e["path"]))
    ]
    if not paths:
        report["stats_mismatch_files"] = 0
        return
    key0 = snap.key_cols[0]
    ts_col = table._zone_ts_col(snap.schema)
    actual = table._file_stats(paths, key_col=key0, ts_col=ts_col)
    bad = []
    for entries in snap.files.values():
        for e in entries:
            full = os.path.join(table.root, e["path"])
            st = actual.get(full)
            if st is None:
                continue  # missing file — already an error above
            drift = []
            for want_k, got_k in (
                ("lsn_min", "lsn_min"),
                ("lsn_max", "lsn_max"),
                ("key_min", "key_min"),
                ("key_max", "key_max"),
                ("ts_min", "ts_min"),
                ("ts_max", "ts_max"),
            ):
                if want_k in e and st.get(got_k) is not None:
                    want, got = e[want_k], st[got_k]
                    if isinstance(want, int):
                        got = int(got)
                    if want != got:
                        drift.append(f"{want_k}: manifest {want!r} != footer {got!r}")
            if drift:
                bad.append(f"{e['path']}: {'; '.join(drift)}")
    report["stats_mismatch_files"] = len(bad)
    if bad:
        _err(
            report,
            "stats_drift",
            f"{len(bad)} files with manifest/footer stat drift "
            f"(pruning UNSOUND; sample: {bad[:_SAMPLE]})",
        )


def _deep_buckets(table: "LakeTable", snap, report: dict) -> None:
    """Every row's key must hash to the manifest bucket its file lives
    under — the invariant read_key/bucket pruning and the bucket-aligned
    merge rely on, and exactly what a caller lying to ``merge()``'s
    ``_bucket`` fast path breaks. Only the first key column is scanned."""
    from postgres_to_snowflake_data_pipeline_spark.lake.table import bucket_expr

    key0 = snap.key_cols[0]
    key_field = next(f for f in snap.schema.fields if f.name == key0)
    narrow = T.StructType([key_field])
    per_bucket = []
    for b, entries in snap.files.items():
        paths = [
            os.path.join(table.root, e["path"])
            for e in entries
            if os.path.exists(os.path.join(table.root, e["path"]))
        ]
        if not paths:
            continue
        per_bucket.append(
            table.spark.read.schema(narrow)
            .parquet(*paths)
            .select(
                F.count(
                    F.when(
                        bucket_expr(key0, snap.n_buckets) != int(b), 1
                    )
                ).alias("bad")
            )
        )
    if not per_bucket:
        report["bucket_mismatch_rows"] = 0
        return
    from functools import reduce

    from pyspark.sql import DataFrame

    total = (
        reduce(DataFrame.unionAll, per_bucket)
        .agg(F.sum("bad").alias("bad"))
        .first()["bad"]
    )
    report["bucket_mismatch_rows"] = int(total or 0)
    if total:
        _err(
            report,
            "bucket_mismatch",
            f"{total} rows live in a bucket their key does not hash to "
            "(point lookups and bucket-pruned reads will MISS them; "
            "repair: compact() or rebucket() re-cluster every row)",
        )


def _deep_ties(table: "LakeTable", snap, report: dict) -> None:
    """(key, _lsn) appearing in more than one storage row: LWW resolves
    the winner deterministically (delete beats upsert, then payload
    comparison) but a tie means the feed minted one LSN twice — an
    upstream contract worth surfacing. Narrow columns only."""
    fields = [f for f in snap.schema.fields if f.name in snap.key_cols]
    narrow = T.StructType(
        fields + [T.StructField("_lsn", T.LongType(), True)]
    )
    paths = [
        os.path.join(table.root, e["path"])
        for entries in snap.files.values()
        for e in entries
        if os.path.exists(os.path.join(table.root, e["path"]))
    ]
    if not paths:
        report["lsn_tie_groups"] = 0
        return
    ties = (
        table.spark.read.schema(narrow)
        .parquet(*paths)
        .groupBy(*snap.key_cols, "_lsn")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    report["lsn_tie_groups"] = int(ties)
    if ties:
        _warn(
            report,
            "lsn_ties",
            f"{ties} (key, lsn) groups hold >1 storage row — winners "
            "resolve deterministically, but the feed assigned an LSN "
            "twice",
        )


def fsck(
    table: "LakeTable", deep: bool = False, snapshot_id: int | None = None
) -> dict[str, Any]:
    """Run the invariant checks against ``snapshot_id`` (default:
    current). Returns a report dict; ``ok`` is False iff any ERROR-level
    issue was found (warnings — orphans, LSN ties — do not fail it)."""
    report: dict[str, Any] = {
        "table": table.root,
        "deep": deep,
        "errors": [],
        "warnings": [],
    }
    snaps = _check_chain(table, report)
    snap = (
        table.current()
        if snapshot_id is None
        else table.log.load(snapshot_id)
    )
    report["checked_snapshot"] = snap.snapshot_id
    _check_files_exist(table, snap, report)
    _check_orphans(table, snaps, report)
    _check_props(table, snap, report)
    _check_stat_liveness(table, snap, report)
    if deep:
        _deep_stats(table, snap, report)
        _deep_buckets(table, snap, report)
        _deep_ties(table, snap, report)
    report["ok"] = not report["errors"]
    return report
