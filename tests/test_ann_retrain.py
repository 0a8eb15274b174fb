"""Drift-triggered quantizer retrain + the table-props facility it rides
(lake/ann_index.py::LakeAnnIndex.retrain / lake/metadata.py Snapshot.props).

The lifecycle under test: build (quantizer commits ATOMICALLY with epoch 0
as table props) → frozen-centroid appends accumulate drift → maintain()
crosses the threshold → retrain commits {new centroids + reassignments +
tombstones for moved rows} as ONE LWW merge. Pinned properties:

- props fold FORWARD through every commit kind (merge, compact, evolve)
  and update atomically with data commits;
- retrain is exactly-once (generation token + retrain position ride
  props atomically; no residual commit keys);
- retrain preserves the row set (one live row per vec_id, no dups across
  cells) while moving rows to their new cells;
- time travel is TOTAL: a pre-retrain snapshot searches with the OLD
  quantizer over the OLD layout (quantizer can never tear from layout);
- post-retrain search over a planted far cluster is exact while still
  pruning its reads;
- maintain() fires the retrain exactly when appended_share crosses the
  threshold, and the drift signal resets to 0 afterwards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import LakeAnnIndex
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

DIM = 8


def _cluster(spark, center: float, n: int, start_id: int):
    """A tight deterministic cluster of n vectors around center·e₁ with a
    small id-dependent wobble in the remaining coordinates."""
    rows = []
    for i in range(n):
        v = [center] + [((start_id + i) % 7 - 3) * 0.01] * (DIM - 1)
        rows.append((start_id + i, v))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


@pytest.fixture(scope="module")
def drifted(spark, tmp_path_factory):
    """Index built on cluster A (around +1·e₁), then a same-size cluster B
    (around -1·e₁) appended with FROZEN centroids — 50% drift."""
    root = str(tmp_path_factory.mktemp("retrain") / "idx")
    a = _cluster(spark, 1.0, 40, 1000)
    b = _cluster(spark, -1.0, 40, 2000)
    idx = LakeAnnIndex.build(
        spark, a, root, key_col="vec_id", vec_col="v",
        k=4, iters=2, sample_mod=1, n_buckets=4,
    )
    idx.append(b, epoch=1)
    return idx, a, b


def test_props_fold_forward_and_update_atomically(spark, tmp_path):
    import pyspark.sql.types as T

    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("x", T.LongType(), True),
        ]),
        key_cols=("conv_id",), n_buckets=2,
    )
    assert t.props == {}
    t.update_props({"owner": "cdc", "tier": 1})
    assert t.props == {"owner": "cdc", "tier": 1}
    # a later data commit inherits them
    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch

    ev = spark.createDataFrame(
        [(1, "insert", "c1", 5)], "lsn long, op string, conv_id string, x long"
    )
    apply_batch(spark, t, ev, epoch=0, salt_buckets=0,
                props_update={"tier": 2, "owner": None})
    assert t.props == {"tier": 2}  # updated + deleted atomically with data
    # exactly-once: a keyed props commit re-applied is a no-op
    assert t.update_props({"tier": 3}, commit_key="cfg:1") is not None
    assert t.update_props({"tier": 9}, commit_key="cfg:1") is None
    assert t.props == {"tier": 3}
    # compaction (replace commit) carries props forward
    t.compact()
    assert t.props == {"tier": 3}


def test_retrain_moves_rows_and_preserves_the_row_set(spark, drifted):
    idx, a, b = drifted
    pre_snap = idx.table.current().snapshot_id
    pre_rows = idx.table.read().select("vec_id", "cell").collect()
    pre_cells_of_b = {
        r["vec_id"]: r["cell"] for r in pre_rows if r["vec_id"] >= 2000
    }
    pre_cells_a = {r["cell"] for r in pre_rows if r["vec_id"] < 2000}
    share = idx.appended_share()
    assert share == pytest.approx(0.5)

    committed = idx.retrain()
    assert committed is not None
    # exactly-once: same base state => metadata no-op
    assert idx.retrain() is None

    rows = idx.table.read().collect()
    assert len(rows) == 80  # one live row per vec_id, tombstones worked
    assert len({r["vec_id"] for r in rows}) == 80
    # the planted far cluster must occupy its own cell(s) now, disjoint
    # from cluster A's — the drift response the retrain exists for
    cells_a = {r["cell"] for r in rows if r["vec_id"] < 2000}
    cells_b = {r["cell"] for r in rows if r["vec_id"] >= 2000}
    assert cells_a.isdisjoint(cells_b)
    # before the retrain, frozen centroids had squeezed B into cells A
    # already occupied (the quantizer was trained on A alone, so every
    # B assignment lands on an A-trained centroid)
    assert set(pre_cells_of_b.values()) <= pre_cells_a
    # drift signal reset: new generation has no post-training appends
    assert idx.appended_share() == 0.0

    # time travel is total: the pre-retrain snapshot still carries the OLD
    # quantizer and searches the OLD layout consistently
    old_props = idx.table.log.load(pre_snap).props["ann"]
    assert old_props["token"] != idx.meta["token"]
    q = spark.createDataFrame(
        [(0, [-1.0] + [0.0] * (DIM - 1))], "query_id long, v array<double>"
    )
    old_res = idx.search(q, k=3, snapshot_id=pre_snap)
    assert old_res.count() == 3  # searchable, with the historical quantizer


def test_post_retrain_search_is_exact_and_pruned(spark, drifted):
    idx, _a, b = drifted
    idx.retrain()  # no-op if the previous test already retrained
    q = spark.createDataFrame(
        [(0, [-1.0] + [0.0] * (DIM - 1))], "query_id long, v array<double>"
    )
    res = idx.search(q, k=5, nprobe=1).collect()
    got = {r["neighbor_id"] for r in res}
    assert got <= {r["vec_id"] for r in b.collect()}  # all from cluster B
    assert len(got) == 5
    # and the read was pruned: fewer files than the whole table's
    opened = {
        f
        for f in idx.search(q, k=5, nprobe=1).inputFiles()
        if idx.table.root in f
    }
    assert opened < set(idx.table.read().inputFiles())


def test_maintain_triggers_retrain_on_threshold(spark, tmp_path):
    root = str(tmp_path / "idx")
    a = _cluster(spark, 1.0, 40, 1000)
    idx = LakeAnnIndex.build(
        spark, a, root, key_col="vec_id", vec_col="v",
        k=4, iters=2, sample_mod=1, n_buckets=4,
    )
    tok0 = idx.meta["token"]
    # 25% drift: below the 0.5 threshold — no retrain
    idx.maintain(_cluster(spark, -1.0, 13, 2000), epoch=1)
    assert idx.meta["token"] == tok0
    assert 0.0 < idx.appended_share() < 0.5
    # pushes cumulative share over 0.5 — retrain fires and resets it
    idx.maintain(_cluster(spark, -1.0, 40, 3000), epoch=2)
    assert idx.meta["token"] != tok0
    assert idx.appended_share() == 0.0
    # the reloaded index sees the retrained quantizer (props, no sidecar)
    again = LakeAnnIndex.load(spark, root)
    assert again.meta["token"] == idx.meta["token"]
    assert again.cents == idx.cents


def test_post_retrain_append_epoch_beats_retrain_reinserts(spark, tmp_path):
    """LSN-stride semantics: a maintenance epoch applied AFTER a retrain
    must win LWW over the retrain's re-insert of the same key — appends
    write at epoch-stride slots and the retrain strictly between the
    highest applied slot and the next epoch's, so there is no tie for
    payload comparison to break nondeterministically (the pre-stride
    design collided at watermark+1)."""
    root = str(tmp_path / "idx")
    idx = LakeAnnIndex.build(
        spark, _cluster(spark, 1.0, 20, 1000), root,
        key_col="vec_id", vec_col="v", k=2, iters=1, sample_mod=1,
        n_buckets=2,
    )
    idx.append(_cluster(spark, -1.0, 20, 2000), epoch=1)
    assert idx.retrain(force=True) is not None
    # no residual commit keys: the generation token in props carries the
    # retrain's exactly-once position instead
    assert all("retrain" not in k for k in idx.table.current().commit_keys)
    # epoch 2 re-delivers key 2000 with an updated embedding that stays in
    # its cell (append's contract supersedes a key only within its cell —
    # see LakeAnnIndex.append; a cell-hopping update needs delete+insert)
    updated = spark.createDataFrame(
        [(2000, [-1.0, 0.5] + [0.0] * (DIM - 2))],
        "vec_id long, v array<double>",
    )
    idx.append(updated, epoch=2)
    got = idx.table.read().filter(F.col("vec_id") == 2000).collect()
    assert len(got) == 1 and got[0]["v"][1] == 0.5


def test_retrain_lsn_clears_residual_epochs(spark, tmp_path):
    """A maintenance epoch committed ABOVE the contiguous watermark (gap
    in the epoch sequence) must still sit BELOW the retrain's lsn —
    deriving the retrain lsn from the watermark alone would write the
    reassignments UNDER epoch 5's rows and tombstone-vs-insert ties would
    leave a key live in two cells."""
    root = str(tmp_path / "idx")
    idx = LakeAnnIndex.build(
        spark, _cluster(spark, 1.0, 20, 1000), root,
        key_col="vec_id", vec_col="v", k=2, iters=1, sample_mod=1,
        n_buckets=2,
    )
    idx.append(_cluster(spark, -1.0, 20, 2000), epoch=5)  # gap: 1-4 absent
    snap = idx.table.current()
    assert snap.epoch_watermark < 5  # the gap kept epoch 5 residual
    assert idx.retrain(force=True) is not None
    rows = idx.table.read().collect()
    # one live row per key — no key stranded live in two cells
    assert len(rows) == 40
    assert len({r["vec_id"] for r in rows}) == 40


def test_back_to_back_forced_retrains_keep_one_live_row_per_key(spark, tmp_path):
    """Two retrains with NO intervening append (force=True after an
    out-of-band parameter change — the documented force use case) must
    each write at a FRESH lsn: if both derived their lsn from the epoch
    alone, the second retrain's move-tombstones would TIE the first's
    re-inserts and a key could stay live in two cells. The retrain
    position rides props so the second run lands strictly above."""
    root = str(tmp_path / "idx")
    idx = LakeAnnIndex.build(
        spark, _cluster(spark, 1.0, 20, 1000), root,
        key_col="vec_id", vec_col="v", k=2, iters=1, sample_mod=1,
        n_buckets=2,
    )
    idx.append(_cluster(spark, -1.0, 20, 2000), epoch=1)
    first = idx.retrain(force=True)
    assert first is not None
    lsn1 = idx.meta["retrain_lsn"]
    # out-of-band param change, then force retrain with no new appends:
    # different k => different centroids => rows MOVE between the runs
    idx.meta["k"] = 3
    idx.table.update_props({"ann": dict(idx.meta)})
    second = idx.retrain(force=True)
    assert second is not None
    assert idx.meta["retrain_lsn"] > lsn1
    rows = idx.table.read().collect()
    assert len(rows) == 40
    assert len({r["vec_id"] for r in rows}) == 40
