"""Model-based property test for the branch lifecycle: a random program
of trunk writes, branch writes, compactions, rebases and publishes is
checked after every step against a pure-Python LWW model. The model for
a rebase is per-key max-LSN merge of the two sides (the changefeed
carries every post-base winner with its LSN), and a publish copies the
branch model over the trunk — if the engine's clone/rebase/fast-forward
plumbing dropped, duplicated or misordered anything, some step diverges
from the model."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
    apply_batch,
    rebase_branch,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
          "text string, tool string, ts timestamp")
D0 = dt.datetime(2026, 1, 1)
KEYS = [(f"c{i:02d}", t) for i in range(12) for t in range(3)]


def _model_state(model):
    return sorted(
        (c, t, txt) for (c, t), (_lsn, dead, txt) in model.items() if not dead
    )


def _engine_state(table):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in table.read().collect()
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_branch_lifecycle_agrees_with_lww_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    lsn = [0]
    epoch = [0]

    def make_batch(n):
        rows = []
        for _ in range(n):
            c, t = rng.choice(KEYS)
            lsn[0] += 1
            dead = rng.random() < 0.15
            rows.append(
                (lsn[0], "delete" if dead else "insert", c, t,
                 None if dead else "user",
                 None if dead else f"v{lsn[0]}", None, D0)
            )
        return rows

    def model_apply(model, rows):
        for (l, op, c, t, _r, txt, _tool, _ts) in rows:
            cur = model.get((c, t))
            if cur is None or l > cur[0]:
                model[(c, t)] = (l, op == "delete", txt)

    trunk = LakeTable.create(
        spark, str(tmp_path / "trunk"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=4,
    )
    m_trunk: dict = {}
    rows = make_batch(40)
    apply_batch(spark, trunk, spark.createDataFrame(rows, SCHEMA),
                epoch=epoch[0])
    epoch[0] += 1
    model_apply(m_trunk, rows)

    branch = trunk.clone_to(str(tmp_path / "dev"))
    m_branch = dict(m_trunk)
    trunk_moved = False  # has the trunk committed since the branch's base?

    def merge_models(dst, src):
        for k, v in src.items():
            cur = dst.get(k)
            if cur is None or v[0] > cur[0]:
                dst[k] = v

    for _step in range(10):
        op = rng.choice(
            ["write_trunk", "write_branch", "compact_trunk",
             "compact_branch", "rebase", "publish"]
        )
        if op == "write_trunk":
            rows = make_batch(rng.randint(5, 25))
            apply_batch(spark, trunk, spark.createDataFrame(rows, SCHEMA),
                        epoch=epoch[0])
            epoch[0] += 1
            model_apply(m_trunk, rows)
            trunk_moved = True
        elif op == "write_branch":
            rows = make_batch(rng.randint(5, 25))
            apply_batch(spark, branch, spark.createDataFrame(rows, SCHEMA),
                        epoch=epoch[0])
            epoch[0] += 1
            model_apply(m_branch, rows)
        elif op == "compact_trunk":
            trunk.compact()
            trunk_moved = True  # head advanced (metadata), state unchanged
        elif op == "compact_branch":
            branch.compact()
        elif op == "rebase":
            snap = rebase_branch(spark, branch)
            assert (snap is not None) == trunk_moved
            merge_models(m_branch, m_trunk)
            trunk_moved = False
        elif op == "publish":
            if trunk_moved:
                with pytest.raises(ValueError, match="trunk advanced"):
                    trunk.fast_forward_from(branch)
            else:
                trunk.fast_forward_from(branch)
                m_trunk = dict(m_branch)
                # the publish commit is a barrier — the real workflow
                # discards the merged branch and cuts a fresh one
                branch = trunk.clone_to(str(tmp_path / f"dev{_step}"))
                m_branch = dict(m_trunk)
        assert _engine_state(trunk) == _model_state(m_trunk), (op, _step)
        assert _engine_state(branch) == _model_state(m_branch), (op, _step)

    # end-to-end convergence: rebase (a no-op when the trunk is already
    # at the branch's base), then publish
    if rebase_branch(spark, branch) is not None:
        merge_models(m_branch, m_trunk)
    trunk.fast_forward_from(branch)
    m_trunk = dict(m_branch)
    assert _engine_state(trunk) == _model_state(m_trunk)
    assert _engine_state(trunk) == _engine_state(branch)
