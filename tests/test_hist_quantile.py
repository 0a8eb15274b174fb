"""approx_p{N} histogram-quantile measures on DeltaAggView.

Invariants:

- the bin function is EXACT integer/dyadic arithmetic (no floating log):
  monotone in the value, within one sub-bin of the value (ratio < 9/8),
  exact zero/negative handling, loud rejection of non-integer inputs;
- the maintained view equals a from-scratch recompute with the same
  binning BIT-FOR-BIT after epochs of updates, deletes and group moves
  (full retraction — no append-only contract, unlike min/max/HLL);
- the surfaced quantile is within one bin (±6.25% relative) of the exact
  percentile;
- state stays sparse (entry count bounded by touched bins, not rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.delta_view import (
    HIST_ZERO_BIN,
    DeltaAggView,
    hist_bin,
    hist_bin_value,
    parse_hist_op,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable


def test_parse_hist_op():
    assert parse_hist_op("approx_p50") == 50
    assert parse_hist_op("approx_p1") == 1
    assert parse_hist_op("approx_p99") == 99
    for bad in ("approx_p0", "approx_p100", "approx_p", "approx_pxx",
                "p50", "approx_p5.5"):
        assert parse_hist_op(bad) is None


def test_hist_bin_exact_and_monotone(spark):
    vals = (
        [0, 1, 2, 3, 5, 7, 8, 9, 15, 16, 17, 63, 64, 65, 1023, 1024]
        + [2**k for k in range(1, 53)]
        + [2**k - 1 for k in range(2, 53)]
        + [-1, -7, -8, -9, -100, -(2**40)]
    )
    df = spark.createDataFrame([(v,) for v in sorted(vals)], "v long")
    rows = (
        df.select(
            "v",
            hist_bin(F.col("v")).alias("b"),
            hist_bin_value(hist_bin(F.col("v"))).alias("mid"),
        )
        .orderBy("v")
        .collect()
    )
    bins = [r["b"] for r in rows]
    assert bins == sorted(bins)  # monotone in v
    for r in rows:
        v, b, mid = r["v"], r["b"], r["mid"]
        if v == 0:
            assert b == HIST_ZERO_BIN and mid == 0.0
            continue
        assert (mid > 0) == (v > 0)
        # midpoint within one sub-bin of the value (ratio < 9/8 + half bin)
        ratio = abs(mid) / abs(v)
        assert 1 / 1.13 < ratio < 1.13, (v, b, mid)
    # exact powers of two sit exactly at a bin's lower edge: bin = 8*e,
    # the historical floating-log failure point (log2(64)*8 = 47.999…)
    p2 = {r["v"]: r["b"] for r in rows if r["v"] > 0}
    for k in range(1, 53):
        assert p2[2**k] == 8 * k, (k, p2[2**k])
    # NULL passes through
    assert (
        spark.createDataFrame([(None,)], "v long")
        .select(hist_bin(F.col("v")).alias("b"))
        .first()["b"]
        is None
    )


def test_hist_bin_rejects_non_integer(spark):
    df = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(Exception, match="integer-valued"):
        df.select(hist_bin(F.col("v"))).collect()
    big = spark.createDataFrame([(float(2**60),)], "v double")
    with pytest.raises(Exception, match="integer-valued"):
        big.select(hist_bin(F.col("v"))).collect()


def _recompute(state, pct):
    """From-scratch quantile with the same binning over the final state."""
    binned = state.select("role", hist_bin(F.length("text")).alias("b")).filter(
        F.col("b").isNotNull()
    )
    cnt = binned.groupBy("role", "b").count()
    tot = binned.groupBy("role").agg(F.count("*").alias("n"))
    w = Window.partitionBy("role").orderBy("b")
    cum = cnt.withColumn("cum", F.sum("count").over(w)).join(tot, "role")
    num = F.col("n") * pct + 99
    rank = ((num - F.pmod(num, 100)) / 100).cast("long")
    hit = (
        cum.filter(F.col("cum") >= rank)
        .groupBy("role")
        .agg(F.min("b").alias("bin"))
    )
    return hit.select(
        "role", hist_bin_value(F.col("bin")).alias(f"want{pct}")
    )


def test_view_quantiles_track_updating_source(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=4,
    )
    view = DeltaAggView(
        spark, str(tmp_path / "v"), t, ("role",),
        {"p50": ("approx_p50", "length(text)"),
         "p95": ("approx_p95", "length(text)"),
         "n": ("count", "*")},
        payload_cols=["role", "text"],
    )
    for e in range(3):  # updates, deletes, group moves across epochs
        apply_batch(
            spark, t, change_events(spark, 3000, n_convs=150, seed=e + 1),
            epoch=e,
        )
        view.refresh()
    got = view.read()
    state = t.read().filter(F.col("role").isNotNull())
    want = _recompute(state, 50).join(_recompute(state, 95), "role")
    j = got.join(want, "role", "full")
    bad = j.filter(
        (F.col("p50") != F.col("want50")) | (F.col("p95") != F.col("want95"))
        | F.col("p50").isNull() | F.col("want50").isNull()
    )
    assert bad.isEmpty(), bad.collect()
    # within one bin of the EXACT percentile
    ex = state.groupBy("role").agg(
        F.expr("percentile(length(text), 0.5)").alias("ex50"),
        F.expr("percentile(length(text), 0.95)").alias("ex95"),
    )
    for r in got.join(ex, "role").collect():
        assert 1 / 1.15 < r["p50"] / r["ex50"] < 1.15, r
        assert 1 / 1.15 < r["p95"] / r["ex95"] < 1.15, r
    # state is sparse: stored entries bounded by touched bins, not rows
    stored = view._table.read().select(
        F.max(F.size("p50")).alias("mx")
    ).first()["mx"]
    assert stored < 100, stored


def test_view_quantile_group_death_and_rebirth(spark, tmp_path):
    from tests.test_mirror import _feed

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
    )
    view = DeltaAggView(
        spark, str(tmp_path / "v"), t, ("role",),
        {"p50": ("approx_p50", "length(text)")},
        payload_cols=["role", "text"],
    )
    apply_batch(spark, t, _feed(spark, [
        (1, "insert", "a", 0, "user", "xx", None),       # len 2
        (2, "insert", "a", 1, "user", "x" * 40, None),   # len 40
        (3, "insert", "b", 0, "bot", "yyy", None),
    ]), epoch=0)
    view.refresh()
    r = {x["role"]: x for x in view.read().collect()}
    # n=2 -> rank ceil(2*50/100)=1 -> first bin (len 2) midpoint 2.125
    assert r["user"]["p50"] == 2.125 and r["bot"]["n_rows"] == 1
    # delete the whole bot group; shrink the user group to one row
    apply_batch(spark, t, _feed(spark, [
        (4, "delete", "b", 0, None, None, None),
        (5, "delete", "a", 1, None, None, None),
    ]), epoch=1)
    view.refresh()
    rows = {x["role"]: x for x in view.read().collect()}
    assert "bot" not in rows  # group died
    assert rows["user"]["p50"] == 2.125 and rows["user"]["n_rows"] == 1
    # rebirth with a different distribution retracts cleanly
    apply_batch(spark, t, _feed(spark, [
        (6, "insert", "b", 0, "bot", "z" * 100, None),
    ]), epoch=2)
    view.refresh()
    rows = {x["role"]: x for x in view.read().collect()}
    # len 100: e=6, sub=floor(100/8)-8=4 -> bin 52 -> 2^6*(17+8)/16 = 100.0
    assert rows["bot"]["p50"] == 100.0


def test_viewspec_accepts_hist_measures(spark):
    from postgres_to_snowflake_data_pipeline_spark.orchestrate import ViewSpec

    v = ViewSpec(
        name="q", table="t", group_cols=("role",),
        measures={"p50": ("approx_p50", "length(text)")},
    )
    assert v.measures["p50"][0] == "approx_p50"
    with pytest.raises(ValueError, match="approx_p"):
        ViewSpec(
            name="q", table="t", group_cols=("role",),
            measures={"p0": ("approx_p0", "length(text)")},
        )
