"""q19's sketch path: approx_percentile must agree with the exact path
within the sketch's guaranteed rank error.

Greenwald-Khanna with accuracy a guarantees the returned value's RANK is
within n/a of the target rank — a distribution-free bound, so the right
assertion is a bracket: the sketch's p-quantile must lie between the
EXACT quantiles at p ± 2/a (2x safety on the published bound). Runs at
sf0.1 (~150k orders) so each group is big enough for the sketch to be a
real summary, not a verbatim buffer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.queries import reference

SF01 = os.environ.get("SPARK_GRAFT_SKETCH_SF_DIR", "/root/testdata/sf0.1")
EPS = 2.0 / reference.PERCENTILE_ACCURACY


@pytest.fixture(scope="module")
def sketch_dir():
    if not os.path.isdir(SF01):
        pytest.skip(f"{SF01} not present")
    return SF01


def test_sketch_within_rank_error_of_exact(spark, sketch_dir):
    approx = {
        r["priority"]: r.asDict()
        for r in reference.percentile_stats(spark, sketch_dir, approx=True).collect()
    }
    o = reference.load(spark, sketch_dir, "orders")
    brackets = {
        r["priority"]: r.asDict()
        for r in o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            *[
                F.expr(f"percentile(o_totalprice, {q})").alias(name)
                for p, tag in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
                for q, name in (
                    (max(p - EPS, 0.0), f"{tag}_lo"),
                    (min(p + EPS, 1.0), f"{tag}_hi"),
                )
            ]
        )
        .collect()
    }
    assert approx.keys() == brackets.keys() and approx
    for g, row in approx.items():
        b = brackets[g]
        for tag in ("p50", "p90", "p99"):
            lo, hi = b[f"{tag}_lo"], b[f"{tag}_hi"]
            # the sketch output was rounded to 2 dp — widen by the round
            assert lo - 0.01 <= row[tag] <= hi + 0.01, (g, tag, row[tag], lo, hi)


def test_auto_threshold_picks_exact_at_small_scale(spark, sf_dir):
    """Below APPROX_THRESHOLD_ROWS the auto path must equal the exact
    path bit-for-bit (this is what keeps the driver's q19 oracle green)."""
    auto = reference.percentile_stats(spark, sf_dir, approx=None).collect()
    exact = reference.q19_percentile_stats(spark, sf_dir).collect()
    assert auto == exact
