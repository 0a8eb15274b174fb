"""Temporal join operators the reference lacks (SURVEY.md §2.3: "no theta,
range, as-of ... joins appear") — implemented with scale-aware patterns and
oracled against DuckDB's native ASOF / inequality joins.

j01 as-of join: Spark has no ASOF join; the idiomatic formulation is the
union + ordered-window carry-forward — one sort-shuffle on (user, time),
no nested-loop, no explosion, streaming-friendly.

j02 range join: a naive |Δt| ≤ w self-join is a nested loop in Spark
(inequality-only condition). The scale pattern is BANDING: bucket time
into w-sized bins, equi-join on (user, bin) with each left row exploded to
its 3 adjacent bins, then filter exactly — every qualifying pair matches
exactly once, and the join is a plain hash join on small keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgres_to_snowflake_data_pipeline_spark.queries.base import load


# ---------------------------------------------------------------------------
# j01 — as-of join: for every purchase, the user's most recent click at or
# before the purchase time.
# ---------------------------------------------------------------------------
def j01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    # at equal ts the click sorts first (is_p asc) so an exactly-simultaneous
    # click is visible to the purchase — matching ASOF's p.ts >= c.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_id = F.last(
        F.when(F.col("is_p") == 0, F.col("event_id")), ignorenulls=True
    ).over(w)
    click_ts = F.last(
        F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("last_click_id", click_id)
        .withColumn("last_click_ts", click_ts)
        .filter(F.col("is_p") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            "last_click_id",
            "last_click_ts",
            F.round("value", 2).alias("purchase_value"),
        )
    )


J01_SQL = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
       c.event_id AS last_click_id, c.ts AS last_click_ts,
       round(p.value, 2) AS purchase_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# j02 — banded range join: pairs of events by the same user within a
# 10-minute window.
# ---------------------------------------------------------------------------
WINDOW_S = 600


def j02_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("t"),
    )
    b = base.withColumn("bin", F.floor(F.col("t") / WINDOW_S))
    a = b.withColumn(
        "jbin", F.explode(F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1))
    ).select("user_id", F.col("event_id").alias("id_a"), F.col("t").alias("t_a"), "jbin")
    rhs = b.select(
        "user_id", F.col("event_id").alias("id_b"), F.col("t").alias("t_b"),
        F.col("bin").alias("jbin"),
    )
    return (
        a.join(rhs, ["user_id", "jbin"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= WINDOW_S)
        )
        .select(
            "user_id", "id_a", "id_b",
            F.abs(F.col("t_a") - F.col("t_b")).cast("long").alias("gap_s"),
        )
    )


J02_SQL = f"""
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       CAST(abs(floor(epoch(a.ts)) - floor(epoch(b.ts))) AS BIGINT) AS gap_s
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(floor(epoch(a.ts)) - floor(epoch(b.ts))) <= {WINDOW_S}
"""
