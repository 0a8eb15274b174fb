"""Reference-parity relational queries (SURVEY.md §2), Spark-first.

Each query re-expresses one operator cluster from the reference pipeline
over the driver's TPC-H-ish tables, with an exact DuckDB oracle. Citations
point at the reference file:line the semantics come from.

Scale notes (100 TB): every query here is a declarative DataFrame plan —
Catalyst does column pruning + predicate pushdown into the parquet scans,
AQE sizes/coalesces the shuffles, and dimension joins are explicitly
broadcast so the only large shuffles are the aggregation exchanges on the
grouping keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.queries.base import load


# ---------------------------------------------------------------------------
# q01 — pricing summary (A1-class multi-aggregate: the reference's GROUP BY +
# SUM(CASE)+COUNT pattern, /root/reference/dags/silver_layer_dag.py:53-66,
# widened to the classic flag/status rollup). Partial (map-side) aggregation
# then a single exchange on the tiny (flag,status) key space.
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2025-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)      AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6)      AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2025-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — the silver report: the reference's one real analytical query
# (fact ⋈ dim ⋈ dim → GROUP BY year/dim/dim → SUM(CASE)×2 +
# COUNT(DISTINCT) → ORDER BY), /root/reference/dags/silver_layer_dag.py:41-69
# and /root/reference/scripts/reporte_gerencial.sql:1-15. Mapped:
# tarjeta_puntos→lineitem⋈orders, banco→nation, programa→mktsegment,
# CREDIT/DEBIT→returnflag, points→extendedprice, cardholder→custkey.
# nation (25 rows) is broadcast — no shuffle for the dim joins; the orders
# join is a key shuffle that AQE sizes.
# ---------------------------------------------------------------------------
def q02_silver_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    credit = F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(
        F.lit(0.0)
    )
    debit = F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.year("o_orderdate").alias("anio"),
            F.col("n_name").alias("banco"),
            F.col("c_mktsegment").alias("programa"),
        )
        .agg(
            F.round(F.sum(credit), 2).alias("total_puntos_credit"),
            F.round(F.sum(debit), 2).alias("total_puntos_debit"),
            F.countDistinct("o_custkey").alias("cant_tarjetahabientes"),
        )
        .orderBy("anio", "banco", "programa")
    )


Q02_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS anio,
       n_name AS banco,
       c_mktsegment AS programa,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2)
           AS total_puntos_credit,
       round(sum(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END), 2)
           AS total_puntos_debit,
       count(DISTINCT o_custkey) AS cant_tarjetahabientes
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q03 — load-verification counts: per-table COUNT(*) + COUNT(DISTINCT ...)
# stacked with UNION ALL, /root/reference/dags/s3_to_snowflake_dag.py:159-203
# (U1+A2+A3). Each branch is an independent scan-side partial count.
# ---------------------------------------------------------------------------
def q03_verification_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = [
        ("customer", "c_nationkey"),
        ("lineitem", "l_returnflag"),
        ("orders", "o_orderstatus"),
        ("part", "p_brand"),
        ("supplier", "s_nationkey"),
    ]
    parts = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).alias("row_count"),
            F.countDistinct(c).alias("distinct_sources"),
        )
        for t, c in spec
    ]
    return reduce(DataFrame.unionByName, parts).orderBy("table_name")


Q03_SQL = """
SELECT 'customer' AS table_name, count(*) AS row_count,
       count(DISTINCT c_nationkey) AS distinct_sources FROM customer
UNION ALL
SELECT 'lineitem', count(*), count(DISTINCT l_returnflag) FROM lineitem
UNION ALL
SELECT 'orders', count(*), count(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'part', count(*), count(DISTINCT p_brand) FROM part
UNION ALL
SELECT 'supplier', count(*), count(DISTINCT s_nationkey) FROM supplier
ORDER BY table_name
"""


# ---------------------------------------------------------------------------
# q04 — data_summary: GROUP BY source with COUNT/MAX stats, the reference's
# summary CTAS /root/reference/dags/s3_to_snowflake_dag.py:205-255 (A4),
# over the events stream table.
# ---------------------------------------------------------------------------
def q04_data_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.countDistinct("user_id").alias("distinct_users"),
            F.max("ts").alias("last_ts"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


Q04_SQL = """
SELECT event_type,
       count(*) AS row_count,
       count(DISTINCT user_id) AS distinct_users,
       max(ts) AS last_ts,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q05 — cleanse projection: the reference's per-row Python cleaning
# (truncate_string /root/reference/scripts/load_data.py:105-109, empty→NULL
# :184-185, lineage literals /root/reference/scripts/export_to_s3.py:82-86)
# as pure vectorized column expressions (P1/P5/P6/F7).
# ---------------------------------------------------------------------------
def q05_cleanse_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey"),
        F.substring("c_name", 1, 12).alias("name_trunc"),
        F.lower("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") >= 0, F.round(F.col("c_acctbal"), 2)).alias(
            "acctbal_clean"
        ),
        F.lit("supabase").alias("source_database"),
    )


Q05_SQL = """
SELECT c_custkey,
       substr(c_name, 1, 12) AS name_trunc,
       lower(c_mktsegment) AS segment,
       CASE WHEN c_acctbal >= 0 THEN round(c_acctbal, 2) END AS acctbal_clean,
       'supabase' AS source_database
FROM customer
"""


# ---------------------------------------------------------------------------
# q06 — left join + grouped counts: the reference's catalog introspection
# joins (information_schema LEFT JOIN key_column_usage,
# /root/reference/scripts/generate_postgres_dictionary.py:101-107) mapped to
# nation LEFT JOIN supplier. Both sides small → broadcast, zero shuffle
# before the group-by.
# ---------------------------------------------------------------------------
def q06_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(supp, nation.n_nationkey == supp.s_nationkey, "left")
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("s_suppkey").alias("supplier_cnt"),
            F.round(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias("supplier_bal"),
        )
        .orderBy("region_name", "nation_name")
    )


Q06_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       count(s_suppkey) AS supplier_cnt,
       round(coalesce(sum(s_acctbal), 0.0), 2) AS supplier_bal
FROM nation
JOIN region ON n_regionkey = r_regionkey
LEFT JOIN supplier ON n_nationkey = s_nationkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q07 — timestamp normalize/roundtrip: the reference stringifies timestamps
# to 'YYYY-MM-DD HH:MM:SS' before Parquet (/root/reference/scripts/
# export_to_s3.py:88-93) and parses multi-format strings on load
# (/root/reference/scripts/load_data.py:75-103) — F3/F4 as built-ins.
# ---------------------------------------------------------------------------
def q07_timestamp_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ts_str = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        ts_str.alias("ts_str"),
        F.to_timestamp(ts_str, "yyyy-MM-dd HH:mm:ss").alias("ts_roundtrip"),
        F.year("o_orderdate").alias("anio"),
        F.month("o_orderdate").alias("mes"),
    )


Q07_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
       strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
           AS ts_roundtrip,
       CAST(year(o_orderdate) AS INTEGER) AS anio,
       CAST(month(o_orderdate) AS INTEGER) AS mes
FROM orders
"""


# ---------------------------------------------------------------------------
# q08 — last-writer-wins current state: the engine's core reduction
# (SURVEY.md §2.4) as a batch query — one winner per (user_id, event_type)
# keyed on max event_id, via max_by (single hash-agg shuffle; no window
# sort needed Spark-side).
# ---------------------------------------------------------------------------
def q08_lww_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max("event_id").alias("last_event_id"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
        F.max_by("ts", "event_id").alias("last_ts"),
    )


Q08_SQL = """
SELECT user_id, event_type,
       max(event_id) AS last_event_id,
       round(arg_max(value, event_id), 2) AS last_value,
       arg_max(ts, event_id) AS last_ts
FROM events
GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# q09 — CDC final state (SQL view of the engine semantics): treat events as
# a change feed — 'error' = delete, anything else = upsert, event_id = LSN,
# key = user_id. Final state keeps only keys whose winning op isn't delete —
# the tombstone rule the lake table enforces (SURVEY.md §7.4 #3).
# ---------------------------------------------------------------------------
def q09_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_op"),
        F.round(F.max_by("value", "event_id"), 2).alias("value"),
    )
    return win.filter(F.col("last_op") != "error").select(
        "user_id", "last_event_id", "last_op", "value"
    )


Q09_SQL = """
SELECT user_id, last_event_id, last_op, value
FROM (
  SELECT user_id,
         max(event_id) AS last_event_id,
         arg_max(event_type, event_id) AS last_op,
         round(arg_max(value, event_id), 2) AS value
  FROM events
  GROUP BY user_id
)
WHERE last_op <> 'error'
"""


# ---------------------------------------------------------------------------
# q10 — per-key top-k (window function): top-3 events per user by value.
# The reference has no OVER clauses (SURVEY.md §2.5); this is the windowed
# rank the engine adds for turn-ordering verification. Rank on rounded value
# with event_id tie-break so ordering is engine-independent.
# ---------------------------------------------------------------------------
def q10_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    vr = F.round(F.col("value"), 2)
    w = Window.partitionBy("user_id").orderBy(vr.desc(), F.col("event_id"))
    return (
        ev.select(
            "user_id",
            "event_id",
            vr.alias("value_r"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


Q10_SQL = """
SELECT user_id, event_id, value_r, rnk
FROM (
  SELECT user_id, event_id, round(value, 2) AS value_r,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY round(value, 2) DESC, event_id) AS rnk
  FROM events
)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# q11 — multi-format timestamp parsing: the reference's parse_timestamp
# tries 5 strptime formats per value in per-row Python
# (/root/reference/scripts/load_data.py:75-103); here it's a coalesce of
# vectorized try-parses (F3) — null only if every format misses.
# ---------------------------------------------------------------------------
def q11_multiformat_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    fmt_sel = F.col("o_orderkey") % 3
    raw = (
        F.when(fmt_sel == 0, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .when(fmt_sel == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "dd.MM.yyyy HH:mm"))
    )
    parsed = F.coalesce(
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(raw, F.lit("MM/dd/yyyy")),
        F.try_to_timestamp(raw, F.lit("dd.MM.yyyy HH:mm")),
    )
    return o.select(
        "o_orderkey",
        raw.alias("raw_str"),
        parsed.alias("parsed_ts"),
        parsed.isNull().alias("unparseable"),
    )


Q11_SQL = """
WITH s AS (
  SELECT o_orderkey,
         CASE o_orderkey % 3
           WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
           WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
           ELSE strftime(o_orderdate, '%d.%m.%Y %H:%M')
         END AS raw_str
  FROM orders
)
SELECT o_orderkey, raw_str,
       coalesce(try_strptime(raw_str, '%Y-%m-%d %H:%M:%S'),
                try_strptime(raw_str, '%m/%d/%Y'),
                try_strptime(raw_str, '%d.%m.%Y %H:%M')) AS parsed_ts,
       coalesce(try_strptime(raw_str, '%Y-%m-%d %H:%M:%S'),
                try_strptime(raw_str, '%m/%d/%Y'),
                try_strptime(raw_str, '%d.%m.%Y %H:%M')) IS NULL AS unparseable
FROM s
"""


# ---------------------------------------------------------------------------
# q12 — CSV source roundtrip (S1 + P7): customers exported to CSV, read
# back with an explicit schema in DROPMALFORMED mode, cleaned. The oracle
# reads the original parquet — so the value-hash also proves the CSV
# write/read hop is lossless for these types.
# ---------------------------------------------------------------------------
def q12_csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from postgres_to_snowflake_data_pipeline_spark.sources.files import read_csv_table

    c = load(spark, sf_dir, "customer")
    out = os.path.join(
        tempfile.gettempdir(), "csvq-" + sf_dir.strip("/").replace("/", "-")
    )
    c.write.mode("overwrite").option("header", True).csv(out)
    back = read_csv_table(spark, out, c.schema, drop_malformed=True)
    return back.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal_r"),
        "c_mktsegment",
    )


Q12_SQL = """
SELECT c_custkey, c_name, c_nationkey,
       round(c_acctbal, 2) AS acctbal_r, c_mktsegment
FROM customer
"""


# ---------------------------------------------------------------------------
# q13 — rollup with subtotals (beyond the reference, which has no grouping
# sets — SURVEY.md §2.4): year × nation rollup of order totals with
# grouping_id distinguishing detail/subtotal/grand-total rows.
# ---------------------------------------------------------------------------
def q13_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.rollup(F.year("o_orderdate").alias("anio"), F.col("n_name").alias("nación"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .withColumnRenamed("nación", "nation_name")
    )


Q13_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS anio,
       n_name AS nation_name,
       round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders,
       CAST(grouping(year(o_orderdate)) * 2 + grouping(n_name) AS BIGINT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP (year(o_orderdate), n_name)
"""


# ---------------------------------------------------------------------------
# q14 — semi/anti joins (absent from the reference — SURVEY.md §2.3):
# customers WITH recent orders (left semi) and customers WITHOUT any
# order (left anti), stacked with a tag column.
# ---------------------------------------------------------------------------
def q14_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey
    with_orders = c.join(o, cond, "left_semi").select(
        "c_custkey", F.lit("has_orders").alias("segment")
    )
    without = c.join(o, cond, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("segment")
    )
    return with_orders.unionByName(without)


Q14_SQL = """
SELECT c_custkey, 'has_orders' AS segment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# q15 — global ORDER BY + LIMIT (top-k): absent from the reference
# (SURVEY.md §2.6 "No LIMIT/top-k anywhere"). Spark plans this as
# TakeOrderedAndProject — per-partition top-k then a single tiny driver
# merge, never a full global sort. Ranking on rounded price with orderkey
# tie-break keeps it engine-independent.
# ---------------------------------------------------------------------------
def q15_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pr = F.round("o_totalprice", 2)
    return (
        o.select(
            "o_orderkey",
            pr.alias("price_r"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("price_r").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q15_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS price_r,
       o_orderpriority AS priority
FROM orders
ORDER BY price_r DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q16 — event-time tumbling-window rollup: hourly event counts/sums. In
# streaming this is `groupBy(window(ts, '1 hour'))` with a watermark; the
# batch formulation (date_trunc) computes the identical result, which is
# how the engine's batch/stream parity is verified for windowed aggs.
# ---------------------------------------------------------------------------
def q16_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


Q16_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q17 — session windows (gap-based): per-user activity sessions with a
# 6-hour inactivity gap, via Spark's native session_window (the same
# operator Structured Streaming uses for stateful sessionization). The
# oracle is the classic gaps-and-islands SQL: a new session starts when
# the gap from the previous event reaches the threshold.
# ---------------------------------------------------------------------------
SESSION_GAP = "6 hours"


def q17_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events", "total_value")
    )


Q17_SQL = """
WITH t AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM t
)
SELECT user_id,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, sess_id
"""


# ---------------------------------------------------------------------------
# q18 — JSON scalar extraction: the reference handles JSON only as Python
# serialization of metadata documents (SURVEY.md §2.8); here the `props`
# JSON payload column is parsed with the built-in from_json and aggregated
# — the schema-on-read pattern for semi-structured event payloads.
# ---------------------------------------------------------------------------
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k",
        F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))["k"],
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


Q18_SQL = """
SELECT event_type,
       count(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_parsed,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q19 — grouped percentiles: the distribution-profile operator for the
# metrics layer (the reference's data_summary reports only counts and
# maxima, s3_to_snowflake_dag.py:209-250; a 100 TB metrics table needs
# distributional stats). Two physical paths behind one API:
#
# - EXACT (`percentile`): buffers each group's values — fine to ~1e7 rows
#   per group, and it shares linear interpolation with DuckDB's
#   `quantile_cont`, so it is the oracle path.
# - SKETCH (`approx_percentile`, Greenwald-Khanna): bounded memory
#   (O(accuracy·log n) per group), partial-aggregated map-side like any
#   Tungsten agg — the 10^10-row path. Guaranteed rank error ≤
#   1/accuracy, pinned against the exact bracket percentiles in
#   tests/test_percentile_sketch.py.
#
# `percentile_stats(..., approx=None)` auto-selects: sketch once the scan
# exceeds APPROX_THRESHOLD_ROWS (the count is one metadata-cheap pass —
# parquet footers answer it without reading data pages). The catalog's
# q19 pins approx=False so the driver's value-hash stays exact.
# ---------------------------------------------------------------------------
APPROX_THRESHOLD_ROWS = 10_000_000
PERCENTILE_ACCURACY = 1_000  # rank error <= 1/accuracy = 0.1 percentile


def percentile_stats(
    spark: SparkSession, sf_dir: str, approx: bool | None = None
) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    if approx is None:
        approx = o.count() >= APPROX_THRESHOLD_ROWS

    def pct(p: float) -> Column:
        if approx:
            e = f"approx_percentile(o_totalprice, {p}, {PERCENTILE_ACCURACY})"
        else:
            e = f"percentile(o_totalprice, {p})"
        return F.round(F.expr(e), 2)

    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            pct(0.5).alias("p50"),
            pct(0.9).alias("p90"),
            pct(0.99).alias("p99"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("priority")
    )


def q19_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return percentile_stats(spark, sf_dir, approx=False)


Q19_SQL = """
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q20 — CUBE (full grouping-set lattice), completing the grouping-set
# surface next to q13's ROLLUP: per (priority, status) totals plus every
# marginal and the grand total, disambiguated by grouping_id. At 100 TB
# Spark expands the lattice BEFORE the exchange (one Expand + one shuffle
# on the 4-way grouping-set key), not one pass per grouping set.
# ---------------------------------------------------------------------------
def q20_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping_id().alias("gid"),
    )


Q20_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders,
       CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# q21 — explicit GROUPING SETS: the asymmetric lattice neither q13's ROLLUP
# nor q20's CUBE can express — (priority, year), (priority), (year) but NOT
# the grand total. The reference materializes each marginal as its own
# CTAS pass (/root/reference/dags/s3_to_snowflake_dag.py:209-255, one
# data_summary per slice); here Spark's Expand emits all three set shapes
# before ONE exchange, so at 100 TB the fact table is scanned once, not
# once per marginal.
# ---------------------------------------------------------------------------
def q21_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    return (
        o.groupingSets(
            [["o_orderpriority", "yr"], ["o_orderpriority"], ["yr"]],
            "o_orderpriority",
            "yr",
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            "yr",
            "total_price",
            "n_orders",
            "gid",
        )
    )


Q21_SQL = """
WITH o AS (
  SELECT *, CAST(year(o_orderdate) AS INTEGER) AS yr FROM orders
)
SELECT o_orderpriority AS priority,
       yr,
       round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders,
       CAST(grouping(o_orderpriority) * 2 + grouping(yr) AS BIGINT) AS gid
FROM o
GROUP BY GROUPING SETS ((o_orderpriority, yr), (o_orderpriority), (yr))
"""


# ---------------------------------------------------------------------------
# q22 — PIVOT (long -> wide): per-year totals with one column per order
# status. The value list is PINNED ('F','O','P') — at 100 TB an unpinned
# pivot needs a distinct-scan of the pivot column before planning, so the
# engine surfaces the pinned form: one partial-aggregated exchange on yr,
# statuses folded map-side by Expand, no second pass. Cells with no rows
# stay NULL (both engines' SUM over the empty set).
# ---------------------------------------------------------------------------
def q22_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    return (
        o.groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .select(
            "yr",
            F.col("F").alias("total_f"),
            F.col("O").alias("total_o"),
            F.col("P").alias("total_p"),
        )
        .orderBy("yr")
    )


Q22_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
         AS total_f,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
         AS total_o,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
         AS total_p
FROM orders
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q23 — windowed moving average over a pre-aggregated daily series: the
# trend operator for the metrics layer (the reference reports only static
# totals, silver_layer_dag.py:53-66). Two stages, both shuffling the SAME
# (user_id) key: groupBy(user_id, day) collapses events to ~days rows per
# user BEFORE the sort, then the 7-row frame runs inside one window pass —
# at 100 TB the window input is the daily rollup (O(users x days)), never
# the raw event stream. Day is emitted as a string so the oracle compare
# is type-stable across engines.
# ---------------------------------------------------------------------------
def q23_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    # Exact-cents arithmetic: value is 2-dp money, so summing it as
    # DECIMAL(12,2) (then BIGINT cents) is order-independent — a plain
    # double sum differs in the last ulp across partition orders and
    # flips round(x, 2) at .005 boundaries (bit this query at sf0.01).
    # Two SMALL exchanges beat one big one here: map-side partial
    # aggregation collapses the raw events to ~O(users x days) rows
    # BEFORE the (user_id, d) exchange, and the window's user_id exchange
    # re-shuffles only that rollup. An explicit repartition("user_id")
    # up front would merge them into a single exchange — but that one
    # exchange ships EVERY raw event row (partial agg then runs
    # post-shuffle where it reduces nothing) and concentrates a hot
    # user's full history in one task. Exchange COUNT is not shuffle
    # VOLUME; plan-pinned in tests/test_plans.py.
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("dsum")
    )
    w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-6, 0)
    cents = (F.col("dsum") * 100).cast("bigint")
    return daily.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("dsum").cast("double").alias("daily_total"),
        # round to whole cents FIRST (x.5 cents is exactly representable,
        # so both engines' half-away rounding agrees), then scale — a
        # direct round(double, 2) at a .005 boundary diverges: Spark goes
        # through BigDecimal.valueOf's shortest-string ("34.785" -> up)
        # while DuckDB rounds the exact binary value (34.78499... -> down)
        (
            F.round(F.sum(cents).over(w) / F.count(F.lit(1)).over(w)).cast(
                "bigint"
            )
            / F.lit(100.0)
        ).alias("avg_7d"),
    )


Q23_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS daily_total,
         CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       strftime(d, '%Y-%m-%d') AS day,
       daily_total,
       CAST(round(sum(cents) OVER w / count(*) OVER w) AS BIGINT) / 100.0
         AS avg_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# q24 — unpivot (wide -> long): the inverse of q22's pivot, completing the
# reshape pair the reference's report layer implies (silver_layer_dag.py
# emits fixed wide columns; a metrics store consumes long (measure, value)
# rows). Four lineitem measures melt into (measure, value) and aggregate
# per (measure, returnflag).
#
# Scale shape: DataFrame.unpivot lowers to a single Expand node — ONE scan
# of the four measure columns multiplied 4x MAP-SIDE, then partial
# aggregation collapses to |measures| x |flags| groups before the one
# exchange. Never four scans, and the shuffle carries group rows only.
# Money stays exact: DOUBLE measures become BIGINT cents before the sum
# (order-independent; a double sum flips .005 boundaries across partition
# orders — see CLAUDE.md rounding note).
# ---------------------------------------------------------------------------
def q24_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint").alias(c)  # noqa: E731
    wide = li.select(
        "l_returnflag",
        cents("l_quantity"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    long = wide.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "cents",
    )
    return (
        long.groupBy("measure", "l_returnflag")
        .agg(
            F.sum("cents").alias("sum_cents"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("measure", "l_returnflag")
    )


Q24_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT)      AS l_quantity,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS l_extendedprice,
         CAST(round(l_discount * 100) AS BIGINT)      AS l_discount,
         CAST(round(l_tax * 100) AS BIGINT)           AS l_tax
  FROM lineitem
),
long AS (
  SELECT l_returnflag, measure, cents
  FROM wide
  UNPIVOT (cents FOR measure IN
           (l_quantity, l_extendedprice, l_discount, l_tax))
)
SELECT measure, l_returnflag,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       count(*) AS n_rows
FROM long
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q25 — time-RANGE window frame: for every event, how many events (and the
# min/max value) the SAME user produced in the PRECEDING HOUR, inclusive.
# This is the frame kind the rest of the window family doesn't cover —
# q10/q15 rank whole partitions, q23's moving average is a ROWS frame
# (fixed row count); a RANGE frame is bounded by the ORDER-BY VALUE, so
# frame membership follows event-time density and ties share one frame
# regardless of physical row order (which is why min/max/count — exact,
# order-independent — are the measures; no float accumulation rides the
# frame). Ordering on epoch MICROSECONDS keeps both engines' boundary
# arithmetic in exact integers. Plan: one hash exchange on user_id, one
# sort, one Window — the same single-shuffle shape as q10 (WindowExec
# handles the running frame in one pass over each sorted partition; at
# 10^10 rows the cost is the user_id exchange, and a hot user salts the
# same way the CDC path does). Reference analog: the silver report's
# per-card running aggregates (silver_layer_dag.py) restated as a
# sliding event-time window.
# ---------------------------------------------------------------------------
def q25_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ in the driver parquet; the session TZ is pinned
    # UTC (session.py), so the cast is the identity on the stored micros
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)  # preceding hour, inclusive
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.min("value").over(w).alias("v_min_1h"),
        F.max("value").over(w).alias("v_max_1h"),
    )


Q25_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       min(value) OVER w AS v_min_1h,
       max(value) OVER w AS v_max_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""
