"""Live JDBC round-trip over the embedded Derby database Spark ships with.

The reference's two database hops — partition-parallel extraction from
Postgres (/root/reference/scripts/export_to_s3.py:74-76) and the report
writeback to Supabase (/root/reference/dags/silver_layer_dag.py:82-127) —
were config-complete but unexercised in round 1 (no network database in
the sandbox). Derby's embedded driver (bundled in $SPARK_HOME/jars) is a
real SQL database served over the same JDBC code path, so the exact
production call sites run end to end: write a changefeed INTO a database,
scan it back partition-parallel, merge it into the lake, and push the
report back out over JDBC.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
from postgres_to_snowflake_data_pipeline_spark.sinks import (
    write_report_jdbc,
    write_report_jdbc_staged,
)
from postgres_to_snowflake_data_pipeline_spark.sources.feed import jdbc_changefeed

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


def test_jdbc_changefeed_to_lake_round_trip(spark, tmp_path):
    """DB-hosted WAL table -> partition-parallel JDBC scan -> merge -> state
    matches the oracle computed from the original events."""
    events = change_events(spark, 3000, n_convs=150).persist()
    url = _url("cdcdb")
    write_report_jdbc(
        events, url, "wal_changes", mode="overwrite",
        properties={"driver": DRIVER},
    )
    hi = events.agg(F.max("lsn")).first()[0]
    feed = jdbc_changefeed(
        spark, url, "wal_changes",
        lower_bound=0, upper_bound=int(hi) + 1, num_partitions=8,
        properties={"driver": DRIVER},
    )
    # the scan is genuinely partition-parallel over the LSN ranges
    assert feed.rdd.getNumPartitions() == 8
    assert feed.count() == events.count()

    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=8,
    )
    apply_batch(spark, table, feed, epoch=0)
    assert_matches_oracle(table.read(), events, PAYLOAD)
    events.unpersist()


def test_jdbc_report_writeback_reads_back_identically(spark):
    """The silver-report writeback hop: aggregate -> JDBC overwrite ->
    read back -> identical rows (the reference's Supabase
    reporte_gerencial writeback, silver_layer_dag.py:82-127)."""
    events = change_events(spark, 2000, n_convs=100)
    report = (
        events.groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.max("lsn").alias("max_lsn"),
        )
    )
    url = _url("reportdb")
    write_report_jdbc(report, url, "silver_report", mode="overwrite",
                      properties={"driver": DRIVER})
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "silver_report")
        .option("driver", DRIVER)
        .load()
    )
    a = report.orderBy("role").collect()
    b = back.orderBy("role").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _read_jdbc(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _report(spark, tag: str):
    return spark.createDataFrame(
        [(tag, i, i * 10) for i in range(5)], "tag string, k int, v int"
    )


def test_staged_writeback_create_then_replace(spark):
    """First staged run creates the live table; the second replaces its
    contents atomically; neither leaves a stage or retired table behind."""
    url = _url("stagedb1")
    props = {"driver": DRIVER}
    write_report_jdbc_staged(_report(spark, "v1"), url, "report", props)
    assert _rows(_read_jdbc(spark, url, "report")) == _rows(_report(spark, "v1"))
    write_report_jdbc_staged(_report(spark, "v2"), url, "report", props)
    assert _rows(_read_jdbc(spark, url, "report")) == _rows(_report(spark, "v2"))
    # no working tables linger after a clean run
    for leftover in ("report__stage", "report__retired"):
        with pytest.raises(Exception):
            _read_jdbc(spark, url, leftover).collect()


def test_staged_writeback_recovers_from_leftover_stage(spark):
    """A stage table abandoned by a crash between load and swap is simply
    overwritten by the next run (crash-before-swap recovery)."""
    url = _url("stagedb2")
    props = {"driver": DRIVER}
    write_report_jdbc_staged(_report(spark, "live"), url, "report", props)
    # simulate the crash: a half-loaded stage with a DIFFERENT schema
    junk = spark.createDataFrame([("junk",)], "junk string")
    write_report_jdbc(junk, url, "report__stage", properties=props)
    write_report_jdbc_staged(_report(spark, "next"), url, "report", props)
    assert _rows(_read_jdbc(spark, url, "report")) == _rows(_report(spark, "next"))


def test_staged_writeback_gc_of_leftover_retired(spark):
    """A retired table abandoned by a crash after commit-but-before-drop is
    GCed at the start of the next run (it would otherwise block the
    live->retired rename forever)."""
    url = _url("stagedb3")
    props = {"driver": DRIVER}
    write_report_jdbc_staged(_report(spark, "live"), url, "report", props)
    junk = spark.createDataFrame([("junk",)], "junk string")
    write_report_jdbc(junk, url, "report__retired", properties=props)
    write_report_jdbc_staged(_report(spark, "next"), url, "report", props)
    assert _rows(_read_jdbc(spark, url, "report")) == _rows(_report(spark, "next"))
    with pytest.raises(Exception):
        _read_jdbc(spark, url, "report__retired").collect()
