"""Egress sinks (SURVEY.md §2.1 S5/S6/S10/S11/S12 parity).

The reference's sinks are: date-partitioned Parquet to S3
(/root/reference/scripts/export_to_s3.py:95-114, key layout :103-106),
CREATE-OR-REPLACE warehouse tables, a CTAS summary table, a JDBC report
writeback (/root/reference/dags/silver_layer_dag.py:82-127), and JSON/
Markdown documents. Spark-first equivalents below; the lake table itself
(lake/table.py) is the primary sink for CDC state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_partitioned_snapshot(
    df: DataFrame,
    path: str,
    date_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned Parquet export — the reference's
    ``data/{table}/{YYYY}/{MM}/{DD}/`` S3 layout (export_to_s3.py:103-106)
    as hive-style partitions, so downstream readers get partition pruning
    for free."""
    (
        df.withColumn("_y", F.year(date_col))
        .withColumn("_m", F.month(date_col))
        .withColumn("_d", F.dayofmonth(date_col))
        .write.partitionBy("_y", "_m", "_d")
        .mode(mode)
        .parquet(path)
    )


def write_report_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Create-or-replace analytical report table (the Silver CTAS,
    s3_to_snowflake_dag.py:209-255 / silver_layer_dag.py:41-69)."""
    df.write.mode(mode).parquet(path)


def write_report_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC report writeback (the reference recomputes the report into
    Supabase, silver_layer_dag.py:82-127; we write the already-computed
    DataFrame). Exercised end-to-end against embedded Derby in
    tests/test_jdbc.py.

    NOTE: ``mode='overwrite'`` DROPs the target and reloads it row by
    row — a concurrent reader of the report sees an empty or partially
    loaded table for the whole load window, and a crash mid-load loses
    the previous report entirely. For a report with live readers use
    :func:`write_report_jdbc_staged`."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def _jdbc_connect(spark_jvm, url: str, properties: dict[str, str] | None):
    """Open a driver-side java.sql.Connection through the session JVM (the
    same classpath Spark's own JDBC writer uses, so no new dependency)."""
    props = spark_jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        if k == "driver":
            # Spark reader/writer option; for DriverManager we must load
            # the class so the driver self-registers (Class.forName is the
            # documented JDBC bootstrap for drivers outside the app jar)
            spark_jvm.java.lang.Class.forName(v)
        else:
            props.setProperty(k, v)
    return spark_jvm.java.sql.DriverManager.getConnection(url, props)


def _table_exists(conn, table: str) -> bool:
    """Dialect-portable existence probe: a zero-row scan (``WHERE 1=0``,
    universal SQL — unlike FETCH FIRST, which MySQL rejects) either
    resolves (exists) or raises undefined-table. Only the SPECIFIC
    missing-relation SQLStates map to False — Derby 42X05, Postgres 42P01,
    MySQL/SQL Server 42S02; anything else (privilege errors like Postgres
    42501, syntax errors, lock timeout, connection loss)
    re-raises, because a non-absence error misread as absence would make
    the swap skip the live->retired rename and then fail against the
    still-existing live table with a misleading cause."""
    st = conn.createStatement()
    try:
        st.executeQuery(f"SELECT 1 FROM {table} WHERE 1=0").close()
        return True
    except Exception as exc:
        state = None
        j = getattr(exc, "java_exception", None)
        if j is not None:
            try:
                state = j.getSQLState()
            except Exception:
                state = None
        # ONLY the undefined-table/undefined-schema states — class 42 as a
        # whole also covers syntax and privilege errors (e.g. Postgres
        # 42501), which must not be misread as "table absent" or the swap
        # takes the wrong branch. Missing SCHEMA (Derby 42Y07, Postgres
        # 3F000) implies the table is absent too — a schema-qualified
        # first-ever publish must bootstrap, not crash.
        if state is not None and str(state) in (
            "42X05", "42P01", "42S02", "42Y07", "3F000",
        ):
            return False
        raise
    finally:
        st.close()


def write_report_jdbc_staged(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    rename_fmt: str = "RENAME TABLE {old} TO {new}",
) -> None:
    """Transactional create-or-replace report writeback.

    The reference's writeback truncates-and-reloads the warehouse report
    (silver_layer_dag.py:82-127), so dashboard readers racing the load see
    a partial report. This variant keeps the live table readable with the
    OLD rows until one atomic metadata transaction swaps the new ones in:

    1. load the new report into ``{table}__stage`` (Spark JDBC overwrite —
       also clears a stage left by a crashed previous run);
    2. in ONE transaction: rename live -> ``{table}__retired``, rename
       stage -> live (DDL is transactional in Derby/Postgres, the two
       engines this targets; ``rename_fmt`` defaults to Derby/MySQL
       ``RENAME TABLE``, pass ``"ALTER TABLE {old} RENAME TO {new}"`` for
       Postgres);
    3. drop the retired table.

    Crash before (2): live table untouched, stale stage is overwritten on
    the next run. Crash inside (2): the transaction rolls back, live table
    untouched. Crash after commit: only a retired table is left, dropped
    at the start of the next run. Exercised against embedded Derby in
    tests/test_jdbc.py (happy path, leftover-stage recovery, retired GC).
    """
    stage, retired = f"{table}__stage", f"{table}__retired"
    write_report_jdbc(df, url, stage, mode="overwrite", properties=properties)
    conn = _jdbc_connect(df.sparkSession._sc._jvm, url, properties)
    try:
        st = conn.createStatement()
        try:
            # existence probes run under autocommit, BEFORE the swap
            # transaction opens: in engines where a statement error aborts
            # the whole transaction (Postgres), a probe miss inside the
            # transaction would poison the renames
            live_exists = _table_exists(conn, table)
            # clear a retired table a crashed previous run left behind —
            # the rename target must not exist (autocommit: plain GC)
            if _table_exists(conn, retired):
                st.execute(f"DROP TABLE {retired}")
            conn.setAutoCommit(False)
            if live_exists:
                st.execute(rename_fmt.format(old=table, new=retired))
            st.execute(rename_fmt.format(old=stage, new=table))
            conn.commit()
            conn.setAutoCommit(True)
            if live_exists:
                st.execute(f"DROP TABLE {retired}")
        except Exception:
            if not conn.getAutoCommit():
                conn.rollback()
            raise
        finally:
            st.close()
    finally:
        conn.close()
