"""Catalog ↔ DuckDB oracle parity at sf0.001 (mirrors the driver's gate).

For every query in the catalog: row count, column-name set, and an
order-insensitive value hash must match the oracle SQL run by DuckDB on
the same parquet files. This is the semantic test layer the reference
lacks (SURVEY.md §5) — its runtime verification queries
(/root/reference/dags/s3_to_snowflake_dag.py:159-203) only counted rows.
"""

from __future__ import annotations

import duckdb
import pytest

from postgres_to_snowflake_data_pipeline_spark.queries import FULL_CATALOG as CATALOG
from tools.check_parity import TABLES, frame_hash


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    fn, sql = CATALOG[name]
    # every catalog entry must carry an exact oracle; a genuinely
    # non-SQL-expressible op belongs in a dedicated pytest, not here
    assert sql is not None, f"{name} has no oracle SQL"
    sdf = fn(spark, sf_dir).toPandas()
    odf = oracle.execute(sql).df()
    assert len(sdf) == len(odf), f"row count {len(sdf)} != {len(odf)}"
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in odf.columns
    )
    assert frame_hash(sdf) == frame_hash(odf), "value hash mismatch"
