"""Similarity search over the `embeddings` table (array<float> column).

v01: brute-force cosine top-k — the exact baseline. The query set is tiny
and broadcast; the candidate side streams through executors partition by
partition, so the scan parallelizes and nothing but (query, candidate,
score) triples ever shuffle.

v02: partition-pruned (IVF-style) variant — candidates are searched only
inside the query's coarse cell (the `label` column stands in for the
nearest-centroid assignment). At 100 TB this is the scale path: the
embedding table is partitioned/bucketed by cell id, so a query touches one
cell's files instead of the full table.

All arithmetic is double-precision via built-in higher-order array
functions (zip_with/aggregate) — JVM-side, no Python. Scores are rounded
to 6 decimals *before* ranking in both engines so ordering is engine-
independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgres_to_snowflake_data_pipeline_spark.queries.base import load

N_QUERIES = 5  # vec_id < 5 are the query vectors


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _topk(joined: DataFrame, k: int) -> DataFrame:
    cos_r = F.round(
        _cosine(_as_double("q_embedding"), _as_double("c_embedding")), 6
    ).alias("cosine")
    scored = joined.select("query_id", "neighbor_id", cos_r)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


# ---------------------------------------------------------------------------
# v01 — brute-force cosine top-k (exact ANN baseline)
# ---------------------------------------------------------------------------
def v01_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    cands = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_embedding"),
    )
    return _topk(cands.crossJoin(F.broadcast(queries)), k=5)


V01_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
               6) AS cosine
  FROM c, q
)
SELECT query_id, neighbor_id, cosine,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# v02 — IVF-style cell-pruned top-k: search only the query's coarse cell
# ---------------------------------------------------------------------------
def v02_ann_ivf_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("label").alias("cell"),
    )
    cands = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_embedding"),
        F.col("label").alias("cell"),
    )
    return _topk(cands.join(F.broadcast(queries), "cell").drop("cell"), k=3)


V02_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe, label AS cell
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce, label AS cell
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
               6) AS cosine
  FROM c JOIN q USING (cell)
)
SELECT query_id, neighbor_id, cosine,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# v03 — embedding-cosine near-duplicate pairs within cells: all pairs in
# the same coarse cell with cosine ≥ 0.9 (embedding near-dedup). The cell
# join bounds the pair blow-up to per-cell sizes — the same bound a
# bucketed/partitioned layout gives at scale.
# ---------------------------------------------------------------------------
def v03_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("q_embedding"),
        F.col("label").alias("cell"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("c_embedding"),
        F.col("label").alias("cell"),
    )
    cos_r = F.round(
        _cosine(_as_double("q_embedding"), _as_double("c_embedding")), 6
    ).alias("cosine")
    return (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos_r)
        .filter(F.col("cosine") >= 0.9)
    )


V03_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label AS cell FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS cosine
FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            6) >= 0.9
"""
