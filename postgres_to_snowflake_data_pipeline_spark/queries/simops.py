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

from postgres_to_snowflake_data_pipeline_spark.functions import kmeans as _km
from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
    cosine_similarity as _cosine,
)
from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
    to_double_array as _as_double,
)
from postgres_to_snowflake_data_pipeline_spark.queries.base import load

N_QUERIES = 5  # vec_id < 5 are the query vectors


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


# ---------------------------------------------------------------------------
# v04 — random-hyperplane LSH-bucketed ANN (the scale path for unlabeled
# corpora): each vector is reduced to an 8-bit bucket = sign pattern of dot
# products with 8 deterministic ±1 hyperplanes; search only within the
# query's bucket. At 100 TB the table is partitioned by bucket, so a query
# touches 1/256th of the data (multi-probe widens recall). The hyperplane
# sign matrix is a deterministic md5-derived constant embedded identically
# in the Spark plan and the oracle SQL.
# ---------------------------------------------------------------------------
N_PLANES = 8
DIM = 64


def _plane_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1 if hashlib.md5(f"plane{p}#dim{d}".encode()).digest()[0] % 2 == 0 else -1
            for d in range(DIM)
        ]
        for p in range(N_PLANES)
    ]


def _bucket_of(vec_col: str) -> Column:
    v = _as_double(vec_col)
    bits = []
    for p, signs in enumerate(_plane_signs()):
        plane = F.array(*[F.lit(float(s)) for s in signs])
        bits.append(
            F.when(_dot_planes(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.alias("bucket")


def _dot_planes(a: Column, plane: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, plane, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def v04_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    with_bucket = emb.select("vec_id", "embedding", _bucket_of("embedding"))
    queries = with_bucket.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        "bucket",
    )
    cands = with_bucket.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_embedding"),
        "bucket",
    )
    return _topk(cands.join(F.broadcast(queries), "bucket").drop("bucket"), k=3)


def _oracle_bucket_sql(vec: str) -> str:
    parts = []
    for p, signs in enumerate(_plane_signs()):
        arr = "[" + ", ".join(f"{s}.0" for s in signs) + "]"
        parts.append(
            f"(CASE WHEN list_dot_product({vec}, {arr}::DOUBLE[]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(parts)


# ---------------------------------------------------------------------------
# v05 — multi-probe LSH ANN: probe the query's bucket AND every bucket at
# Hamming distance 1 (flip each of the 8 sign bits) — 9 bucketed probes per
# query instead of 1. The recall knob: near neighbors that landed just
# across one hyperplane are recovered, while the join stays bucket-equi
# (9x the probe rows, still nothing like a cross join; candidates keep ONE
# bucket each so no pair dedup is needed).
# ---------------------------------------------------------------------------
def v05_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    with_bucket = emb.select("vec_id", "embedding", _bucket_of("embedding"))
    probes = F.array(
        F.col("bucket"), *[F.expr(f"bucket ^ {1 << p}") for p in range(N_PLANES)]
    )
    queries = with_bucket.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.explode(probes).alias("bucket"),
    )
    cands = with_bucket.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_embedding"),
        "bucket",
    )
    return _topk(cands.join(F.broadcast(queries), "bucket").drop("bucket"), k=3)


V04_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_oracle_bucket_sql("embedding::DOUBLE[]")} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qe, bucket FROM e WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, v AS ce, bucket FROM e WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
               6) AS cosine
  FROM c JOIN q USING (bucket)
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# v06 — IVF with a TRAINED coarse quantizer (the half v02 assumes away):
# distributed k-means over the unlabeled embedding table, then nprobe=2
# cell-pruned search. Fully deterministic and oracle-checkable:
#
# - seeded init: cell = (md5-derived 60-bit int of vec_id) % K — the same
#   multiply-mod-style hash family both engines share (CLAUDE.md).
# - FIXED Lloyd iterations (KMEANS_ITERS): update = posexplode → groupBy
#   (cell, pos) → avg rounded to 6 dp (map-side partials collapse the
#   shuffle to K×DIM rows per task); assign = argmin over the K centroid
#   literals via array_min of (dist, cell) structs — whole-stage codegen,
#   ties broken by cell id. Distances and scores are rounded to 6 dp
#   BEFORE any comparison so FP summation-order noise (~1e-15) can never
#   flip an assignment differently across engines.
# - centroids (K×DIM doubles) are the ONLY driver state — bounded, and
#   broadcast into the next iteration's plan as literals.
#
# Search: candidates keep their 1 nearest cell; each query probes its
# NPROBE nearest cells (slice of the sorted (dist, cell) array) — a
# bucket-equi join, never a crossJoin. At 100 TB: train on a deterministic
# hash-sample (the centroid estimate needs ~1e6 vectors, not the corpus),
# partition the table by cell id, and a query opens nprobe/K of the data.
# The oracle unrolls the same fixed iterations as a DuckDB CTE chain.
# ---------------------------------------------------------------------------
K_CELLS = 8
KMEANS_ITERS = 3
NPROBE = 2


def _argmin_cell(vcol: str, cents: dict[int, list[float]]) -> Column:
    return _km.argmin_cell(vcol, cents)


def _probe_cells(vcol: str, cents: dict[int, list[float]], nprobe: int) -> Column:
    return _km.probe_cells(vcol, cents, nprobe)


def train_kmeans_cells(emb_v: DataFrame, vcol: str = "v") -> dict[int, list[float]]:
    """v06's trainer: full-corpus Lloyd iterations at module defaults.
    The primitives live in ``functions/kmeans.py`` (shared with the
    persisted index in ``lake/ann_index.py``, which trains on a
    hash-sample instead — the 100 TB lifecycle)."""
    return _km.train_kmeans_cells(emb_v, vcol, k=K_CELLS, iters=KMEANS_ITERS)


def v06_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select("vec_id", _as_double("embedding").alias("v"))
    cents = train_kmeans_cells(ev)
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_embedding"),
        F.explode(_probe_cells("v", cents, NPROBE)).alias("cell"),
    )
    cands = ev.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("c_embedding"),
        _argmin_cell("v", cents).alias("cell"),
    )
    return _topk(cands.join(F.broadcast(queries), "cell").drop("cell"), k=3)


def _v06_sql() -> str:
    seed = (
        "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {K_CELLS}"
    )
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"a0 AS (SELECT vec_id, v, {seed} AS cell FROM e)",
    ]
    prev = "a0"
    for i in range(1, KMEANS_ITERS + 1):
        ctes.append(
            f"c{i} AS (SELECT cell, pos, round(avg(val), 6) AS cv FROM "
            f"(SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS pos "
            f"FROM {prev}) GROUP BY cell, pos)"
        )
        ctes.append(
            f"c{i}l AS (SELECT cell, list(cv ORDER BY pos) AS cvec "
            f"FROM c{i} GROUP BY cell)"
        )
        ctes.append(
            f"d{i} AS (SELECT p.vec_id, p.v, c.cell, "
            f"round(list_dot_product(c.cvec, c.cvec) "
            f"- 2 * list_dot_product(p.v, c.cvec), 6) AS dist "
            f"FROM e p, c{i}l c)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, v, cell FROM (SELECT *, row_number() "
            f"OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn "
            f"FROM d{i}) WHERE rn = 1)"
        )
        prev = f"a{i}"
    last = KMEANS_ITERS
    ctes.append(
        f"qp AS (SELECT vec_id AS query_id, v AS qe, cell FROM (SELECT *, "
        f"row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn "
        f"FROM d{last} WHERE vec_id < {N_QUERIES}) WHERE rn <= {NPROBE})"
    )
    ctes.append(
        f"cand AS (SELECT vec_id AS neighbor_id, v AS ce, cell "
        f"FROM a{last} WHERE vec_id >= {N_QUERIES})"
    )
    ctes.append(
        "scored AS (SELECT query_id, neighbor_id, "
        "round(list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe)) "
        "* sqrt(list_dot_product(ce, ce))), 6) AS cosine "
        "FROM cand JOIN qp USING (cell))"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk "
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored) "
        "WHERE rnk <= 3"
    )


V06_SQL = _v06_sql()


# ---------------------------------------------------------------------------
# v07 — PERSISTED IVF index (the lifecycle v06 got wrong at scale): train
# the coarse quantizer ONCE on a deterministic md5 hash-sample of the
# candidates, persist centroids + a cell-clustered parquet layout
# (lake/ann_index.py), then search by opening ONLY the nprobe probed
# cells' files (partition pruning — pinned via inputFiles() in
# tests/test_ann_index.py). The oracle replays the identical sampled
# training, final assignment and probe join declaratively in DuckDB, so
# the hash check covers the full build+search composition.
# ---------------------------------------------------------------------------
SAMPLE_MOD = 2  # sample half the candidates for training (tiny sf tables)


def v07_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex

    # pid-suffixed scratch: deterministic within a process (reruns reuse
    # and rebuild it), but two PROCESSES running the catalog concurrently
    # (driver gate + bench) must not rmtree each other's live index
    work = os.path.join(
        tempfile.gettempdir(),
        f"annidx-{sf_dir.strip('/').replace('/', '-')}-pid{os.getpid()}",
    )
    shutil.rmtree(work, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select("vec_id", _as_double("embedding").alias("v"))
    idx = AnnIndex.build(
        spark,
        ev.filter(F.col("vec_id") >= N_QUERIES),
        work,
        key_col="vec_id",
        vec_col="v",
        k=K_CELLS,
        iters=KMEANS_ITERS,
        sample_mod=SAMPLE_MOD,
    )
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return idx.search(queries, k=3, nprobe=NPROBE)


def _ivf_persisted_sql(base_pred: str = "") -> str:
    """The persisted-IVF oracle: training unrolled in SQL over the hash
    sample of the candidate set (optionally narrowed by ``base_pred`` —
    v08 trains on the pre-append base only), final centroids assign the
    FULL candidate set (v08's appended vectors are assigned by the same
    frozen centroids, so the assignment CTE needs no change)."""
    seed = (
        "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {K_CELLS}"
    )
    samp = (
        "CAST(concat('0x', substr(md5(concat('sample#', "
        "CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) "
        f"% {SAMPLE_MOD} = 0"
    )
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"s AS (SELECT vec_id, v FROM e WHERE vec_id >= {N_QUERIES}{base_pred} AND {samp})",
        f"a0 AS (SELECT vec_id, v, {seed} AS cell FROM s)",
    ]
    prev = "a0"
    for i in range(1, KMEANS_ITERS + 1):
        ctes.append(
            f"c{i} AS (SELECT cell, pos, round(avg(val), 6) AS cv FROM "
            f"(SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS pos "
            f"FROM {prev}) GROUP BY cell, pos)"
        )
        ctes.append(
            f"c{i}l AS (SELECT cell, list(cv ORDER BY pos) AS cvec "
            f"FROM c{i} GROUP BY cell)"
        )
        ctes.append(
            f"d{i} AS (SELECT p.vec_id, p.v, c.cell, "
            f"round(list_dot_product(c.cvec, c.cvec) "
            f"- 2 * list_dot_product(p.v, c.cvec), 6) AS dist "
            f"FROM s p, c{i}l c)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, v, cell FROM (SELECT *, row_number() "
            f"OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn "
            f"FROM d{i}) WHERE rn = 1)"
        )
        prev = f"a{i}"
    last = KMEANS_ITERS
    # final trained centroids (c{last}l) assign the FULL candidate set and
    # pick the queries' probe cells — sample only ever fed training
    ctes.append(
        f"df AS (SELECT p.vec_id, p.v, c.cell, "
        f"round(list_dot_product(c.cvec, c.cvec) "
        f"- 2 * list_dot_product(p.v, c.cvec), 6) AS dist "
        f"FROM e p, c{last}l c)"
    )
    ctes.append(
        f"cand AS (SELECT vec_id AS neighbor_id, v AS ce, cell FROM "
        f"(SELECT *, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY dist, cell) AS rn FROM df WHERE vec_id >= {N_QUERIES}) "
        f"WHERE rn = 1)"
    )
    ctes.append(
        f"qp AS (SELECT vec_id AS query_id, v AS qe, cell FROM (SELECT *, "
        f"row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn "
        f"FROM df WHERE vec_id < {N_QUERIES}) WHERE rn <= {NPROBE})"
    )
    ctes.append(
        "scored AS (SELECT query_id, neighbor_id, "
        "round(list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe)) "
        "* sqrt(list_dot_product(ce, ce))), 6) AS cosine "
        "FROM cand JOIN qp USING (cell))"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk "
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored) "
        "WHERE rnk <= 3"
    )


V07_SQL = _ivf_persisted_sql()


def v08_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF index MAINTENANCE: build on the pre-append base
    (vec_id % 5 != 0), then insert the remaining fifth of the corpus via
    ``AnnIndex.append`` — frozen centroids assign the new vectors to
    their cells and the layout grows in place — reload the index from
    its sidecar (persistence round-trip inside the oracled flow) and
    search. The oracle trains on the base subset only and assigns the
    FULL candidate set with the trained centroids, exactly the frozen-
    centroid insert semantics (see lake/ann_index.py::append)."""
    import os
    import shutil
    import tempfile

    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex

    work = os.path.join(
        tempfile.gettempdir(),
        f"annidx8-{sf_dir.strip('/').replace('/', '-')}-pid{os.getpid()}",
    )
    shutil.rmtree(work, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select("vec_id", _as_double("embedding").alias("v"))
    cands = ev.filter(F.col("vec_id") >= N_QUERIES)
    idx = AnnIndex.build(
        spark,
        cands.filter(F.col("vec_id") % 5 != 0),
        work,
        key_col="vec_id",
        vec_col="v",
        k=K_CELLS,
        iters=KMEANS_ITERS,
        sample_mod=SAMPLE_MOD,
    )
    idx.append(cands.filter(F.col("vec_id") % 5 == 0))
    idx = AnnIndex.load(spark, work)
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return idx.search(queries, k=3, nprobe=NPROBE)


V08_SQL = _ivf_persisted_sql(" AND vec_id % 5 != 0")


def v09_ann_ivf_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index stored AS a lake table (lake/ann_index.py::LakeAnnIndex):
    same sampled training, frozen-centroid insert and nprobe search as
    v08, but every maintenance batch is a COMMIT-KEYED epoch — the append
    is applied TWICE here (simulating Structured Streaming's at-least-once
    foreachBatch re-delivery) and the second apply is a metadata no-op, so
    the hash-checked result doubles as an exactly-once proof. The search
    reads only the probed cells' hash buckets through the manifest (file
    sets, not directory listings). Oracle: identical to v08 — storage and
    idempotency change, the math does not."""
    import os
    import shutil
    import tempfile

    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import LakeAnnIndex

    work = os.path.join(
        tempfile.gettempdir(),
        f"annidx9-{sf_dir.strip('/').replace('/', '-')}-pid{os.getpid()}",
    )
    shutil.rmtree(work, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select("vec_id", _as_double("embedding").alias("v"))
    cands = ev.filter(F.col("vec_id") >= N_QUERIES)
    idx = LakeAnnIndex.build(
        spark,
        cands.filter(F.col("vec_id") % 5 != 0),
        work,
        key_col="vec_id",
        vec_col="v",
        k=K_CELLS,
        iters=KMEANS_ITERS,
        sample_mod=SAMPLE_MOD,
    )
    appended = cands.filter(F.col("vec_id") % 5 == 0)
    idx.append(appended, epoch=1)
    idx.append(appended, epoch=1)  # re-delivered batch: metadata no-op
    idx = LakeAnnIndex.load(spark, work)  # persistence round-trip
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return idx.search(queries, k=3, nprobe=NPROBE)


V09_SQL = V08_SQL


def v10_ann_ivf_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift-retrain lifecycle proven by value hash: build the lake
    index on the pre-append base (vec_id % 5 != 0), then ``maintain`` the
    remaining fifth with a drift tolerance the append EXCEEDS
    (appended_share 0.2 > threshold 0.1) — the maintenance tick itself
    fires ``retrain``, which re-trains the quantizer on the CURRENT rows'
    hash-sample and commits new centroids + cell reassignments +
    tombstones as one LWW epoch (lake/ann_index.py). Because retraining
    on base ∪ appended is definitionally a fresh full-set training, the
    oracle is V07's SQL verbatim (train on the full candidate sample) —
    the hash can only match if the retrain actually replaced the frozen
    quantizer AND the reassignment preserved the row set. The drift reset
    and generation turnover are asserted in-query; search runs through a
    persistence round-trip on the retrained index."""
    import os
    import shutil
    import tempfile

    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import LakeAnnIndex

    work = os.path.join(
        tempfile.gettempdir(),
        f"annidx10-{sf_dir.strip('/').replace('/', '-')}-pid{os.getpid()}",
    )
    shutil.rmtree(work, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select("vec_id", _as_double("embedding").alias("v"))
    cands = ev.filter(F.col("vec_id") >= N_QUERIES)
    idx = LakeAnnIndex.build(
        spark,
        cands.filter(F.col("vec_id") % 5 != 0),
        work,
        key_col="vec_id",
        vec_col="v",
        k=K_CELLS,
        iters=KMEANS_ITERS,
        sample_mod=SAMPLE_MOD,
    )
    tok0 = idx.meta["token"]
    idx.maintain(
        cands.filter(F.col("vec_id") % 5 == 0), epoch=1,
        rebuild_threshold=0.1,
    )
    assert idx.meta["token"] != tok0, "drift threshold did not fire retrain"
    assert idx.appended_share() == 0.0, "retrain did not reset the signal"
    idx = LakeAnnIndex.load(spark, work)  # persistence round-trip
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return idx.search(queries, k=3, nprobe=NPROBE)


#: retrain on base ∪ appended ≡ fresh training on the full candidate set
V10_SQL = _ivf_persisted_sql()


def _probe_list_sql() -> str:
    probes = ", ".join(f"xor(bucket, {1 << p})" for p in range(N_PLANES))
    return f"[bucket, {probes}]"


V05_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_oracle_bucket_sql("embedding::DOUBLE[]")} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v AS qe, unnest({_probe_list_sql()}) AS bucket
  FROM e WHERE vec_id < {N_QUERIES}
),
c AS (SELECT vec_id AS neighbor_id, v AS ce, bucket FROM e WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
               6) AS cosine
  FROM c JOIN q USING (bucket)
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# v11 — hybrid retrieval: keyword + metadata filter BEFORE the vector
# distance (the retrieval shape LLM corpora actually serve: "top-k similar
# docs mentioning X in language Y"). Candidates are documents carrying
# token 'dup' with lang='en', joined to their embeddings, scored by exact
# cosine against the broadcast query set, top-5 per query.
#
# Scale design: the relational predicate prunes the candidate set ahead of
# the O(candidates x queries) distance stage — at 100 TB the token/lang
# filter is the content-index / inverted-index path (a lake-backed corpus
# reads via LakeTable.read(token_prune=..., eq_prune=...), opening only
# files whose indexes may match), and the surviving fraction (~2% here)
# is what the v01-shaped broadcast crossJoin ever sees. The join to
# embeddings is on the corpus key, co-partitioned under a shared bucket
# layout in the lake (no shuffle of the vectors at scale).
# ---------------------------------------------------------------------------
HYBRID_TOKEN = "dup"
HYBRID_LANG = "en"


def v11_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    keep = docs.filter(
        (F.col("lang") == HYBRID_LANG)
        & F.array_contains(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), HYBRID_TOKEN
        )
    ).select(F.col("doc_id").alias("neighbor_id"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    cands = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .join(keep, emb["vec_id"] == keep["neighbor_id"])
        .select("neighbor_id", F.col("embedding").alias("c_embedding"))
    )
    return _topk(cands.crossJoin(F.broadcast(queries)), k=5)


V11_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
keep AS (
  SELECT doc_id FROM documents
  WHERE lang = '{HYBRID_LANG}'
    AND list_contains(
          string_split_regex(lower(text), '[^a-z0-9]+'), '{HYBRID_TOKEN}')
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce
  FROM embeddings JOIN keep ON vec_id = doc_id
  WHERE vec_id >= {N_QUERIES}
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
# v12 — product-quantized IVF search with exact re-rank (round 5; VERDICT
# r4 stretch #9). The persisted index stores an m-code PQ column next to
# each exact vector (lake/ann_index.py::build(pq=...)); search runs an
# ADC pass that scans ONLY the code column of the probed cells, then
# re-ranks the top-C candidates per query on exact cosine behind a
# pushed-down key filter. Every stage is deterministic (md5-seeded Lloyd
# for coarse cells AND per-subspace codebooks, 6-dp rounded distances,
# INTEGER-micro ADC sums — order-independent across engines), so the
# WHOLE chain — train → encode → ADC → re-rank — replays exactly in
# DuckDB. At 100 TB the scan-byte ratio is ~dim*8 : m (bytes measured in
# tools/bench_pq.py; recall gate in tests/test_ann_pq.py).
# ---------------------------------------------------------------------------
PQ_M = 4        # subspaces (dim 64 -> 16-dim subvectors)
PQ_K = 8        # codewords per subspace
PQ_RERANK = 12  # exact-rerank candidates per query


def v12_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex

    work = os.path.join(
        tempfile.gettempdir(),
        f"annidx12-{sf_dir.strip('/').replace('/', '-')}-pid{os.getpid()}",
    )
    shutil.rmtree(work, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select("vec_id", _as_double("embedding").alias("v"))
    idx = AnnIndex.build(
        spark,
        ev.filter(F.col("vec_id") >= N_QUERIES),
        work,
        key_col="vec_id",
        vec_col="v",
        k=K_CELLS,
        iters=KMEANS_ITERS,
        sample_mod=SAMPLE_MOD,
        pq=(PQ_M, PQ_K),
    )
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return idx.search(queries, k=3, nprobe=NPROBE, pq_rerank=PQ_RERANK)


def _ivf_pq_sql() -> str:
    """The PQ oracle: v07's coarse-quantizer CTEs (training unrolled over
    the hash sample, full-set assignment, per-query probe cells), plus —
    per subspace — the SAME unrolled Lloyd over sliced sample vectors, a
    DENSE code remap (row_number over surviving cells, exactly the
    engine's sorted-cell positions), candidate encoding by rounded
    argmin (ties to the lower code), integer-micro ADC tables, a top-C
    cut per query by (adc, neighbor), and the exact-cosine re-rank."""
    dsub = DIM // PQ_M
    seed = (
        "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) "
        "AS BIGINT)"
    )
    samp = (
        "CAST(concat('0x', substr(md5(concat('sample#', "
        "CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) "
        f"% {SAMPLE_MOD} = 0"
    )
    # -- coarse quantizer: identical CTE chain to _ivf_persisted_sql
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"s AS (SELECT vec_id, v FROM e WHERE vec_id >= {N_QUERIES} AND {samp})",
        f"a0 AS (SELECT vec_id, v, {seed} % {K_CELLS} AS cell FROM s)",
    ]
    prev = "a0"
    for i in range(1, KMEANS_ITERS + 1):
        ctes += [
            f"c{i} AS (SELECT cell, pos, round(avg(val), 6) AS cv FROM "
            f"(SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS pos "
            f"FROM {prev}) GROUP BY cell, pos)",
            f"c{i}l AS (SELECT cell, list(cv ORDER BY pos) AS cvec "
            f"FROM c{i} GROUP BY cell)",
            f"d{i} AS (SELECT p.vec_id, p.v, c.cell, "
            f"round(list_dot_product(c.cvec, c.cvec) "
            f"- 2 * list_dot_product(p.v, c.cvec), 6) AS dist "
            f"FROM s p, c{i}l c)",
            f"a{i} AS (SELECT vec_id, v, cell FROM (SELECT *, row_number() "
            f"OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn "
            f"FROM d{i}) WHERE rn = 1)",
        ]
        prev = f"a{i}"
    last = KMEANS_ITERS
    ctes += [
        f"df AS (SELECT p.vec_id, p.v, c.cell, "
        f"round(list_dot_product(c.cvec, c.cvec) "
        f"- 2 * list_dot_product(p.v, c.cvec), 6) AS dist "
        f"FROM e p, c{last}l c)",
        f"cand AS (SELECT vec_id AS neighbor_id, v AS ce, cell FROM "
        f"(SELECT *, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY dist, cell) AS rn FROM df WHERE vec_id >= {N_QUERIES}) "
        f"WHERE rn = 1)",
        f"qp AS (SELECT vec_id AS query_id, v AS qe, cell FROM (SELECT *, "
        f"row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn "
        f"FROM df WHERE vec_id < {N_QUERIES}) WHERE rn <= {NPROBE})",
        "q2 AS (SELECT DISTINCT query_id, qe FROM qp)",
        "pairs AS (SELECT qp.query_id, cand.neighbor_id "
        "FROM cand JOIN qp USING (cell))",
    ]
    # -- per-subspace codebooks over the SAME sample (sliced), encode +
    #    integer-micro query distance tables
    for i in range(PQ_M):
        lo, hi = i * dsub + 1, (i + 1) * dsub
        ctes.append(
            f"ss{i} AS (SELECT vec_id, list_slice(v, {lo}, {hi}) AS v, "
            f"{seed} % {PQ_K} AS cell FROM s)"
        )
        prev = f"ss{i}"
        for j in range(1, KMEANS_ITERS + 1):
            ctes += [
                f"s{i}c{j} AS (SELECT cell, pos, round(avg(val), 6) AS cv "
                f"FROM (SELECT cell, unnest(v) AS val, "
                f"generate_subscripts(v, 1) AS pos FROM {prev}) "
                f"GROUP BY cell, pos)",
                f"s{i}c{j}l AS (SELECT cell, list(cv ORDER BY pos) AS cvec "
                f"FROM s{i}c{j} GROUP BY cell)",
                f"s{i}d{j} AS (SELECT p.vec_id, p.v, c.cell, "
                f"round(list_dot_product(c.cvec, c.cvec) "
                f"- 2 * list_dot_product(p.v, c.cvec), 6) AS dist "
                f"FROM (SELECT vec_id, v FROM ss{i}) p, s{i}c{j}l c)",
                f"s{i}a{j} AS (SELECT vec_id, v, cell FROM (SELECT *, "
                f"row_number() OVER (PARTITION BY vec_id "
                f"ORDER BY dist, cell) AS rn FROM s{i}d{j}) WHERE rn = 1)",
            ]
            prev = f"s{i}a{j}"
        ctes += [
            # dense remap: code = position of the surviving cell in sorted
            # order (the engine's [cb[c] for c in sorted(cb)])
            f"cb{i} AS (SELECT row_number() OVER (ORDER BY cell) - 1 "
            f"AS code, cvec FROM s{i}c{last}l)",
            # encode every candidate's subvector (rounded argmin, ties to
            # the lower code)
            f"enc{i} AS (SELECT neighbor_id, code FROM (SELECT "
            f"c.neighbor_id, b.code, "
            f"round(list_dot_product(b.cvec, b.cvec) - 2 * "
            f"list_dot_product(list_slice(c.ce, {lo}, {hi}), b.cvec), 6) "
            f"AS dist, row_number() OVER (PARTITION BY c.neighbor_id "
            f"ORDER BY round(list_dot_product(b.cvec, b.cvec) - 2 * "
            f"list_dot_product(list_slice(c.ce, {lo}, {hi}), b.cvec), 6), "
            f"b.code) AS rn FROM cand c, cb{i} b) WHERE rn = 1)",
            # per-query distance table in INTEGER MICROS (order-free sums)
            f"qd{i} AS (SELECT q2.query_id, b.code, "
            f"CAST(round((list_dot_product(b.cvec, b.cvec) - 2 * "
            f"list_dot_product(list_slice(q2.qe, {lo}, {hi}), b.cvec)) "
            f"* 1e6) AS BIGINT) AS d FROM q2, cb{i} b)",
        ]
    adc_joins = " ".join(
        f"JOIN enc{i} e{i} ON e{i}.neighbor_id = p.neighbor_id "
        f"JOIN qd{i} t{i} ON t{i}.query_id = p.query_id "
        f"AND t{i}.code = e{i}.code"
        for i in range(PQ_M)
    )
    adc_sum = " + ".join(f"t{i}.d" for i in range(PQ_M))
    ctes += [
        f"adc AS (SELECT p.query_id, p.neighbor_id, {adc_sum} AS adc "
        f"FROM pairs p {adc_joins})",
        f"topc AS (SELECT query_id, neighbor_id FROM (SELECT *, "
        f"row_number() OVER (PARTITION BY query_id "
        f"ORDER BY adc, neighbor_id) AS rn FROM adc) "
        f"WHERE rn <= {PQ_RERANK})",
        "rer AS (SELECT t.query_id, t.neighbor_id, "
        "round(list_dot_product(q2.qe, c.ce) "
        "/ (sqrt(list_dot_product(q2.qe, q2.qe)) "
        "* sqrt(list_dot_product(c.ce, c.ce))), 6) AS cosine "
        "FROM topc t JOIN cand c ON c.neighbor_id = t.neighbor_id "
        "JOIN q2 ON q2.query_id = t.query_id)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk "
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rnk FROM rer) "
        "WHERE rnk <= 3"
    )


V12_SQL = _ivf_pq_sql()
