"""Deterministic distributed k-means primitives.

Shared by the v06 catalog query (train-and-search in one plan, fully
DuckDB-oracled) and the persisted ANN index (``lake/ann_index.py`` — train
once on a hash-sample, persist centroids + a cell-clustered layout). Both
engines can replay every step bit-for-bit:

- seeded init: cell = (md5-derived 60-bit int of the key) % k — the
  multiply-mod-free hash family Spark and DuckDB share
  (``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
  ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``).
- FIXED Lloyd iterations: update = posexplode → groupBy (cell, pos) →
  avg rounded to 6 dp (map-side partials collapse the shuffle to k×dim
  rows per task); assign = argmin over the k centroid literals via
  array_min of (dist, cell) structs — whole-stage codegen, ties broken by
  cell id. Distances are rounded to 6 dp BEFORE any comparison so FP
  summation-order noise (~1e-15) can never flip an assignment differently
  across engines or runs.
- centroids (k×dim doubles) are the ONLY driver state — bounded, and
  broadcast into the next iteration's plan as literals.

Scale posture (100 TB): training needs ~1e6 vectors for a stable coarse
quantizer, not the corpus — callers train on a deterministic hash-sample
(``sample_hash``) and assignment/search stay full-corpus, single-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.functions.vector import dot


def _md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (engine-shared)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seed_cell(key_col: str, k: int) -> Column:
    """Deterministic initial assignment: md5-hash of the key mod k."""
    return (_md5_long(F.col(key_col).cast("string")) % k).cast("int")


def sample_hash(key_col: str) -> Column:
    """Training-sample hash, deliberately DOMAIN-SEPARATED ("sample#"
    prefix) from ``seed_cell``: sampling by ``h % m == 0`` and then
    seeding by ``h % k`` with the SAME h would confine the init to the
    cells ≡ 0 (mod gcd(m, k)) and collapse the quantizer."""
    return _md5_long(F.concat(F.lit("sample#"), F.col(key_col).cast("string")))


def dist_structs(vcol: str, cents: dict[int, list[float]]) -> list[Column]:
    """(rounded partial L2 distance, cell) structs for every centroid.
    dot(v,v) is constant across cells, so the argmin uses
    dist = dot(c,c) - 2*dot(v,c) — same formula in the DuckDB oracle."""
    out = []
    for cell in sorted(cents):
        c = cents[cell]
        cc = 0.0
        for x in c:
            cc += x * x
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.round(F.lit(cc) - 2.0 * dot(F.col(vcol), carr), 6)
        out.append(F.struct(d.alias("d"), F.lit(int(cell)).alias("c")))
    return out


def argmin_cell(vcol: str, cents: dict[int, list[float]]) -> Column:
    return F.array_min(F.array(*dist_structs(vcol, cents)))["c"]


def probe_cells(vcol: str, cents: dict[int, list[float]], nprobe: int) -> Column:
    ordered = F.array_sort(F.array(*dist_structs(vcol, cents)))
    return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["c"])


def argmin_code(vec: Column, codebook: list[list[float]]) -> Column:
    """Position-coded argmin over a DENSE codebook list (product
    quantization's per-subspace encoder): the code is the codeword's
    index 0..len-1, so an ADC distance table indexes by code directly.
    Same rounded ``dot(c,c) - 2*dot(v,c)`` partial-L2 as ``dist_structs``
    (dot(v,v) is constant per vector), ties to the lower code."""
    structs = []
    for code, c in enumerate(codebook):
        cc = 0.0
        for x in c:
            cc += x * x
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.round(F.lit(cc) - 2.0 * dot(vec, carr), 6)
        structs.append(F.struct(d.alias("d"), F.lit(int(code)).alias("c")))
    return F.array_min(F.array(*structs))["c"]


def subvector(vec: Column, m: int, dsub: int) -> Column:
    """Subspace ``m``'s slice of a flat vector (PQ splits dim into
    contiguous blocks of ``dsub``). ``F.slice`` is 1-based."""
    return F.slice(vec, m * dsub + 1, dsub)


def train_kmeans_cells(
    emb_v: DataFrame, vcol: str = "v", k: int = 8, iters: int = 3
) -> dict[int, list[float]]:
    """Lloyd's k-means over (vec_id, v: array<double>) with seeded init and
    ``iters`` fixed iterations. Returns cell -> centroid (rounded 6 dp).
    Empty cells drop out naturally (k may shrink); every step is a pure
    function of the data, so reruns and the DuckDB oracle agree exactly."""
    assign: Column = seed_cell("vec_id", k)
    cents: dict[int, list[float]] = {}
    for _ in range(iters):
        rows = (
            emb_v.withColumn("cell", assign)
            .select("cell", F.posexplode(vcol).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
            .collect()
        )
        if not rows:
            # fail at the source: an empty training set would otherwise
            # surface as an opaque AnalysisException from argmin over an
            # empty centroid array, far from the cause (e.g. a hash-sample
            # that matched nothing — lower sample_mod)
            raise ValueError("k-means training input is empty")
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["cv"]
        cents = {c: [d[p] for p in range(len(d))] for c, d in by_cell.items()}
        assign = argmin_cell(vcol, cents)
    return cents
