"""Product-quantized storage for the persisted IVF index (VERDICT r4 #9).

At 100 TB the float64 vector bytes dominate ANN scan I/O. ``AnnIndex``
built with ``pq=(m, kcodes)`` stores an m-code column next to each exact
vector; ``search(pq_rerank=C)`` runs an ADC pass that reads ONLY the code
column (column pruning — pinned on ReadSchema), then re-ranks the top-C
candidates per query on exact cosine behind a pushed-down key filter.
Gates: recall ≥ 0.8 on the planted fixture, deterministic codebooks, and
the stored code column an order of magnitude smaller than the vectors."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.functions.vector import to_double_array
from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex

DIM = 16
N_Q = 5


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    rng = np.random.default_rng(11)
    rows, qs, vid = [], [], 0
    for _ in range(N_Q):
        q = rng.standard_normal(DIM)
        q /= np.linalg.norm(q)
        qs.append(q)
        rows.append((vid, q.tolist()))
        vid += 1
    for q in qs:
        for _ in range(3):
            v = q + 0.25 * rng.standard_normal(DIM) / np.sqrt(DIM)
            rows.append((vid, v.tolist()))
            vid += 1
    for _ in range(300):
        rows.append((vid, rng.standard_normal(DIM).tolist()))
        vid += 1
    d = tmp_path_factory.mktemp("pq")
    pd.DataFrame(rows, columns=["vec_id", "v"]).to_parquet(
        d / "vectors.parquet"
    )
    return str(d / "vectors.parquet")


def _vectors(spark, path):
    return spark.read.parquet(path).select(
        "vec_id", to_double_array("v").alias("v")
    )


@pytest.fixture(scope="module")
def index(spark, planted, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pqidx"))
    return AnnIndex.build(
        spark,
        _vectors(spark, planted),
        root,
        k=4,
        iters=3,
        sample_mod=2,
        pq=(4, 16),
    )


def _queries(spark, planted):
    return (
        _vectors(spark, planted)
        .filter(F.col("vec_id") < N_Q)
        .select(F.col("vec_id").alias("query_id"), "v")
    )


def test_pq_recall_vs_exact_with_rerank(spark, planted, index):
    """ADC + exact re-rank must recover ≥ 0.8 of the planted exact top-3
    (the same bar every other ANN variant in this repo clears)."""
    q = _queries(spark, planted)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in index.search(q, k=4, nprobe=2).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in index.search(q, k=4, nprobe=2, pq_rerank=16).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"PQ rerank recall {recall:.2f}"


def test_adc_stage_reads_only_the_code_column(spark, planted, index):
    """The stage-1 candidate plan's parquet ReadSchema must carry the pq
    code column and NOT the vector column — that pruning is the entire
    I/O argument for PQ."""
    q = _queries(spark, planted)
    probe = index.probed_cells(q, 2)
    data_path = os.path.join(index.root, "data")
    paths = [os.path.join(data_path, f"cell={c}") for c in probe]
    cands = spark.read.option("basePath", data_path).parquet(*paths)
    import postgres_to_snowflake_data_pipeline_spark.functions.kmeans as km

    qx = q.select(
        "query_id",
        F.col("v").alias("_qv"),
        F.explode(km.probe_cells("v", index.cents, 2)).alias("cell"),
    )
    import re

    plan = (
        index._pq_candidates(cands, qx, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every ReadSchema in the plan: the CANDIDATE scan is the one carrying
    # the pq column — it must not also read the vector column. (The query
    # side legitimately reads v: it computes the distance tables.)
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    cand_schemas = [s for s in schemas if "pq" in s]
    assert cand_schemas, plan[:2000]
    for s in cand_schemas:
        assert "v:array" not in s, s


def test_stored_code_bytes_are_an_order_smaller(index):
    """The on-disk I/O claim, measured from parquet footers: the code
    column's compressed bytes across the layout are < 1/4 of the vector
    column's (16 doubles vs 4 small ints; real corpora with dim 768+ and
    m=8-16 sit far beyond this bound)."""
    import pyarrow.parquet as pq

    vec_b = code_b = 0
    for f in index.data_files():
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                path = col.path_in_schema
                if path.startswith("v."):
                    vec_b += col.total_compressed_size
                elif path.startswith("pq."):
                    code_b += col.total_compressed_size
    assert vec_b > 0 and code_b > 0
    assert code_b < vec_b / 4, (code_b, vec_b)


def test_pq_build_is_deterministic(spark, planted, tmp_path):
    a = AnnIndex.build(
        spark, _vectors(spark, planted), str(tmp_path / "a"),
        k=4, iters=2, sample_mod=2, pq=(4, 8),
    )
    b = AnnIndex.build(
        spark, _vectors(spark, planted), str(tmp_path / "b"),
        k=4, iters=2, sample_mod=2, pq=(4, 8),
    )
    assert a.meta["pq"] == b.meta["pq"]
    codes_a = {
        r["vec_id"]: r["pq"]
        for r in spark.read.parquet(os.path.join(a.root, "data")).collect()
    }
    codes_b = {
        r["vec_id"]: r["pq"]
        for r in spark.read.parquet(os.path.join(b.root, "data")).collect()
    }
    assert codes_a == codes_b


def test_append_encodes_with_frozen_codebooks(spark, planted, index):
    rng = np.random.default_rng(3)
    new = spark.createDataFrame(
        [(10_000 + i, rng.standard_normal(DIM).tolist()) for i in range(20)],
        "vec_id long, v array<double>",
    )
    n = index.append(new)
    assert n == 20
    got = (
        spark.read.parquet(os.path.join(index.root, "data"))
        .filter(F.col("vec_id") >= 10_000)
        .select("pq")
        .collect()
    )
    assert len(got) == 20
    assert all(r["pq"] is not None and len(r["pq"]) == 4 for r in got)
    # a search after maintenance still returns k rows per query
    out = index.search(
        _queries(spark, planted), k=3, nprobe=2, pq_rerank=12
    ).groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in out)


def test_pq_validation(spark, planted, tmp_path, index):
    with pytest.raises(ValueError):  # dim 16 not divisible by 5
        AnnIndex.build(
            spark, _vectors(spark, planted), str(tmp_path / "bad"),
            k=4, sample_mod=2, pq=(5, 8),
        )
    idx2 = AnnIndex.build(
        spark, _vectors(spark, planted), str(tmp_path / "nopq"),
        k=4, sample_mod=2,
    )
    with pytest.raises(ValueError):  # rerank on a pq-less index
        idx2.search(_queries(spark, planted), pq_rerank=8)


def test_lake_ann_index_pq_lifecycle(spark, planted, tmp_path):
    """PQ under transactional maintenance (LakeAnnIndex): build with
    pq=, ADC+rerank search through the manifest-pruned read, exactly-once
    appends encoding with frozen codebooks, and a forced retrain that
    re-trains codebooks WITH the coarse quantizer and re-encodes the
    layout in the same commit (codes never pair with a foreign
    codebook)."""
    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import (
        LakeAnnIndex,
    )

    root = str(tmp_path / "lakepq")
    vecs = _vectors(spark, planted)
    idx = LakeAnnIndex.build(
        spark, vecs.filter(F.col("vec_id") >= N_Q), root,
        k=4, iters=2, sample_mod=2, pq=(4, 8),
    )
    q = _queries(spark, planted)

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in idx.search(q, k=3, nprobe=2).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in idx.search(q, k=3, nprobe=2, pq_rerank=16).collect()
    }
    assert len(got & exact) / len(exact) >= 0.8

    # maintenance: appended rows carry codes; re-delivery is a no-op
    rng = np.random.default_rng(5)
    new = spark.createDataFrame(
        [(20_000 + i, rng.standard_normal(DIM).tolist()) for i in range(10)],
        "vec_id long, v array<double>",
    )
    assert not idx.append(new, epoch=1).skipped
    assert idx.append(new, epoch=1).skipped
    stored = idx.table.read(columns=["cell", "vec_id", "pq"]).filter(
        F.col("vec_id") >= 20_000
    ).collect()
    assert len(stored) == 10
    assert all(r["pq"] is not None and len(r["pq"]) == 4 for r in stored)

    # forced retrain: new generation token AND new codebooks, atomically
    old_token, old_cb = idx.meta["token"], idx.meta["pq"]["codebooks"]
    assert idx.retrain(force=True) is not None
    assert idx.meta["token"] != old_token
    assert idx.meta["pq"]["codebooks"] != old_cb  # sample grew -> retrained
    # every live row re-encoded under the new codebooks: spot-check one
    # vector's stored code against a fresh encode expression
    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex

    live = idx.table.read(columns=["vec_id", "v", "pq"])
    recoded = live.withColumn(
        "_want", AnnIndex._encode_expr("v", idx.meta["pq"])
    ).filter(F.col("pq") != F.col("_want"))
    assert recoded.count() == 0

    # search still green after the whole lifecycle
    out = idx.search(q, k=3, nprobe=2, pq_rerank=16)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)
