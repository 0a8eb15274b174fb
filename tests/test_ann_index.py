"""Persisted IVF index (lake/ann_index.py): the layout IS the index.

Pins the three properties that make it an index rather than a repeated
full-table job (VERDICT r3 #1):
- a search opens ONLY the probed cells' files (inputFiles ⊂ layout);
- build is deterministic (rebuild → identical centroids sidecar) and
  separable from search (load() needs no training scan);
- recall on planted near neighbors stays ≥ 0.8 even though training saw
  only the hash-sample.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.functions.vector import to_double_array
from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex
from postgres_to_snowflake_data_pipeline_spark.queries import simops


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    # same construction as tests/test_ann_recall.py's fixture
    rng = np.random.default_rng(11)
    dim, n_q, per_q, n_noise = simops.DIM, simops.N_QUERIES, 3, 200
    rows, qs, vid = [], [], 0
    for _ in range(n_q):
        q = rng.standard_normal(dim)
        q /= np.linalg.norm(q)
        qs.append(q)
        rows.append((vid, q.astype(np.float32).tolist(), vid % 4))
        vid += 1
    for q in qs:
        for _ in range(per_q):
            v = q + 0.25 * rng.standard_normal(dim) / np.sqrt(dim)
            rows.append((vid, v.astype(np.float32).tolist(), vid % 4))
            vid += 1
    for _ in range(n_noise):
        rows.append((vid, rng.standard_normal(dim).astype(np.float32).tolist(), vid % 4))
        vid += 1
    d = tmp_path_factory.mktemp("planted_idx")
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        d / "embeddings.parquet"
    )
    return str(d)


def _vectors(spark, planted_dir):
    emb = spark.read.parquet(planted_dir + "/embeddings.parquet")
    return emb.select("vec_id", to_double_array("embedding").alias("v"))


def _build(spark, planted_dir, root):
    ev = _vectors(spark, planted_dir)
    return AnnIndex.build(
        spark,
        ev.filter(F.col("vec_id") >= simops.N_QUERIES),
        str(root),
        key_col="vec_id",
        vec_col="v",
        k=simops.K_CELLS,
        iters=simops.KMEANS_ITERS,
        sample_mod=simops.SAMPLE_MOD,
    )


def test_search_opens_only_probed_cells_files(spark, planted_dir, tmp_path):
    """THE scale property: a 1-query nprobe=2 search must read exactly the
    2 probed cell directories' files — partition pruning on the clustered
    layout, never a full scan."""
    idx = _build(spark, planted_dir, tmp_path / "idx")
    all_files = {os.path.realpath(p) for p in idx.data_files()}
    cells_on_disk = {p.split("cell=")[1].split("/")[0] for p in all_files}
    assert len(cells_on_disk) > simops.NPROBE  # pruning has something to skip

    one_query = _vectors(spark, planted_dir).filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    probed = idx.probed_cells(one_query, simops.NPROBE)
    assert len(probed) == simops.NPROBE
    res = idx.search(one_query, k=3, nprobe=simops.NPROBE)
    opened = {
        os.path.realpath(f.replace("file:", ""))
        for f in res.inputFiles()
        if "/data/" in f and f.endswith(".parquet")
    } & all_files
    assert opened, "search read no layout files?"
    assert opened < all_files, "search scanned the whole layout"
    for f in opened:
        cell = int(f.split("cell=")[1].split("/")[0])
        assert cell in probed, (f, probed)
    # exactly one file per cell: the build's repartition("cell") puts each
    # cell in one task, so partitionBy can't scatter small files
    assert len(all_files) == len(cells_on_disk)


def test_rebuild_is_deterministic_and_load_is_training_free(
    spark, planted_dir, tmp_path
):
    idx1 = _build(spark, planted_dir, tmp_path / "a")
    idx2 = _build(spark, planted_dir, tmp_path / "b")
    assert idx1.meta["cells"] == idx2.meta["cells"]
    # load() reads the sidecar only — no Spark job, no training pass
    loaded = AnnIndex.load(spark, str(tmp_path / "a"))
    assert loaded.cents == idx1.cents
    q = _vectors(spark, planted_dir).filter(
        F.col("vec_id") < simops.N_QUERIES
    ).select(F.col("vec_id").alias("query_id"), "v")
    got1 = {(r["query_id"], r["neighbor_id"]) for r in idx1.search(q).collect()}
    got2 = {(r["query_id"], r["neighbor_id"]) for r in loaded.search(q).collect()}
    assert got1 == got2


def test_sampled_training_keeps_recall(spark, planted_dir, tmp_path):
    """Training on the hash-sample (not the corpus) must not cost recall:
    ≥ 0.8 of the exact top-3 at nprobe=2 on planted neighbors."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in simops.v01_ann_cosine_topk(spark, planted_dir).collect()
        if r["rnk"] <= 3
    }
    idx = _build(spark, planted_dir, tmp_path / "idx")
    q = _vectors(spark, planted_dir).filter(
        F.col("vec_id") < simops.N_QUERIES
    ).select(F.col("vec_id").alias("query_id"), "v")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in idx.search(q, k=3, nprobe=simops.NPROBE).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"persisted-IVF recall {recall:.2f}"


def test_append_inserts_into_frozen_cells(spark, planted_dir, tmp_path):
    """Index maintenance: append assigns new vectors with the FROZEN
    centroids and the layout absorbs them in place — searches must see
    appended vectors immediately, results must equal a same-centroid
    recompute over base+appended, pruning must keep holding, and the
    sidecar drift counters must survive a reload."""
    from postgres_to_snowflake_data_pipeline_spark.functions import kmeans as km
    from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
        cosine_similarity,
    )

    ev = _vectors(spark, planted_dir)
    cands = ev.filter(F.col("vec_id") >= simops.N_QUERIES)
    base = cands.filter(F.col("vec_id") % 3 != 0)
    extra = cands.filter(F.col("vec_id") % 3 == 0)
    root = tmp_path / "idx"
    idx = AnnIndex.build(
        spark, base, str(root), key_col="vec_id", vec_col="v",
        k=simops.K_CELLS, iters=simops.KMEANS_ITERS,
        sample_mod=simops.SAMPLE_MOD,
    )
    files_before = set(idx.data_files())
    n = idx.append(extra)
    assert n == extra.count() > 0
    assert files_before < set(idx.data_files())  # layout grew in place

    # an appended vector, used as the query, must find ITSELF at rank 1
    probe_id = extra.select(F.min("vec_id")).first()[0]
    self_q = ev.filter(F.col("vec_id") == probe_id).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    top = idx.search(self_q, k=1, nprobe=simops.NPROBE).first()
    assert top["neighbor_id"] == probe_id and top["cosine"] == 1.0

    # search == same-centroid recompute over base+appended (exact)
    queries = ev.filter(F.col("vec_id") < simops.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cosine"])
        for r in idx.search(queries, k=3, nprobe=simops.NPROBE).collect()
    )
    probed = idx.probed_cells(queries, simops.NPROBE)
    from pyspark.sql.window import Window as W

    qcells = queries.select(
        "query_id", F.col("v").alias("_qv"),
        F.explode(km.probe_cells("v", idx.cents, simops.NPROBE)).alias("cell"),
    )
    recompute = (
        cands.withColumn("cell", km.argmin_cell("v", idx.cents))
        .filter(F.col("cell").isin(probed))
        .join(qcells, "cell")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("_qv"), F.col("v")), 6).alias("cosine"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= 3)
    )
    want = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cosine"])
        for r in recompute.collect()
    )
    assert got == want

    # pruning still holds over the grown layout
    all_files = {os.path.realpath(p) for p in idx.data_files()}
    opened = {
        os.path.realpath(f.replace("file:", ""))
        for f in idx.search(queries, k=3, nprobe=simops.NPROBE).inputFiles()
        if f.endswith(".parquet")
    } & all_files
    assert opened and opened < all_files
    for f in opened:
        assert int(f.split("cell=")[1].split("/")[0]) in probed

    # drift counters persist through the sidecar round-trip
    re = AnnIndex.load(spark, str(root))
    assert re.meta["appended_rows"] == n
    assert 0.0 < re.appended_share() < 1.0
    re.append(extra.limit(0))  # zero-row append: counter unchanged
    assert re.meta["appended_rows"] == n
