"""Connected components (corpusops.connected_components) beyond the
LSH-fixture happy path: long chains (multi-round convergence), multiple
components, and the survivor-selection invariants t18 builds on it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.queries import corpusops


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "a long, b long")
    rows = corpusops.connected_components(edges).collect()
    return {r["node"]: r["label"] for r in rows}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-...-9: diameter 8, so one propagation round is NOT
    # enough — pins that the loop actually iterates to the fixpoint
    n = 9
    got = _cc(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_two_components_and_cycle(spark):
    got = _cc(spark, [(10, 20), (20, 30), (30, 10), (77, 99)])
    assert got == {10: 10, 20: 10, 30: 10, 77: 77, 99: 77}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _cc(spark, [(5, 6), (6, 5), (5, 6), (6, 7)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_long_chain_converges_in_log_rounds(spark):
    # 200-node path graph: pure min-label propagation needs ~200 rounds
    # (would blow the 25-round rail); hook + pointer-doubling must finish
    # in ~log2(n) rounds
    n = 200
    rounds: list[int] = []
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "a long, b long"
    )
    rows = corpusops.connected_components(edges, rounds_out=rounds).collect()
    assert {r["node"]: r["label"] for r in rows} == {i: 1 for i in range(1, n + 1)}
    assert rounds[0] <= 10, rounds


def test_nonconvergence_guard_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        corpusops.connected_components(edges, max_iters=2)


def test_survivors_exactly_one_keep_per_cluster(spark, sf_dir):
    out = corpusops.t18_dedup_survivors(spark, sf_dir)
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(
            F.sum("keep").alias("n_keep"),
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("keep") == 1, F.col("quality"))).alias("kept_q"),
            F.max("quality").alias("max_q"),
        )
        .collect()
    )
    assert all(r["n_keep"] == 1 for r in per_cluster)
    # the kept doc carries the cluster-max quality
    assert all(r["kept_q"] == r["max_q"] for r in per_cluster)
    # every document of the corpus appears exactly once
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.count() == docs


def test_clusters_consistent_with_candidate_pairs(spark, sf_dir):
    # every t11 candidate pair must land in the same cluster
    from postgres_to_snowflake_data_pipeline_spark.queries.textops import (
        t11_minhash_candidates_fast,
    )

    comp = corpusops.t17_dup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    pairs = t11_minhash_candidates_fast(spark, sf_dir)
    a = comp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "cluster_id", "ca"
    )
    b = comp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "cluster_id", "cb"
    )
    split = pairs.join(a, "doc_a").join(b, "doc_b").filter("ca <> cb")
    assert split.isEmpty()


def test_sequence_pack_budget_respected(spark, sf_dir):
    # within every (source, shard, seq_id): offsets start where the
    # previous doc ended, and a sequence only overflows PACK_BUDGET via
    # its straddling last doc (each doc starts strictly inside the budget)
    out = corpusops.t19_sequence_pack(spark, sf_dir)
    assert out.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= corpusops.PACK_BUDGET)
    ).isEmpty()
    # deterministic across parallelism: same result repartitioned
    again = corpusops.t19_sequence_pack(spark, sf_dir).repartition(7)
    assert out.exceptAll(again).isEmpty() and again.exceptAll(out).isEmpty()
