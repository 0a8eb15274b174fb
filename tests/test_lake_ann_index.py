"""IVF index stored AS a lake table (lake/ann_index.py::LakeAnnIndex).

Pins the properties the lake storage adds over the raw-parquet AnnIndex:
- maintenance is EXACTLY-ONCE: re-applying an append epoch (Structured
  Streaming's at-least-once foreachBatch re-delivery) is a metadata no-op
  — row count, commit count and search results unchanged;
- a search reads ONLY the probed cells' hash buckets, through the
  MANIFEST (inputFiles ⊆ the probed buckets' file sets, strictly fewer
  than the table's);
- the drift signal (appended_share) comes from commit summaries —
  metadata only, no scan;
- persistence round-trips (load() → same centroids, same results).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.functions import kmeans as km
from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
    cosine_similarity,
    to_double_array,
)
from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import LakeAnnIndex
from postgres_to_snowflake_data_pipeline_spark.queries import simops

SF_DIR = "/root/testdata/sf0.001"


def _vectors(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    return emb.select("vec_id", to_double_array("embedding").alias("v"))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """(index, base df, appended df, queries df) — built once, appended
    once; the redelivery/pruning/search tests all read the same state."""
    root = str(tmp_path_factory.mktemp("lakeann") / "idx")
    ev = _vectors(spark)
    cands = ev.filter(F.col("vec_id") >= simops.N_QUERIES)
    base = cands.filter(F.col("vec_id") % 5 != 0)
    appended = cands.filter(F.col("vec_id") % 5 == 0)
    idx = LakeAnnIndex.build(
        spark, base, root,
        key_col="vec_id", vec_col="v",
        k=simops.K_CELLS, iters=simops.KMEANS_ITERS,
        sample_mod=simops.SAMPLE_MOD,
    )
    res = idx.append(appended, epoch=1)
    assert not res.skipped and res.rows_deduped == appended.count()
    queries = ev.filter(F.col("vec_id") < simops.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return idx, base, appended, queries


def test_redelivered_append_epoch_is_a_noop(spark, built):
    idx, base, appended, queries = built
    before_rows = idx.table.read().count()
    before_commits = idx.table.current().commit_count
    before_top = sorted(map(tuple, idx.search(queries, k=3).collect()))

    res = idx.append(appended, epoch=1)  # same batch_id re-delivered
    assert res.skipped
    assert idx.table.read().count() == before_rows
    assert idx.table.current().commit_count == before_commits
    assert sorted(map(tuple, idx.search(queries, k=3).collect())) == before_top


def test_search_reads_only_probed_buckets_through_manifest(spark, built):
    idx, _base, _appended, queries = built
    one = queries.filter(F.col("query_id") == 0)
    probe = sorted(
        r["cell"]
        for r in one.select(
            F.explode(km.probe_cells("v", idx.cents, simops.NPROBE)).alias("cell")
        ).collect()
    )
    buckets = idx.probed_buckets(probe)
    allowed = set(idx.table.read(buckets=buckets).inputFiles())
    every = set(idx.table.read().inputFiles())
    assert allowed < every  # pruning has something to skip

    res = idx.search(one, k=3, nprobe=simops.NPROBE)
    table_root = idx.table.root
    opened = {f for f in res.inputFiles() if table_root in f}
    assert opened and opened <= allowed, (opened, allowed)
    # correctness: probed-bucket candidates resolve the same top-k as a
    # brute-force over the same probed CELLS
    cand = idx.table.read().filter(F.col("cell").isin([int(c) for c in probe]))
    brute = sorted(
        (r["vec_id"],)
        for r in cand.join(F.broadcast(one.select("v").withColumnRenamed("v", "qv")))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(3)
        .collect()
    )
    got = sorted((r["neighbor_id"],) for r in res.collect())
    assert got == brute


def test_compacted_index_prunes_to_probed_cell_slices(spark, tmp_path):
    """After maintenance compaction with cell-boundary slicing
    (compact(key_slices=k)), a search opens only files whose manifest
    cell range intersects the probed cells — even inside a hash bucket
    shared by several cells — and the results are unchanged."""
    root = str(tmp_path / "idx")
    ev = _vectors(spark)
    cands = ev.filter(F.col("vec_id") >= simops.N_QUERIES)
    idx = LakeAnnIndex.build(
        spark, cands.filter(F.col("vec_id") % 5 != 0), root,
        key_col="vec_id", vec_col="v",
        k=simops.K_CELLS, iters=simops.KMEANS_ITERS,
        sample_mod=simops.SAMPLE_MOD,
        n_buckets=3,  # force several cells per hash bucket
    )
    idx.append(cands.filter(F.col("vec_id") % 5 == 0), epoch=1)
    queries = ev.filter(F.col("vec_id") < simops.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    before = sorted(map(tuple, idx.search(queries, k=3).collect()))
    snap = idx.compact(key_slices=4)
    assert all(
        e["kind"] == "base" for fs in snap.files.values() for e in fs
    )
    res = idx.search(queries, k=3)
    assert sorted(map(tuple, res.collect())) == before

    probe = sorted(
        r["cell"]
        for r in queries.select(
            F.explode(km.probe_cells("v", idx.cents, 2)).alias("cell")
        )
        .distinct()
        .collect()
    )
    by_suffix = {
        e["path"]: e for fs in snap.files.values() for e in fs
    }
    opened = [f for f in res.inputFiles() if idx.table.root in f]
    assert opened
    for f in opened:
        e = next(v for p, v in by_suffix.items() if f.endswith(p))
        assert any(
            e["key_min"] <= c <= e["key_max"] for c in probe
        ), (f, e, probe)
    # and slicing actually skipped something: fewer files than the
    # probed buckets hold in total
    all_probed_bucket_files = idx.table.read(
        buckets=idx.probed_buckets(probe)
    ).inputFiles()
    assert len(opened) < len(all_probed_bucket_files)


def test_appended_share_from_commit_summaries(spark, built):
    idx, base, appended, _q = built
    nb, na = base.count(), appended.count()
    assert idx.appended_share() == pytest.approx(na / (nb + na))


def test_streaming_maintenance_is_exactly_once(spark, tmp_path):
    """The integration the class exists for: vectors arrive as a file
    stream, ``foreachBatch`` appends each micro-batch as epoch
    ``batch_id + 1``. Wiping the checkpoint re-delivers EVERY batch with
    the same ids — the commit keys turn the full re-run into metadata
    no-ops: rows, commit count and search results unchanged."""
    root = str(tmp_path / "idx")
    feed = str(tmp_path / "vfeed")
    ckpt = str(tmp_path / "ckpt")
    ev = _vectors(spark)
    cands = ev.filter(F.col("vec_id") >= simops.N_QUERIES)
    base = cands.filter(F.col("vec_id") % 5 != 0)
    arriving = cands.filter(F.col("vec_id") % 5 == 0)
    idx = LakeAnnIndex.build(
        spark, base, root,
        key_col="vec_id", vec_col="v",
        k=simops.K_CELLS, iters=simops.KMEANS_ITERS,
        sample_mod=simops.SAMPLE_MOD,
    )
    arriving.repartition(4).write.mode("overwrite").parquet(feed)

    def drain(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema(arriving.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            stream.writeStream
            .foreachBatch(lambda df, bid: idx.append(df, epoch=bid + 1))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not drain in time"

    drain(ckpt)
    rows = idx.table.read().count()
    commits = idx.table.current().commit_count
    queries = ev.filter(F.col("vec_id") < simops.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    top = sorted(map(tuple, idx.search(queries, k=3).collect()))
    assert rows == base.count() + arriving.count()

    shutil.rmtree(ckpt)  # full re-delivery with the same batch ids
    drain(ckpt)
    assert idx.table.read().count() == rows
    assert idx.table.current().commit_count == commits
    assert sorted(map(tuple, idx.search(queries, k=3).collect())) == top


def test_load_round_trip_and_later_epoch_wins_lww(spark, built, tmp_path):
    idx, _base, appended, queries = built
    re = LakeAnnIndex.load(spark, idx.root)
    assert re.cents == idx.cents
    assert re.meta["base_rows"] == idx.meta["base_rows"]
    assert sorted(map(tuple, re.search(queries, k=3).collect())) == sorted(
        map(tuple, idx.search(queries, k=3).collect())
    )
    # a LATER epoch re-inserting existing keys converges by LWW —
    # merge-on-read dedup, not a duplicate row per re-insert
    before = re.table.read().count()
    res = re.append(appended, epoch=2)
    assert not res.skipped
    assert re.table.read().count() == before
