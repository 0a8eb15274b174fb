"""Persisted IVF (inverted-file) ANN index: layout-as-index.

v06 proved the math (trained coarse quantizer, nprobe cell-pruned search,
DuckDB-oracled) but had the wrong lifecycle at scale: it re-trained
k-means with full-corpus Lloyd passes inside every query call and the
cell assignment died with the DataFrame. This module splits the two
halves the way a 100 TB deployment must:

- ``AnnIndex.build`` — train ONCE on a deterministic md5 hash-sample
  (a coarse quantizer stabilizes on ~1e6 vectors; the corpus never needs
  to be scanned ``iters`` times), persist the centroids as a small JSON
  sidecar (k×dim doubles — the whole index metadata), and rewrite the
  vector table CLUSTERED BY CELL: one shuffle, ``partitionBy("cell")``
  parquet. The physical layout IS the index — the same philosophy as the
  reference's manually partitioned exports
  (/root/reference/scripts/export_to_s3.py:103-106).
- ``AnnIndex.search`` — assign each query to its ``nprobe`` nearest
  cells (pure centroid arithmetic, no corpus scan) and open ONLY those
  cells' partition directories — passed as explicit paths, so the scan's
  FileIndex never even lists the unprobed partitions (pinned via
  ``inputFiles()`` in tests/test_ann_index.py). A search touches
  ~nprobe/k of the data instead of all of it.
- ``AnnIndex.append`` — maintenance without retraining: frozen centroids
  assign new vectors to their cells (the classic IVF insert), the layout
  grows in place, and each append drops an atomically-written
  ``append-{token}.json`` marker whose row counts sum to the drift
  counter (``appended_share`` is the rebuild-trigger signal) — no
  read-modify-write of shared state. Oracled as catalog entry v08.

Determinism: every step (sample membership, seeded init, fixed Lloyd
iterations, 6-dp rounding before comparisons) is a pure function of the
data — rebuilds are bit-identical and the whole build+search composition
is DuckDB-oracled as catalog entry v07 (queries/simops.py).

Durability: the sidecar is written atomically (tmp + rename) AFTER the
data directory, so a crashed build leaves no readable index; rebuilds
overwrite both.

:class:`LakeAnnIndex` (below) is the same index stored AS a lake table —
commit-keyed maintenance epochs (exactly-once under streaming
re-delivery), manifest-driven bucket pruning, CAS commits, time travel
and GC for free. Oracled as catalog entry v09. Prefer it when the index
is maintained continuously; the raw layout above remains the minimal
read-optimal form for build-once corpora.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from postgres_to_snowflake_data_pipeline_spark.functions import kmeans as km
from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
    cosine_similarity,
    dot,
)
from postgres_to_snowflake_data_pipeline_spark.lake.metadata import atomic_write_json

_SIDECAR = "centroids.json"
_DATA = "data"


def _train_pq(train: DataFrame, dim: int, pq: tuple[int, int], iters: int) -> dict:
    """Per-subspace PQ codebooks over the (vec_id, v) training sample —
    the same deterministic Lloyd math as ``km.train_kmeans_cells`` run
    per subspace (the DuckDB oracle unrolls it exactly that way), but
    FUSED: the sample explodes into (subspace, subvector) rows once and
    a single loop trains all m codebooks together — ``iters`` aggregate
    jobs total instead of ``m×iters`` (the whole training stays
    sample-bound either way; this removes the driver round-trip
    multiplier). Identical centroids by construction: the seed hash,
    per-(subspace, cell, pos) averages, 6-dp rounding and argmin
    tie-breaks all match the per-subspace runs. Codewords are DENSELY
    position-coded (sorted surviving cells), so an ADC table indexes by
    code directly."""
    m, kcodes = pq
    if dim == 0 or dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    dsub = dim // m
    sub = train.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        km.subvector(F.col("v"), i, dsub).alias("v"),
                    )
                    for i in range(m)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.i").alias("_m"), F.col("s.v").alias("v"))

    def _assign(per_sub: dict[int, dict[int, list[float]]]):
        # per-subspace argmin, dispatched on the subspace tag — the same
        # rounded dist_structs arithmetic as the unfused trainer
        expr = None
        for i in range(m):
            arm = km.argmin_cell("v", per_sub[i])
            expr = (
                F.when(F.col("_m") == i, arm)
                if expr is None
                else expr.when(F.col("_m") == i, arm)
            )
        return expr

    assign = km.seed_cell("vec_id", kcodes)  # same seed in every subspace
    per_sub: dict[int, dict[int, list[float]]] = {}
    for _ in range(iters):
        rows = (
            sub.withColumn("cell", assign)
            .select("_m", "cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("_m", "cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
            .collect()
        )
        if not rows:
            raise ValueError("pq codebook training input is empty")
        by: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            by.setdefault((r["_m"], r["cell"]), {})[r["pos"]] = r["cv"]
        per_sub = {i: {} for i in range(m)}
        for (i, cell), d in by.items():
            per_sub[i][cell] = [d[p] for p in range(len(d))]
        assign = _assign(per_sub)
    codebooks = [
        [per_sub[i][c] for c in sorted(per_sub[i])] for i in range(m)
    ]
    return {"m": m, "k": kcodes, "dsub": dsub, "codebooks": codebooks}


def _pq_topc(
    cands: DataFrame, q: DataFrame, key_col: str, pqm: dict, rerank: int
) -> DataFrame:
    """(query_id, _nb): the ``rerank`` best candidates per query by
    asymmetric distance. ``cands`` must carry (cell, key, pq) ONLY —
    callers select those three so Catalyst prunes the scan to the code
    column (the whole point; pinned via ReadSchema in tests). The query
    side carries its m×kcodes distance table as an in-plan expression in
    INTEGER MICROS — the ADC sum is then order-independent and exactly
    reproducible in any engine (a double fold's association order could
    flip near-ties, the classic oracle-parity trap)."""
    m, dsub = pqm["m"], pqm["dsub"]
    dtab = F.array(
        *[
            F.array(
                *[
                    F.round(
                        (
                            F.lit(sum(x * x for x in c))
                            - 2.0
                            * dot(
                                km.subvector(F.col("_qv"), i, dsub),
                                F.array(*[F.lit(float(x)) for x in c]),
                            )
                        )
                        * 1e6,
                        0,
                    ).cast("long")
                    for c in pqm["codebooks"][i]
                ]
            )
            for i in range(m)
        ]
    )
    adc = (
        cands.join(F.broadcast(q.withColumn("_dtab", dtab)), "cell")
        .withColumn(
            "_adc",
            F.expr(
                f"aggregate(sequence(0, {m - 1}), cast(0 as bigint), "
                "(acc, i) -> acc + _dtab[i][pq[i]])"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").asc(), F.col(key_col)
    )
    return (
        adc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank)
        .select("query_id", F.col(key_col).alias("_nb"))
    )


class AnnIndex:
    """A cell-clustered vector layout + its coarse quantizer centroids."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cents: dict[int, list[float]],
        meta: dict,
    ):
        self.spark = spark
        self.root = root
        self.cents = cents
        self.meta = meta

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        vectors: DataFrame,
        root: str,
        *,
        key_col: str = "vec_id",
        vec_col: str = "v",
        k: int = 8,
        iters: int = 3,
        sample_mod: int = 4,
        pq: tuple[int, int] | None = None,
    ) -> "AnnIndex":
        """Train on the hash-sample (``sample_hash(key) % sample_mod == 0``
        — domain-separated from the seed hash, see functions/kmeans.py),
        then cluster the FULL vector set by nearest cell and persist.

        ``vectors`` must carry ``key_col`` and an array<double> ``vec_col``
        (the layout stores EXACTLY those two plus the cell — a fixed
        schema, so later ``append`` batches can never fork the file
        schema). One full-data shuffle total (the clustering
        repartition); training scans only the sample.
        ``repartition("cell")`` puts each cell in exactly one task, so
        ``partitionBy`` emits one file per cell — no small-file explosion
        at any k."""
        from pyspark.sql import Observation

        vectors = vectors.select(key_col, vec_col)
        sample = vectors.filter(km.sample_hash(key_col) % sample_mod == 0)
        # train_kmeans_cells seeds on the literal column name "vec_id"
        train = sample.select(
            F.col(key_col).alias("vec_id"), F.col(vec_col).alias("v")
        )
        cents = km.train_kmeans_cells(train, "v", k=k, iters=iters)
        dim = len(next(iter(cents.values()))) if cents else 0
        pq_meta = None
        if pq is not None:
            # product quantization (VERDICT r4 #9): split the dim into m
            # contiguous subspaces and train a DENSE kcodes-word codebook
            # per subspace on the SAME hash-sample — every stored row then
            # carries an m-code column next to its exact vector: searches
            # scan codes (column-pruned), re-rank the few survivors on
            # exact vectors — at 100 TB the float64 vector bytes dominate
            # scan I/O ~dim*8 : m.
            pq_meta = _train_pq(train, dim, pq, iters)
        data_path = os.path.join(root, _DATA)
        obs = Observation()
        clustered = vectors.withColumn(
            "cell", km.argmin_cell(vec_col, cents)
        )
        if pq_meta is not None:
            clustered = clustered.withColumn(
                "pq", cls._encode_expr(vec_col, pq_meta)
            )
        (
            clustered.repartition(F.col("cell"))
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(data_path)
        )
        meta = {
            "key_col": key_col,
            "vec_col": vec_col,
            "k": k,
            "iters": iters,
            "sample_mod": sample_mod,
            "dim": dim,
            "base_rows": int(obs.get["rows"]),
            "appended_rows": 0,
            "cells": {str(c): v for c, v in sorted(cents.items())},
        }
        if pq_meta is not None:
            meta["pq"] = pq_meta
        # a REBUILD resets drift: stale append markers from the previous
        # build's maintenance era must not count against the new centroids
        for name in os.listdir(root) if os.path.isdir(root) else []:
            if name.startswith("append-") and name.endswith(".json"):
                os.unlink(os.path.join(root, name))
        atomic_write_json(os.path.join(root, _SIDECAR), meta)
        return cls(spark, root, cents, meta)

    @staticmethod
    def _encode_expr(vec_col: str, pq_meta: dict) -> F.Column:
        """array<int> of per-subspace codes — m position-coded argmins
        over the frozen codebooks, all whole-stage-codegen arithmetic."""
        m, dsub = pq_meta["m"], pq_meta["dsub"]
        return F.array(
            *[
                km.argmin_code(
                    km.subvector(F.col(vec_col), i, dsub),
                    pq_meta["codebooks"][i],
                )
                for i in range(m)
            ]
        )

    def append(self, vectors: DataFrame) -> int:
        """Index MAINTENANCE without retraining: assign new vectors to the
        EXISTING cells (centroids are frozen — the classic IVF insert) and
        append them to the cell-clustered layout; searches see them
        immediately because a search opens cell DIRECTORIES. Returns the
        number of rows appended.

        SINGLE WRITER: like the lake table's compaction, maintenance is
        one scheduled job at a time — two appends racing the same layout
        would share the parquet dir's ``_temporary`` staging and one
        job's commit cleanup can delete the other's in-flight task files.
        (Searches are unaffected: they open committed cell directories.)

        The DRIFT signal, though, is race- and crash-proof regardless:
        each append records its row count in its OWN atomically-written
        ``append-{token}.json`` marker (no read-modify-write of shared
        state — the sidecar stays the immutable build artifact), and
        ``load`` sums the markers. Frozen centroids stop reflecting the
        distribution as the appended share grows (``appended_share``);
        rebuild when it crosses the deployment's tolerance (classic IVF
        practice). The row count rides an ``Observation`` on the write
        (no second scan). A crash between the data append and the marker
        write leaves a CORRECT index — search reads the directories —
        with only the drift counter undercounting until the next rebuild."""
        from pyspark.sql import Observation

        key_col, vec_col = self.meta["key_col"], self.meta["vec_col"]
        obs = Observation()
        appended = (
            vectors.select(key_col, vec_col)  # the layout's fixed schema
            .withColumn("cell", km.argmin_cell(vec_col, self.cents))
        )
        if "pq" in self.meta:  # frozen codebooks encode, like the cells
            appended = appended.withColumn(
                "pq", self._encode_expr(vec_col, self.meta["pq"])
            )
        (
            appended.repartition(F.col("cell"))
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(self.root, _DATA))
        )
        n = int(obs.get["rows"])
        atomic_write_json(
            os.path.join(self.root, f"append-{uuid.uuid4().hex[:12]}.json"),
            {"rows": n},
        )
        self.meta["appended_rows"] = (
            int(self.meta.get("appended_rows", 0)) + n
        )
        return n

    def appended_share(self) -> float:
        """Fraction of the layout's rows inserted after training — the
        rebuild-trigger signal. 0.0 on a fresh build; pre-append-era
        sidecars (no counters) report 0.0."""
        base = int(self.meta.get("base_rows", 0))
        app = int(self.meta.get("appended_rows", 0))
        return app / (base + app) if (base + app) else 0.0

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "AnnIndex":
        with open(os.path.join(root, _SIDECAR)) as f:
            meta = json.load(f)
        # drift counter = the sidecar's build-time value (0 on current
        # builds; pre-marker sidecars carried an accumulated count) plus
        # one marker per append since — each atomically written under a
        # unique name, so concurrent appends can never lose counts
        appended = int(meta.get("appended_rows", 0))
        for name in os.listdir(root):
            if name.startswith("append-") and name.endswith(".json"):
                with open(os.path.join(root, name)) as f:
                    appended += int(json.load(f).get("rows", 0))
        meta["appended_rows"] = appended
        cents = {int(c): v for c, v in meta["cells"].items()}
        return cls(spark, root, cents, meta)

    # ------------------------------------------------------------------
    def probed_cells(self, queries: DataFrame, nprobe: int) -> list[int]:
        """The union of the queries' nprobe nearest cells — bounded by
        min(n_queries × nprobe, k) values; the one (tiny) driver collect
        a search performs, and exactly what partition pruning needs."""
        vec_col = self.meta["vec_col"]
        cells = (
            queries.select(
                F.explode(km.probe_cells(vec_col, self.cents, nprobe)).alias("cell")
            )
            .distinct()
            .collect()
        )
        return sorted(r["cell"] for r in cells)

    def search(
        self,
        queries: DataFrame,
        *,
        k: int = 3,
        nprobe: int = 2,
        query_id_col: str = "query_id",
        pq_rerank: int | None = None,
    ) -> DataFrame:
        """Top-k cosine neighbors per query, reading ONLY the probed
        cells' files. ``queries`` carries ``query_id_col`` + the index's
        ``vec_col`` (array<double>); output columns match the catalog's
        ANN queries: (query_id, neighbor_id, cosine, rnk).

        ``pq_rerank=C`` (index built with ``pq=``): two-stage search —
        an ADC pass over the probed cells reading ONLY the m-int code
        column (column pruning keeps the dim×8-byte vectors out of that
        scan entirely; per-query distance tables are in-plan expressions
        over the broadcast query side), then the top-C ADC candidates
        per query re-rank on exact cosine from a second, candidate-
        semi-joined scan of the vector column. At 100 TB this cuts the
        dominant scan bytes by ~dim*8/m while the recall gate stays on
        the exact re-rank."""
        key_col, vec_col = self.meta["key_col"], self.meta["vec_col"]
        probe = self.probed_cells(queries, nprobe)
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(km.probe_cells(vec_col, self.cents, nprobe)).alias("cell"),
        )
        # open the probed cell DIRECTORIES explicitly rather than filtering
        # a full-table scan: the plan's FileIndex then never even LISTS the
        # unprobed partitions (at 100 TB, listing alone is a job), and
        # inputFiles() provably contains only probed-cell files. basePath
        # keeps the `cell` partition column in the schema. A trained cell
        # with no candidates has no directory — skip it (it provably holds
        # no neighbors). Existence goes through the Hadoop FS API, not
        # os.path: the layout may live on a non-local filesystem, where a
        # driver-local isdir would silently report every cell missing and
        # the search would return empty instead of searching.
        data_path = os.path.join(self.root, _DATA)
        paths = [
            p
            for c in probe
            if self._fs_exists(p := os.path.join(data_path, f"cell={int(c)}"))
        ]
        if paths:
            cands = self.spark.read.option("basePath", data_path).parquet(*paths)
        else:
            # degenerate: every probed cell is empty — keep the output
            # schema by scanning the layout under an always-false filter
            cands = (
                self.spark.read.option("basePath", data_path)
                .parquet(data_path)
                .filter(F.lit(False))
            )
        if pq_rerank is not None:
            if "pq" not in self.meta:
                raise ValueError("pq_rerank: index was built without pq=")
            # stage-1 candidates materialize via ONE bounded driver
            # collect (≤ n_queries × rerank (query, key) pairs — same
            # budget class as probed_cells), so stage 2 can push the
            # candidate keys into the vector scan as an In FILTER:
            # parquet row-group/dictionary stats then skip the expensive
            # vec-column pages of non-candidate row groups, where a pure
            # join shape would re-read every probed cell's vectors.
            pairs = self._pq_candidates(cands, q, pq_rerank).collect()
            keys = sorted({r["_nb"] for r in pairs})
            sel = cands.select("cell", key_col, vec_col).filter(
                F.col(key_col).isin(keys) if keys else F.lit(False)
            )
            top = self.spark.createDataFrame(
                [(r["query_id"], r["_nb"]) for r in pairs],
                schema=T.StructType(
                    [
                        T.StructField("query_id", q.schema["query_id"].dataType),
                        T.StructField("_nb", cands.schema[key_col].dataType),
                    ]
                ),
            )
            scored = (
                sel.join(
                    F.broadcast(top), sel[key_col] == top["_nb"], "inner"
                )
                .join(F.broadcast(q.drop("cell").distinct()), "query_id")
                .select(
                    "query_id",
                    F.col(key_col).alias("neighbor_id"),
                    F.round(
                        cosine_similarity(F.col("_qv"), F.col(vec_col)), 6
                    ).alias("cosine"),
                )
            )
        else:
            scored = cands.join(F.broadcast(q), "cell").select(
                "query_id",
                F.col(key_col).alias("neighbor_id"),
                F.round(
                    cosine_similarity(F.col("_qv"), F.col(vec_col)), 6
                ).alias("cosine"),
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return scored.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= k
        )

    def _pq_candidates(
        self, cands: DataFrame, q: DataFrame, rerank: int
    ) -> DataFrame:
        """Stage 1 of a PQ search: (query_id, _nb) — the ``rerank``
        best candidates per query by asymmetric distance (ADC). The scan
        side selects ONLY (cell, key, pq): Catalyst prunes the parquet
        read to the code column — the whole point (pinned in
        tests/test_ann_pq.py via ReadSchema). The query side carries its
        m×kcodes distance table as an in-plan expression (rounded like
        every other distance here, so candidate sets are deterministic);
        the ADC score is one ``aggregate`` lookup-sum per pair."""
        key_col = self.meta["key_col"]
        return _pq_topc(
            cands.select("cell", key_col, "pq"),
            q,
            key_col,
            self.meta["pq"],
            rerank,
        )

    def _fs_exists(self, path: str) -> bool:
        """Path existence via the Hadoop FileSystem resolved for ``path``
        — correct for local, HDFS, and object-store roots alike."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def data_files(self) -> list[str]:
        """All parquet data files of the layout (for pruning assertions)."""
        out = []
        data_path = os.path.join(self.root, _DATA)
        for dirpath, _dirs, files in os.walk(data_path):
            out.extend(
                os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
            )
        return out


class LakeAnnIndex:
    """The IVF index stored AS a lake table — index maintenance with the
    lake's transactional guarantees (round 4b).

    ``AnnIndex`` above owns a raw cell-partitioned parquet layout: the
    right READ shape (a search opens only probed cell directories), but
    its maintenance is single-writer and at-most-once — a re-delivered
    ``foreachBatch`` batch (Spark checkpoint recovery re-invokes with the
    same batch_id) would double-insert its vectors. This variant stores
    rows ``(cell, <key>, <vec>)`` in a :class:`LakeTable` keyed by
    ``(cell, key)``:

    - the bucket hash is a pure function of ``cell`` (``key_cols[0]``),
      so the layout clusters by cell and a search reads ONLY the probed
      cells' buckets THROUGH THE MANIFEST (file sets, no directory
      listing — at object-store scale, listing is a job);
    - every maintenance batch is a commit-keyed epoch
      (``apply_batch(epoch=...)``): re-delivery is a metadata no-op —
      EXACTLY-ONCE index maintenance on a streaming cadence;
    - CAS commits, snapshot time travel, retention GC, and per-file
      key(=cell) range stats all apply unchanged;
    - the QUANTIZER lives in the table's fold-forward snapshot PROPS
      (round 4c), not a sidecar: centroids commit ATOMICALLY with the
      rows they assign, every snapshot carries the quantizer that matches
      its layout (time-travel search uses the historical centroids), and
      no crash ordering can tear quantizer from layout;
    - ``retrain`` closes the lifecycle: when ``appended_share`` crosses
      the drift tolerance, retrain re-trains the coarse quantizer on the
      CURRENT rows' hash-sample and commits {new centroids + cell
      reassignments + tombstones for moved rows} as ONE LWW merge —
      crash-safe and exactly-once via the generation token + retrain
      position riding props (no residual commit keys), and concurrent
      readers keep a consistent (old quantizer, old layout) view until
      the commit lands. ``maintain`` = append + auto-retrain.

    Insert-only contract (classic IVF insert): re-inserting a key whose
    embedding MOVED to a different cell is a new (cell, key) row — emit a
    delete for the old cell's row alongside, or rebuild, if embeddings
    mutate (see ``append``). Training is the same deterministic k-means
    as ``AnnIndex`` (functions/kmeans.py), so the v08 oracle SQL covers
    this storage verbatim (catalog entry v09, queries/simops.py)."""

    _TABLE = "table"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cents: dict[int, list[float]],
        meta: dict,
        table: "LakeTable",
    ):
        self.spark = spark
        self.root = root
        self.cents = cents
        self.meta = meta
        self.table = table

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        vectors: DataFrame,
        root: str,
        *,
        key_col: str = "vec_id",
        vec_col: str = "v",
        k: int = 8,
        iters: int = 3,
        sample_mod: int = 4,
        n_buckets: int | None = None,
        pq: tuple[int, int] | None = None,
    ) -> "LakeAnnIndex":
        """Train on the hash-sample (identical math to ``AnnIndex.build``),
        then commit the cell-assigned full set as the lake table's epoch 0
        WITH the quantizer riding the same commit as table props — one CAS
        makes centroids and layout visible together. ``n_buckets`` defaults
        to ``k`` — about one cell per hash bucket (collisions are fine: the
        search filters on the cell column after the bucket-pruned scan).

        A (re)build is DESTRUCTIVE and re-runnable: a crash leaves either
        the old intact index or a propless fresh table where ``load``
        fails loudly and ``build`` can simply run again — never a
        quantizer paired with another build's layout."""
        import shutil

        from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
        from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

        sidecar = os.path.join(root, _SIDECAR)  # pre-props builds only
        if os.path.exists(sidecar):
            os.unlink(sidecar)
        shutil.rmtree(os.path.join(root, cls._TABLE), ignore_errors=True)
        vectors = vectors.select(key_col, vec_col)
        # rare build-time scan: props must carry base_rows INSIDE the
        # epoch-0 commit to stay atomic. DISTINCT keys, not raw rows — the
        # build input may re-emit a key, and the drift denominator must be
        # the live base set or appended_share systematically under-reads
        base_rows = vectors.select(key_col).distinct().count()
        sample = vectors.filter(km.sample_hash(key_col) % sample_mod == 0)
        train = sample.select(
            F.col(key_col).alias("vec_id"), F.col(vec_col).alias("v")
        )
        cents = km.train_kmeans_cells(train, "v", k=k, iters=iters)
        dim = len(next(iter(cents.values()))) if cents else 0
        # PQ codebooks train on the same sample; the m-code column rides
        # the storage schema so a pq-less search is unaffected (column
        # pruning) while search(pq_rerank=) scans only the codes. The
        # codebooks live in the ann props WITH the quantizer — retrain
        # replaces both atomically with the rows they encode.
        pq_meta = _train_pq(train, dim, pq, iters) if pq is not None else None
        schema = T.StructType(
            [T.StructField("cell", T.IntegerType(), False)]
            + [vectors.schema[key_col], vectors.schema[vec_col]]
            + (
                [T.StructField("pq", T.ArrayType(T.IntegerType()), True)]
                if pq_meta is not None
                else []
            )
        )
        table = LakeTable.create(
            spark,
            os.path.join(root, cls._TABLE),
            schema,
            key_cols=("cell", key_col),
            n_buckets=n_buckets or k,
        )
        meta = {
            "key_col": key_col,
            "vec_col": vec_col,
            "k": k,
            "iters": iters,
            "sample_mod": sample_mod,
            "dim": dim,
            "base_rows": base_rows,
            # quantizer generation marker: appended_share scopes its sum
            # to snapshots carrying the CURRENT token, so a retrain resets
            # the drift signal by construction
            "token": uuid.uuid4().hex[:12],
            "cells": {str(c): v for c, v in sorted(cents.items())},
        }
        if pq_meta is not None:
            meta["pq"] = pq_meta
        # salt_buckets=0: the AUTO skew probe measures hot-BUCKET share,
        # and a cell-keyed table (~k cells over ~k buckets) trips it by
        # construction — but batch keys are unique under the insert-only
        # contract, so the salted two-stage dedup would be a pure extra
        # shuffle on every maintenance batch
        apply_batch(
            spark,
            table,
            cls._as_events(vectors, cents, 0, vec_col, pq_meta),
            epoch=0,
            salt_buckets=0,
            props_update={"ann": meta},
            # the generation's training commit: appended_share skips it
            summary_extra={"ann_quantizer": True},
        )
        return cls(spark, root, cents, meta, table)

    #: maintenance epochs write at lsn = epoch * STRIDE; retrain commits
    #: write in the open interval between the highest applied epoch's
    #: slot and the next epoch's. The stride guarantees a retrain's
    #: re-inserts beat every row they were derived from yet LOSE to any
    #: later append epoch — without it a retrain at watermark+1 TIES the
    #: next append's lsn and LWW falls back to payload comparison
    #: (nondeterministic winner). The interval is WIDE (2^20) because
    #: back-to-back retrains with no intervening epoch (force=True after
    #: a parameter change) each need a FRESH slot — the second retrain's
    #: move-tombstones must beat the first retrain's re-inserts, so its
    #: lsn comes from props' last retrain position + 1, not the epoch
    #: alone.
    _LSN_STRIDE = 1 << 20

    @classmethod
    def _as_events(
        cls,
        vectors: DataFrame,
        cents: dict[int, list[float]],
        epoch: int,
        vec_col: str,
        pq_meta: dict | None = None,
    ) -> DataFrame:
        """Change events for one maintenance batch: assign cells with the
        (frozen) centroids; ``lsn = epoch * _LSN_STRIDE`` —
        insert-only keys are unique per batch, and a later epoch
        re-inserting a key wins by LWW. ``pq_meta`` (frozen codebooks)
        additionally encodes the m-code PQ column."""
        out = vectors.select(
            F.lit(int(epoch) * cls._LSN_STRIDE).cast("long").alias("lsn"),
            F.lit("insert").alias("op"),
            km.argmin_cell(vec_col, cents).alias("cell"),
            "*",
        )
        if pq_meta is not None:
            out = out.withColumn(
                "pq", AnnIndex._encode_expr(vec_col, pq_meta)
            )
        return out

    def _refresh(self) -> "Snapshot":
        """Re-read quantizer + meta from the CURRENT snapshot's props (a
        retrain — ours or another maintenance writer's — may have replaced
        them since load). Returns the snapshot it read, so callers can pin
        quantizer and data to the same version."""
        snap = self.table.current()
        meta = snap.props.get("ann")
        if meta is None:
            raise ValueError(
                "lake ANN index has no quantizer props — the build never "
                "committed (crashed mid-build?); run build() again"
            )
        self.meta = meta
        self.cents = {int(c): v for c, v in meta["cells"].items()}
        return snap

    def append(self, vectors: DataFrame, epoch: int):
        """Frozen-centroid insert as commit-keyed epoch ``epoch`` (> 0;
        epoch 0 is the build). Exactly-once: a re-delivered epoch is a
        metadata no-op (``ApplyResult.skipped``), so this is safe to call
        from a streaming ``foreachBatch`` with ``batch_id + 1``. Cells are
        assigned with the LATEST committed quantizer (re-read per call):
        after a retrain, maintenance keeps feeding the new generation.

        CONTRACT — inserts, plus same-cell updates only: the storage key
        is ``(cell, key)``, so a later epoch re-delivering a key
        supersedes it by LWW only while the new embedding quantizes to
        the SAME cell. An update whose embedding hops cells would leave
        the key live in both (nothing tombstones the old cell's row —
        only ``retrain`` emits move tombstones, because only it sees the
        previous assignment without an O(state) probe per batch). Model
        embedding mutations as delete (old) + insert (new) events in the
        maintenance feed, or rely on the drift-triggered retrain to fold
        duplicates out is NOT sufficient — the retrain re-reads both live
        rows. Callers with update-heavy feeds should key their upstream
        lake table on the bare key and treat this index as derived."""
        from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch

        if epoch <= 0:
            raise ValueError("append epochs start at 1 (0 is the build)")
        self._refresh()
        key_col, vec_col = self.meta["key_col"], self.meta["vec_col"]
        events = self._as_events(
            vectors.select(key_col, vec_col),
            self.cents,
            epoch,
            vec_col,
            self.meta.get("pq"),
        )
        # salt off: see build() — unique insert keys, skew probe would
        # misfire on the cell-keyed bucket shape every PROBE_EVERY epochs
        return apply_batch(
            self.spark, self.table, events, epoch=epoch, salt_buckets=0
        )

    def appended_share(self) -> float:
        """Drift signal: fraction of live rows inserted under the CURRENT
        quantizer generation but after its training — from the retained
        snapshots' commit summaries (metadata only — no scan). The sum is
        scoped to snapshots carrying the current generation ``token``
        (props fold forward, so every post-(re)build snapshot carries it)
        minus the generation's own training commit. If retention GC
        expired part of the chain the share is a LOWER bound; rebuild
        cadence should outpace expiry."""
        self._refresh()
        base = int(self.meta.get("base_rows", 0))
        tok = self.meta.get("token")
        gen = sorted(
            (
                s
                for s in self.table.snapshots()
                if s.props.get("ann", {}).get("token") == tok
            ),
            key=lambda s: s.snapshot_id,
        )
        appended = 0
        for s in gen:
            if s.summary.get("ann_quantizer"):
                continue  # the generation's own training commit
            appended += sum(
                r["rows_merged"]
                for r in s.summary.get("bucket_lineage", [])
            )
        return appended / (base + appended) if (base + appended) else 0.0

    def retrain(self, force: bool = False) -> "Snapshot | None":
        """Re-train the coarse quantizer on the CURRENT rows' hash-sample
        and commit {new centroids (props) + reassignment rows + tombstones
        for moved rows} as ONE LWW merge — the drift response that closes
        the IVF lifecycle (build → append/drift → retrain).

        No-op (returns None) when the current generation has nothing to
        learn — zero rows appended since its training (``force=True``
        overrides, e.g. after changing training params out of band).
        Exactly-once on retries WITHOUT a residual commit key: a retrain
        that crashed before its CAS left nothing behind and simply re-runs;
        one that crashed after sees the NEW generation token, reads
        ``appended_share() == 0`` and no-ops. (An earlier design minted
        ``ann-retrain:s{sid}`` commit keys — each one rode the residual
        list of every later snapshot forever; the generation token in
        props already carries the same monotone position atomically.)

        LWW mechanics: reassignments are re-inserts at an lsn strictly
        between the highest APPLIED position (epoch slots — residual
        epochs above the contiguous watermark included — and any prior
        retrain's lsn from props) and the NEXT epoch's slot, so they
        beat every row they were derived from but lose to any later
        append epoch; see ``_LSN_STRIDE``. A row whose cell MOVED gets a tombstone at its
        old ``(cell, key)`` and an insert at the new one; an unmoved row
        is re-inserted identically (same payload — the tie is
        content-equal). Readers never see a torn state: until the CAS
        lands they read the old quantizer with the old layout; after it,
        the new pair.

        Concurrency: retrain is maintenance (single scheduled writer, like
        compaction). An append racing the retrain commit lands with the
        OLD quantizer's cells — correct but unreflected in the new
        centroids; the next drift cycle picks it up."""
        from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
            _dedup_storage,
            _normalize_batch,
        )

        from postgres_to_snowflake_data_pipeline_spark.lake.metadata import epoch_of

        if not force and self.appended_share() == 0.0:
            return None
        snap = self._refresh()
        meta = dict(self.meta)
        key_col, vec_col = meta["key_col"], meta["vec_col"]
        cur = self.table.read(
            snapshot_id=snap.snapshot_id,
            columns=["cell", key_col, vec_col],
        )
        base_rows = cur.count()
        sample = cur.filter(km.sample_hash(key_col) % meta["sample_mod"] == 0)
        train = sample.select(
            F.col(key_col).alias("vec_id"), F.col(vec_col).alias("v")
        )
        cents = km.train_kmeans_cells(
            train, "v", k=meta["k"], iters=meta["iters"]
        )
        # PQ codebooks retrain WITH the coarse quantizer (same sample) —
        # the re-encode rides the reassignment rewrite for free, and the
        # new codebooks land in the same props commit as the rows they
        # encode (readers never pair codes with a foreign codebook)
        old_pq = meta.get("pq")
        new_pq = (
            _train_pq(
                train,
                int(meta["dim"]),
                (old_pq["m"], old_pq["k"]),
                meta["iters"],
            )
            if old_pq is not None
            else None
        )
        residual_epochs = [
            e for e in (epoch_of(k) for k in snap.commit_keys) if e is not None
        ]
        max_epoch = max([snap.epoch_watermark, *residual_epochs])
        # strictly above every applied lsn — including a PRIOR retrain at
        # the same max_epoch (its position rides props), else the second
        # retrain's tombstones would tie the first's re-inserts
        lsn = max(
            max_epoch * self._LSN_STRIDE + 1,
            int(meta.get("retrain_lsn", 0)) + 1,
        )
        if lsn >= (max_epoch + 1) * self._LSN_STRIDE:
            raise RuntimeError(
                f"retrain lsn interval exhausted at epoch {max_epoch} "
                f"({self._LSN_STRIDE - 1} retrains between two appends)"
            )
        assigned = cur.select(
            F.col("cell").alias("_old_cell"),
            F.col(key_col),
            F.col(vec_col),
            km.argmin_cell(vec_col, cents).alias("cell"),
        )
        pq_cols = (
            [AnnIndex._encode_expr(vec_col, new_pq).alias("pq")]
            if new_pq is not None
            else []
        )
        inserts = assigned.select(
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit("insert").alias("op"),
            "cell",
            key_col,
            vec_col,
            *pq_cols,
        )
        tombstones = assigned.filter(
            F.col("cell") != F.col("_old_cell")
        ).select(
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit("delete").alias("op"),
            F.col("_old_cell").alias("cell"),
            F.col(key_col),
            F.col(vec_col),
            *(
                [F.lit(None).cast("array<int>").alias("pq")]
                if new_pq is not None
                else []
            ),
        )
        events = inserts.unionByName(tombstones)
        table_schema, events, obs_metrics = _normalize_batch(
            self.table, events, f"ann-retrain:s{snap.snapshot_id}"
        )
        # pin dedup/bucketing to the snapshot the reassignments were
        # derived from — a fresh current() here could see a racing append
        # and bucket against a state this retrain never read
        storage = _dedup_storage(events, table_schema, snap, 0)
        new_meta = dict(
            meta,
            base_rows=base_rows,
            token=uuid.uuid4().hex[:12],
            retrain_lsn=lsn,
            cells={str(c): v for c, v in sorted(cents.items())},
            **({"pq": new_pq} if new_pq is not None else {}),
        )
        committed = self.table.merge(
            storage,
            schema=table_schema,
            summary={
                "operation_detail": "ann-retrain",
                "ann_quantizer": True,
                "retrain_base_snapshot": snap.snapshot_id,
            },
            summary_fn=obs_metrics,
            props_update={"ann": new_meta},
        )
        if committed is not None:
            self.meta = new_meta
            self.cents = cents
        return committed

    def maintain(
        self,
        vectors: DataFrame,
        epoch: int,
        rebuild_threshold: float = 0.5,
    ):
        """One maintenance tick: frozen-centroid append, then retrain iff
        the drift signal crossed ``rebuild_threshold`` (classic IVF
        practice: retrain when the post-training share of the data makes
        the frozen quantizer unrepresentative). Returns the append's
        ApplyResult; the retrain (if any) is its own commit."""
        res = self.append(vectors, epoch)
        if self.appended_share() >= rebuild_threshold:
            # force: the threshold check above IS the drift test — retrain
            # re-running appended_share() would scan the snapshot chain a
            # second time in the same tick for the same answer
            self.retrain(force=True)
        return res

    def compact(self, key_slices: int | None = None):
        """Fold the maintenance deltas (each append epoch adds delta
        files; read amplification grows until a fold). ``key_slices > 1``
        additionally slices each bucket's base at CELL boundaries
        (cell = ``key_cols[0]``), so when several cells share a hash
        bucket a search's ``key_prune`` opens only the probed cells'
        slices instead of the whole bucket. Same maintenance-cadence
        shape as the transcript table's (streaming/pipeline.py)."""
        return self.table.compact(key_slices=key_slices)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeAnnIndex":
        """Open the index: the quantizer comes from the lake table's OWN
        snapshot props (it versions with the layout), never a sidecar — a
        table without ann props is a crashed build, surfaced loudly."""
        from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

        table = LakeTable.load(spark, os.path.join(root, cls._TABLE))
        idx = cls(spark, root, {}, {}, table)
        try:
            idx._refresh()
        except ValueError:
            if os.path.exists(os.path.join(root, _SIDECAR)):
                # a healthy index written by the pre-props format is NOT a
                # crashed build — don't steer the operator to a destructive
                # rebuild over a misdiagnosis
                raise ValueError(
                    "lake ANN index has a legacy sidecar quantizer but no "
                    "snapshot props — this index predates props-carried "
                    "quantizers; rebuild once with build() to migrate "
                    "(the sidecar alone is no longer read because it does "
                    "not version atomically with the table layout)"
                ) from None
            raise
        return idx

    # ------------------------------------------------------------------
    def probed_buckets(self, cells: list[int]) -> list[int]:
        """The hash buckets holding the probed cells — mapped through the
        SAME Catalyst expression that assigns buckets at write time
        (``bucket_expr`` on the int cell column), so probe and layout can
        never drift apart."""
        from postgres_to_snowflake_data_pipeline_spark.lake.table import bucket_expr

        if not cells:
            return []
        nb = self.table.current().n_buckets
        rows = (
            self.spark.createDataFrame([(int(c),) for c in cells], "cell int")
            .select(bucket_expr("cell", nb).alias("b"))
            .distinct()
            .collect()
        )
        return sorted(r["b"] for r in rows)

    def search(
        self,
        queries: DataFrame,
        *,
        k: int = 3,
        nprobe: int = 2,
        query_id_col: str = "query_id",
        snapshot_id: int | None = None,
        pq_rerank: int | None = None,
    ) -> DataFrame:
        """Top-k cosine neighbors per query over ONLY the probed cells'
        buckets, read through the manifest (merge-on-read: a search sees
        every committed append immediately, snapshot-consistently).
        Quantizer and data are pinned to the SAME snapshot — the props
        carry the centroids that assigned that snapshot's cells, so a
        concurrent retrain can never make a search probe new cells over an
        old layout (or vice versa), and ``snapshot_id`` time-travels the
        whole index, quantizer included. Output matches the catalog's ANN
        queries: (query_id, neighbor_id, cosine, rnk)."""
        from postgres_to_snowflake_data_pipeline_spark.lake.table import bucket_expr

        snap = (
            self.table.current()
            if snapshot_id is None
            else self.table.log.load(snapshot_id)
        )
        meta = snap.props.get("ann")
        if meta is None:
            raise ValueError(
                f"snapshot {snap.snapshot_id} carries no ann quantizer props"
            )
        cents = {int(c): v for c, v in meta["cells"].items()}
        key_col, vec_col = meta["key_col"], meta["vec_col"]
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(km.probe_cells(vec_col, cents, nprobe)).alias("cell"),
        )
        # ONE driver round-trip resolves both prune levels: the distinct
        # probed cells AND their hash buckets (bucket_expr on the same
        # IntegerType cell column the write side hashes — probe and
        # layout can never drift apart). Bounded by min(queries×nprobe, k).
        nb = snap.n_buckets
        cb = (
            q.select("cell")
            .distinct()
            .select("cell", bucket_expr("cell", nb).alias("b"))
            .collect()
        )
        cells = sorted(int(r["cell"]) for r in cb)
        probed_buckets = sorted({r["b"] for r in cb})
        # bucket pruning (hash of cell) + per-file cell-range pruning:
        # key_prune drops files whose [key_min, key_max] covers none of
        # the probed cells — after compact(key_slices=k) that opens only
        # the probed cells' SLICES even when several cells share a hash
        # bucket. The residual isin filter stays for row-level exactness.
        if pq_rerank is not None:
            if meta.get("pq") is None:
                raise ValueError("pq_rerank: index was built without pq=")
            # stage 1 (ADC) reads only (cell, key, pq) through the same
            # bucket/cell pruning; stage 2 re-reads the vector column
            # behind a pushed-down candidate-key In filter (bounded
            # driver collect — same budget class as the probe resolve)
            codes = self.table.read(
                snapshot_id=snap.snapshot_id,
                buckets=probed_buckets,
                columns=["cell", key_col, "pq"],
                key_prune=cells,
            ).filter(F.col("cell").isin(cells))
            pairs = _pq_topc(
                codes, q, key_col, meta["pq"], pq_rerank
            ).collect()
            keys = sorted({r["_nb"] for r in pairs})
            sel = self.table.read(
                snapshot_id=snap.snapshot_id,
                buckets=probed_buckets,
                columns=["cell", key_col, vec_col],
                key_prune=cells,
            ).filter(
                F.col(key_col).isin(keys) if keys else F.lit(False)
            )
            top = self.spark.createDataFrame(
                [(r["query_id"], r["_nb"]) for r in pairs],
                schema=T.StructType(
                    [
                        T.StructField(
                            "query_id", q.schema["query_id"].dataType
                        ),
                        T.StructField("_nb", sel.schema[key_col].dataType),
                    ]
                ),
            )
            scored = (
                sel.join(
                    F.broadcast(top), sel[key_col] == top["_nb"], "inner"
                )
                .join(F.broadcast(q.drop("cell").distinct()), "query_id")
                .select(
                    "query_id",
                    F.col(key_col).alias("neighbor_id"),
                    F.round(
                        cosine_similarity(F.col("_qv"), F.col(vec_col)), 6
                    ).alias("cosine"),
                )
            )
        else:
            cands = self.table.read(
                snapshot_id=snap.snapshot_id,
                buckets=probed_buckets,
                columns=["cell", key_col, vec_col],
                key_prune=cells,
            ).filter(F.col("cell").isin(cells))
            scored = cands.join(F.broadcast(q), "cell").select(
                "query_id",
                F.col(key_col).alias("neighbor_id"),
                F.round(
                    cosine_similarity(F.col("_qv"), F.col(vec_col)), 6
                ).alias("cosine"),
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return scored.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= k
        )
