"""Corpus-assembly operators: dup-graph clustering, survivor selection,
and token-budget sequence packing.

Near-dup *pairs* (t08/t11) don't dedup a corpus by themselves — pairs must
be closed into clusters (connected components of the candidate graph) and
each cluster collapsed to one survivor. That closure is an *iterative*
algorithm, the one operator class the rest of the catalog doesn't cover:
the driver loops, every iteration is a pure DataFrame shuffle, and the
loop converges in O(graph diameter) rounds (min-label propagation — the
"hash-to-min" scheme of Kiveris et al., *Connected Components in MapReduce
and Beyond*, SoCC'14). LSH dup graphs are near-cliques (docs sharing a
band signature link pairwise), so the diameter is tiny — 2-3 rounds in
practice, bounded by ``MAX_CC_ITERS`` as a safety rail.

Scale notes (100 TB): the iteration state is (node, label) BIGINT pairs —
never text — and the edge list (LSH candidates) is orders of magnitude
smaller than the corpus. Each round is one shuffle of the label table;
``localCheckpoint`` truncates the lineage so round N's plan doesn't
re-execute rounds 1..N-1. Survivor selection is one window per cluster
(clusters are tiny by construction). Sequence packing partitions by
(source, shard) so no single reducer sees a whole source.

DuckDB oracles: the component closure is expressed exactly as a
``WITH RECURSIVE`` reachability walk — min reachable node == min-label
fixpoint on a symmetric edge list — so even the iterative operator gets a
full value-hash parity check.

Reference analog: the reference pipeline dedups per-table snapshots by
primary key only (/root/reference/scripts/load_data.py); content-level
dedup clustering is part of this repo's training-data brief, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgres_to_snowflake_data_pipeline_spark.queries.base import load
from postgres_to_snowflake_data_pipeline_spark.queries.textops import (
    _D_NORM,
    _D_QUALITY,
    _NORM,
    _fast_family_sql,
    _quality_exprs,
    _with_tokens,
    t11_minhash_candidates_fast,
)

#: Safety rail for the component loop. Hook + pointer-doubling converges
#: in O(log n) rounds on ANY graph shape (a 10^6-node chain needs ~21),
#: so hitting this indicates a real defect, not an unlucky topology —
#: fail loudly rather than return a half-converged clustering.
MAX_CC_ITERS = 25


def connected_components(
    edges: DataFrame,
    max_iters: int = MAX_CC_ITERS,
    rounds_out: list[int] | None = None,
) -> DataFrame:
    """Connected components of an undirected graph given as (a, b) pairs.

    Returns (node, cluster_id) with cluster_id = min node id reachable.
    Each round does two steps (the hook + shortcut scheme of
    Shiloach & Vishkin 1982, the same label-compression idea as the
    large-star/small-star of Kiveris et al., SoCC'14):

    1. HOOK — every node takes the min label over itself and its
       neighbors (one shuffle of (node, label) against the symmetrized,
       checkpointed edge list);
    2. SHORTCUT — pointer doubling: ``label <- label(label)`` via a
       self-join of the label table, so the distance a label has
       travelled roughly DOUBLES per round.

    Hook alone converges in O(diameter) rounds — fine for near-clique
    LSH dup graphs (diameter ~2) but O(n) rounds on chain-shaped graphs;
    the shortcut makes every topology O(log n) rounds. Fixpoint is
    unchanged (labels monotonically decrease toward the component min,
    and a no-improvement round implies labels are constant across every
    edge), so the WITH RECURSIVE oracle still applies. Convergence check
    is ``improved.isEmpty()`` — no collect of the label table; one
    ``localCheckpoint`` per round truncates lineage, and the O(log)
    round count bounds the number of materializations.

    ``rounds_out``: if a list is passed, the number of rounds used is
    appended (test/telemetry hook).
    """
    sym = edges.selectExpr("a", "b").unionByName(
        edges.selectExpr("b AS a", "a AS b")
    )
    # materialize once — every round joins against it
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for it in range(max_iters):
        prop = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("label")
        )
        hooked = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # shortcut: follow the label one hop through the label table
        # itself. label values are node ids of the same component, so the
        # (inner-equivalent) left join always finds plabel; coalesce only
        # guards the theoretical miss. plabel <= label by monotonicity,
        # least() keeps that explicit.
        ptr = hooked.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            hooked.join(ptr, hooked["label"] == ptr["pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("plabel", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        improved = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
        )
        done = improved.isEmpty()
        labels = new_labels
        if done:
            if rounds_out is not None:
                rounds_out.append(it + 1)
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "O(log n) hook+shortcut should never get here on real inputs"
    )


def _dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every doc in >=1 LSH candidate pair,
    using the scale-path MinHash family (t11) as the edge source."""
    pairs = t11_minhash_candidates_fast(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# t17 — near-dup clusters: connected components over the LSH candidate
# graph. Output one row per clustered doc with its canonical cluster id
# (min doc_id in the component) and the component size.
# ---------------------------------------------------------------------------
def t17_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = _dup_components(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def _recursive_components_sql() -> str:
    """Shared oracle CTEs: fast-family bands -> candidate edges ->
    recursive reachability closure -> (doc_id, cluster_id).

    min(front) over the reachability walk on a symmetric edge list is
    exactly the min-label fixpoint the Spark loop computes.
    """
    fam = _fast_family_sql().replace("WITH s AS", "WITH RECURSIVE s AS", 1)
    return fam + """
, cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand
),
walk(node, front) AS (
  SELECT a, a FROM edges
  UNION
  SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.front
),
comp AS (
  SELECT node AS doc_id, min(front) AS cluster_id FROM walk GROUP BY node
)
"""


T17_SQL = _recursive_components_sql() + """
SELECT c.doc_id, c.cluster_id, s.cluster_size
FROM comp c
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) s
  USING (cluster_id)
"""


# ---------------------------------------------------------------------------
# t18 — dedup survivor selection: every document gets a cluster (its own
# doc_id if unclustered) and exactly one doc per cluster survives — the
# highest quality score, ties to the smallest doc_id. This is the actual
# "deduped corpus" materialization: `WHERE keep = 1` of this output is the
# training set. Quality is computed from the token column before the
# cluster join, so text never crosses the cluster shuffle.
# ---------------------------------------------------------------------------
def t18_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    _dr, _sr, quality = _quality_exprs()
    scored = d.select("doc_id", quality.alias("quality"))
    comp = _dup_components(spark, sf_dir)
    joined = scored.join(comp, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return joined.withColumn("rn", F.row_number().over(w)).select(
        "doc_id",
        "cluster_id",
        "quality",
        (F.col("rn") == 1).cast("int").alias("keep"),
    )


T18_SQL = _recursive_components_sql() + f"""
, scored AS (
  SELECT doc_id, {_D_QUALITY} AS quality FROM documents
),
clustered AS (
  SELECT s.doc_id, COALESCE(c.cluster_id, s.doc_id) AS cluster_id, s.quality
  FROM scored s LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id, quality,
       CAST(CASE WHEN row_number() OVER (PARTITION BY cluster_id
                                         ORDER BY quality DESC, doc_id) = 1
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM clustered
"""


# ---------------------------------------------------------------------------
# t19 — token-budget sequence packing: lay documents end-to-end in a
# deterministic order and cut the stream every PACK_BUDGET tokens; each doc
# is assigned to the sequence where it starts. The order is (fingerprint,
# doc_id) inside a (source, shard) group — shard = md5(doc_id) mod
# PACK_SHARDS — so packing is seed-free and replayable AND no single
# reducer ever sorts a whole source (the window partitions by the composite
# key; parallelism scales with PACK_SHARDS, not the number of sources).
# ---------------------------------------------------------------------------
PACK_BUDGET = 512
PACK_SHARDS = 8


def t19_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    m = d.select(
        "doc_id",
        "source",
        F.size("toks").alias("n_tokens"),
        F.md5(F.expr(_NORM)).alias("fp"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(PACK_SHARDS),
        ).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("fp", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return m.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        F.floor(cum_before / PACK_BUDGET).cast("long").alias("seq_id"),
        (cum_before - F.floor(cum_before / PACK_BUDGET) * PACK_BUDGET)
        .cast("long")
        .alias("seq_offset"),
    )


T19_SQL = f"""
WITH m AS (
  SELECT doc_id, source,
         len(string_split({_D_NORM}, ' ')) AS n_tokens,
         md5({_D_NORM}) AS fp,
         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % {PACK_SHARDS} AS INTEGER) AS shard
  FROM documents
),
c AS (
  SELECT *,
         COALESCE(sum(n_tokens) OVER (
             PARTITION BY source, shard ORDER BY fp, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM m
)
SELECT doc_id, source, shard, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS seq_id,
       CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS seq_offset
FROM c
"""
