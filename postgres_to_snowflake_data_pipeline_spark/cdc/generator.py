"""Deterministic, distributed synthetic CDC feed generator.

Replaces the reference's driver-side sample-data script
(/root/reference/scripts/generate_sample_data.py:23-139, which uses
``random.randint`` on the driver) with a **pure function of (seed, row
index)** evaluated as Spark column expressions over ``spark.range`` — so the
same ``n_events`` produces byte-identical input at any parallelism (the N vs
4N scaling runs must see identical data, FIXTURES.md §4), and generation
itself scales horizontally: no driver materialization, no per-row Python.

Feed properties (FIXTURES.md §4):
- **Skew**: conv assignment via a cubed-uniform transform — the hottest
  conversation receives ~(1/n_convs)^(1/3) of all events (≈6% at 5k convs),
  exercising salted repartitioning + AQE skew splitting.
- **Op mix**: ~5% delete, remainder insert/update (both upsert semantics,
  like the reference's tolerant ``ON CONFLICT DO NOTHING`` +
  ``ON_ERROR='CONTINUE'`` loads).
- **Duplicates**: ~2% of events re-emitted with identical LSN (exactly-once
  dedup check).
- **Late / out-of-order**: ~5% of events carry an LSN lower than
  already-emitted events (odd LSNs interleaved below the even main sequence)
  and a correspondingly older ``ts`` — a late lower-LSN update must neither
  overwrite a higher-LSN row nor resurrect a deleted key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2026-01-01 00:00:00"  # pinned base timestamp (FIXTURES.md)


def _h(seed: int, *cols: Column | str) -> Column:
    """Deterministic non-negative 64-bit hash of (seed, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def event_projection(
    idx: Column,
    n_convs: int = 5000,
    seed: int = 42,
    max_turns: int = 50,
    late_frac_mod: int = 20,
    delete_pct: int = 5,
    text_bytes: int = 0,
) -> list[Column]:
    """The deterministic change-event columns as a pure function of a row
    index column — shared by the batch generator (``spark.range``) and the
    rate-source stream (``sources.rate_change_stream``), so both produce
    identical rows for identical indices at any parallelism.

    ``text_bytes > 0`` pads ``text`` to roughly that many bytes with a
    deterministic filler (payload-weighted benchmarking: real transcripts
    carry ~KB turns, not the 40-byte default). The verifiable
    ``turn text {conv}/{turn} @lsn={lsn}`` prefix is preserved."""
    # --- LSN: main sequence on even numbers; late events dip to odd numbers
    # below earlier events (unique because odd/even never collide and each
    # idx maps to a distinct odd value).
    is_late = (_h(seed + 7, idx) % late_frac_mod == 0) & (idx > 20)
    lsn = F.when(is_late, idx * 2 - 35).otherwise(idx * 2).cast("long")

    # --- Skewed conversation assignment: u^3 transform of a uniform hash.
    u = (_h(seed, idx) % 1_000_000) / 1_000_000.0
    conv_rank = F.floor(F.lit(n_convs) * u * u * u).cast("long")
    conv_id = F.format_string("conv-%08d", conv_rank)

    turn_idx = (_h(seed + 1, idx) % max_turns).cast("int")

    opsel = _h(seed + 2, idx) % 100
    op = (
        F.when(opsel < delete_pct, F.lit("delete"))
        .when(opsel < 35, F.lit("update"))
        .otherwise(F.lit("insert"))
    )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (_h(seed + 3, idx) % 4 + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("calc"), F.lit("code")),
            (_h(seed + 4, idx) % 3 + 1).cast("int"),
        ),
    )
    # Deliverable invariant is per-turn *text* equality: make text a pure
    # function of (key, lsn) so any wrong winner is visible.
    text = F.format_string("turn text %s/%s @lsn=%s", conv_id, turn_idx.cast("string"), lsn.cast("string"))
    if text_bytes > 0:
        filler = F.repeat(
            F.md5(F.concat_ws("|", conv_id, lsn.cast("string"))),
            max(text_bytes // 32, 1),
        )
        text = F.concat(text, F.lit(" "), filler)
    ts = F.timestamp_seconds(F.unix_timestamp(F.lit(BASE_TS)) + lsn)

    return [
        lsn.alias("lsn"),
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(op != "delete", role).alias("role"),
        F.when(op != "delete", text).alias("text"),
        F.when(op != "delete", tool).alias("tool"),
        ts.alias("ts"),
    ]


def change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 5000,
    seed: int = 42,
    max_turns: int = 50,
    dup_frac_mod: int = 50,   # 1/50 = 2% duplicated LSNs
    late_frac_mod: int = 20,  # 1/20 = 5% late (lower-LSN, older-ts) events
    delete_pct: int = 5,
    evolved_from: int | None = None,
    num_partitions: int | None = None,
    text_bytes: int = 0,
) -> DataFrame:
    """Build the deterministic change feed as a DataFrame.

    ``evolved_from``: if set, events with index >= that value additionally
    carry the additive-evolution columns ``tool_meta`` / ``latency_ms``
    (non-null), modeling a producer-side schema upgrade mid-stream.
    Events before it carry NULLs in those columns (the caller may also drop
    the columns entirely to model the pre-evolution feed shape).
    """
    idx = F.col("id")
    base = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)

    cols = event_projection(
        idx,
        n_convs=n_convs,
        seed=seed,
        max_turns=max_turns,
        late_frac_mod=late_frac_mod,
        delete_pct=delete_pct,
        text_bytes=text_bytes,
    )
    df = base.select(*cols, idx.alias("_idx"))

    if evolved_from is not None:
        evolved = F.col("_idx") >= evolved_from
        df = df.withColumn(
            "tool_meta",
            F.when(
                evolved & (F.col("op") != "delete"),
                F.format_string('{"call_id":%s}', F.col("lsn").cast("string")),
            ),
        ).withColumn(
            "latency_ms",
            F.when(
                evolved & (F.col("op") != "delete"),
                (_h(seed + 5, F.col("_idx")) % 5000).cast("int"),
            ),
        )

    # --- Duplicates: re-emit 2% of events with identical content+LSN.
    dups = df.filter(_h(seed + 6, F.col("_idx")) % dup_frac_mod == 0)
    return df.unionByName(dups).drop("_idx")


def hot_key_feed(
    spark: SparkSession, n_events: int, text_bytes: int = 0, seed: int = 7
) -> DataFrame:
    """The north rule's hot-conversation pathology: ~50% of all events on
    ONE conv_id (across its turn space), the rest spread uniformly. The
    single shared construction for tests/test_skew.py and
    tools/bench_skew.py, so the benchmarked distribution is exactly the
    correctness-tested one. ``text_bytes`` pads texts (wide-payload skew,
    BENCH.md §2b-wide)."""
    base = change_events(spark, n_events // 2, n_convs=max(n_events // 200, 10))
    hot = (
        change_events(spark, n_events // 2, n_convs=1, seed=seed)
        .withColumn("conv_id", F.lit("conv-hot"))
        .withColumn("lsn", F.col("lsn") + 100_000_000)
    )
    # text must restate the rewritten conv/lsn (the generator's invariant
    # "surviving text carries its key and max lsn" is what the skew tests'
    # oracles check)
    hot = hot.withColumn(
        "text",
        F.format_string(
            "turn text %s/%s @lsn=%s",
            F.col("conv_id"),
            F.col("turn_idx").cast("string"),
            F.col("lsn").cast("string"),
        ),
    )
    feed = base.unionByName(hot)
    if text_bytes:
        feed = feed.withColumn("text", F.rpad(F.col("text"), text_bytes, "x"))
    return feed


def write_feed(
    df: DataFrame,
    path: str,
    n_files: int,
) -> None:
    """Materialize the feed as ``n_files`` parquet files ordered by LSN range.

    Each file is a contiguous LSN slice — the unit of arrival for the
    streaming source (``maxFilesPerTrigger=1`` replays the WAL in order, but
    the engine is also correct under any file->batch assignment because
    dedup orders by LSN, not arrival)."""
    (
        df.repartitionByRange(n_files, "lsn")
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .parquet(path)
    )
