"""Text-analysis & deduplication operators over the `documents` table.

The training-data-pipeline operator family (exact dedup, n-gram Jaccard
near-dup, MinHash+LSH, SimHash, language-ID, quality scoring, token
counting, fingerprinting). All pure `pyspark.sql.functions` column
expressions — no Python UDFs anywhere — so every stage stays inside
whole-stage codegen and scales by partition count.

Hash functions are md5 (identical across Spark and the DuckDB oracle), so
every operator here is exactly oracle-checkable.

Scale notes (100 TB): each operator is shingle/token-explode → hash-agg —
the explode multiplies rows ~50× but the immediately following partial
aggregation collapses them map-side before the single shuffle on doc_id
(or shingle for the pair-join). The LSH candidate join shuffles only band
signatures (16 bytes × bands per doc), never full documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.queries.base import load

# token normalization shared by every operator: lowercase, collapse runs of
# whitespace, split on single space
_NORM = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
_TOKS = f"split({_NORM}, ' ')"
# distinct word-3-shingles; guarded so <3-token docs yield an empty array
# (sequence(1, size-2) would otherwise run DESCENDING for size<3)
_SHINGLES = (
    f"CASE WHEN size({_TOKS}) >= 3 THEN "
    f"array_distinct(transform(sequence(1, size({_TOKS}) - 2), "
    f"i -> concat_ws(' ', slice({_TOKS}, i, 3)))) "
    f"ELSE CAST(array() AS array<string>) END"
)

# DuckDB twins of the above
_D_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_D_TOKS = f"string_split({_D_NORM}, ' ')"
_D_SHINGLES = (
    f"CASE WHEN len({_D_TOKS}) >= 3 THEN "
    f"list_distinct([array_to_string(({_D_TOKS})[i:i+2], ' ') "
    f"for i in range(1, len({_D_TOKS}) - 1)]) "
    f"ELSE [] END"
)

_STOP_EN = "('the','a','of','and','to','in','is')"
_STOP_ES = "('el','la','de','que','y','en','los')"
_STOP_DE = "('der','die','das','und','ist','nicht','ein')"
_STOP_FR = "('le','là','de','et','les','des','un')"
_STOP_ZH = "('的','是','不','了','在','人','我')"

#: DuckDB twin of _quality_exprs()'s composite score — single source for
#: T02_SQL and T15_SQL
_D_QUALITY = (
    f"round(0.6 * round(len(list_distinct({_D_TOKS})) / "
    f"CAST(len({_D_TOKS}) AS DOUBLE), 6) "
    f"+ 0.4 * (1 - round(len(list_filter({_D_TOKS}, t -> t IN {_STOP_EN})) "
    f"/ CAST(len({_D_TOKS}) AS DOUBLE), 6)), 6)"
)



def _with_tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("toks", F.expr(_TOKS))


_LANGS = [
    ("en", _STOP_EN), ("es", _STOP_ES), ("de", _STOP_DE),
    ("fr", _STOP_FR), ("zh", _STOP_ZH),
]


def _lang_hits() -> dict[str, F.Column]:
    """Per-language stopword hit counts over the ``toks`` column — the one
    definition shared by t03 (language ID) and t15 (curation gate)."""
    return {
        lang: F.size(F.expr(f"filter(toks, t -> t IN {stops})"))
        for lang, stops in _LANGS
    }


def _quality_exprs() -> tuple[F.Column, F.Column, F.Column]:
    """(distinct_ratio, stopword_ratio, quality) over ``toks`` — the one
    scoring definition shared by t02 and t15."""
    n = F.size("toks").cast("double")
    distinct_ratio = F.round(F.size(F.array_distinct("toks")) / n, 6)
    stop_ratio = F.round(
        F.size(F.expr(f"filter(toks, t -> t IN {_STOP_EN})")) / n, 6
    )
    quality = F.round(0.6 * distinct_ratio + 0.4 * (1 - stop_ratio), 6)
    return distinct_ratio, stop_ratio, quality


# ---------------------------------------------------------------------------
# t01 — token counting (whitespace tokenizer): per-doc token count, char
# count, chars/token. Pure narrow projection — no shuffle at all.
# ---------------------------------------------------------------------------
def t01_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.round(F.length("text").cast("double") / F.size("toks"), 4).alias(
            "chars_per_token"
        ),
    )


T01_SQL = f"""
SELECT doc_id,
       CAST(len({_D_TOKS}) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_calc,
       round(CAST(length(text) AS DOUBLE) / len({_D_TOKS}), 4) AS chars_per_token
FROM documents
"""


# ---------------------------------------------------------------------------
# t02 — quality scoring: distinct-token ratio, stopword ratio, punctuation
# ratio, and a composite score. Vectorized higher-order array functions.
# ---------------------------------------------------------------------------
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    distinct_ratio, stop_ratio, quality = _quality_exprs()
    punct_ratio = F.round(
        F.size(F.expr("regexp_extract_all(text, '[.,!?;:]', 0)"))
        / F.length("text").cast("double"),
        6,
    )
    return d.select(
        "doc_id",
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


T02_SQL = f"""
SELECT doc_id,
       round(len(list_distinct({_D_TOKS})) / CAST(len({_D_TOKS}) AS DOUBLE), 6)
           AS distinct_ratio,
       round(len(list_filter({_D_TOKS}, t -> t IN {_STOP_EN}))
             / CAST(len({_D_TOKS}) AS DOUBLE), 6) AS stopword_ratio,
       round(len(regexp_extract_all(text, '[.,!?;:]', 0))
             / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
       {_D_QUALITY} AS quality
FROM documents
"""


# ---------------------------------------------------------------------------
# t03 — language ID: stopword-hit n-gram heuristic across 5 languages,
# argmax with a fixed tie-break order (en > es > de > fr > zh).
# ---------------------------------------------------------------------------
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    hits = _lang_hits()
    en, es, de, fr, zh = (hits[k] for k in ("en", "es", "de", "fr", "zh"))
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en >= zh), "en")
        .when((es >= de) & (es >= fr) & (es >= zh), "es")
        .when((de >= fr) & (de >= zh), "de")
        .when(fr >= zh, "fr")
        .otherwise("zh")
    )
    return d.select(
        "doc_id",
        en.alias("en_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        zh.alias("zh_hits"),
        pred.alias("lang_pred"),
        F.col("lang").alias("lang_actual"),
    )


def _d_hits(stops: str) -> str:
    return f"CAST(len(list_filter({_D_TOKS}, t -> t IN {stops})) AS INTEGER)"


T03_SQL = f"""
SELECT doc_id,
       {_d_hits(_STOP_EN)} AS en_hits,
       {_d_hits(_STOP_ES)} AS es_hits,
       {_d_hits(_STOP_DE)} AS de_hits,
       {_d_hits(_STOP_FR)} AS fr_hits,
       {_d_hits(_STOP_ZH)} AS zh_hits,
       CASE
         WHEN {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_ES)}
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_DE)}
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_FR)}
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_ZH)} THEN 'en'
         WHEN {_d_hits(_STOP_ES)} >= {_d_hits(_STOP_DE)}
          AND {_d_hits(_STOP_ES)} >= {_d_hits(_STOP_FR)}
          AND {_d_hits(_STOP_ES)} >= {_d_hits(_STOP_ZH)} THEN 'es'
         WHEN {_d_hits(_STOP_DE)} >= {_d_hits(_STOP_FR)}
          AND {_d_hits(_STOP_DE)} >= {_d_hits(_STOP_ZH)} THEN 'de'
         WHEN {_d_hits(_STOP_FR)} >= {_d_hits(_STOP_ZH)} THEN 'fr'
         ELSE 'zh'
       END AS lang_pred,
       lang AS lang_actual
FROM documents
"""


# ---------------------------------------------------------------------------
# t04 — document fingerprinting: md5 of the normalized text (whitespace-
# collapsed, lowercased) + a short prefix fingerprint.
# ---------------------------------------------------------------------------
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.expr(_NORM))
    return d.select(
        "doc_id", fp.alias("fp_md5"), F.substring(fp, 1, 8).alias("fp_short")
    )


T04_SQL = f"""
SELECT doc_id, md5({_D_NORM}) AS fp_md5, substr(md5({_D_NORM}), 1, 8) AS fp_short
FROM documents
"""


# ---------------------------------------------------------------------------
# t05 — exact deduplication: hash-groupBy on content hash; canonical doc =
# min doc_id. One shuffle on the 16-byte hash, never on the text itself —
# at 100 TB the map-side projection reduces each doc to (hash, id) first.
# ---------------------------------------------------------------------------
def t05_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


T05_SQL = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# t06 — n-gram Jaccard near-dup pairs: distinct word-3-shingles, candidate
# pairs via shingle-equality self-join, exact Jaccard from shared/total
# counts. The join key is the shingle string; at scale the shingle would be
# md5-hashed first (16 bytes) — kept raw here for oracle clarity.
# ---------------------------------------------------------------------------
def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(F.expr(_SHINGLES)).alias("shingle")
    )


def t06_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # join on the 16-byte md5 of the shingle, not the raw string — at 100 TB
    # the shuffle carries fixed-width hashes instead of arbitrary text (md5
    # collisions are negligible and the oracle hashes identically)
    s = _shingled(spark, sf_dir).select("doc_id", F.md5("shingle").alias("sh"))
    counts = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = s.alias("a")
    b = s.alias("b")
    shared = (
        a.join(b, "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        shared.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.05)
    )


T06_SQL = f"""
WITH s AS (
  SELECT doc_id, md5(unnest({_D_SHINGLES})) AS sh FROM documents
),
c AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM s a JOIN s b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
       round(shared / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE), 6) AS jaccard
FROM p
JOIN c ca ON ca.doc_id = doc_a
JOIN c cb ON cb.doc_id = doc_b
WHERE round(shared / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE), 6) >= 0.05
"""


# ---------------------------------------------------------------------------
# t07 — MinHash band signatures (the LSH index): 16 md5-based min-hashes per
# doc, banded 4×4, each band collapsed to one md5 signature. This is the
# shuffle-cheap representation (bands × 16 bytes per doc) that the
# candidate join (t08) buckets on.
# ---------------------------------------------------------------------------
N_HASHES = 16
BAND_SIZE = 4


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All 16 min-hashes as agg columns of ONE pass over the shingle explode
    # (no seed-explode: 16x fewer pre-shuffle rows, map-side partial mins),
    # then bands fold locally — zero extra shuffle after the doc_id agg.
    # Hash values identical to the seed-exploded formulation the DuckDB
    # oracle uses (md5 of 'shingle#seed').
    s = _shingled(spark, sf_dir)
    minh = s.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(seed))))
            ).alias(f"mh_{seed}")
            for seed in range(N_HASHES)
        ]
    )
    bands = [
        minh.select(
            "doc_id",
            F.lit(band).alias("band"),
            F.md5(
                F.concat(
                    *[
                        F.col(f"mh_{band * BAND_SIZE + j}")
                        for j in range(BAND_SIZE)
                    ]
                )
            ).alias("band_sig"),
        )
        for band in range(N_HASHES // BAND_SIZE)
    ]
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def t07_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_bands(spark, sf_dir)


_D_MINHASH_BANDS = f"""
WITH s AS (
  SELECT doc_id, unnest({_D_SHINGLES}) AS shingle FROM documents
),
seeded AS (
  SELECT doc_id, seed, md5(concat_ws('#', shingle, CAST(seed AS VARCHAR))) AS h
  FROM s, (SELECT unnest(range(0, {N_HASHES})) AS seed) seeds
),
minh AS (
  SELECT doc_id, seed, min(h) AS minh FROM seeded GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(seed // {BAND_SIZE} AS INTEGER) AS band,
         md5(string_agg(minh, '' ORDER BY seed)) AS band_sig
  FROM minh GROUP BY 1, 2
)
"""

T07_SQL = _D_MINHASH_BANDS + "SELECT doc_id, band, band_sig FROM bands"


# ---------------------------------------------------------------------------
# t08 — MinHash+LSH candidate pairs: bucket-join on (band, band_sig); docs
# sharing ≥1 band signature are near-dup candidates. At 100 TB this is the
# only join — on 20-byte keys — and its output is tiny (true candidates).
# ---------------------------------------------------------------------------
def t08_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("bands_shared"))
    )


T08_SQL = _D_MINHASH_BANDS + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS bands_shared
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# t09 — SimHash (32-bit): per-token 32-bit hash from md5 hex, ±1 vote per
# bit weighted by token frequency, sign-threshold to a 32-bit signature.
# Near-dup docs differ in few bits (hamming distance); the signature is a
# single BIGINT per doc — trivially shuffleable at any scale.
# ---------------------------------------------------------------------------
def t09_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode("toks").alias("tok"))
    h = toks.withColumn(
        "h32", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    )
    bits = h.select(
        "doc_id",
        "h32",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
    ).withColumn(
        "vote",
        F.when(F.expr("(shiftright(h32, bit) & 1) = 1"), F.lit(1)).otherwise(-1),
    )
    per_bit = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0))
        ).alias("simhash32")
    )


T09_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents
),
h AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h32 FROM t
),
b AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h32 >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(range(0, 32)) AS bit) bits
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
           AS simhash32
FROM b GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# t10 — MinHash bands, scale path (multiply-mod family): same banding
# structure as t07 but with ONE md5 per shingle (reduced to a 60-bit int
# base) and 16 universal-hash draws (a_i*base+b_i) mod p — 16x less hashing
# work pre-aggregation, and unlike an engine-private intrinsic the values
# are exactly reproducible in the DuckDB oracle (shared md5 + hex cast +
# 64-bit modular arithmetic; constants single-sourced from functions.text).
# ---------------------------------------------------------------------------
def t10_minhash_bands_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgres_to_snowflake_data_pipeline_spark.functions.text import (
        minhash_base,
        minhash_signature_fast,
    )

    s = _shingled(spark, sf_dir).select(
        "doc_id", minhash_base("shingle").alias("base")
    )
    minh = s.groupBy("doc_id").agg(
        *[F.min(c).alias(f"mh_{i}")
          for i, c in enumerate(minhash_signature_fast("base", N_HASHES))]
    )
    bands = []
    for band in range(N_HASHES // BAND_SIZE):
        sig = F.md5(
            F.concat_ws(
                "#",
                *[F.col(f"mh_{band * BAND_SIZE + j}").cast("string")
                  for j in range(BAND_SIZE)],
            )
        )
        bands.append(
            minh.select(
                "doc_id", F.lit(band).alias("band"), sig.alias("band_sig")
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def _fast_family_sql() -> str:
    """DuckDB CTEs mirroring the multiply-mod MinHash family exactly
    (same constants as functions.text.MINHASH_AB, inlined)."""
    from postgres_to_snowflake_data_pipeline_spark.functions.text import (
        MINHASH_AB,
        MINHASH_P,
    )

    ab_rows = ",\n         ".join(
        f"({i}, {MINHASH_AB[i][0]}, {MINHASH_AB[i][1]})" for i in range(N_HASHES)
    )
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(unnest({_D_SHINGLES})), 1, 15)) AS BIGINT)
           % {MINHASH_P} AS base
  FROM documents
),
ab(seed, a, b) AS (
  VALUES {ab_rows}
),
seeded AS (
  SELECT doc_id, seed, (a * base + b) % {MINHASH_P} AS h
  FROM s CROSS JOIN ab
),
minh AS (
  SELECT doc_id, seed, min(h) AS minh FROM seeded GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(seed // {BAND_SIZE} AS INTEGER) AS band,
         md5(string_agg(CAST(minh AS VARCHAR), '#' ORDER BY seed)) AS band_sig
  FROM minh GROUP BY 1, 2
)
"""


T10_SQL = _fast_family_sql() + "SELECT doc_id, band, band_sig FROM bands"


def t11_minhash_candidates_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-join on the fast signatures (full oracle parity)."""
    bands = t10_minhash_bands_fast(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("bands_shared"))
    )


T11_SQL = _fast_family_sql() + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS bands_shared
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# t12 — TF-IDF top term per document: corpus document frequencies (one
# hash-agg over the exploded distinct tokens), idf = ln(N/df), per-doc top
# term by tf*idf. The df table is tiny (vocabulary-sized) and broadcasts.
# ---------------------------------------------------------------------------
def t12_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _with_tokens(load(spark, sf_dir, "documents"))
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row relation, not a separate driver-side
    # count() action — the whole query stays one job
    n = d.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
    )


T12_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 6) AS tfidf
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term AS top_term, tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# t13 — fuzzy near-dup pairs by edit distance: Levenshtein over the first
# 40 normalized chars, blocked on (source, first-4-chars). The block key is
# part of the operator's semantics (like LSH bands): only same-block pairs
# are compared, which bounds per-block pair counts even when one source
# dominates — blocking on source alone left the pair space near-quadratic
# per source at 100x scale. The oracle applies the identical blocking, so
# the check stays exact.
# ---------------------------------------------------------------------------
def t13_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.substring(F.expr(_NORM), 1, 40).alias("prefix"),
    ).withColumn("p4", F.substring("prefix", 1, 4))
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, ["source", "p4"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 20)
    )


T13_SQL = f"""
WITH d AS (
  SELECT doc_id, source, substr({_D_NORM}, 1, 40) AS prefix,
         substr({_D_NORM}, 1, 4) AS p4
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_dist
FROM d a JOIN d b ON a.source = b.source AND a.p4 = b.p4 AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 20
"""


# ---------------------------------------------------------------------------
# t14 — rolling-hash document fingerprint: left-fold a polynomial hash
# (acc*B + tok) mod p over the per-token 60-bit md5 bases. Order-sensitive
# (unlike the set-style md5 fingerprint t04): token transpositions change
# the fingerprint. One narrow projection, no shuffle, no UDF — the fold is
# a higher-order `aggregate` inside codegen; DuckDB's `list_reduce` is the
# oracle twin (both left-fold with the first element as init).
# ---------------------------------------------------------------------------
ROLL_B = 1_000_003
ROLL_P = 2_147_483_647

_BASES = (
    f"transform({_TOKS}, t -> pmod(CAST(conv(substr(md5(t), 1, 15), 16, 10)"
    f" AS BIGINT), {ROLL_P}))"
)


def t14_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fold = (
        f"aggregate(slice(b, 2, size(b) - 1), element_at(b, 1), "
        f"(acc, x) -> pmod(acc * {ROLL_B}L + x, {ROLL_P}L))"
    )
    return d.withColumn("b", F.expr(_BASES)).select(
        "doc_id",
        F.size("b").alias("n_tokens"),
        F.when(F.size("b") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr(fold))
        .alias("rolling_fp"),
    )


T14_SQL = f"""
WITH b AS (
  SELECT doc_id,
         list_transform({_D_TOKS},
             t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
                  % {ROLL_P}) AS bases
  FROM documents
)
SELECT doc_id, CAST(len(bases) AS INTEGER) AS n_tokens,
       CASE WHEN len(bases) = 0 THEN NULL
            ELSE list_reduce(bases, (acc, x) -> (acc * {ROLL_B} + x) % {ROLL_P})
       END AS rolling_fp
FROM b
"""


# ---------------------------------------------------------------------------
# t15 — corpus curation pipeline: the composite a training-data pipeline
# actually runs — language gate (t03's argmax), quality gate (t02's
# score), length gate (t01), then exact dedup on the normalized-text
# fingerprint (t04/t05) keeping the lowest doc_id. One narrow projection
# per doc, one shuffle on the 16-byte fingerprint; the text column never
# moves. All gates are the already-oracled expressions composed verbatim.
# ---------------------------------------------------------------------------
MIN_TOKENS = 15
MIN_QUALITY = 0.58


def t15_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load(spark, sf_dir, "documents"))
    hits = _lang_hits()
    en, es, de, fr, zh = (hits[k] for k in ("en", "es", "de", "fr", "zh"))
    # >= 1 hit required: a doc with zero stopword hits in every language
    # must not default into the English bucket via the argmax tie-break
    is_en = (en >= 1) & (en >= es) & (en >= de) & (en >= fr) & (en >= zh)
    n = F.size("toks")
    _distinct_ratio, _stop_ratio, quality = _quality_exprs()
    gated = (
        d.select(
            "doc_id",
            n.alias("n_tokens"),
            quality.alias("quality"),
            F.md5(F.expr(_NORM)).alias("fp"),
            is_en.alias("is_en"),
        )
        .filter(
            F.col("is_en")
            & (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("quality") >= MIN_QUALITY)
        )
    )
    return (
        gated.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "n_tokens", "quality")).alias("_w"))
        .select("_w.doc_id", "_w.n_tokens", "_w.quality")
    )


T15_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CAST(len({_D_TOKS}) AS INTEGER) AS n_tokens,
         {_D_QUALITY} AS quality,
         md5({_D_NORM}) AS fp,
         ({_d_hits(_STOP_EN)} >= 1
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_ES)}
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_DE)}
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_FR)}
          AND {_d_hits(_STOP_EN)} >= {_d_hits(_STOP_ZH)}) AS is_en
  FROM documents
),
gated AS (
  SELECT * FROM m
  WHERE is_en AND n_tokens >= {MIN_TOKENS} AND quality >= {MIN_QUALITY}
)
SELECT doc_id, n_tokens, quality
FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM gated
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# t16 — stratified deterministic sample: k docs per stratum (source),
# selected by smallest md5(doc_id) — the distributed "hash sampling"
# pattern (cf. stratified sampling over streaming/stored data, EDBT'19):
# seed-free, replayable, and independent of row order, so the same sample
# comes back at any parallelism or scale-out. Catalyst plans the rank
# filter as WindowGroupLimit (partial per-partition top-k BEFORE the
# shuffle — pinned in tests/test_plans.py), so each stratum moves only
# ~k rows per input partition, never the whole stratum.
# ---------------------------------------------------------------------------
SAMPLE_K = 5


def t16_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("source", "doc_id", F.col("rk").cast("int").alias("rk"))
    )


T16_SQL = f"""
SELECT source, doc_id, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
WHERE rk <= {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# t20 — repetition / boilerplate scoring (Gopher-style quality filter,
# Rae et al. 2021 §A1.1, public paper): per-document duplicate-word
# fraction, most-frequent-word share and duplicate-5-gram fraction, each
# computed ENTIRELY inside the row with higher-order array functions — no
# explode, no token ever crosses a shuffle (the only exchange is the
# ORDER BY on (doc_id)-sized rows). The in-row top-word count is
# O(distinct × n) per doc, the right trade at corpus scale: CPU inside
# whole-stage codegen instead of a (doc_id, word) shuffle that would dwarf
# the data. Reference analog: the reference's cleanse stage drops rows by
# shape only (/root/reference/scripts/load_data.py:73-96); content-quality
# scoring is engine capability on top.
# ---------------------------------------------------------------------------
_GRAMS5 = (
    f"CASE WHEN size({_TOKS}) >= 5 THEN "
    f"transform(sequence(1, size({_TOKS}) - 4), "
    f"i -> concat_ws(' ', slice({_TOKS}, i, 5))) "
    f"ELSE CAST(array() AS array<string>) END"
)

#: flag thresholds (Gopher uses 0.2 / 0.3-family cutoffs; exact values are
#: corpus policy, not engine semantics)
REP_TOP_WORD_MAX = 0.2
REP_DUP_GRAM_MAX = 0.1


def t20_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.expr(_TOKS)
    n = F.size(toks)
    grams = F.expr(_GRAMS5)
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    )
    dup_word = F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)) / n.cast("double"), 6
    )
    top_word = F.round(top / n.cast("double"), 6)
    dup_gram = F.when(
        n >= 5,
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        d.select(
            "doc_id",
            n.alias("n_words"),
            dup_word.alias("dup_word_frac"),
            top_word.alias("top_word_frac"),
            dup_gram.alias("dup_5gram_frac"),
        )
        .withColumn(
            "is_repetitive",
            (F.col("top_word_frac") > REP_TOP_WORD_MAX)
            | (F.col("dup_5gram_frac") > REP_DUP_GRAM_MAX),
        )
        .orderBy("doc_id")
    )


T20_SQL = f"""
WITH t AS (
  SELECT doc_id, {_D_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id, len(toks) AS n_words,
    round(1 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6)
      AS dup_word_frac,
    round(list_max([len(list_filter(toks, x -> x = w))
                    for w in list_distinct(toks)])
          / CAST(len(toks) AS DOUBLE), 6) AS top_word_frac,
    CASE WHEN len(toks) >= 5 THEN
      round(1 - len(list_distinct([array_to_string(toks[i:i+4], ' ')
                                   for i in range(1, len(toks) - 3)]))
            / CAST(len(toks) - 4 AS DOUBLE), 6)
    ELSE 0.0 END AS dup_5gram_frac
  FROM t
)
SELECT doc_id, n_words, dup_word_frac, top_word_frac, dup_5gram_frac,
       (top_word_frac > {REP_TOP_WORD_MAX} OR dup_5gram_frac > {REP_DUP_GRAM_MAX})
         AS is_repetitive
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# t21 — benchmark decontamination (the training-data hygiene pass every
# public LLM corpus pipeline runs, e.g. GPT-3 App. C / PaLM App. D,
# public papers: drop training docs that share a long n-gram with an
# evaluation set). Benchmark set here: every 50th doc_id (deterministic
# stand-in for a small eval suite). A corpus doc is contaminated when it
# shares >= 1 distinct 13-gram with any benchmark doc.
#
# Scale shape: the benchmark side is SMALL by construction (eval suites
# are KBs against a 100 TB corpus), so its distinct-gram set is
# BROADCAST — the corpus side streams map-side through the hash join,
# and only (doc_id, 16-byte gram hash) pairs of actual HITS reach the
# final per-doc aggregate. No corpus-vs-corpus shuffle exists anywhere.
# ---------------------------------------------------------------------------
_GRAMS13 = (
    f"CASE WHEN size({_TOKS}) >= 13 THEN "
    f"array_distinct(transform(sequence(1, size({_TOKS}) - 12), "
    f"i -> concat_ws(' ', slice({_TOKS}, i, 13)))) "
    f"ELSE CAST(array() AS array<string>) END"
)
BENCH_MOD = 50  # doc_id % BENCH_MOD == 0 -> benchmark member


def t21_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(F.expr(_GRAMS13)).alias("gram")
    ).select("doc_id", F.md5("gram").alias("g"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = grams.filter(is_bench).select(
        F.col("doc_id").alias("bench_doc"), "g"
    )
    hits = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("bench_doc").alias("n_benchmark_docs"),
        )
    )
    # the pass LABELS every corpus doc (clean docs carry zero counts) —
    # that is the shape a downstream filter consumes, and it puts the
    # whole corpus under the value-hash check, not just the hits
    return (
        d.filter(~is_bench)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            F.coalesce("n_benchmark_docs", F.lit(0)).alias(
                "n_benchmark_docs"
            ),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


T21_SQL = f"""
WITH t AS (
  SELECT doc_id, {_D_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id,
         md5(unnest(CASE WHEN len(toks) >= 13 THEN
             list_distinct([array_to_string(toks[i:i+12], ' ')
                            for i in range(1, len(toks) - 11)])
             ELSE [] END)) AS g
  FROM t
)
, h AS (
  SELECT c.doc_id,
         CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_grams,
         CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_benchmark_docs
  FROM g c JOIN g b USING (g)
  WHERE c.doc_id % {BENCH_MOD} <> 0 AND b.doc_id % {BENCH_MOD} = 0
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(h.n_shared_grams, 0) AS n_shared_grams,
       coalesce(h.n_benchmark_docs, 0) AS n_benchmark_docs,
       coalesce(h.n_shared_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
WHERE d.doc_id % {BENCH_MOD} <> 0
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# t22 — PII detection + redaction (the scrubbing pass every public
# training-corpus pipeline runs before release: mask emails, IPv4
# addresses and phone numbers, count what was hit). The generator's
# corpus is deliberately PII-free, so the query PLANTS deterministic
# PII derived from doc_id first — both engines build the identical
# augmented text, then the redaction semantics (regex sweep order,
# global replacement, per-class hit counts, md5 of the scrubbed text)
# are checked value-for-value. Same planted-fixture approach as the
# ANN recall tests (random data would exercise nothing).
#
# Scale shape: pure per-row regexp column expressions — no shuffle at
# all except the presentation sort; the pass streams map-side at any
# corpus size and pushes only (doc_id, text) through the scan.
# Patterns are RE2-safe (no backrefs/lookaround) so Spark (Java regex)
# and DuckDB (RE2) agree literally.
# ---------------------------------------------------------------------------
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+1-555-[0-9]{4}"
_PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

# planted suffix: every doc gets one email; every 3rd an IP; every 7th a
# phone; every 4th a SECOND email — counts vary per row so the oracle
# check is non-trivial
_PLANT_SPARK = (
    "concat(text,"
    " ' contact user', CAST(doc_id AS STRING), '@example.com',"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' host 10.', CAST(doc_id % 256 AS STRING),"
    "      '.0.', CAST(doc_id % 100 AS STRING)) ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' tel +1-555-', "
    "      lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' cc admin', CAST(doc_id AS STRING),"
    "      '@corp.example.org') ELSE '' END)"
)
_PLANT_DUCK = (
    "text ||"
    " ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)"
    "      || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||"
    " CASE WHEN doc_id % 7 = 0 THEN ' tel +1-555-' || "
    "      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||"
    " CASE WHEN doc_id % 4 = 0 THEN ' cc admin' || CAST(doc_id AS VARCHAR)"
    "      || '@corp.example.org' ELSE '' END"
)


def t22_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    planted = F.expr(_PLANT_SPARK)
    n_emails = F.size(F.regexp_extract_all(planted, F.lit(_PII_EMAIL), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(planted, F.lit(_PII_PHONE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(planted, F.lit(_PII_IPV4), F.lit(0)))
    # sweep order matters and is part of the contract: emails first (their
    # domains contain dots an aggressive IP pattern could nibble), then
    # phones, then IPs over what remains
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IPV4,
        "<IP>",
    )
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    ).orderBy("doc_id")


T22_SQL = f"""
WITH p AS (
  SELECT doc_id, {_PLANT_DUCK} AS planted FROM documents
),
s AS (
  SELECT doc_id, planted,
         regexp_replace(
           regexp_replace(
             regexp_replace(planted, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g') AS scrubbed
  FROM p
)
SELECT doc_id,
       CAST(len(regexp_extract_all(planted, '{_PII_EMAIL}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(planted, '{_PII_PHONE}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(planted, '{_PII_IPV4}')) AS INTEGER)  AS n_ips,
       CAST(length(scrubbed) AS INTEGER) AS scrubbed_len,
       md5(scrubbed) AS scrubbed_md5
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# t23 — mixture sampling under per-source token budgets: the data-mixing
# stage of a training pipeline (each source gets a token budget from its
# mixture weight; the best documents fill the budget greedily). Weights
# here derive deterministically from the source id (w = 1 + src_num % 3,
# budget = 800 * w tokens); ranking is the t02/t15 quality composite with
# doc_id as the total-order tie-break; a document is kept while the
# cumulative token count INCLUDING it fits the budget (greedy prefix).
#
# Scale shape: tokens and quality are computed map-side from the scan; the
# single exchange partitions by SOURCE (mixture components are bounded —
# dozens, not millions), and only (doc_id, source, n_tokens, quality)
# cross it — text never shuffles (plan-pinned). A skewed giant source is
# the known hazard at 100 TB; the fix there is the same two-level
# pre-aggregation trick t16 uses (per-partition top-k before the window)
# because a greedy prefix only ever needs ~budget/min_doc_tokens rows per
# source — documented, not needed at bench scale.
# ---------------------------------------------------------------------------
TOKENS_PER_WEIGHT = 800


def t23_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _with_tokens(load(spark, sf_dir, "documents"))
    _, _, quality = _quality_exprs()
    src_num = F.substring("source", 4, 10).cast("bigint")
    scored = d.select(
        "doc_id",
        "source",
        F.size("toks").alias("n_tokens"),
        quality.alias("quality"),
        (F.lit(TOKENS_PER_WEIGHT) * (1 + src_num % 3)).alias("budget"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "quality", "cum_tokens")
        .orderBy("source", "doc_id")
    )


T23_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len({_D_TOKS}) AS INTEGER) AS n_tokens,
         {_D_QUALITY} AS quality,
         {TOKENS_PER_WEIGHT} * (1 + CAST(substr(source, 4, 10) AS BIGINT) % 3)
           AS budget
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens, quality, budget,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, quality, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= budget
ORDER BY source, doc_id
"""
