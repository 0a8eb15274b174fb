"""Text expression builders: normalization, tokenization, shingling,
hashing-based signatures.

Two hash families on purpose:
- **md5** variants (in `queries.textops`) are cross-engine reproducible —
  the correctness-gate path, verifiable against any ANSI-SQL oracle.
- **xxhash64** variants here are the scale path: Spark's native 64-bit
  hash is one codegen intrinsic per row (no hex-string materialization),
  measured ~3x faster on the MinHash pipeline at sf0.1. Same algorithmic
  structure, engine-private hash values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column | str = "text") -> Column:
    """Lowercase + collapse whitespace runs to single spaces."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def shingles(col: Column | str = "text", n: int = 3) -> Column:
    """Distinct word n-shingles; empty array for texts shorter than n
    tokens (guarded: sequence(1, size-n+1) would run descending)."""
    t = tokens(col)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def simhash32(tok: Column) -> Column:
    """Per-token 32-bit hash for SimHash voting (md5-hex based, matching
    the oracle-checkable pipeline in queries.textops)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def minhash_signature_fast(
    shingle_col: Column | str, n_hashes: int = 16
) -> list[Column]:
    """xxhash64-based MinHash signature of an exploded shingle column:
    aggregate each of these with F.min() grouped by document. One codegen
    hash per (shingle, seed) — the 100 TB path (the md5 twin lives in
    queries.textops for oracle parity)."""
    return [
        F.xxhash64(F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col,
                   F.lit(seed)).alias(f"mh_{seed}")
        for seed in range(n_hashes)
    ]
