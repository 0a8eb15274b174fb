"""Text expression builders: normalization, tokenization, shingling,
hashing-based signatures.

Two MinHash hash families on purpose:
- **md5-per-seed** (in `queries.textops` t07/t08): 16 independent md5
  computations per shingle — the straightforward formulation, verifiable
  against any ANSI-SQL oracle.
- **multiply-mod family** (here, t10/t11): ONE md5 per shingle reduced to
  a 60-bit integer base, then 16 universal-hash draws
  ``(a_i * base + b_i) mod p`` (p = 2^31-1) — 16x less hashing work per
  shingle, and still exactly reproducible in plain SQL (DuckDB shares
  md5, hex→int casts, and 64-bit modular arithmetic; all intermediate
  products stay < 2^62 so ANSI overflow checking never fires). This is
  the scale path AND it carries a full value-level oracle — unlike an
  engine-private intrinsic (xxhash64), whose values no other engine can
  reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: multiply-mod universal-hash family: h_i(x) = (a_i * x + b_i) mod MINHASH_P
#: over a 60-bit base drawn from md5. p = 2^31-1 (Mersenne prime) keeps every
#: product under 2^62 — safe for ANSI-mode BIGINT arithmetic in both engines.
MINHASH_P = 2_147_483_647
#: (a_i, b_i) per hash draw — deterministic, shared verbatim by the Spark
#: expressions and the generated oracle SQL (single source of truth).
MINHASH_AB = [
    ((2_654_435_761 * (i + 1)) % MINHASH_P, (40_503 * (i + 7) + 12_345) % MINHASH_P)
    for i in range(64)
]


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


def minhash_base(shingle_col: Column | str) -> Column:
    """60-bit integer base of a shingle (one md5, hex-prefix → BIGINT),
    reduced mod MINHASH_P. DuckDB twin:
    ``CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % p``."""
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        F.lit(MINHASH_P),
    )


def minhash_signature_fast(
    base_col: Column | str, n_hashes: int = 16
) -> list[Column]:
    """Multiply-mod MinHash draws over a precomputed ``minhash_base``
    column: aggregate each with F.min() grouped by document. One md5 per
    shingle total (vs one per (shingle, seed) in the md5-family twin in
    queries.textops) — the 100 TB path, with exact oracle parity via the
    shared MINHASH_AB constants."""
    b = F.col(base_col) if isinstance(base_col, str) else base_col
    return [
        F.pmod(F.lit(MINHASH_AB[i][0]) * b + F.lit(MINHASH_AB[i][1]),
               F.lit(MINHASH_P)).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
