"""Portable (cross-engine deterministic) hashing column builders.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so oracle-checked dedup/minhash operators can't use them. Both
engines agree bit-for-bit on ``md5`` of a UTF-8 string, so we derive a
60-bit integer hash from the first 15 hex chars of the md5 digest:

    Spark :  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT

(verified identical; e.g. 'hello' → 419982666956583591 in both). 15 hex
chars = 60 bits, always non-negative, no bigint overflow. MinHash
permutations are the classic universal-hash family ``(a*h + b) mod p`` over
that base hash, with p a large prime below 2^61 so products stay within
int128 in DuckDB… but DuckDB multiplies BIGINTs with overflow checks, so we
instead keep everything within 63 bits: permute with ``(a*h + b) % p``
computed on h reduced mod p (< 2^31), with a,b < 2^31 — products < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Modulus for minhash permutations: a Mersenne prime that fits in 31 bits,
# so a*h+b stays < 2^62 (no BIGINT overflow in either engine, ANSI-safe).
MINHASH_PRIME = 2147483647  # 2^31 - 1

# Deterministic (a, b) parameters for up to 16 permutations, generated once
# from a fixed seed (python random.Random(42)); hard-coded so the Spark side
# and the SQL oracle share them verbatim.
MINHASH_PARAMS: tuple[tuple[int, int], ...] = (
    (1363933198, 1205250120),
    (1396591604, 1431996210),
    (1424137800, 1876418924),
    (1219321346, 14107427),
    (1965967068, 1411801212),
    (1995518055, 1267311158),
    (1834672299, 1712988595),
    (1393454469, 1343869611),
    (690566613, 69493892),
    (153682871, 355292945),
    (1762906819, 1942700610),
    (1324807402, 1700833494),
    (1630851781, 546590467),
    (1391030948, 2122821019),
    (921075418, 1613813834),
    (756579438, 870124860),
)


def portable_hash64(col: Column | str) -> Column:
    """60-bit integer hash of a string column, identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL for the same hash, for oracle strings."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_perm(hash_col: Column, perm: int) -> Column:
    """The perm-th universal-hash permutation of a portable_hash64 value."""
    a, b = MINHASH_PARAMS[perm]
    p = MINHASH_PRIME
    return (F.lit(a) * (hash_col % F.lit(p)) + F.lit(b)) % F.lit(p)


def minhash_perm_sql(hash_expr: str, perm: int) -> str:
    """DuckDB SQL for the same permutation."""
    a, b = MINHASH_PARAMS[perm]
    p = MINHASH_PRIME
    return f"(({a} * ({hash_expr} % {p}) + {b}) % {p})"


def materialize_ctes(sql: str, *names: str) -> str:
    """Annotate the FIRST definition of each named CTE in a DuckDB oracle
    with AS MATERIALIZED — a pure evaluation hint (results are identical;
    DuckDB docs, "WITH Clause / Materialized CTEs"). DuckDB inlines CTEs
    by default, so a CTE referenced k times re-executes its whole upstream
    chain k times; the composite-eval oracles (blocking recall, curation
    funnel/ablation) reference family pipelines 3-7x each, which measured
    27.8 s -> 0.87 s at sf0.01 for dedup_blocking_recall_eval when the
    shared CTEs are materialized once. Only oracle TEXT changes — the
    semantics a hash gate proves are untouched."""
    import re as _re

    for name in names:
        sql = _re.sub(rf"(\b{name} AS) \(", r"\1 MATERIALIZED (", sql, count=1)
    return sql
