"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (zip_with / aggregate), fully JVM-side, no UDFs.

All arithmetic is done in double after an explicit cast so results are a
deterministic left-to-right fold — bit-identical to the DuckDB oracle's
``list_dot_product`` on ``DOUBLE[]`` — and so 100 TB runs never pay Python
serde for the hot similarity path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe for zero vectors via nullif (ANSI mode
    raises on x/0 — we return NULL instead, matching SQL semantics)."""
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
