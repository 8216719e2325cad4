"""Vector math over ARRAY<FLOAT/DOUBLE> columns — pure SQL higher-order
functions, no UDFs, no MLlib types (SURVEY §7: arrays stay first-class).

Reference parity: ``Vector3D.distanceFromVector`` intends cosine distance
``1 − a·b/(‖a‖‖b‖)`` (ProcessData.java:567-576) but is broken by Java's XOR
operator (SURVEY Appendix A, B1); this module implements the evident intent,
for any dimensionality (the reference parses exactly 3 single-digit dims,
ProcessData.java:554-556 — Q5).

Determinism contract: elements are cast to DOUBLE *before* multiplying and
accumulated sequentially — bit-identical with DuckDB's
``list_sum(list_transform(...))`` over the same parquet floats (verified), so
cosine scores need no rounding in the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-accumulation dot product in DOUBLE."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """NULL for zero-norm inputs (round 6): cosine is undefined there, and
    the two engines must agree on that — DuckDB's divide-by-zero yields NULL
    natively, while ANSI Spark throws DIVIDE_BY_ZERO (even for DOUBLE), so a
    single zero embedding — routine at corpus scale: dead rows, padding —
    crashed every similarity query. ``try_divide`` restores the IEEE-style
    total function with DuckDB's exact semantics; non-zero denominators are
    bit-identical to plain division."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """Engine function for the reference's A13 kernel (correct math)."""
    return F.lit(1.0) - cosine_similarity(a, b)


# --- DuckDB oracle fragments (same math, same accumulation order) ---


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duck_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def duck_cosine_similarity(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"


def duck_cosine_distance(a: str, b: str) -> str:
    return f"(1.0 - {duck_cosine_similarity(a, b)})"
