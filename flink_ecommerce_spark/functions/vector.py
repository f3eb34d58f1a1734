"""Embedding/vector math as built-in Spark higher-order functions.

All of these stay JVM-side (TransformExpression inside whole-stage
codegen) — no Python UDF, no Arrow round-trip — so a brute-force
cosine scan is a pure map over the big side and scales linearly with
executors. Arrays are cast element-wise to double first so results
match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sum of element-wise products, accumulated left-to-right in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """``dot`` specialised to fixed-length-``dim`` arrays: the same
    left-to-right double accumulation unrolled into a chain of
    GetArrayItem multiplies, which (unlike higher-order functions,
    which Spark evaluates interpreted, allocating three intermediate
    arrays per call) whole-stage-codegens. IEEE-identical to
    ``dot``: the products and the addition order are the same, and
    ``0.0 + x == x`` exactly for every double x (a -0.0 first product
    folds to +0.0, which cannot change any later sum or comparison).
    Falls back to ``dot`` for rows whose arrays are not length
    ``dim`` (element_at past the end would return NULL), so the
    expression is total. Used on pair-join hot paths (guide §4.1:
    prefer codegen'd built-ins; the HOF form costs ~64 interpreted
    lambda evaluations + 3 array allocations per PAIR)."""
    s: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        s = s + F.element_at(a, i).cast("double") * F.element_at(
            b, i
        ).cast("double")
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), s
    ).otherwise(dot(a, b))


def cosine_from_parts(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot and per-vector norms — the
    pair-join form: norms are per-VECTOR quantities, so computing them
    once per row before the join (n + q evaluations) instead of
    inside the pair expression (n x q) removes the dominant term of
    the scoring cost. Bit-identical to cosine_sim: same products,
    same accumulation order, same zero-vector guard."""
    return dot_col / F.greatest(norm_a * norm_b, F.lit(1e-12))


def cosine_sim(a: Column, b: Column) -> Column:
    # greatest(denom, 1e-12) is a branch-free zero-vector guard: a
    # zero vector's cosine against anything is exactly 0.0 instead of
    # 0/0 = NaN (which orders differently across engines). Real
    # embedding norms are O(1), so the floor never perturbs a nonzero
    # result at 6-decimal rounding. Mirrored in sql_cosine.
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))


def sql_dot(a: str, b: str, dim: int) -> str:
    """DuckDB SQL computing dot() identically (same accumulation order)."""
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def sql_l2_norm(a: str, dim: int) -> str:
    return (
        f"sqrt(list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (x, y) -> x + y))"
    )


def sql_cosine(a: str, b: str, dim: int) -> str:
    # GREATEST(..., 1e-12) mirrors cosine_sim's zero-vector guard
    return (
        f"({sql_dot(a, b, dim)} / GREATEST("
        f"{sql_l2_norm(a, dim)} * {sql_l2_norm(b, dim)}, 1e-12))"
    )
