"""Vector math over array<float> embedding columns, dual-compiled.

The Spark forms are pure higher-order-function expressions (zip_with /
aggregate / transform): JVM-side, codegen-friendly, no Python in the hot
path. Accumulation is sequential in index order — the same order DuckDB's
list_cosine_similarity uses — so results are bit-identical across engines
(verified: 0 mismatches at round-6 over real embedding pairs).

For brute-force top-k at scale, operators/similarity.py also offers an
Arrow-batched Pandas-UDF matmul path (numpy BLAS), which is faster per row
but not bit-reproducible against the oracle; the expression path is the
correctness reference.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    da, db = as_double(a), as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


# ---------------------------------------------------------------------------
# Fixed-dimension (unrolled) forms — bit-identical, whole-stage-codegen-able
# ---------------------------------------------------------------------------
# The HOF forms above are CodegenFallback: Catalyst interprets one lambda
# frame per element per row, which dominates candidate-pair stages (a
# 64-dim cosine per pair walks ~320 interpreted lambda steps). When the
# embedding dimension is statically known — every operator contract here
# pins it — the same fold unrolls into a flat arithmetic chain that
# whole-stage codegen compiles. Bit-identity: the unrolled chain
# lit(0.0) + a[0]*b[0] + a[1]*b[1] + ... evaluates in exactly the
# left-to-right order of aggregate()'s fold, each step the same IEEE
# double op on the same widened float, so results are identical to the
# HOF form (oracle-verified tri-scale; see OPTIMIZATION_r11.md).
# Null/length semantics also match: F.get() yields NULL past the end of a
# short array exactly where zip_with() pads NULL, and NULL poisons the
# whole sum in both forms. Arrays LONGER than dim would diverge (the HOF
# walks them all) — dim is a contract, not a hint.


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """``dot(as_double(a), as_double(b))`` for length-``dim`` arrays as a
    flat codegen-able expression (same fold order, same IEEE ops)."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc


def dot_lit_fixed(a: Column, plane: list[float]) -> Column:
    """``dot(as_double(a), lit(plane))`` unrolled over a Python-literal
    hyperplane (the LSH bucketing hot path)."""
    acc: Column = F.lit(0.0)
    for i, w in enumerate(plane):
        acc = acc + F.get(a, i).cast("double") * F.lit(float(w))
    return acc


def sqsum_fixed(a: Column, dim: int) -> Column:
    """Sum of squares with the HOF fold order (0.0 + x0² + x1² + ...)."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        acc = acc + x * x
    return acc


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(sqsum_fixed(a, dim))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """``cosine(a, b)`` for length-``dim`` arrays, unrolled."""
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))


def int_dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Unrolled exact integer dot (bigint) over length-``dim`` int arrays —
    value-identical to the HOF fold in any order (integer math is exact;
    |dot| <= 127² · dim stays far below 2^63)."""
    acc: Column = F.lit(0).cast("bigint")
    for i in range(dim):
        acc = acc + (F.get(a, i) * F.get(b, i)).cast("bigint")
    return acc


def cosine_sql(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


def l2_distance(a: Column, b: Column) -> Column:
    da, db = as_double(a), as_double(b)
    diff = F.zip_with(da, db, lambda x, y: x - y)
    return F.sqrt(F.aggregate(F.transform(diff, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def l2_distance_sql(a: str, b: str) -> str:
    return f"list_distance({a}::DOUBLE[], {b}::DOUBLE[])"
