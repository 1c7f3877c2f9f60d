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


def cosine_sql(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


def l2_distance(a: Column, b: Column) -> Column:
    da, db = as_double(a), as_double(b)
    diff = F.zip_with(da, db, lambda x, y: x - y)
    return F.sqrt(F.aggregate(F.transform(diff, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def l2_distance_sql(a: str, b: str) -> str:
    return f"list_distance({a}::DOUBLE[], {b}::DOUBLE[])"
