"""Coverage for the remaining expression operations: XOR, SIZEOF, TRIM,
LOWER/UPPER, ABS, IS NULL, SIZE_IS, CONTAINS_KEY/VALUE, MOD, IF-chains —
each checked in Column form, and in SQL form where both dialects carry it."""

import duckdb
import pytest

from bullet_storm_spark.plans.expressions import (
    BinaryExpression,
    Dialect,
    NAryExpression,
    Operation,
    UnaryExpression,
    fld,
    val,
)


def b(l, op, r):
    return BinaryExpression(l, r, op)


def u(x, op):
    return UnaryExpression(x, op)


@pytest.fixture(scope="module")
def rows_df(spark):
    return spark.createDataFrame(
        [
            (" Pad ", [1, 2, 3], {"a": 1, "b": 2}, -7, True, False),
            ("x", [9], {"z": 9}, 4, False, False),
            (None, [], {}, 0, True, True),
        ],
        "s string, arr array<int>, m map<string,int>, n int, p boolean, q boolean",
    )


def one_col(df, expr):
    return [r[0] for r in df.select(expr.to_column()).collect()]


def test_unary_ops(rows_df):
    assert one_col(rows_df, u(fld("s"), Operation.TRIM)) == ["Pad", "x", None]
    assert one_col(rows_df, u(fld("s"), Operation.LOWER)) == [" pad ", "x", None]
    assert one_col(rows_df, u(fld("s"), Operation.UPPER)) == [" PAD ", "X", None]
    assert one_col(rows_df, u(fld("n"), Operation.ABS)) == [7, 4, 0]
    assert one_col(rows_df, u(fld("arr"), Operation.SIZEOF)) == [3, 1, 0]
    assert one_col(rows_df, u(fld("s"), Operation.IS_NULL)) == [False, False, True]
    assert one_col(rows_df, u(fld("s"), Operation.IS_NOT_NULL)) == [True, True, False]


def test_xor_mod_size_is(rows_df):
    assert one_col(rows_df, b(fld("p"), Operation.XOR, fld("q"))) == [
        True,
        False,
        False,
    ]
    assert one_col(rows_df, b(fld("n"), Operation.MOD, val(3))) == [-1, 1, 0]
    assert one_col(rows_df, b(fld("arr"), Operation.SIZE_IS, val(3))) == [
        True,
        False,
        False,
    ]


def test_map_membership(rows_df):
    assert one_col(rows_df, b(fld("m"), Operation.CONTAINS_KEY, val("a"))) == [
        True,
        False,
        False,
    ]
    assert one_col(rows_df, b(fld("m"), Operation.CONTAINS_VALUE, val(9))) == [
        False,
        True,
        False,
    ]


def test_if_chain(rows_df):
    expr = NAryExpression(
        [
            b(fld("n"), Operation.LESS_THAN, val(0)),
            val("neg"),
            NAryExpression(
                [b(fld("n"), Operation.EQUALS, val(0)), val("zero"), val("pos")],
                Operation.IF,
            ),
        ],
        Operation.IF,
    )
    assert one_col(rows_df, expr) == ["neg", "pos", "zero"]


def test_scalar_sql_twin_parity():
    """The DuckDB rendering of scalar ops must evaluate identically."""
    con = duckdb.connect()
    cases = [
        (u(val(" Pad "), Operation.TRIM), "Pad"),
        (u(val("AbC"), Operation.LOWER), "abc"),
        (u(val(-7), Operation.ABS), 7),
        (b(val(10), Operation.MOD, val(3)), 1),
        (b(val(True), Operation.XOR, val(False)), True),
        (
            NAryExpression([val(True), val(1), val(2)], Operation.IF),
            1,
        ),
    ]
    for expr, expected in cases:
        got = con.sql(f"SELECT {expr.to_sql(Dialect.DUCKDB)}").fetchone()[0]
        assert got == expected, expr
