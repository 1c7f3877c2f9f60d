"""Expression tree — the engine's predicate/projection language.

Mirrors the expression surface bullet-core exposes and the reference
exercises (SURVEY.md §2.2; /root/reference src/test/java/com/yahoo/bullet/
storm/FilterBoltTest.java:268-285,328-330,566-617: FieldExpression,
ValueExpression, ListExpression, BinaryExpression, CastExpression over
operations AND/OR/EQUALS/NOT_EQUALS/GREATER_THAN/EQUALS_ANY/NOT_EQUALS_ALL
plus bullet-core's remaining comparators, arithmetic, and unary string/size
ops).

Every node compiles two ways from the same tree:

* ``to_column()`` -> a PySpark ``Column`` (JVM-side, inside whole-stage
  codegen — never a Python UDF), and
* ``to_sql(dialect)`` -> an equivalent SQL fragment for the DuckDB
  correctness oracle (dialect differences — e.g. DuckDB's
  ``regexp_replace(..., 'g')`` flag, 1-based list indexing — are handled
  here so higher layers emit one tree and get both programs).

Keeping a single source tree for both programs is what guarantees the
driver's Spark-vs-DuckDB hash comparison is comparing the same semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F


class Dialect(str, Enum):
    SPARK = "spark"
    DUCKDB = "duckdb"


class Operation(str, Enum):
    """Operations of bullet-core's Operation enum (comparison/logic/membership
    exercised at FilterBoltTest.java:71-77; arithmetic and unary string ops in
    bullet-core's public BQL surface, SURVEY.md §2.6)."""

    # binary comparison
    EQUALS = "=="
    NOT_EQUALS = "!="
    GREATER_THAN = ">"
    LESS_THAN = "<"
    GREATER_EQUALS = ">="
    LESS_EQUALS = "<="
    REGEX_LIKE = "RLIKE"
    SIZE_IS = "SIZEIS"
    CONTAINS_KEY = "CONTAINSKEY"
    CONTAINS_VALUE = "CONTAINSVALUE"
    # membership (EQUALS_ANY ~ IN, NOT_EQUALS_ALL ~ NOT IN)
    IN = "IN"
    NOT_IN = "NOT IN"
    # logic
    AND = "AND"
    OR = "OR"
    XOR = "XOR"
    NOT = "NOT"
    # arithmetic
    ADD = "+"
    SUB = "-"
    MUL = "*"
    DIV = "/"
    MOD = "%"
    # unary / scalar functions
    SIZEOF = "SIZEOF"
    TRIM = "TRIM"
    LOWER = "LOWER"
    UPPER = "UPPER"
    ABS = "ABS"
    IS_NULL = "ISNULL"
    IS_NOT_NULL = "ISNOTNULL"
    # ternary
    IF = "IF"


# type names accepted by CastExpression: bullet-core Type enum primitives
# (SURVEY.md §1.1) -> (spark ddl, duckdb ddl)
_CAST_TYPES: dict[str, tuple[str, str]] = {
    "BOOLEAN": ("boolean", "BOOLEAN"),
    "INTEGER": ("int", "INTEGER"),
    "LONG": ("bigint", "BIGINT"),
    "FLOAT": ("float", "FLOAT"),
    "DOUBLE": ("double", "DOUBLE"),
    "STRING": ("string", "VARCHAR"),
    "DATE": ("date", "DATE"),
    "TIMESTAMP": ("timestamp", "TIMESTAMP"),
}


def _sql_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, float):
        # bare fraction literals parse as DECIMAL in both SQL dialects
        # (DuckDB: 0.1 -> DECIMAL(2,1); Spark SQL: 0.1 -> DECIMAL(1,1))
        # while F.lit(0.1) is DOUBLE — pin the literal to DOUBLE so
        # arithmetic/result types can't drift from the Spark program
        if value != value:  # NaN
            return "CAST('NaN' AS DOUBLE)"
        if value in (float("inf"), float("-inf")):
            sign = "-" if value < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        return f"CAST({value!r} AS DOUBLE)"
    return str(value)


class Expression:
    """Base node. Subclasses implement to_column / to_sql."""

    def to_column(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:  # pragma: no cover
        raise NotImplementedError

    # sugar so trees read naturally in query definitions / tests
    def __and__(self, other: "Expression") -> "Expression":
        return NAryExpression([self, other], Operation.AND)

    def __or__(self, other: "Expression") -> "Expression":
        return NAryExpression([self, other], Operation.OR)

    def __invert__(self) -> "Expression":
        return UnaryExpression(self, Operation.NOT)


ExprLike = Union[Expression, str]


def ensure_expr(e: ExprLike) -> Expression:
    """Accept either a tree node or a raw field name string."""
    if isinstance(e, Expression):
        return e
    return FieldExpression(e)


@dataclass
class FieldExpression(Expression):
    """Reference: FieldExpression("f") / FieldExpression("m", "sub") for
    nested map access (FilterBoltTest.java:269-270,328)."""

    field: str
    subfield: str | None = None

    def to_column(self) -> Column:
        col = F.col(self.field)
        return col[self.subfield] if self.subfield is not None else col

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        if self.subfield is None:
            return self.field
        if dialect == Dialect.DUCKDB:
            return f"{self.field}['{self.subfield}']"
        return f"{self.field}['{self.subfield}']"


@dataclass
class ValueExpression(Expression):
    """Literal (FilterBoltTest.java:330,575,583)."""

    value: Any

    def to_column(self) -> Column:
        return F.lit(self.value)

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        return _sql_literal(self.value)


@dataclass
class ListExpression(Expression):
    """Literal list (FilterBoltTest.java:571-572). Used with IN / NOT IN."""

    values: Sequence[Expression]

    def to_column(self) -> Column:
        return F.array(*[v.to_column() for v in self.values])

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        inner = ", ".join(v.to_sql(dialect) for v in self.values)
        return f"[{inner}]" if dialect == Dialect.DUCKDB else f"array({inner})"


@dataclass
class CastExpression(Expression):
    """CastExpression(expr, Type.INTEGER) — FilterBoltTest.java:579."""

    operand: Expression
    type_name: str

    def __post_init__(self) -> None:
        key = self.type_name.upper()
        if key not in _CAST_TYPES:
            raise ValueError(f"unsupported cast type: {self.type_name}")
        self.type_name = key

    def to_column(self) -> Column:
        return self.operand.to_column().cast(_CAST_TYPES[self.type_name][0])

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        ddl = _CAST_TYPES[self.type_name][1]
        return f"CAST({self.operand.to_sql(dialect)} AS {ddl})"


@dataclass
class UnaryExpression(Expression):
    operand: Expression
    op: Operation

    def to_column(self) -> Column:
        c = self.operand.to_column()
        if self.op == Operation.NOT:
            return ~c
        if self.op == Operation.SIZEOF:
            return F.size(c)
        if self.op == Operation.TRIM:
            return F.trim(c)
        if self.op == Operation.LOWER:
            return F.lower(c)
        if self.op == Operation.UPPER:
            return F.upper(c)
        if self.op == Operation.ABS:
            return F.abs(c)
        if self.op == Operation.IS_NULL:
            return c.isNull()
        if self.op == Operation.IS_NOT_NULL:
            return c.isNotNull()
        raise ValueError(f"unsupported unary op {self.op}")

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        s = self.operand.to_sql(dialect)
        if self.op == Operation.NOT:
            return f"(NOT {s})"
        if self.op == Operation.SIZEOF:
            return f"len({s})" if dialect == Dialect.DUCKDB else f"size({s})"
        if self.op == Operation.TRIM:
            return f"trim({s})"
        if self.op == Operation.LOWER:
            return f"lower({s})"
        if self.op == Operation.UPPER:
            return f"upper({s})"
        if self.op == Operation.ABS:
            return f"abs({s})"
        if self.op == Operation.IS_NULL:
            return f"({s} IS NULL)"
        if self.op == Operation.IS_NOT_NULL:
            return f"({s} IS NOT NULL)"
        raise ValueError(f"unsupported unary op {self.op}")


@dataclass
class BinaryExpression(Expression):
    """BinaryExpression(l, r, op) — FilterBoltTest.java:328-330,567-586."""

    left: Expression
    right: Expression
    op: Operation

    def to_column(self) -> Column:
        l, r = self.left.to_column(), self.right.to_column()
        op = self.op
        if op == Operation.EQUALS:
            return l == r
        if op == Operation.NOT_EQUALS:
            return l != r
        if op == Operation.GREATER_THAN:
            return l > r
        if op == Operation.LESS_THAN:
            return l < r
        if op == Operation.GREATER_EQUALS:
            return l >= r
        if op == Operation.LESS_EQUALS:
            return l <= r
        if op == Operation.REGEX_LIKE:
            return l.rlike(self._regex_pattern())
        if op == Operation.SIZE_IS:
            return F.size(l) == r
        if op == Operation.CONTAINS_KEY:
            return F.map_contains_key(l, r)
        if op == Operation.CONTAINS_VALUE:
            return F.array_contains(F.map_values(l), r)
        if op == Operation.IN:
            return F.array_contains(r, l)
        if op == Operation.NOT_IN:
            return ~F.array_contains(r, l)
        if op == Operation.ADD:
            return l + r
        if op == Operation.SUB:
            return l - r
        if op == Operation.MUL:
            return l * r
        if op == Operation.DIV:
            return l / r
        if op == Operation.MOD:
            return l % r
        if op == Operation.XOR:
            return l.cast("boolean") != r.cast("boolean")
        raise ValueError(f"unsupported binary op {op}")

    def _regex_pattern(self) -> str:
        if not isinstance(self.right, ValueExpression) or not isinstance(
            self.right.value, str
        ):
            raise ValueError("REGEX_LIKE requires a string literal pattern")
        return self.right.value

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        l, r = self.left.to_sql(dialect), self.right.to_sql(dialect)
        op = self.op
        simple = {
            Operation.EQUALS: "=",
            Operation.NOT_EQUALS: "<>",
            Operation.GREATER_THAN: ">",
            Operation.LESS_THAN: "<",
            Operation.GREATER_EQUALS: ">=",
            Operation.LESS_EQUALS: "<=",
            Operation.ADD: "+",
            Operation.SUB: "-",
            Operation.MUL: "*",
            Operation.DIV: "/",
            Operation.MOD: "%",
        }
        if op in simple:
            return f"({l} {simple[op]} {r})"
        if op == Operation.REGEX_LIKE:
            if dialect == Dialect.DUCKDB:
                return f"regexp_matches({l}, {r})"
            return f"({l} RLIKE {r})"
        if op == Operation.SIZE_IS:
            size = f"len({l})" if dialect == Dialect.DUCKDB else f"size({l})"
            return f"({size} = {r})"
        if op == Operation.CONTAINS_KEY:
            return (
                f"map_contains_key({l}, {r})"
                if dialect == Dialect.SPARK
                else f"(map_extract({l}, {r}) IS NOT NULL)"
            )
        if op == Operation.CONTAINS_VALUE:
            return (
                f"array_contains(map_values({l}), {r})"
                if dialect == Dialect.SPARK
                else f"list_contains(map_values({l}), {r})"
            )
        if op in (Operation.IN, Operation.NOT_IN):
            # render as IN-list when the right side is a literal list
            if isinstance(self.right, ListExpression):
                inner = ", ".join(v.to_sql(dialect) for v in self.right.values)
                kw = "IN" if op == Operation.IN else "NOT IN"
                return f"({l} {kw} ({inner}))"
            fn = "list_contains" if dialect == Dialect.DUCKDB else "array_contains"
            base = f"{fn}({r}, {l})"
            return base if op == Operation.IN else f"(NOT {base})"
        if op == Operation.XOR:
            return f"(CAST({l} AS BOOLEAN) <> CAST({r} AS BOOLEAN))"
        raise ValueError(f"unsupported binary op {op}")


@dataclass
class NAryExpression(Expression):
    """AND/OR trees of arbitrary width (FilterBoltTest.java:566-617) and
    IF(cond, then, else)."""

    operands: Sequence[Expression]
    op: Operation

    def to_column(self) -> Column:
        cols = [o.to_column() for o in self.operands]
        if self.op == Operation.AND:
            out = cols[0]
            for c in cols[1:]:
                out = out & c
            return out
        if self.op == Operation.OR:
            out = cols[0]
            for c in cols[1:]:
                out = out | c
            return out
        if self.op == Operation.IF:
            if len(cols) != 3:
                raise ValueError("IF takes exactly 3 operands")
            return F.when(cols[0], cols[1]).otherwise(cols[2])
        raise ValueError(f"unsupported n-ary op {self.op}")

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        parts = [o.to_sql(dialect) for o in self.operands]
        if self.op in (Operation.AND, Operation.OR):
            joiner = f" {self.op.name} "
            return "(" + joiner.join(parts) + ")"
        if self.op == Operation.IF:
            return f"(CASE WHEN {parts[0]} THEN {parts[1]} ELSE {parts[2]} END)"
        raise ValueError(f"unsupported n-ary op {self.op}")


@dataclass
class SqlExpression(Expression):
    """Escape hatch: a raw SQL fragment valid in BOTH Spark SQL and DuckDB
    (use only dialect-shared syntax), or per-dialect overrides."""

    sql: str
    duckdb_sql: str | None = None

    def to_column(self) -> Column:
        return F.expr(self.sql)

    def to_sql(self, dialect: Dialect = Dialect.DUCKDB) -> str:
        if dialect == Dialect.DUCKDB and self.duckdb_sql is not None:
            return self.duckdb_sql
        return self.sql


# ---------------------------------------------------------------------------
# convenience constructors (used heavily by tests and __spark_entry__)
# ---------------------------------------------------------------------------

def fld(name: str, sub: str | None = None) -> FieldExpression:
    return FieldExpression(name, sub)


def val(v: Any) -> ValueExpression:
    return ValueExpression(v)


def lst(*values: Any) -> ListExpression:
    return ListExpression([v if isinstance(v, Expression) else val(v) for v in values])


def binop(left: ExprLike, op: Operation, right: Expression) -> BinaryExpression:
    return BinaryExpression(ensure_expr(left), right, op)


def eq(left: ExprLike, v: Any) -> BinaryExpression:
    return binop(left, Operation.EQUALS, v if isinstance(v, Expression) else val(v))


def neq(left: ExprLike, v: Any) -> BinaryExpression:
    return binop(left, Operation.NOT_EQUALS, v if isinstance(v, Expression) else val(v))


def gt(left: ExprLike, v: Any) -> BinaryExpression:
    return binop(left, Operation.GREATER_THAN, v if isinstance(v, Expression) else val(v))


def gte(left: ExprLike, v: Any) -> BinaryExpression:
    return binop(left, Operation.GREATER_EQUALS, v if isinstance(v, Expression) else val(v))


def lt(left: ExprLike, v: Any) -> BinaryExpression:
    return binop(left, Operation.LESS_THAN, v if isinstance(v, Expression) else val(v))


def lte(left: ExprLike, v: Any) -> BinaryExpression:
    return binop(left, Operation.LESS_EQUALS, v if isinstance(v, Expression) else val(v))


def isin(left: ExprLike, *values: Any) -> BinaryExpression:
    return binop(left, Operation.IN, lst(*values))


def not_isin(left: ExprLike, *values: Any) -> BinaryExpression:
    return binop(left, Operation.NOT_IN, lst(*values))
