"""As-of (point-in-time) join — match each fact row to the latest state
row at or before its timestamp, per key.

Spark has no native ASOF JOIN; the naive formulation (inequality join +
per-fact max) explodes to O(facts x states-per-key). The scalable
composition used here is union + ordered window:

  1. tag state rows and fact rows, union them on (key, ts)
  2. one window per key ordered by (ts, state-first): last non-null state
     value at each row = the as-of match
  3. keep the fact rows

One shuffle on the key, linear work, no range explosion — the same shape
streams use for temporal joins. The DuckDB twin is its native ASOF JOIN
(inclusive >=), which pins our tie semantics: a state row AT the fact's
timestamp matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    facts: DataFrame,
    states: DataFrame,
    key: str,
    ts: str,
    state_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """facts columns + (for each state col c) ``asof_c`` = value of c from
    the latest states row with the same key and states.ts <= facts.ts.
    how='inner' drops facts with no prior state; 'left' keeps them null."""
    fact_cols = facts.columns
    fact_types = dict(facts.dtypes)
    tagged_states = states.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),  # states sort first at equal ts -> inclusive
        *[F.col(c).alias(f"__s_{c}") for c in state_cols],
        *[F.lit(None).cast(fact_types[c]).alias(f"__f_{c}") for c in fact_cols],
    )
    tagged_facts = facts.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(states.dtypes)[c]).alias(f"__s_{c}") for c in state_cols],
        *[F.col(c).alias(f"__f_{c}") for c in fact_cols],
    )
    unioned = tagged_states.unionByName(tagged_facts)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the whole latest state ROW as a struct marker: the struct is
    # non-null for every state row even when its payload columns are NULL,
    # so the latest row wins (matching native ASOF JOIN semantics) instead
    # of per-column last() skipping back to an older non-null value; the
    # same marker drives the inner-join "matched" test
    srow = F.when(
        F.col("__side") == 0,
        F.struct(*[F.col(f"__s_{c}").alias(c) for c in state_cols]),
    )
    carried = unioned.select(
        "__side",
        *[F.col(f"__f_{c}") for c in fact_cols],
        F.last(srow, ignorenulls=True).over(w).alias("__asof"),
    )
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(f"__f_{c}").alias(c) for c in fact_cols],
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in state_cols],
        F.col("__asof").isNotNull().alias("__matched"),
    )
    if how == "inner":
        out = out.where(F.col("__matched"))
    return out.drop("__matched")


def asof_join_sql(
    facts_sql: str,
    states_sql: str,
    key: str,
    ts: str,
    state_cols: list[str],
    fact_cols: list[str],
    how: str = "left",
) -> str:
    """DuckDB twin via native ASOF JOIN (inclusive >= match)."""
    kind = "ASOF LEFT JOIN" if how == "left" else "ASOF JOIN"
    f_cols = ", ".join(f"f.{c}" for c in fact_cols)
    s_cols = ", ".join(f"s.{c} AS asof_{c}" for c in state_cols)
    return f"""
SELECT {f_cols}, {s_cols}
FROM ({facts_sql}) f
{kind} ({states_sql}) s
  ON f.{key} = s.{key} AND f.{ts} >= s.{ts}
"""
