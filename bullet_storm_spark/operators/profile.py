"""Table profiling — the Deequ / Great-Expectations data-quality gate.

Before a table feeds training or analytics, the pipeline wants one cheap
pass answering: how complete is each column (null rate), how wide is it
(distinct count), and what are its extremes? That per-column profile is
what completeness/uniqueness/range EXPECTATIONS are then written against
(Schelter et al., VLDB 2018 — Deequ's metric set; this module is the
profile computation, expressed Spark-first).

Plan shape: ONE aggregation job over the scan computes every column's
metrics together (count / conditional-null count / count(distinct) /
min / max are all partial-aggregatable, so the pass is map-side combined
and shuffles one row per partition); the per-column result rows are then
C trivial selects over that single cached 1-row frame. Numeric and
timestamp extremes land in ``num_min``/``num_max`` (doubles, 6 dp;
timestamps as epoch micros), string extremes in ``str_min``/``str_max``
— never a stringified double, so the oracle comparison carries no
float-formatting hazard.

At 100 TB: the profile is one scan; ``count(distinct)`` per column is
the only expensive metric (Catalyst expands once per distinct column) —
for extreme-cardinality columns swap ``exact_distinct=False`` to
HLL++ (`approx_count_distinct`), the same contract as the COUNT
DISTINCT aggregation family (the entry then declares rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _kind(dtype: T.DataType) -> str:
    if isinstance(dtype, _NUMERIC):
        return "num"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dtype, T.StringType):
        return "str"
    return "other"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, null_rate, n_distinct, num_min,
    num_max, str_min, str_max): one row per profiled column. ``num_*``
    carry numeric/timestamp extremes (doubles; timestamps as epoch µs),
    ``str_*`` string extremes; the inapplicable pair is NULL. Complex
    types (arrays/maps/structs) profile completeness only."""
    fields = [
        f for f in df.schema.fields if columns is None or f.name in set(columns)
    ]
    if not fields:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for f in fields:
        c, k = F.col(f.name), _kind(f.dataType)
        aggs.append(
            F.sum(c.isNull().cast("long")).alias(f"__nulls_{f.name}")
        )
        if k == "other":
            continue
        dcol = (
            F.count_distinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(dcol.cast("long").alias(f"__dist_{f.name}"))
        if k == "num":
            aggs.append(F.round(F.min(c).cast("double"), round_to)
                        .alias(f"__min_{f.name}"))
            aggs.append(F.round(F.max(c).cast("double"), round_to)
                        .alias(f"__max_{f.name}"))
        elif k == "ts":
            aggs.append(F.unix_micros(F.min(c)).cast("double")
                        .alias(f"__min_{f.name}"))
            aggs.append(F.unix_micros(F.max(c)).cast("double")
                        .alias(f"__max_{f.name}"))
        else:
            aggs.append(F.min(c).alias(f"__smin_{f.name}"))
            aggs.append(F.max(c).alias(f"__smax_{f.name}"))
    one = df.agg(*aggs)
    outs = []
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    for f in fields:
        k = _kind(f.dataType)
        outs.append(
            one.select(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{f.name}").alias("n_nulls"),
                F.round(F.col(f"__nulls_{f.name}") / F.col("__n"), round_to)
                .alias("null_rate"),
                (F.col(f"__dist_{f.name}") if k != "other" else null_l)
                .alias("n_distinct"),
                (F.col(f"__min_{f.name}") if k in ("num", "ts") else null_d)
                .alias("num_min"),
                (F.col(f"__max_{f.name}") if k in ("num", "ts") else null_d)
                .alias("num_max"),
                (F.col(f"__smin_{f.name}") if k == "str" else null_s)
                .alias("str_min"),
                (F.col(f"__smax_{f.name}") if k == "str" else null_s)
                .alias("str_max"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("column")


def profile_table_sql(
    table: str,
    columns: list[tuple[str, str, str]],
    round_to: int = 6,
) -> str:
    """DuckDB twin. ``columns`` = [(name, kind, dtype_string)] with kind
    in num/ts/str/other and ``dtype_string`` the SPARK simpleString (the
    profile reports the engine-side dtype; the twin echoes it so the
    check compares values, not type-system spellings)."""
    if not columns:
        raise ValueError("no columns to profile")
    aggs = ["COUNT(*)::BIGINT AS __n"]
    for name, kind, _ in columns:
        aggs.append(
            f"CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS __nulls_{name}"
        )
        if kind == "other":
            continue
        aggs.append(f"COUNT(DISTINCT {name})::BIGINT AS __dist_{name}")
        if kind == "num":
            aggs.append(f"CASE WHEN ABS(CAST(MIN({name}) AS DOUBLE)) >= 1e16 THEN CAST((CAST(MIN({name}) AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(MIN({name}) AS DOUBLE)) * CAST(ABS(CAST(MIN({name}) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
                        f" AS __min_{name}")
            aggs.append(f"CASE WHEN ABS(CAST(MAX({name}) AS DOUBLE)) >= 1e16 THEN CAST((CAST(MAX({name}) AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(MAX({name}) AS DOUBLE)) * CAST(ABS(CAST(MAX({name}) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
                        f" AS __max_{name}")
        elif kind == "ts":
            aggs.append(f"CAST(epoch_us(MIN({name})) AS DOUBLE) AS __min_{name}")
            aggs.append(f"CAST(epoch_us(MAX({name})) AS DOUBLE) AS __max_{name}")
        else:
            aggs.append(f"MIN({name}) AS __smin_{name}")
            aggs.append(f"MAX({name}) AS __smax_{name}")
    selects = []
    for name, kind, dtype in columns:
        dist = f"__dist_{name}" if kind != "other" else "CAST(NULL AS BIGINT)"
        nmin = f"__min_{name}" if kind in ("num", "ts") else "CAST(NULL AS DOUBLE)"
        nmax = f"__max_{name}" if kind in ("num", "ts") else "CAST(NULL AS DOUBLE)"
        smin = f"__smin_{name}" if kind == "str" else "CAST(NULL AS VARCHAR)"
        smax = f"__smax_{name}" if kind == "str" else "CAST(NULL AS VARCHAR)"
        selects.append(
            f"SELECT '{name}' AS \"column\", '{dtype}' AS dtype, __n AS n_rows,\n"
            f"       __nulls_{name} AS n_nulls,\n"
            f"       CASE WHEN ABS(CAST(__nulls_{name} AS DOUBLE) / __n) >= 1e16 THEN CAST((CAST(__nulls_{name} AS DOUBLE) / __n) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(__nulls_{name} AS DOUBLE) / __n) * CAST(ABS(CAST(__nulls_{name} AS DOUBLE) / __n) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
            f" AS null_rate,\n"
            f"       {dist} AS n_distinct, {nmin} AS num_min, {nmax} AS num_max,\n"
            f"       {smin} AS str_min, {smax} AS str_max FROM __agg"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH __agg AS (
  SELECT {", ".join(aggs)} FROM {table}
)
{body}
ORDER BY "column"
"""


# ---------------------------------------------------------------------------
# Expectations — the verification half of the Deequ gate
# ---------------------------------------------------------------------------

# rule kinds -> required params
_RULE_KINDS = {
    "not_null": ("max_null_rate",),       # null_rate(col) <= max_null_rate
    "unique": (),                         # count(distinct col) == count(col)
    "min_at_least": ("bound",),           # min(col) >= bound
    "max_at_most": ("bound",),            # max(col) <= bound
    "distinct_at_least": ("bound",),      # count(distinct col) >= bound
    "distinct_at_most": ("bound",),       # count(distinct col) <= bound
}


def check_expectations(
    df: DataFrame,
    rules: list[tuple],
    round_to: int = 6,
) -> DataFrame:
    """(rule_idx, kind, column, observed, threshold, passed): evaluate a
    Deequ-style expectation suite in ONE aggregation pass. ``rules`` is
    a list of (kind, column[, param]) tuples with kinds: not_null
    (null_rate <= max_null_rate), unique, min_at_least, max_at_most,
    distinct_at_least, distinct_at_most. ``observed`` is the measured
    metric, ``threshold`` the rule parameter (NULL for unique), both
    doubles so the verdict table is engine-portable.

    The suite verdict is ``passed`` AND-ed by the caller (or feed the
    frame to a HAVING) — individual rows stay visible so a failing gate
    names its rule, the FilterBolt error-path posture."""
    if not rules:
        raise ValueError("need >= 1 rule")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    seen = set()
    for r in rules:
        kind, col = r[0], r[1]
        if kind not in _RULE_KINDS:
            raise ValueError(f"unknown rule kind {kind!r}")
        if len(r) != 2 + len(_RULE_KINDS[kind]):
            raise ValueError(f"rule {r!r} needs params {_RULE_KINDS[kind]}")
        if ("nulls", col) not in seen:
            seen.add(("nulls", col))
            aggs.append(
                F.sum(F.col(col).isNull().cast("long")).alias(f"__nulls_{col}")
            )
        if kind in ("unique", "distinct_at_least", "distinct_at_most") and (
            "dist", col
        ) not in seen:
            seen.add(("dist", col))
            aggs.append(F.count_distinct(F.col(col)).cast("long")
                        .alias(f"__dist_{col}"))
        if kind in ("min_at_least",) and ("min", col) not in seen:
            seen.add(("min", col))
            aggs.append(F.min(F.col(col)).cast("double").alias(f"__min_{col}"))
        if kind in ("max_at_most",) and ("max", col) not in seen:
            seen.add(("max", col))
            aggs.append(F.max(F.col(col)).cast("double").alias(f"__max_{col}"))
    one = df.agg(*aggs)
    outs = []
    for i, r in enumerate(rules):
        kind, col = r[0], r[1]
        param = float(r[2]) if len(r) > 2 else None
        if kind == "not_null":
            obs = F.round(F.col(f"__nulls_{col}") / F.col("__n"), round_to)
            passed = obs <= param
        elif kind == "unique":
            obs = (F.col(f"__dist_{col}")
                   + F.col(f"__nulls_{col}")).cast("double")
            passed = (F.col(f"__dist_{col}") + F.col(f"__nulls_{col}")
                      ) == F.col("__n")
        elif kind == "min_at_least":
            obs = F.round(F.col(f"__min_{col}"), round_to)
            passed = obs >= param
        elif kind == "max_at_most":
            obs = F.round(F.col(f"__max_{col}"), round_to)
            passed = obs <= param
        elif kind == "distinct_at_least":
            obs = F.col(f"__dist_{col}").cast("double")
            passed = obs >= param
        else:  # distinct_at_most
            obs = F.col(f"__dist_{col}").cast("double")
            passed = obs <= param
        outs.append(
            one.select(
                F.lit(i).cast("long").alias("rule_idx"),
                F.lit(kind).alias("kind"),
                F.lit(col).alias("column"),
                obs.cast("double").alias("observed"),
                (F.lit(param).cast("double") if param is not None
                 else F.lit(None).cast("double")).alias("threshold"),
                passed.alias("passed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("rule_idx")


def check_expectations_sql(
    table: str,
    rules: list[tuple],
    round_to: int = 6,
) -> str:
    if not rules:
        raise ValueError("need >= 1 rule")
    aggs = ["COUNT(*)::BIGINT AS __n"]
    seen = set()
    for r in rules:
        kind, col = r[0], r[1]
        if kind not in _RULE_KINDS:
            raise ValueError(f"unknown rule kind {kind!r}")
        if ("nulls", col) not in seen:
            seen.add(("nulls", col))
            aggs.append(
                f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS __nulls_{col}"
            )
        if kind in ("unique", "distinct_at_least", "distinct_at_most") and (
            "dist", col
        ) not in seen:
            seen.add(("dist", col))
            aggs.append(f"COUNT(DISTINCT {col})::BIGINT AS __dist_{col}")
        if kind == "min_at_least" and ("min", col) not in seen:
            seen.add(("min", col))
            aggs.append(f"CAST(MIN({col}) AS DOUBLE) AS __min_{col}")
        if kind == "max_at_most" and ("max", col) not in seen:
            seen.add(("max", col))
            aggs.append(f"CAST(MAX({col}) AS DOUBLE) AS __max_{col}")
    selects = []
    for i, r in enumerate(rules):
        kind, col = r[0], r[1]
        param = float(r[2]) if len(r) > 2 else None
        thr = repr(param) if param is not None else "CAST(NULL AS DOUBLE)"
        if kind == "not_null":
            obs = f"CASE WHEN ABS(CAST(__nulls_{col} AS DOUBLE) / __n) >= 1e16 THEN CAST((CAST(__nulls_{col} AS DOUBLE) / __n) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(__nulls_{col} AS DOUBLE) / __n) * CAST(ABS(CAST(__nulls_{col} AS DOUBLE) / __n) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
            passed = f"({obs}) <= {param!r}"
        elif kind == "unique":
            obs = f"CAST(__dist_{col} + __nulls_{col} AS DOUBLE)"
            passed = f"(__dist_{col} + __nulls_{col}) = __n"
        elif kind == "min_at_least":
            obs = f"CASE WHEN ABS(__min_{col}) >= 1e16 THEN CAST((__min_{col}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((__min_{col}) * CAST(ABS(__min_{col}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
            passed = f"({obs}) >= {param!r}"
        elif kind == "max_at_most":
            obs = f"CASE WHEN ABS(__max_{col}) >= 1e16 THEN CAST((__max_{col}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((__max_{col}) * CAST(ABS(__max_{col}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
            passed = f"({obs}) <= {param!r}"
        elif kind == "distinct_at_least":
            obs = f"CAST(__dist_{col} AS DOUBLE)"
            passed = f"({obs}) >= {param!r}"
        else:
            obs = f"CAST(__dist_{col} AS DOUBLE)"
            passed = f"({obs}) <= {param!r}"
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS rule_idx, '{kind}' AS kind,"
            f" '{col}' AS \"column\",\n"
            f"       CAST({obs} AS DOUBLE) AS observed, {thr} AS threshold,\n"
            f"       {passed} AS passed FROM __agg"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH __agg AS (
  SELECT {", ".join(aggs)} FROM {table}
)
{body}
ORDER BY rule_idx
"""


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    round_to: int = 6,
) -> DataFrame:
    """(n_child, fk_nulls, n_orphans, orphan_rate, n_parent, pk_is_unique):
    referential-integrity accounting between a child table's foreign key
    and a parent's key — the join-quality pre-flight every star-schema
    load runs (orphan facts silently vanish from inner joins; a non-unique
    "primary" key silently fans joins out). ``orphan_rate`` is orphans /
    non-null FK rows.

    Plan: one distinct-key aggregate on the parent (key-cardinality
    sized, broadcast) + one left join from the child FK counts — the
    child table never shuffles on anything but its own aggregation."""
    pk = parent.agg(
        F.count(pk_col).cast("long").alias("__pk_rows"),
        F.count_distinct(F.col(pk_col)).cast("long").alias("__pk_distinct"),
    )
    keys = parent.select(F.col(pk_col).alias("__k")).distinct()
    fk_counts = (
        child.select(F.col(fk_col).alias("__fk"))
        .groupBy("__fk")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    joined = fk_counts.join(
        F.broadcast(keys), fk_counts["__fk"] == keys["__k"], "left"
    )
    agg = joined.agg(
        F.sum("__c").cast("long").alias("n_child"),
        F.sum(F.when(F.col("__fk").isNull(), F.col("__c")).otherwise(0))
        .cast("long")
        .alias("fk_nulls"),
        F.sum(
            F.when(F.col("__k").isNull() & F.col("__fk").isNotNull(), F.col("__c"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_orphans"),
    )
    return agg.crossJoin(F.broadcast(pk)).select(
        "n_child",
        "fk_nulls",
        "n_orphans",
        F.round(
            F.when(
                F.col("n_child") - F.col("fk_nulls") > 0,
                F.col("n_orphans") / (F.col("n_child") - F.col("fk_nulls")),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("orphan_rate"),
        F.col("__pk_rows").alias("n_parent"),
        (F.col("__pk_distinct") == F.col("__pk_rows")).alias("pk_is_unique"),
    )


def referential_check_sql(
    child_table: str,
    parent_table: str,
    fk_col: str,
    pk_col: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH __pk AS (
  SELECT COUNT({pk_col})::BIGINT AS pk_rows,
         COUNT(DISTINCT {pk_col})::BIGINT AS pk_distinct
  FROM {parent_table}
),
__keys AS (SELECT DISTINCT {pk_col} AS k FROM {parent_table}),
__fk AS (
  SELECT {fk_col} AS fk, COUNT(*)::BIGINT AS c
  FROM {child_table} GROUP BY fk
),
__j AS (
  SELECT f.fk, f.c, k.k FROM __fk f LEFT JOIN __keys k ON f.fk = k.k
),
__a AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_child,
         CAST(SUM(CASE WHEN fk IS NULL THEN c ELSE 0 END) AS BIGINT)
           AS fk_nulls,
         CAST(SUM(CASE WHEN k IS NULL AND fk IS NOT NULL THEN c ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM __j
)
SELECT n_child, fk_nulls, n_orphans,
       CAST(CAST(CAST(CAST((CASE WHEN n_child - fk_nulls > 0
                  THEN CAST(n_orphans AS DOUBLE) / (n_child - fk_nulls)
                  ELSE 0.0 END) * CAST(ABS(CASE WHEN n_child - fk_nulls > 0
                  THEN CAST(n_orphans AS DOUBLE) / (n_child - fk_nulls)
                  ELSE 0.0 END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS orphan_rate,
       pk_rows AS n_parent,
       (pk_distinct = pk_rows) AS pk_is_unique
FROM __a CROSS JOIN __pk
"""


def functional_deps(
    df: DataFrame,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """(determinant, dependent, n_keys, n_violating, max_dependents,
    holds): exact functional-dependency audit — for each candidate
    ``A → B``, how many A-values map to MORE than one B-value (TANE-
    family dependency checking, Huhtala et al. Comp J 1999, restricted
    to the caller's candidate pairs — discovery over all column pairs
    is the same loop).  The data-quality primitive behind "is this
    column a key?", "is this mapping table actually a mapping?", and
    "did denormalization drift introduce conflicting attributes?".

    Plan: one (A, B)-keyed partial-distinct aggregation per candidate
    pair (Catalyst two-phase), finished by a key-sized summary; results
    union into one report frame.  NULL determinants are excluded (SQL
    convention: a NULL key determines nothing); NULL dependents count
    as a distinct value (a NULL-vs-value conflict IS a violation).
    """
    reports = []
    for det, dep in pairs:
        per_key = (
            df.where(F.col(det).isNotNull())
            .groupBy(F.col(det).alias("__k"))
            .agg(
                F.count_distinct(F.col(dep)).cast("long").alias("__d"),
                F.max(F.col(dep).isNull().cast("long")).alias("__has_null"),
            )
            .select(
                "__k",
                (F.col("__d") + F.col("__has_null")).cast("long").alias("__d"),
            )
        )
        reports.append(
            per_key.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("__d") > 1).cast("long"))
                .cast("long")
                .alias("n_violating"),
                F.max("__d").cast("long").alias("max_dependents"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "determinant",
        "dependent",
        "n_keys",
        "n_violating",
        "max_dependents",
        (F.col("n_violating") == 0).cast("long").alias("holds"),
    ).orderBy("determinant", "dependent")


def functional_deps_sql(table: str, pairs: list[tuple[str, str]]) -> str:
    parts = []
    for det, dep in pairs:
        parts.append(f"""
SELECT '{det}' AS determinant, '{dep}' AS dependent,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(MAX(d) AS BIGINT) AS max_dependents
FROM (
  SELECT {det} AS k,
         CAST(COUNT(DISTINCT {dep})
              + MAX(CASE WHEN {dep} IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM {table} WHERE {det} IS NOT NULL GROUP BY {det}
)""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
SELECT determinant, dependent, n_keys, n_violating, max_dependents,
       CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM ({union})
ORDER BY determinant, dependent
"""


def json_key_profile(
    df: DataFrame,
    json_col: str,
    round_to: int = 9,
) -> DataFrame:
    """(key, n_present, n_json_null, share_present): top-level key
    census of a semi-structured JSON column — the schema-discovery
    pre-flight for event property bags (which keys exist, how sparsely,
    and how often they carry an explicit JSON null vs a value).  Rows
    whose JSON is NULL/unparseable contribute to the denominator (the
    column exists for them; its keys don't).

    Parity: both engines enumerate keys natively (``json_object_keys``
    / ``json_keys``) and detect explicit-null via string extraction
    returning NULL; value TEXT is never compared across engines (object
    re-serialization whitespace differs — documented non-surface).
    One explode + one key-sized aggregation; the row total rides a
    1-row broadcast.
    """
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    keys = df.select(
        F.explode(F.json_object_keys(F.col(json_col))).alias("key"),
        F.col(json_col).alias("__j"),
    )
    # the PyFunction form of get_json_object requires a LITERAL path;
    # the SQL form takes any expression
    per_key = keys.select(
        "key",
        F.expr("get_json_object(__j, concat('$.', key))").alias("__v"),
    ).groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.col("__v").isNull().cast("long"))
        .cast("long")
        .alias("n_json_null"),
    )
    return per_key.crossJoin(F.broadcast(total)).select(
        "key",
        "n_present",
        "n_json_null",
        F.round(
            F.col("n_present").cast("double") / F.col("__n").cast("double"),
            round_to,
        ).alias("share_present"),
    ).orderBy("key")


def json_key_profile_sql(
    table: str,
    json_sql: str,
    round_to: int = 9,
) -> str:
    return f"""
WITH __t AS (SELECT {json_sql} AS j FROM {table}),
__n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM __t),
__k AS (
  -- json_valid mirrors Spark's json_object_keys returning NULL on
  -- malformed JSON (row silently skipped) where DuckDB json_keys would
  -- ERROR the whole query (ADVICE r8); malformed rows stay in __n
  SELECT UNNEST(json_keys(j)) AS key, j
  FROM __t WHERE j IS NOT NULL AND json_valid(j)
),
__p AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present,
         CAST(SUM(CASE WHEN json_extract_string(j, '$.' || key) IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_json_null
  FROM __k GROUP BY key
)
SELECT p.key, p.n_present, p.n_json_null,
       CASE WHEN ABS(CAST(p.n_present AS DOUBLE) / t.n) >= 1e16 THEN CAST((CAST(p.n_present AS DOUBLE) / t.n) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_present AS DOUBLE) / t.n) * CAST(ABS(CAST(p.n_present AS DOUBLE) / t.n) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS share_present
FROM __p p CROSS JOIN __n t ORDER BY p.key
"""


def json_key_drift(
    df: DataFrame,
    json_col: str,
    b_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """Top-level JSON key census drift between two slices: ``(key,
    n_a, n_b, share_a, share_b, delta)`` ordered by key — did the
    producer's property bag change shape between the reference slice
    (¬b_pred) and the comparison slice (b_pred)? The schema-drift alarm
    for semi-structured columns: a key whose presence share jumps or
    collapses between deploys is the usual first symptom of an upstream
    contract change, invisible to column-level profiling because the
    column is one string.

    Shares are per-slice (key presence / slice row count, NULL-JSON
    rows in the denominator — the json_key_profile contract); a key
    absent from a slice reports 0 there, so additions and removals both
    surface. delta = share_b − share_a. Integer counts, one IEEE
    division per share; the two slice totals ride a 1-row broadcast.
    One explode + one key-sized aggregation."""
    tagged = df.select(
        F.col(json_col).alias("__j"), b_pred.cast("boolean").alias("__b")
    ).where(b_pred.isNotNull())
    totals = tagged.agg(
        F.sum(F.when(~F.col("__b"), 1).otherwise(0)).cast("long").alias("__na"),
        F.sum(F.when(F.col("__b"), 1).otherwise(0)).cast("long").alias("__nb"),
    )
    keys = tagged.select(
        F.explode(F.json_object_keys(F.col("__j"))).alias("key"), "__b"
    )
    per_key = keys.groupBy("key").agg(
        F.sum(F.when(~F.col("__b"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("__b"), 1).otherwise(0)).cast("long").alias("n_b"),
    )
    j = per_key.crossJoin(F.broadcast(totals))
    share_a = F.round(
        F.try_divide(F.col("n_a").cast("double"), F.col("__na").cast("double")),
        round_to,
    )
    share_b = F.round(
        F.try_divide(F.col("n_b").cast("double"), F.col("__nb").cast("double")),
        round_to,
    )
    return j.select(
        "key",
        "n_a",
        "n_b",
        share_a.alias("share_a"),
        share_b.alias("share_b"),
        F.round(share_b - share_a, round_to).alias("delta"),
    ).orderBy("key")


def json_key_drift_sql(
    table: str,
    json_sql: str,
    b_pred_sql: str,
    round_to: int = 9,
) -> str:
    return f"""
WITH __t AS (
  SELECT {json_sql} AS j, ({b_pred_sql}) AS b
  FROM {table} WHERE ({b_pred_sql}) IS NOT NULL
),
__tot AS (
  SELECT CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM __t
),
__k AS (
  -- json_valid: skip malformed rows exactly like Spark's
  -- json_object_keys-returns-NULL path (slice totals keep them)
  SELECT UNNEST(json_keys(j)) AS key, b
  FROM __t WHERE j IS NOT NULL AND json_valid(j)
),
__p AS (
  SELECT key,
         CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM __k GROUP BY key
)
SELECT p.key, p.n_a, p.n_b,
       CASE WHEN ABS(CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) >= 1e16 THEN CAST((CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) * CAST(ABS(CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS share_a,
       CASE WHEN ABS(CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) >= 1e16 THEN CAST((CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) * CAST(ABS(CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS share_b,
       CAST(CAST(CAST(CAST((CASE WHEN ABS(CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) >= 1e16 THEN CAST((CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) * CAST(ABS(CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
             - CASE WHEN ABS(CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) >= 1e16 THEN CAST((CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) * CAST(ABS(CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END) * CAST(ABS(CASE WHEN ABS(CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) >= 1e16 THEN CAST((CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) * CAST(ABS(CAST(p.n_b AS DOUBLE) / NULLIF(CAST(t.nb AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
             - CASE WHEN ABS(CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) >= 1e16 THEN CAST((CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) * CAST(ABS(CAST(p.n_a AS DOUBLE) / NULLIF(CAST(t.na AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS delta
FROM __p p, __tot t ORDER BY p.key
"""
