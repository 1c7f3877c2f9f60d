"""BQL-style query front door.

The reference receives already-parsed Query objects (BQL parsing lives
upstream in bullet-bql / the web service — SURVEY.md §4 'no parser'), but
the published Bullet query language is the natural user surface, so this
module provides a compact BQL-flavored dialect compiled to our Query model:

    SELECT * FROM STREAM(30000, TIME) WHERE x > 1 LIMIT 10
    SELECT COUNT(*) AS cnt, SUM(v) AS s FROM events WHERE v > 0
    SELECT kind, COUNT(*) AS cnt FROM events GROUP BY kind
    SELECT DISTINCT kind, region FROM events              -- GROUP BY, no ops
    SELECT COUNT(DISTINCT user) AS u FROM events
    SELECT TOP(5, 2, kind) AS cnt FROM events
    SELECT QUANTILE(v, MANUAL, 0.1, 0.5, 0.9) FROM events
    SELECT QUANTILE(v, LINEAR, 11) FROM events            -- 11 even points
    SELECT FREQ(v, MANUAL, 0, 50, 100) FROM events        -- PMF
    SELECT FREQ(v, REGION, 0, 200, 50) FROM events        -- start,end,step
    SELECT CUMFREQ(v, MANUAL, 0, 50, 100) FROM events     -- CDF
    SELECT kind, COUNT(*) AS cnt, cnt * 2 AS double_cnt FROM events
        GROUP BY kind                                     -- post-agg COMPUTE
    ... WINDOWING EVERY(1000, TIME) | EVERY(10, RECORD) | TUMBLING(1000, TIME)
    ... HAVING cnt > 2  ORDER BY cnt DESC  LIMIT 5

FROM STREAM(ms, TIME) sets the query duration (Bullet's look-forward
bound); FROM <name> reads the named source. Scalar expressions inside
SELECT/WHERE/HAVING are parsed by Spark itself via F.expr — Catalyst is the
expression parser (SURVEY.md §7.0).
"""

from __future__ import annotations

import re

from bullet_storm_spark.plans.expressions import SqlExpression, ensure_expr
from bullet_storm_spark.plans.query import (
    Computation,
    CountDistinct,
    Distribution,
    DistributionType,
    Field,
    GroupBy,
    GroupOperation,
    GroupOpType,
    Having,
    OrderBy,
    Projection,
    Query,
    Raw,
    SlidingRecordWindow,
    TumblingWindow,
    DEFAULT_DURATION_MS,
)

_CLAUSE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)"
    r"\s+FROM\s+(?P<source>STREAM\s*\([^)]*\)|\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
    r"(?:\s+HAVING\s+(?P<having>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"(?:\s+WINDOWING\s+(?P<window>.+?))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_AGG_FN = {
    "COUNT": GroupOpType.COUNT,
    "SUM": GroupOpType.SUM,
    "MIN": GroupOpType.MIN,
    "MAX": GroupOpType.MAX,
    "AVG": GroupOpType.AVG,
    "PERCENTILE": GroupOpType.PERCENTILE,
}


class BQLError(ValueError):
    pass


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _alias_split(item: str) -> tuple[str, str | None]:
    m = re.match(r"^(.*?)\s+AS\s+(\w+)\s*$", item, re.IGNORECASE | re.DOTALL)
    if m:
        return m.group(1).strip(), m.group(2)
    return item.strip(), None


def parse(bql: str) -> Query:
    m = _CLAUSE_RE.match(bql)
    if not m:
        raise BQLError(f"unparseable BQL: {bql!r}")
    g = m.groupdict()

    # FROM: STREAM(ms, TIME) -> duration; bare name -> source table
    source, duration = "events", DEFAULT_DURATION_MS
    src = g["source"].strip()
    sm = re.match(r"STREAM\s*\(\s*(\d+)\s*(?:,\s*TIME\s*)?\)", src, re.IGNORECASE)
    if sm:
        duration = int(sm.group(1))
    else:
        source = src

    where = SqlExpression(g["where"].strip()) if g["where"] else None
    having = [Having(SqlExpression(g["having"].strip()))] if g["having"] else []
    order = []
    if g["order"]:
        keys = []
        for part in _split_top_level(g["order"]):
            om = re.match(r"^(\w+)(?:\s+(ASC|DESC))?$", part.strip(), re.IGNORECASE)
            if not om:
                raise BQLError(f"unsupported ORDER BY item: {part!r}")
            keys.append((om.group(1), (om.group(2) or "ASC").upper() == "ASC"))
        order = [OrderBy(keys)]
    limit = int(g["limit"]) if g["limit"] else None

    window = None
    if g["window"]:
        # EVERY(n, TIME|RECORD[, ALL]) — trailing ALL = additive window
        # (bullet-core include=ALL: emissions cover everything since start);
        # TUMBLING(n, unit) is the bullet-bql synonym for the resetting form
        wm = re.match(
            r"(EVERY|TUMBLING)\s*\(\s*(\d+)\s*,\s*(TIME|RECORD)\s*(?:,\s*(ALL)\s*)?\)",
            g["window"].strip(),
            re.IGNORECASE,
        )
        if not wm:
            raise BQLError(f"unsupported WINDOWING: {g['window']!r}")
        kind = wm.group(1).upper()
        n, unit = int(wm.group(2)), wm.group(3).upper()
        include_all = wm.group(4) is not None
        if kind == "TUMBLING" and include_all:
            raise BQLError("TUMBLING windows reset; use EVERY(..., ALL)")
        window = (
            TumblingWindow(n, include_all=include_all)
            if unit == "TIME"
            else SlidingRecordWindow(n, include_all=include_all)
        )

    select_text = g["select"].strip()
    distinct = False
    dm = re.match(r"^DISTINCT\s+(.+)$", select_text, re.IGNORECASE | re.DOTALL)
    if dm:
        distinct, select_text = True, dm.group(1)
    items = _split_top_level(select_text)
    group_cols = (
        [c.strip() for c in _split_top_level(g["group"])] if g["group"] else None
    )

    projection, aggregation, post = _compile_select(
        items, group_cols, limit, distinct
    )
    return Query(
        source=source,
        filter=where,
        projection=projection,
        aggregation=aggregation,
        post_aggregations=having + post + order,
        window=window,
        duration_ms=duration,
    )


def _dist_points(kind: str, spec: str, args: list[float]) -> list[float]:
    """MANUAL: explicit points. LINEAR(n): n evenly spaced points (over
    [0,1] for QUANTILE — the bullet-bql LINEAR semantics). REGION(start,
    end, increment): inclusive arithmetic range."""
    spec = spec.upper()
    if spec == "MANUAL":
        return args
    if spec == "LINEAR":
        if len(args) != 1 or int(args[0]) < 2:
            raise BQLError("LINEAR needs one arg: the number of points (>= 2)")
        n = int(args[0])
        if kind == "QUANTILE":
            return [round(i / (n - 1), 10) for i in range(n)]
        raise BQLError("LINEAR is only defined for QUANTILE; use REGION")
    if spec == "REGION":
        if len(args) != 3 or args[2] <= 0:
            raise BQLError("REGION needs (start, end, increment > 0)")
        start, end, inc = args
        points, x, i = [], start, 0
        while x <= end + 1e-9:
            points.append(round(x, 10))
            i += 1
            x = start + i * inc
        return points
    raise BQLError(f"unsupported distribution spec {spec!r}")


def _compile_select(items, group_cols, limit, distinct=False):
    # SELECT DISTINCT a, b -> GROUP BY with no metric operations
    if distinct:
        fields = {}
        for item in items:
            expr, alias = _alias_split(item)
            if not re.fullmatch(r"\w+", expr):
                raise BQLError("SELECT DISTINCT takes plain field names")
            fields[expr] = alias or ""
        agg = GroupBy(fields=fields, operations=[])
        if limit is not None:
            agg.size = limit
        return Projection(), agg, []

    # special single-function forms first
    if len(items) == 1:
        expr, alias = _alias_split(items[0])
        cd = re.match(
            r"COUNT\s*\(\s*DISTINCT\s+(.+?)\s*\)$", expr, re.IGNORECASE
        )
        if cd:
            fields = [f.strip() for f in cd.group(1).split(",")]
            return Projection(), CountDistinct(fields=fields, name=alias or "count"), []
        top = re.match(r"TOP\s*\(\s*(.+?)\s*\)$", expr, re.IGNORECASE)
        if top:
            args = [a.strip() for a in _split_top_level(top.group(1))]
            k = int(args[0])
            threshold = None
            rest = args[1:]
            if rest and re.fullmatch(r"\d+", rest[0]):
                threshold = int(rest[0])
                rest = rest[1:]
            if not rest:
                raise BQLError("TOP(k[, threshold], field...) needs fields")
            return (
                Projection(),
                TopKFromFields(rest, k, threshold, alias or "count"),
                [],
            )
        dist = re.match(
            r"(QUANTILE|FREQ|CUMFREQ)\s*\(\s*(\w+)\s*,\s*(MANUAL|LINEAR|REGION)"
            r"\s*,\s*(.+?)\s*\)$",
            expr,
            re.IGNORECASE,
        )
        if dist:
            kind = dist.group(1).upper()
            dtype = {
                "QUANTILE": DistributionType.QUANTILE,
                "FREQ": DistributionType.PMF,
                "CUMFREQ": DistributionType.CDF,
            }[kind]
            args = [float(p) for p in _split_top_level(dist.group(4))]
            points = _dist_points(kind, dist.group(3), args)
            return (
                Projection(),
                Distribution(field=dist.group(2), dist_type=dtype, points=points),
                [],
            )

    # aggregate vs raw select
    ops: list[GroupOperation] = []
    plain: list[tuple[str, str | None]] = []
    for item in items:
        expr, alias = _alias_split(item)
        fm = re.match(r"(\w+)\s*\(\s*(\*|[^)]*)\s*\)$", expr)
        if fm and fm.group(1).upper() in _AGG_FN:
            fn, arg = fm.group(1).upper(), fm.group(2).strip()
            if fn == "COUNT" and arg == "*":
                ops.append(GroupOperation(GroupOpType.COUNT, None, alias or "count"))
            elif fn == "COUNT":
                ops.append(
                    GroupOperation(GroupOpType.COUNT_FIELD, arg, alias or "count")
                )
            elif fn == "PERCENTILE":
                # PERCENTILE(field, p) — exact per-group percentile
                # (batch-only; streaming routes through DISTRIBUTION)
                parts = _split_top_level(arg)
                if len(parts) != 2:
                    raise BQLError(f"PERCENTILE needs (field, p): {expr!r}")
                try:
                    p = float(parts[1])
                except ValueError:
                    raise BQLError(f"PERCENTILE p must be numeric: {parts[1]!r}")
                ops.append(
                    GroupOperation(
                        GroupOpType.PERCENTILE,
                        parts[0],
                        alias or "percentile",
                        round_to=6,
                        p=p,
                    )
                )
            else:
                # SUM/AVG default to exact DECIMAL(38,6) accumulation: the
                # parser has no column types, and a BIGINT-pinned float sum
                # would round in the oracle dialect; decimal accumulation is
                # type-safe, order-independent, and identical in both engines
                ops.append(
                    GroupOperation(
                        _AGG_FN[fn],
                        arg,
                        alias or fn.lower(),
                        exact_decimal=fn in ("SUM", "AVG"),
                    )
                )
        else:
            plain.append((expr, alias))

    if ops:
        fields = {}
        computed: list[Field] = []
        group_set = {c for c in (group_cols or [])}
        for expr, alias in plain:
            if re.fullmatch(r"\w+", expr) and (not group_set or expr in group_set):
                fields[expr] = alias or ""
            elif re.fullmatch(r"\w+", expr):
                raise BQLError(
                    f"plain field {expr!r} must appear in GROUP BY"
                )
            else:
                # expression over aggregate aliases / group keys -> COMPUTE
                # post-aggregation (bullet-bql computed select items)
                computed.append(
                    Field(alias or _default_name(expr), SqlExpression(expr))
                )
        if group_cols:
            for c in group_cols:
                if c not in fields:
                    fields[c] = ""
        agg = GroupBy(fields=fields, operations=ops)
        if limit is not None:
            agg.size = limit
        post = [Computation(computed)] if computed else []
        return Projection(), agg, post

    # RAW
    if len(plain) == 1 and plain[0][0] == "*":
        projection = Projection()
    else:
        projection = Projection(
            [Field(alias or _default_name(expr), SqlExpression(expr)) for expr, alias in plain]
        )
    return projection, Raw(size=limit or 100), []


def _default_name(expr: str) -> str:
    return expr if re.fullmatch(r"\w+", expr) else re.sub(r"\W+", "_", expr).strip("_")


def TopKFromFields(fields, k, threshold, name):
    from bullet_storm_spark.plans.query import TopK

    return TopK(size=k, threshold=threshold, name=name, fields={f: "" for f in fields})
