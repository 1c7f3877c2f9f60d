"""Query <-> JSON codec.

In the reference, queries are first-class data flowing through PubSub as
serialized payloads (SURVEY.md §1.2; /root/reference src/main/java/com/
yahoo/bullet/storm/QueryBolt.java:132-138 deserializes Query objects from
PubSubMessages). This codec is the Spark-side equivalent: the full Query
model — expression trees, all five aggregations, post-aggregations,
windows — round-trips through plain JSON, so a control plane (Kafka topic,
REST endpoint) can carry queries without Python pickling.
"""

from __future__ import annotations

import json
from typing import Any

from bullet_storm_spark.plans import expressions as E
from bullet_storm_spark.plans import query as Q

# ---------------------------------------------------------------------------
# expressions
# ---------------------------------------------------------------------------

def expr_to_dict(e: E.Expression | None) -> dict | None:
    if e is None:
        return None
    if isinstance(e, E.FieldExpression):
        return {"t": "field", "field": e.field, "subfield": e.subfield}
    if isinstance(e, E.ValueExpression):
        return {"t": "value", "value": e.value}
    if isinstance(e, E.ListExpression):
        return {"t": "list", "values": [expr_to_dict(v) for v in e.values]}
    if isinstance(e, E.CastExpression):
        return {"t": "cast", "operand": expr_to_dict(e.operand), "type": e.type_name}
    if isinstance(e, E.UnaryExpression):
        return {"t": "unary", "operand": expr_to_dict(e.operand), "op": e.op.name}
    if isinstance(e, E.BinaryExpression):
        return {
            "t": "binary",
            "left": expr_to_dict(e.left),
            "right": expr_to_dict(e.right),
            "op": e.op.name,
        }
    if isinstance(e, E.NAryExpression):
        return {
            "t": "nary",
            "operands": [expr_to_dict(o) for o in e.operands],
            "op": e.op.name,
        }
    if isinstance(e, E.SqlExpression):
        return {"t": "sql", "sql": e.sql, "duckdb_sql": e.duckdb_sql}
    raise ValueError(f"unserializable expression {type(e).__name__}")


def expr_from_dict(d: dict | None) -> E.Expression | None:
    if d is None:
        return None
    t = d["t"]
    if t == "field":
        return E.FieldExpression(d["field"], d.get("subfield"))
    if t == "value":
        return E.ValueExpression(d["value"])
    if t == "list":
        return E.ListExpression([expr_from_dict(v) for v in d["values"]])
    if t == "cast":
        return E.CastExpression(expr_from_dict(d["operand"]), d["type"])
    if t == "unary":
        return E.UnaryExpression(expr_from_dict(d["operand"]), E.Operation[d["op"]])
    if t == "binary":
        return E.BinaryExpression(
            expr_from_dict(d["left"]), expr_from_dict(d["right"]), E.Operation[d["op"]]
        )
    if t == "nary":
        return E.NAryExpression(
            [expr_from_dict(o) for o in d["operands"]], E.Operation[d["op"]]
        )
    if t == "sql":
        return E.SqlExpression(d["sql"], d.get("duckdb_sql"))
    raise ValueError(f"unknown expression tag {t}")


# ---------------------------------------------------------------------------
# aggregations / windows / post-aggregations
# ---------------------------------------------------------------------------

def _agg_to_dict(agg: Q.Aggregation) -> dict:
    if isinstance(agg, Q.Raw):
        return {"t": "raw", "size": agg.size}
    if isinstance(agg, Q.GroupBy):
        return {
            "t": "group",
            "fields": agg.fields,
            "size": agg.size,
            "operations": [
                {
                    "op": op.op.name,
                    "field": op.field,
                    "alias": op.alias,
                    "exact_decimal": op.exact_decimal,
                    "round_to": op.round_to,
                    "field_kind": op.field_kind,
                    "p": op.p,
                }
                for op in agg.operations
            ],
        }
    if isinstance(agg, Q.CountDistinct):
        return {
            "t": "count_distinct",
            "fields": list(agg.fields),
            "name": agg.name,
            "exact": agg.exact,
            "rsd": agg.rsd,
        }
    if isinstance(agg, Q.Distribution):
        return {
            "t": "distribution",
            "field": agg.field,
            "dist_type": agg.dist_type.name,
            "points": list(agg.points),
            "round_to": agg.round_to,
            "approx": agg.approx,
            "accuracy": agg.accuracy,
        }
    if isinstance(agg, Q.TopK):
        return {
            "t": "top_k",
            "size": agg.size,
            "threshold": agg.threshold,
            "name": agg.name,
            "fields": agg.fields,
            "sketch_capacity": agg.sketch_capacity,
        }
    raise ValueError(f"unserializable aggregation {type(agg).__name__}")


def _agg_from_dict(d: dict) -> Q.Aggregation:
    t = d["t"]
    if t == "raw":
        return Q.Raw(size=d["size"])
    if t == "group":
        return Q.GroupBy(
            fields=d["fields"],
            size=d["size"],
            operations=[
                Q.GroupOperation(
                    Q.GroupOpType[o["op"]],
                    o["field"],
                    o["alias"],
                    o.get("exact_decimal", False),
                    o.get("round_to"),
                    o.get("field_kind", "int"),
                    o.get("p"),
                )
                for o in d["operations"]
            ],
        )
    if t == "count_distinct":
        return Q.CountDistinct(
            fields=d["fields"], name=d["name"], exact=d["exact"], rsd=d["rsd"]
        )
    if t == "distribution":
        return Q.Distribution(
            field=d["field"],
            dist_type=Q.DistributionType[d["dist_type"]],
            points=d["points"],
            round_to=d["round_to"],
            approx=d.get("approx", False),
            accuracy=d.get("accuracy", 10_000),
        )
    if t == "top_k":
        return Q.TopK(
            size=d["size"],
            threshold=d["threshold"],
            name=d["name"],
            fields=d["fields"],
            sketch_capacity=d.get("sketch_capacity"),
        )
    raise ValueError(f"unknown aggregation tag {t}")


def _window_to_dict(w) -> dict | None:
    if w is None:
        return None
    if isinstance(w, Q.TumblingWindow):
        return {"t": "tumbling", "emit_every_ms": w.emit_every_ms,
                "include_all": w.include_all}
    if isinstance(w, Q.SlidingRecordWindow):
        return {"t": "record", "emit_every": w.emit_every,
                "include_all": w.include_all}
    raise ValueError(f"unserializable window {type(w).__name__}")


def _window_from_dict(d: dict | None):
    if d is None:
        return None
    if d["t"] == "tumbling":
        return Q.TumblingWindow(d["emit_every_ms"], d.get("include_all", False))
    if d["t"] == "record":
        return Q.SlidingRecordWindow(d["emit_every"], d.get("include_all", False))
    raise ValueError(f"unknown window tag {d['t']}")


def _post_to_dict(p) -> dict:
    if isinstance(p, Q.OrderBy):
        return {"t": "order_by", "keys": [list(k) for k in p.keys]}
    if isinstance(p, Q.Having):
        return {"t": "having", "expression": expr_to_dict(p.expression)}
    if isinstance(p, Q.Computation):
        return {
            "t": "computation",
            "fields": [
                {"name": f.name, "expression": expr_to_dict(f.expression)}
                for f in p.fields
            ],
        }
    if isinstance(p, Q.Culling):
        return {"t": "culling", "fields": list(p.fields)}
    raise ValueError(f"unserializable post-aggregation {type(p).__name__}")


def _post_from_dict(d: dict):
    t = d["t"]
    if t == "order_by":
        return Q.OrderBy([(k[0], bool(k[1])) for k in d["keys"]])
    if t == "having":
        return Q.Having(expr_from_dict(d["expression"]))
    if t == "computation":
        return Q.Computation(
            [Q.Field(f["name"], expr_from_dict(f["expression"])) for f in d["fields"]]
        )
    if t == "culling":
        return Q.Culling(d["fields"])
    raise ValueError(f"unknown post-aggregation tag {t}")


# ---------------------------------------------------------------------------
# Query
# ---------------------------------------------------------------------------

def query_to_dict(q: Q.Query) -> dict[str, Any]:
    projection = None
    if q.projection.fields is not None:
        projection = [
            {"name": f.name, "expression": expr_to_dict(f.expression)}
            for f in q.projection.fields
        ]
    return {
        "source": q.source,
        "filter": expr_to_dict(q.filter),
        "projection": projection,
        "aggregation": _agg_to_dict(q.aggregation),
        "post_aggregations": [_post_to_dict(p) for p in q.post_aggregations],
        "window": _window_to_dict(q.window),
        "duration_ms": q.duration_ms,
    }


def query_from_dict(d: dict[str, Any]) -> Q.Query:
    projection = Q.Projection(None)
    if d.get("projection") is not None:
        projection = Q.Projection(
            [
                Q.Field(f["name"], expr_from_dict(f["expression"]))
                for f in d["projection"]
            ]
        )
    return Q.Query(
        source=d.get("source", "events"),
        filter=expr_from_dict(d.get("filter")),
        projection=projection,
        aggregation=_agg_from_dict(d["aggregation"]),
        post_aggregations=[_post_from_dict(p) for p in d.get("post_aggregations", [])],
        window=_window_from_dict(d.get("window")),
        duration_ms=d.get("duration_ms", Q.DEFAULT_DURATION_MS),
    )


def query_to_json(q: Q.Query) -> str:
    return json.dumps(query_to_dict(q))


def query_from_json(s: str) -> Q.Query:
    return query_from_dict(json.loads(s))
