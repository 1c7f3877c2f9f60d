"""JSON field access over string columns (the events table's ``props``).

The reference's map-typed fields (SURVEY.md §1.1) arrive in our synthetic
data as JSON strings; these helpers give the same nested-access surface
(FieldExpression("map_field", "id") analogue) over JSON, rendered for both
engines: Spark ``get_json_object`` / DuckDB ``json_extract_string``.
"""

from __future__ import annotations

from bullet_storm_spark.plans.expressions import CastExpression, SqlExpression


def json_get(field: str, path: str) -> SqlExpression:
    """Extract ``$.path`` from a JSON string column as a string.

    The DuckDB side carries a ``json_valid`` guard: DuckDB's
    json_extract_string RAISES on malformed JSON where Spark's
    get_json_object returns NULL (probe-caught r10 — the r9
    events_props_key_drift fix generalized), so a single bad props row
    would turn an oracle comparison into a hard query error."""
    return SqlExpression(
        sql=f"get_json_object({field}, '$.{path}')",
        duckdb_sql=(
            f"(CASE WHEN json_valid({field}) "
            f"THEN json_extract_string({field}, '$.{path}') END)"
        ),
    )


def json_get_int(field: str, path: str) -> CastExpression:
    return CastExpression(json_get(field, path), "INTEGER")


def json_get_double(field: str, path: str) -> CastExpression:
    return CastExpression(json_get(field, path), "DOUBLE")
