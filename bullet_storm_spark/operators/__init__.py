"""Physical operator lowerings.

Each core-aggregation module exposes
``apply(df, agg, post) -> DataFrame`` (Spark lowering) and
``sql(agg, base_sql, post) -> str`` (equivalent DuckDB oracle SQL), both
driven from the same logical Aggregation object so the two programs cannot
drift. Extension operators (dedup / similarity / text / multimodal) live in
their own modules.
"""
