"""Line-level corpus dedup — the CCNet / RefinedWeb boilerplate pass.

Web documents share enormous numbers of IDENTICAL LINES (navigation,
cookie banners, footers, license blurbs) that within-document span dedup
(`operators/spans.py`) cannot see because each document contains the line
only once. CCNet (Wenzek et al., LREC 2020) dedups at the PARAGRAPH/LINE
level across the whole corpus; RefinedWeb (Penedo et al., 2306.01116)
keeps line-level filtering as a core stage. This module is that pass:

* ``line_frequency`` — corpus-wide document-frequency per distinct line
  (counted once per containing doc), the report a boilerplate threshold
  is chosen from;
* ``remove_boilerplate_lines`` — drop every line whose doc-frequency
  reaches ``min_df`` and reassemble documents in original line order.

Spark-first shape (100 TB posture):

* the line stream is one posexplode of ``split(text, '\\n')`` — linear,
  no UDF; counts are a hash aggregation on md5(line) (uniform keys);
* removal is a line-keyed LEFT join of the line stream against the
  frequent-line set. The frequent set is small by construction (only
  lines crossing the df threshold) and broadcasts; at 100 TB this is
  the bloom.py semi-join-reduction posture — the fact stream never
  shuffles on the hot line hash;
* reassembly is one doc-keyed aggregation: sort the surviving (pos,
  line) pairs and join with newline — the same exchange the explode's
  doc id already provides.

Reference scope note: no counterpart in the reference engine (Java/Storm
Bullet); part of the LLM-pipeline extension surface (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line): one row per line, original order preserved."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def line_frequency(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
) -> DataFrame:
    """(line, df_docs): distinct lines appearing in at least ``min_df``
    documents, with their document frequency — the boilerplate report.
    Blank lines are ignored (they separate paragraphs, they are not
    boilerplate)."""
    if min_df < 1:
        raise ValueError(f"need min_df >= 1, got {min_df}")
    return (
        _lines(df, id_col, text_col)
        .where(F.col("line") != "")
        .select("id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
        .where(F.col("df_docs") >= min_df)
        .orderBy(F.desc("df_docs"), "line")
    )


def line_frequency_sql(
    table: str, id_col: str, text_col: str, min_df: int = 2
) -> str:
    if min_df < 1:
        raise ValueError(f"need min_df >= 1, got {min_df}")
    return f"""
WITH __l AS (
  SELECT DISTINCT {id_col} AS id, line
  FROM {table}, UNNEST(string_split({text_col}, chr(10))) AS t(line)
  WHERE line <> ''
)
SELECT line, COUNT(*)::BIGINT AS df_docs
FROM __l GROUP BY line
HAVING COUNT(*) >= {int(min_df)}
ORDER BY df_docs DESC, line
"""


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 5,
) -> DataFrame:
    """(id, text, n_lines, n_removed): every line whose corpus document
    frequency reaches ``min_df`` is dropped; surviving lines rejoin with
    newlines in original order. ``n_lines`` counts the doc's original
    lines, ``n_removed`` the dropped ones. A doc of pure boilerplate
    comes back as '' (downstream length filters remove it)."""
    boiler = line_frequency(df, id_col, text_col, min_df=min_df).select(
        "line", F.lit(True).alias("__boiler")
    )
    lines = _lines(df, id_col, text_col)
    tagged = lines.join(F.broadcast(boiler), "line", "left")
    return (
        tagged.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                "\n",
            ).alias("text"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("__boiler").isNotNull().cast("long")).alias("n_removed"),
        )
        .orderBy("id")
    )


def remove_boilerplate_lines_sql(
    table: str, id_col: str, text_col: str, min_df: int = 5
) -> str:
    freq = line_frequency_sql(table, id_col, text_col, min_df)
    return f"""
WITH __boiler AS ({freq}),
__lines AS (
  SELECT id, pos, arr[pos] AS line FROM (
    SELECT {id_col} AS id, string_split({text_col}, chr(10)) AS arr
    FROM {table}
  ), UNNEST(generate_series(1, len(arr))) AS t(pos)
),
__tagged AS (
  SELECT l.id, l.pos, l.line, (b.line IS NOT NULL) AS is_boiler
  FROM __lines l LEFT JOIN __boiler b ON l.line = b.line
)
SELECT id,
       COALESCE(string_agg(CASE WHEN NOT is_boiler THEN line END,
                           chr(10) ORDER BY pos), '') AS text,
       COUNT(*)::BIGINT AS n_lines,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM __tagged GROUP BY id ORDER BY id
"""
