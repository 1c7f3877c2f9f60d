"""Chat-transcript normalization — the SFT-pipeline conversation shape.

Instruction-tuning corpora arrive as role-tagged transcripts
(``<|system|>...<|user|>...<|assistant|>...``). Before they can be
packed, deduped, or quality-gated, a pipeline explodes them into typed
turns and validates their structure (roles alternate, every user turn is
answered, at most one leading system prompt). Both stages here are pure
scan expressions over the transcript string:

- ``parse_turns``: one ``regexp_extract_all`` per capture group (role,
  content), zipped and exploded — no UDF, the extraction runs in
  whole-stage codegen and the explode fans out exactly n_turns rows.
- ``conversation_report``: per-transcript structural QA computed from
  the role array alone (counts, char budgets per side, repeated-role
  runs, well-formedness verdict) — array higher-order functions, zero
  shuffles beyond the scan.

The role-marker grammar is the plain ``<|role|>`` tag set; content is
``[^<]*`` so the pattern needs no lookarounds (RE2-safe — the DuckDB
twin uses the identical regex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ROLE_PATTERN = r"<\|(system|user|assistant)\|>([^<]*)"


def _extracts(text_col: str):
    roles = F.regexp_extract_all(F.col(text_col), F.lit(ROLE_PATTERN), 1)
    contents = F.regexp_extract_all(F.col(text_col), F.lit(ROLE_PATTERN), 2)
    return roles, contents


def parse_turns(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, turn_idx, role, content, n_chars)`` — one row per turn,
    ``turn_idx`` 1-based in transcript order."""
    roles, contents = _extracts(text_col)
    pairs = F.zip_with(
        roles,
        contents,
        lambda r, c: F.struct(r.alias("role"), c.alias("content")),
    )
    return (
        df.select(F.col(id_col), F.posexplode(pairs).alias("__pos", "__t"))
        .select(
            F.col(id_col),
            (F.col("__pos") + 1).cast("long").alias("turn_idx"),
            F.col("__t.role").alias("role"),
            F.col("__t.content").alias("content"),
            F.length("__t.content").cast("long").alias("n_chars"),
        )
        .orderBy(id_col, "turn_idx")
    )


def parse_turns_sql(table: str, id_col: str, text_col: str) -> str:
    pat = ROLE_PATTERN
    return f"""
WITH ex AS (
  SELECT {id_col} AS id,
         regexp_extract_all({text_col}, '{pat}', 1) AS roles,
         regexp_extract_all({text_col}, '{pat}', 2) AS contents
  FROM {table}
), idx AS (
  SELECT id, unnest(range(1, len(roles) + 1)) AS turn_idx, roles, contents
  FROM ex
)
SELECT id AS {id_col}, CAST(turn_idx AS BIGINT) AS turn_idx,
       roles[turn_idx] AS role, contents[turn_idx] AS content,
       CAST(length(contents[turn_idx]) AS BIGINT) AS n_chars
FROM idx ORDER BY {id_col}, turn_idx
"""


def conversation_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-transcript structural QA: ``(id, n_turns, n_system, n_user,
    n_assistant, user_chars, assistant_chars, repeated_role_runs,
    well_formed)``. ``repeated_role_runs`` counts adjacent same-role
    pairs; ``well_formed`` enforces the full structural contract: at
    least one user and one assistant turn, no repeated-role run, opens
    with a system or user turn, the FINAL turn is an assistant turn
    (with no repeats, a trailing user turn is exactly an unanswered
    question), and any system prompt is single and leading. All from
    the role/content arrays — no explode, no shuffle."""
    roles, contents = _extracts(text_col)
    d = df.select(
        F.col(id_col), roles.alias("__r"), contents.alias("__c")
    )
    n = F.size("__r")

    def count_role(name: str):
        return F.size(F.filter(F.col("__r"), lambda r: r == name)).cast("long")

    def chars_role(name: str):
        return F.aggregate(
            F.zip_with(
                F.col("__r"),
                F.col("__c"),
                lambda r, c: F.when(r == name, F.length(c)).otherwise(0),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    repeated = F.when(
        n >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.element_at(F.col("__r"), i)
                == F.element_at(F.col("__r"), i + 1),
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    # try_element_at: an empty transcript has no first/last role (NULL),
    # which the well_formed AND-chain resolves to FALSE via n_user >= 1 —
    # same three-valued outcome as DuckDB's out-of-bounds list index
    first = F.try_element_at(F.col("__r"), F.lit(1))
    # greatest(n, 1): index 0 is invalid even for try_element_at; an empty
    # array then probes index 1 -> out of bounds -> NULL, as intended
    last = F.try_element_at(F.col("__r"), F.greatest(n, F.lit(1)))
    out = d.select(
        F.col(id_col),
        n.cast("long").alias("n_turns"),
        count_role("system").alias("n_system"),
        count_role("user").alias("n_user"),
        count_role("assistant").alias("n_assistant"),
        chars_role("user").alias("user_chars"),
        chars_role("assistant").alias("assistant_chars"),
        repeated.alias("repeated_role_runs"),
        first.alias("__first"),
        last.alias("__last"),
    )
    well = (
        (F.col("n_user") >= 1)
        & (F.col("n_assistant") >= 1)
        & (F.col("repeated_role_runs") == 0)
        & F.col("__first").isin("system", "user")
        & (F.col("__last") == "assistant")
        & (
            (F.col("n_system") == 0)
            | ((F.col("n_system") == 1) & (F.col("__first") == "system"))
        )
    )
    return out.select(
        id_col,
        "n_turns",
        "n_system",
        "n_user",
        "n_assistant",
        "user_chars",
        "assistant_chars",
        "repeated_role_runs",
        well.alias("well_formed"),
    ).orderBy(id_col)


def conversation_report_sql(table: str, id_col: str, text_col: str) -> str:
    pat = ROLE_PATTERN

    def count_role(name: str) -> str:
        return f"CAST(len(list_filter(roles, r -> r = '{name}')) AS BIGINT)"

    def chars_role(name: str) -> str:
        return (
            "CAST(list_sum(list_transform(range(1, len(roles) + 1), "
            f"i -> CASE WHEN roles[i] = '{name}' THEN length(contents[i]) "
            "ELSE 0 END)) AS BIGINT)"
        )

    return f"""
WITH ex AS (
  SELECT {id_col} AS id,
         regexp_extract_all({text_col}, '{pat}', 1) AS roles,
         regexp_extract_all({text_col}, '{pat}', 2) AS contents
  FROM {table}
), m AS (
  SELECT id,
         CAST(len(roles) AS BIGINT) AS n_turns,
         {count_role("system")} AS n_system,
         {count_role("user")} AS n_user,
         {count_role("assistant")} AS n_assistant,
         COALESCE({chars_role("user")}, 0) AS user_chars,
         COALESCE({chars_role("assistant")}, 0) AS assistant_chars,
         CASE WHEN len(roles) >= 2 THEN CAST(len(list_filter(
              range(1, len(roles)), i -> roles[i] = roles[i + 1]))
              AS BIGINT) ELSE 0 END AS repeated_role_runs,
         roles[1] AS first_role,
         roles[len(roles)] AS last_role
  FROM ex
)
SELECT id AS {id_col}, n_turns, n_system, n_user, n_assistant,
       user_chars, assistant_chars, repeated_role_runs,
       (n_user >= 1 AND n_assistant >= 1 AND repeated_role_runs = 0
        AND first_role IN ('system', 'user')
        AND last_role = 'assistant'
        AND (n_system = 0 OR (n_system = 1 AND first_role = 'system')))
         AS well_formed
FROM m ORDER BY {id_col}
"""
