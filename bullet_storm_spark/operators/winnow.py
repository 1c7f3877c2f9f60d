"""Winnowing document fingerprints (Schleimer, Kleinberg, Aiken, SIGMOD'03),
dual-compiled Spark + DuckDB.

``rolling_fingerprint`` (functions/text.py) keeps ONE hash per document —
the global k-gram minimum — which is a blocking key, not a coverage
guarantee. Winnowing keeps the minimum of every ``w`` consecutive k-gram
hashes instead, which yields the classic guarantee: any substring match of
length >= ``w + k - 1`` between two documents shares at least one selected
fingerprint. That makes the fingerprint set a sound candidate generator for
partial-overlap (plagiarism-style) duplicate detection, where whole-document
MinHash under-fires and span chunking (operators/spans.py) needs aligned
chunk boundaries.

Scale shape (100 TB posture):
* per-document work is a pure column expression over the normalized text —
  the gram-hash array is O(n_chars), the window-min pass O(n_chars * w)
  inside codegen'd higher-order functions; no Python, no UDF;
* the fingerprint relation explodes to O(total selected fps) rows
  (~2/(w+1) of gram count by the winnowing density bound), hash-partitioned
  on a uniform 32-bit key;
* pairing is ONE equi-join on the fingerprint value followed by a pair
  groupBy — the exact-dedup plan at fingerprint granularity. Boilerplate
  fingerprints shared by more than ``df_cap`` documents are dropped before
  the join (same skew bound as vocab.tfidf_pairs), so no hot key can
  produce a quadratic bucket.

Reference analog: the reference engine has no sub-document dedup at all
(SURVEY.md §2.6 extensions); semantics follow the paper, position handling
simplified to distinct hash values (robust winnowing's rightmost-min
tie-break only affects positions, not the selected value set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import normalized_text

from bullet_storm_spark.functions.text import _WS  # noqa: E402 (the cross-engine whitespace class)


def _gram_hashes(norm, k: int):
    """Array of 32-bit k-gram hashes of an already-materialized normalized
    text column (callers put an exchange between the normalization regex
    and this, or CollapseProject re-inlines the regex per gram)."""
    n = F.length(norm)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(norm, i, k)), 1, 8), 16, 10
            ).cast("bigint"),
        ),
    )


def _gram_hashes_sql(norm: str, k: int) -> str:
    return (
        f"list_transform(range(1, length({norm}) - {k - 2}), "
        f"i -> ('0x' || substr(md5(substr({norm}, i, {k})), 1, 8))::BIGINT)"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    max_chars: int = 100_000,
) -> DataFrame:
    """(id, fp) — the distinct winnowing fingerprint set per document:
    minimum of each window of ``w`` consecutive k-gram hashes, ordered by
    (id, fp). Documents shorter than k chars produce no rows (no grams).

    ``max_chars`` bounds per-row state: the gram-hash array is one bigint
    per character, so an unbounded megabyte document would materialize a
    multi-MB array inside a single row. Fingerprints come from the first
    ``max_chars`` normalized chars only — for whole-document near-dup
    blocking that prefix is enough (same contract as MinHash's shingle
    sampling); raise it when hunting tail-of-document plagiarism."""
    return winnow_fingerprints_unsorted(
        df, id_col, text_col, k, w, max_chars
    ).orderBy("id", "fp")


def winnow_fingerprints_unsorted(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    max_chars: int = 100_000,
) -> DataFrame:
    """:func:`winnow_fingerprints` without the final (id, fp) sort — the
    form order-insensitive consumers (the pair join, containment
    verification) should take: their first move is a shuffle/aggregate
    that destroys the ordering, so the range exchange + sort would be
    pure waste (guide §2.4, the determinism-only sort)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    # the short-doc filter runs HERE, on the normalized length, and never
    # on __g: a predicate referencing __g gets pushed below the exchange
    # and re-inlines the normalization regex into every gram of the
    # filter's transform — O(chars per doc) regex evaluations per doc
    # (measured 15.3 s vs 1.0 s at sf0.1 for the identical result).
    # ONE hash exchange on the high-cardinality id: it spreads a
    # narrow (single-row-group) scan across the cores AND acts as the
    # optimizer barrier that keeps __norm materialized. Hash beats the
    # previous keyless repartition(par), which pays a local
    # sort-before-repartition per task (SPARK-23207); a second barrier
    # before the window-min pass is unnecessary — CollapseProject never
    # inlines the non-cheap gram array into its multiple __g references
    # (Spark 3.3+ cheap-expression guard; measured identical results,
    # 2.45 s -> 1.01 s steady at sf0.1 for the fingerprint pass).
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.substring(normalized_text(text_col), 1, int(max_chars)).alias(
                "__norm"
            ),
        )
        .where(F.length("__norm") >= k)
        .repartition(par, "id")
    )
    grams = base.select("id", _gram_hashes(F.col("__norm"), k).alias("__g"))
    ng = F.size("__g")
    # window starts: 1 .. max(ng - w + 1, 1) — shorter-than-w docs keep
    # their single global min (degenerate window = whole array). NO
    # array_distinct here: the per-pair .distinct() after the explode
    # already dedups, and an array_distinct inside a Generate input is
    # several times slower on the interpreted HOF path
    fps = F.transform(
        F.sequence(F.lit(1), F.greatest(ng - (w - 1), F.lit(1))),
        lambda i: F.array_min(F.slice("__g", i, w)),
    )
    return grams.select("id", F.explode(fps).alias("fp")).distinct()


def winnow_fingerprints_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    max_chars: int = 100_000,
) -> str:
    from bullet_storm_spark.functions.text import fold_lower_sql

    norm = (
        f"substr(regexp_replace({fold_lower_sql(f'trim({text_col})')},"
        f" '{_WS}', ' ', 'g'), 1, {int(max_chars)})"
    )
    return f"""
WITH grams AS (
  SELECT {id_col} AS id, {_gram_hashes_sql(norm, k)} AS g FROM {table}
  WHERE length({norm}) >= {k}
), fps AS (
  SELECT id, unnest(list_transform(
    range(1, greatest(len(g) - {w - 1}, 1) + 1),
    i -> list_min(g[i : i + {w - 1}])
  )) AS fp
  FROM grams
)
SELECT DISTINCT id, fp FROM fps ORDER BY id, fp
"""


def winnow_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    df_cap: int = 50,
    candidate_pair_budget: int | None = None,
) -> DataFrame:
    """(id_a, id_b, shared) — document pairs sharing >= ``min_shared``
    winnowing fingerprints; fingerprints in more than ``df_cap`` documents
    are dropped before the join (boilerplate / skew bound). One equi-join
    on fp + one pair groupBy — never all-pairs.

    ``candidate_pair_budget`` prices Σ C(s, 2) over the post-``df_cap``
    fingerprint buckets before the fp join runs and raises loudly over
    budget (`operators.pair_budget`, the family-wide guard) — ``df_cap``
    bounds the worst BUCKET, not the candidate TOTAL, and a
    boilerplate-heavy corpus can still emit quadratic pair volume from
    many medium buckets; lower ``df_cap`` or raise ``k`` when it fires.
    """
    fps = winnow_fingerprints_unsorted(df, id_col, text_col, k, w)
    kept = (
        fps.withColumn("__df", F.count("*").over(Window.partitionBy("fp")))
        .where(F.col("__df") <= df_cap)
        .drop("__df")
        # both sides of the fp self-join read this relation; without the
        # cut each side re-runs the whole normalize+gram+window-min
        # pipeline (self-join sides never share an exchange — the build
        # side is a BroadcastExchange, the probe side streams). The
        # fingerprint relation is tiny (~2/(w+1) of gram count, ids and
        # 32-bit hashes only), so materializing it once is cheap at any
        # corpus size (guide §3.3).
        .localCheckpoint()
    )
    if candidate_pair_budget is not None:
        from bullet_storm_spark.operators.pair_budget import (
            check_candidate_pair_budget,
        )

        check_candidate_pair_budget(
            kept.select("fp"),
            ["fp"],
            candidate_pair_budget,
            "winnow_neardup_pairs",
            "Lower df_cap (drops hotter fingerprints) or raise k "
            "(longer, rarer grams); winnow_recall_audit prices the "
            "recall cost of the config.",
        )
    l = kept.alias("l")
    r = kept.alias("r")
    return (
        l.join(r, (F.col("l.fp") == F.col("r.fp")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
        .orderBy("id_a", "id_b")
    )


def winnow_neardup_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    df_cap: int = 50,
) -> str:
    fps = winnow_fingerprints_sql(table, id_col, text_col, k, w).strip().rstrip()
    # strip the trailing ORDER BY of the fingerprint query for CTE reuse
    fps = fps[: fps.rindex("ORDER BY")]
    return f"""
WITH fps AS ({fps}),
kept AS (
  SELECT id, fp FROM (
    SELECT id, fp, COUNT(*) OVER (PARTITION BY fp) AS dfc FROM fps
  ) WHERE dfc <= {df_cap}
)
SELECT l.id AS id_a, r.id AS id_b, COUNT(*) AS shared
FROM kept l JOIN kept r ON l.fp = r.fp AND l.id < r.id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
ORDER BY id_a, id_b
"""


def winnow_recall_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
) -> DataFrame:
    """One-row audit of winnowing's sampling loss on a caller-bounded
    block: ground truth is pairs sharing >= ``min_shared`` distinct
    k-gram hashes outright (equivalently the ``w=1`` pipeline — every
    gram selected), measured against the ``w``-window pairs. Output
    ``(exact_pairs, winnow_found, missed, recall)``.

    The guarantee covers CONTIGUOUS matches >= w+k-1 chars; pairs sharing
    many scattered short grams can be missed, and this measures how often
    that happens on real data — run it before trusting a (k, w) config,
    the same discipline as dedup.lsh_recall_audit / pq.ann_recall_report.
    No df_cap on either side, so the audit isolates the windowing effect;
    keep the block small enough for the exact gram self-join."""
    no_cap = 1 << 60
    exact = winnow_neardup_pairs(
        df, id_col, text_col, k=k, w=1, min_shared=min_shared, df_cap=no_cap
    )
    found = winnow_neardup_pairs(
        df, id_col, text_col, k=k, w=w, min_shared=min_shared, df_cap=no_cap
    ).select("id_a", "id_b", F.lit(1).alias("__found"))
    return exact.join(found, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("exact_pairs"),
        F.sum(F.coalesce(F.col("__found"), F.lit(0)))
        .cast("bigint")
        .alias("winnow_found"),
        F.sum(F.col("__found").isNull().cast("bigint")).alias("missed"),
        F.round(
            F.sum(F.coalesce(F.col("__found"), F.lit(0)))
            / F.nullif(F.count(F.lit(1)), F.lit(0)),
            6,
        ).alias("recall"),
    )


def winnow_recall_audit_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
) -> str:
    no_cap = 1 << 60
    exact = winnow_neardup_pairs_sql(
        table, id_col, text_col, k=k, w=1, min_shared=min_shared, df_cap=no_cap
    )
    found = winnow_neardup_pairs_sql(
        table, id_col, text_col, k=k, w=w, min_shared=min_shared, df_cap=no_cap
    )
    return f"""
WITH exact_pairs AS (SELECT id_a, id_b FROM ({exact})),
winnow_pairs AS (SELECT id_a, id_b, 1 AS found FROM ({found}))
SELECT COUNT(*) AS exact_pairs,
       CAST(SUM(COALESCE(found, 0)) AS BIGINT) AS winnow_found,
       CAST(SUM(CASE WHEN found IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missed,
       CASE WHEN ABS(SUM(COALESCE(found, 0)) / NULLIF(COUNT(*), 0)) >= 1e16 THEN CAST((SUM(COALESCE(found, 0)) / NULLIF(COUNT(*), 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((SUM(COALESCE(found, 0)) / NULLIF(COUNT(*), 0)) * CAST(ABS(SUM(COALESCE(found, 0)) / NULLIF(COUNT(*), 0)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END AS recall
FROM exact_pairs LEFT JOIN winnow_pairs USING (id_a, id_b)
"""


def winnow_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    df_cap: int = 50,
    shingle_n: int = 3,
    threshold: float = 0.8,
    round_to: int = 6,
    candidate_pair_budget: int | None = None,
) -> DataFrame:
    """(id_a, id_b, shared, containment): the SCALE path for asymmetric
    (quote-inclusion) near-dup — winnowing fingerprint candidates,
    containment-verified. Winnowing's shared-fingerprint guarantee is
    length-asymmetric (a contiguous match >= w+k-1 chars shares a
    fingerprint no matter how different the document lengths), which is
    exactly the property MinHash banding lacks for contained pairs; the
    verifier is `dedup.ngram_containment_pairs`' formula evaluated ONLY
    on the candidate set (one fp equi-join + two id-keyed joins — never
    all-pairs)."""
    from bullet_storm_spark.functions.text import shingles

    cands = winnow_neardup_pairs(
        df,
        id_col,
        text_col,
        k=k,
        w=w,
        min_shared=min_shared,
        df_cap=df_cap,
        candidate_pair_budget=candidate_pair_budget,
    )
    base = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    cont = F.round(
        F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        / F.least(F.size(F.col("a.sh")), F.size(F.col("b.sh"))),
        round_to,
    )
    return (
        cands.join(base.alias("a"), F.col("id_a") == F.col("a.id"))
        .join(base.alias("b"), F.col("id_b") == F.col("b.id"))
        .select("id_a", "id_b", "shared", cont.alias("containment"))
        .where(F.col("containment") >= threshold)
        .orderBy("id_a", "id_b")
    )


def winnow_containment_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    df_cap: int = 50,
    shingle_n: int = 3,
    threshold: float = 0.8,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.functions.text import shingles_sql

    cands = winnow_neardup_pairs_sql(
        table, id_col, text_col, k, w, min_shared, df_cap
    ).strip()
    cands = cands[: cands.rindex("ORDER BY")]
    sh = shingles_sql(text_col, shingle_n)
    cont = (
        "len(list_intersect(a.sh, b.sh))"
        " / LEAST(len(a.sh), len(b.sh))::DOUBLE"
    )
    return f"""
WITH __cands AS ({cands}),
__base AS (
  SELECT {id_col} AS id, {sh} AS sh FROM {table}
),
__nonempty AS (SELECT * FROM __base WHERE len(sh) > 0)
SELECT c.id_a, c.id_b, c.shared,
       CASE WHEN ABS({cont}) >= 1e16 THEN CAST(({cont}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({cont}) * CAST(ABS({cont}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS containment
FROM __cands c
JOIN __nonempty a ON c.id_a = a.id
JOIN __nonempty b ON c.id_b = b.id
WHERE CASE WHEN ABS({cont}) >= 1e16 THEN CAST(({cont}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({cont}) * CAST(ABS({cont}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END >= {threshold}
ORDER BY c.id_a, c.id_b
"""
