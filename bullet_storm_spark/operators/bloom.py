"""Bloom-filter membership index for scale-out dedup probes, dual-compiled.

The incremental-dedup path (operators/dedup.py band_index) answers "have we
seen this document before?" with a join against a persisted index — correct,
but the probe side still shuffles candidate keys. A Bloom filter compresses
the seen-key set into a bitmap ~100-1000x smaller than the keys themselves
(``m`` bits for any number of keys, false-positive rate set by bits/key),
so the membership probe becomes a PURE SCAN EXPRESSION: no shuffle, no join,
no state on the probe side. That is the 100 TB posture for the common
pipeline question "drop everything we already trained on": build once over
the historical corpus, broadcast the bitmap, stream the new corpus through
a filter. False positives drop a few fresh documents (tunable, auditable
below); false negatives never happen.

Design:
* hashing is Kirsch-Mitzenmacher over one md5 per key (two 32-bit halves
  h1, h2; probe position i is (h1 + i*h2) mod m) — the same deterministic,
  engine-portable scheme the MinHash signatures use, so the Spark plan and
  the DuckDB oracle agree bit-for-bit;
* the bitmap is stored as 32-bit words in BIGINT columns (no sign-bit
  traffic, so `>>`/`&`/`%` behave identically in both engines);
* ``bloom_build`` is one explode + one groupBy on <= m/32 distinct words —
  the only shuffle in the whole lifecycle, bounded by the FILTER size, not
  the corpus size;
* ``bloom_probe`` embeds the words as an array literal in the plan (fine to
  ~tens of MB; a filter too big for plan embedding switches to a broadcast
  equi-join on word_idx with the same semantics).

Reference anchor: the reference engine's duplicate-query suppression and
its sketch-backed aggregations (SURVEY.md §2.4) are the same
bounded-memory-summary idea; this applies it to corpus membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WORD = 32  # bits per stored word; BIGINT-held, so all values stay positive
_MOD = 1 << 32


def _halves(key: Column) -> tuple[Column, Column]:
    md5 = F.md5(key)
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("bigint")
    return h1, h2


def _halves_sql(key: str) -> tuple[str, str]:
    return (
        f"('0x' || substr(md5({key}), 1, 8))::BIGINT",
        f"('0x' || substr(md5({key}), 9, 8))::BIGINT",
    )


def _check_params(m_bits: int, k: int) -> None:
    if m_bits < _WORD or m_bits % _WORD:
        raise ValueError(f"m_bits must be a positive multiple of {_WORD}, got {m_bits}")
    if not 1 <= k <= 32:
        raise ValueError(f"need 1 <= k <= 32 hash probes, got {k}")


def bloom_build(
    df: DataFrame, key_col: Column | str, m_bits: int = 4096, k: int = 5
) -> DataFrame:
    """(word_idx, bits): the non-zero 32-bit words of an m-bit Bloom filter
    over the distinct values of ``key_col``, as (h1 + i*h2) mod m probe
    positions for i in [0, k). Zero words are omitted (the probe treats a
    missing word as 0), so the result is also a sparse representation."""
    _check_params(m_bits, k)
    h1, h2 = _halves(F.col(key_col) if isinstance(key_col, str) else key_col)
    positions = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.pmod(h1 + i.cast("bigint") * h2, F.lit(m_bits)),
        )
    )
    return (
        df.select(positions.alias("__p"))
        .distinct()
        .groupBy((F.col("__p") / _WORD).cast("bigint").alias("word_idx"))
        .agg(
            F.expr(f"bit_or(shiftleft(1L, cast(pmod(__p, {_WORD}) as int)))").alias(
                "bits"
            )
        )
        .orderBy("word_idx")
    )


def bloom_build_sql(
    table: str, key_expr: str, m_bits: int = 4096, k: int = 5
) -> str:
    _check_params(m_bits, k)
    h1, h2 = _halves_sql("__key")
    return f"""
WITH __keys AS (SELECT DISTINCT {key_expr} AS __key FROM {table}),
__pos AS (
  SELECT DISTINCT (({h1}) + t.i * ({h2})) % {m_bits} AS __p
  FROM __keys, range(0, {k}) t(i)
)
SELECT __p // {_WORD} AS word_idx,
       bit_or((1::BIGINT) << CAST(__p % {_WORD} AS INTEGER)) AS bits
FROM __pos GROUP BY 1 ORDER BY word_idx
"""


def bloom_words(df: DataFrame, key_col: Column | str, m_bits: int = 4096, k: int = 5) -> list[int]:
    """Driver-side dense word array (length m_bits/32) of the filter —
    the broadcastable artifact bloom_probe embeds. The collect is bounded
    by the FILTER size (m_bits/32 rows), never the corpus."""
    dense = [0] * (m_bits // _WORD)
    for r in bloom_build(df, key_col, m_bits=m_bits, k=k).collect():
        dense[int(r["word_idx"])] = int(r["bits"])
    return dense


def bloom_maybe_member(
    key: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """Boolean scan expression: all k probe bits set in the embedded word
    array. No shuffle, no join — this is the probe-side hot path. The bit
    mask comes from a 32-literal power-of-two array (Spark's shiftleft
    only takes literal shift amounts) and the test is a single bitwise
    AND — both exact integer ops, value-identical to the previous
    (word div 2^bit) mod 2 form but without its per-probe transcendental
    pow(2.0, x) and floor division (guide §1.2 per-task work; the result
    cannot change regardless: the filter admits a superset and the
    downstream join discards false positives)."""
    _check_params(m_bits, k)
    if len(words) != m_bits // _WORD:
        raise ValueError(f"need {m_bits // _WORD} words, got {len(words)}")
    h1, h2 = _halves(key)
    arr = F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    pow2 = F.array(*[F.lit(1 << b).cast("bigint") for b in range(_WORD)])
    conds = []
    for i in range(k):
        p = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(arr, F.floor(p / _WORD).cast("int") + 1)
        mask = F.element_at(pow2, F.pmod(p, F.lit(_WORD)).cast("int") + 1)
        conds.append(word.bitwiseAND(mask) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_probe_audit(
    df: DataFrame,
    id_col: str,
    key_col: str,
    seen_filter: Column,
    m_bits: int = 4096,
    k: int = 5,
) -> DataFrame:
    """(id, maybe_member, is_member, false_positive): probe EVERY row's key
    against a Bloom filter built over the rows matching ``seen_filter``,
    alongside exact membership — the filter-quality audit run before
    trusting a bits/key + k configuration at scale. ``maybe_member`` is the
    pure-expression probe; ``is_member`` is a broadcast semi-check against
    the (distinct) seen keys; a false positive is maybe AND NOT is.
    No false negatives is a STRUCTURAL guarantee (asserted in tests)."""
    seen = df.where(seen_filter)
    words = bloom_words(seen, key_col, m_bits=m_bits, k=k)
    seen_keys = seen.select(F.col(key_col).alias("__seen_key")).distinct()
    probe = df.select(
        F.col(id_col).alias(id_col),
        F.col(key_col).alias("__key"),
        bloom_maybe_member(F.col(key_col), words, m_bits, k).alias("maybe_member"),
    )
    return (
        probe.join(
            F.broadcast(seen_keys.withColumn("__hit", F.lit(True))),
            probe["__key"] == F.col("__seen_key"),
            "left",
        )
        .select(
            id_col,
            "maybe_member",
            F.coalesce(F.col("__hit"), F.lit(False)).alias("is_member"),
            (F.col("maybe_member") & ~F.coalesce(F.col("__hit"), F.lit(False))).alias(
                "false_positive"
            ),
        )
        .orderBy(id_col)
    )


def bloom_probe_audit_sql(
    table: str,
    id_col: str,
    key_expr: str,
    seen_where: str,
    m_bits: int = 4096,
    k: int = 5,
) -> str:
    _check_params(m_bits, k)
    h1, h2 = _halves_sql("__key")
    return f"""
WITH __seen AS (
  SELECT DISTINCT {key_expr} AS __key FROM {table} WHERE {seen_where}
),
__pos AS (
  SELECT DISTINCT (({h1}) + t.i * ({h2})) % {m_bits} AS __p
  FROM __seen, range(0, {k}) t(i)
),
__bitmap AS (
  SELECT __p // {_WORD} AS word_idx,
         bit_or((1::BIGINT) << CAST(__p % {_WORD} AS INTEGER)) AS bits
  FROM __pos GROUP BY 1
),
__probe AS (
  SELECT {id_col} AS __id, {key_expr} AS __key FROM {table}
),
__ppos AS (
  SELECT __id, __key, t.i AS __i,
         (({h1}) + t.i * ({h2})) % {m_bits} AS __p
  FROM __probe, range(0, {k}) t(i)
),
__hits AS (
  SELECT __id, __key,
         MIN(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits >> CAST(__p % {_WORD} AS INTEGER)) & 1 = 1
                  THEN 1 ELSE 0 END) AS __all_set
  FROM __ppos LEFT JOIN __bitmap b ON __p // {_WORD} = b.word_idx
  GROUP BY __id, __key
)
SELECT h.__id AS {id_col},
       h.__all_set = 1 AS maybe_member,
       s.__key IS NOT NULL AS is_member,
       (h.__all_set = 1 AND s.__key IS NULL) AS false_positive
FROM __hits h LEFT JOIN __seen s ON h.__key = s.__key
ORDER BY h.__id
"""
