"""Candidate-pair budget pricing for banded/blocked pair generators.

Every near-dup pair generator in this engine is blocked — candidates
come from a hash equi-join on a bucket key, never an all-pairs loop —
but blocking bounds the JOIN SHAPE, not the OUTPUT SIZE: the candidate
volume is Σ C(s, 2) over bucket sizes, and a near-dup-dense corpus can
make that explode quadratically while the wall-clock plan still "looks
linear" (measured: the weak-scaling sweep found simhash pair OUTPUT
growing as sf^2.3, and one hot band bucket at sf3 emitted a multi-GB
shuffle task that ran for 10+ minutes before being killed —
WEAK_SCALING.json). At 100 TB that is a hung stage, not a slow one.

This module is the automated pre-flight shared by ALL pair families
(the r10 ``simhash_pairs(candidate_pair_budget=...)`` precedent made
uniform): one cheap wordcount-shaped aggregation over the generator's
OWN blocking rows prices the candidate output BEFORE any pair
materializes, and raises loudly — with the bucket workload table —
when it exceeds the caller's budget. The manual planning reports
(``lsh_band_plan``, ``simhash_bucket_profile``, ``block_size_audit``)
remain the *tuning* tools; this is the *guard rail* that makes an
unattended 100 TB sweep fail fast with an actionable message instead
of melting a shuffle.

Engine parity note: the price is integer-exact — C(s, 2) via
``(s*(s-1)) >> 1`` (always even, so the shift is exact in BIGINT; a
double ``/2`` would round past 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CandidatePairBudgetExceeded(ValueError):
    """The blocked join would emit more candidate pairs than the budget.

    A ``ValueError`` so existing ``candidate_pair_budget`` call sites
    (and the r10 simhash tests) keep matching; the subclass carries the
    machine-readable workload for callers that want to re-plan
    (tighten bands, raise ``df_cap``, excise hot buckets) instead of
    just aborting."""

    def __init__(
        self,
        op: str,
        total: int,
        budget: int,
        workload: list[dict],
        hint: str,
    ) -> None:
        self.op = op
        self.total = total
        self.budget = budget
        self.workload = workload
        detail = ", ".join(
            f"{r['block']}: {r['candidate_pairs']} pairs "
            f"(hottest bucket {r['max_bucket']} rows)"
            for r in workload
        )
        super().__init__(
            f"{op} blocking would emit {total} candidate pairs "
            f"(> budget {budget}): {detail}. {hint}"
        )


def price_candidate_pairs(
    blocked: DataFrame, bucket_cols: list[str], block_col: str | None = None
) -> DataFrame:
    """Per-block candidate-pair workload of a blocking layout:
    ``(block, n_buckets, n_rows, max_bucket, candidate_pairs)`` with
    ``candidate_pairs = Σ C(s, 2)`` over the block's bucket sizes —
    exactly the pair volume a self-join on ``bucket_cols`` with an
    ``id < id`` residual will emit. ``block_col`` (one of the bucket
    columns, e.g. the band index) splits the report so the error names
    WHICH band/table is hot; without it the report is one row.

    Cost: one double aggregation over the byte-cheap blocking rows —
    no join, no pair rows, same scan the generator itself performs.
    """
    sizes = blocked.groupBy(
        *[F.col(c) for c in bucket_cols]
    ).agg(F.count(F.lit(1)).cast("long").alias("__s"))
    key = (
        F.col(block_col).cast("string")
        if block_col is not None
        else F.lit("all")
    )
    pairs = F.sum(
        F.shiftright((F.col("__s") * (F.col("__s") - F.lit(1))).cast("long"), 1)
    )
    return (
        sizes.groupBy(key.alias("block"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("__s").cast("long").alias("n_rows"),
            F.max("__s").cast("long").alias("max_bucket"),
            pairs.cast("long").alias("candidate_pairs"),
        )
        .orderBy("block")
    )


def check_candidate_pair_budget(
    blocked: DataFrame,
    bucket_cols: list[str],
    budget: int,
    op: str,
    hint: str,
    block_col: str | None = None,
) -> None:
    """Price the blocked self-join and raise
    :class:`CandidatePairBudgetExceeded` when Σ C(s, 2) > ``budget``.

    Runs ONE aggregation job (the generator's own blocking rows, ids
    only) and nothing else; under budget it returns silently and the
    generator proceeds with its normal plan.
    """
    workload = [
        r.asDict()
        for r in price_candidate_pairs(blocked, bucket_cols, block_col).collect()
    ]
    total = sum(r["candidate_pairs"] for r in workload)
    if total > budget:
        raise CandidatePairBudgetExceeded(op, total, budget, workload, hint)
