"""Skew-resilient join: salting for hot keys.

AQE's skew-join splitting (enabled session-wide here) handles most skew
by splitting oversized partitions at runtime, but it only works for
sort-merge joins and after a shuffle already materialized the hot
partition. Salting restructures the shuffle itself: the skewed side
gets a random salt in [0, n), the other side is replicated n times (one
row per salt), and the join key becomes (key, salt) — a hot key's rows
spread over n reducers instead of one. The classic recipe for fact
tables with power-law keys (user_id, null-heavy FKs) joining medium
dimension tables too big to broadcast.

Cost model: replicates the non-skewed side n_salts times through the
shuffle — pick n_salts ~ (hot-key rows / average-partition rows), keep
the replicated side the smaller one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with the skewed side's hot
    keys spread across ``n_salts`` shuffle partitions.

    Semantically identical to ``skewed.join(other, on, how)`` for inner
    and left joins (asserted in tests); right/full joins would need the
    salt on the other side's null-extension and are rejected.

    The salt on the skewed side is ``rand``-derived but the JOIN RESULT
    is deterministic: every (key, salt) pair finds exactly the same
    matches, the salt only picks which reducer does the work.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salted = skewed.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, keys + ["_salt"], how).drop("_salt")
