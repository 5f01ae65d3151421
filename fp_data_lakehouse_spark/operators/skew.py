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


# ---------------------------------------------------------------------------
# q42: the salted join certified on the driver's hard signal. The
# fixture data is uniform, so the skew is synthesized: half of lineitem
# collapses onto supplier key 1 (a power-law hot key by construction),
# then the salted fact⋈supplier join must produce byte-identical
# aggregates to the oracle's PLAIN join — the salt may only choose
# which reducer does the work, never the answer.
# ---------------------------------------------------------------------------

_Q42_SQL = """
WITH fact AS (
    SELECT CASE WHEN l_partkey % 2 = 0 THEN 1 ELSE l_suppkey END AS k,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
)
SELECT s.s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.cents) AS BIGINT) AS sum_cents
FROM fact f JOIN supplier s ON f.k = s.s_suppkey
GROUP BY s.s_nationkey
"""


def _q42_register() -> None:
    from ..sources.catalog import load_table
    from .registry import register

    @register("q42_salted_skew_join", oracle=_Q42_SQL)
    def q42_salted_skew_join(spark, sf_dir) -> DataFrame:
        """Skew-resilient fact⋈dim join: half the fact rows are collapsed
        onto one supplier key (synthetic power-law hot key), the join runs
        through ``salted_join`` (key spread over 8 salts, dim replicated),
        and the per-nation aggregate must match the oracle's plain join
        exactly — integer cents, so the equality is bit-level at any
        partition order.

        At 100 TB this is the shape for power-law FKs joining dims too
        big to broadcast: AQE's skew splitting only repairs sort-merge
        partitions after the hot shuffle block exists; salting
        restructures the shuffle so the hot key lands on 8 reducers in
        the first place (module note above). The salt column is visible
        in the join's plan keys (plan-asserted)."""
        li = load_table(spark, sf_dir, "lineitem")
        fact = li.select(
            F.when(F.col("l_partkey") % 2 == 0, F.lit(1))
            .otherwise(F.col("l_suppkey"))
            .cast("long")
            .alias("k"),
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        dim = load_table(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").cast("long").alias("k"), "s_nationkey"
        )
        return (
            salted_join(fact, dim, "k")
            .groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
        )


_q42_register()
