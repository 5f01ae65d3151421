"""Fact_Nilai_Semester derivation: the reference's one hand-rolled
computation (A1-A5, SURVEY.md §2.4; reference etl_2fact.py:200-249).

The reference executes this as O(students × terms) point queries with
running totals carried in Python loop variables; here it collapses to
one grouped aggregation plus cumulative windows — a single shuffle on
(id_mahasiswa, id_waktu), then window passes that reuse the same
partitioning (Spark plans one exchange for both).

Semantic notes preserved from the reference:
- IPS = round(Σ sks·bobot / Σ sks, 2) per (student, term), 0.0 when the
  denominator is 0 (etl_2fact.py:228-230).
- IPK = the same ratio over the student's running totals in
  chronological term order (etl_2fact.py:232-235). The reference orders
  terms by surrogate id (insertion order, A1 quirk); we order by
  (tahun, semester) explicitly — same result because transcripts list
  terms chronologically, and correct even when they don't.
- id_nilai = MAX surrogate grade id in the (student, term) group — the
  reference's ORDER BY id_nilai DESC LIMIT 1 "representative grade"
  (A4 quirk, etl_2fact.py:238-244): max id, NOT max/min weight.

Rounding: bobot is a multiple of 0.5, so sks·bobot·10 is an exact
integer; both ratios are rounded with exact integer HALF_UP division
(see operators/relational.py rationale) — deterministic under any
partition order, unlike Python round() on floats (banker's + float
repr), which the oracle tests replicate on the DuckDB side with the
same integer formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _round_ratio_2(numer10: str, denom: str):
    """round(numer10 / (10*denom), 2) via exact integer HALF_UP division;
    0.0 when the denominator is 0 (etl_2fact.py:229-230)."""
    return F.when(F.col(denom) == 0, F.lit(0.0)).otherwise(
        F.expr(f"(2 * {numer10} * 100 + (10 * {denom})) div (2 * (10 * {denom}))") / 100.0
    )


def build_fact_nilai_semester(fact_nilai_mk: DataFrame) -> DataFrame:
    """fact_nilai_mk -> one row per (student, term) with IPS, IPK and the
    representative grade id (A1-A5)."""
    # A2: per-(student, term) totals. bobot10 = sks * bobot * 10, exact.
    per_term = (
        fact_nilai_mk.withColumn(
            "_bobot10", (F.col("sks") * F.round(F.col("bobot") * 10).cast("long")).cast("long")
        )
        .groupBy("id_mahasiswa", "id_waktu", "tahun", "semester")
        .agg(
            F.sum("sks").alias("total_sks"),
            F.sum("_bobot10").alias("total_bobot10"),
            # A4: representative grade = max surrogate id in the group.
            F.max("id_nilai").alias("id_nilai"),
        )
    )

    # A3: running cumulative totals per student in chronological order.
    w_cum = (
        Window.partitionBy("id_mahasiswa")
        .orderBy("tahun", "semester")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_term.withColumn("cum_sks", F.sum("total_sks").over(w_cum))
        .withColumn("cum_bobot10", F.sum("total_bobot10").over(w_cum))
        .select(
            "id_mahasiswa",
            "id_waktu",
            "id_nilai",
            "tahun",
            "semester",
            _round_ratio_2("total_bobot10", "total_sks").alias("ips"),
            _round_ratio_2("cum_bobot10", "cum_sks").alias("ipk"),
        )
    )
