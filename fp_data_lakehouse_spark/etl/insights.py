"""The 29 analytic insights on the transcript star schema — the
reference's entire query corpus (insight_transkrip.sql:1-356),
re-expressed as DataFrame plans over the tables built by ``star`` /
``semester``.

Each insight is registered as ``(builder, duckdb_sql)``: the builder
takes the dict returned by ``build_star_schema`` (+ the semester fact
under ``fact_nilai_semester``) and the SQL runs on DuckDB views of the
same tables — the golden-differential test harness in
tests/test_insights.py executes both and compares value sets, mirroring
the reference-parity claim query by query.

W below = the weighted GPA ratio SUM(bobot*sks)/SUM(sks) that the
corpus uses throughout. All rounded ratios use exact integer HALF_UP
division (bobot is a multiple of 0.5 → bobot*10 integral; see
operators/relational.py for why float ROUND cannot hash-match across
engines). Where the reference rounds an AVG of unrounded per-entity
ratios, we round the per-entity ratio first (exact 2-decimal values),
then average — documented divergence of at most 0.005 per entity,
applied identically on both comparison sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Tables = dict[str, DataFrame]


@dataclass(frozen=True)
class InsightSpec:
    name: str
    builder: Callable[[Tables], DataFrame]
    sql: str


INSIGHTS: dict[str, InsightSpec] = {}


def insight(name: str, sql: str):
    def deco(fn):
        INSIGHTS[name] = InsightSpec(name, fn, sql)
        return fn

    return deco


# --- shared pieces -----------------------------------------------------------


def _enrollment(t: Tables) -> DataFrame:
    """fact ⋈ grade dim ⋈ course dim (the 3-way core of most insights);
    dims broadcast, fact untouched."""
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_nilai"]), "id_nilai")
        .join(F.broadcast(t["dim_matakuliah"].select("id_mk", "kode_mk", "nama_mk", "sks")), "id_mk")
    )


def _fact_keys(t: Tables) -> DataFrame:
    """fact_nilai_mk reduced to its FK columns — the denormalized
    sks/bobot copies stay out of dim joins to avoid ambiguity."""
    return t["fact_nilai_mk"].select("id_mahasiswa", "id_mk", "id_waktu", "id_nilai")


def _sem(t: Tables) -> DataFrame:
    """fact_nilai_semester without its denormalized (tahun, semester)
    columns, so joins to dim_waktu stay unambiguous."""
    return t["fact_nilai_semester"].select("id_mahasiswa", "id_waktu", "id_nilai", "ips", "ipk")


def _b10(col: str = "bobot"):
    """Grade weight as exact integer half-points (bobot*10)."""
    return F.round(F.col(col) * 10).cast("long")


# round(S_b10*sks / (10*S_sks), 2) exactly — the W expression.
def _w_rounded(sum_b10sks: str, sum_sks: str):
    return F.expr(
        f"(2 * {sum_b10sks} * 100 + (10 * {sum_sks})) div (2 * (10 * {sum_sks}))"
    ) / 100.0


_W_SQL = (
    "((2 * SUM(CAST(ROUND(n.bobot * 10) AS BIGINT) * mk.sks) * 100"
    " + (10 * SUM(mk.sks))) // (2 * (10 * SUM(mk.sks)))) / 100.0"
)

# round(SUM(cents)/COUNT/100, 2) for 2-decimal columns (ipk, ip_*).
_AVG_CENTS_SQL = (
    "((2 * SUM(CAST(ROUND({col} * 100) AS BIGINT)) * 100 + (COUNT(*) * 100))"
    " // (2 * (COUNT(*) * 100))) / 100.0"
)


def _avg_cents(col: str):
    return (
        F.expr(
            f"(2 * SUM(CAST(ROUND({col} * 100) AS BIGINT)) * 100 + (COUNT(*) * 100))"
            f" div (2 * (COUNT(*) * 100))"
        )
        / 100.0
    )


# round(SUM(b10)/(10*COUNT), 2): unweighted mean of grade weights.
_AVG_B10_SQL = (
    "((2 * SUM(CAST(ROUND({col} * 10) AS BIGINT)) * 100 + (10 * COUNT(*)))"
    " // (2 * (10 * COUNT(*)))) / 100.0"
)


def _avg_b10(col: str):
    return (
        F.expr(
            f"(2 * SUM(CAST(ROUND({col} * 10) AS BIGINT)) * 100 + (10 * COUNT(*)))"
            f" div (2 * (10 * COUNT(*)))"
        )
        / 100.0
    )


# --- insight 1 (insight_transkrip.sql:1-13) ---------------------------------


@insight(
    "i01_mean_gpa_all_students",
    f"""
    SELECT {_AVG_CENTS_SQL.format(col="gpa")} AS rata_rata_ipk
    FROM (
        SELECT f.id_mahasiswa, {_W_SQL} AS gpa
        FROM fact_nilai_mk f
        JOIN dim_nilai n ON f.id_nilai = n.id_nilai
        JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
        GROUP BY f.id_mahasiswa
    ) per_student
    """,
)
def i01_mean_gpa_all_students(t: Tables) -> DataFrame:
    """Mean GPA over all students: derived-table agg-of-agg."""
    per_student = (
        _enrollment(t)
        .groupBy("id_mahasiswa")
        .agg(F.sum(_b10() * F.col("sks")).alias("_bs"), F.sum("sks").alias("_s"))
        .select(_w_rounded("_bs", "_s").alias("gpa"))
    )
    return per_student.agg(_avg_cents("gpa").alias("rata_rata_ipk"))


# --- insight 2 (insight_transkrip.sql:15-25) --------------------------------


@insight(
    "i02_top10_students_by_gpa",
    f"""
    SELECT m.nrp, m.nama, {_W_SQL} AS ipk_hitung
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    GROUP BY m.id_mahasiswa, m.nrp, m.nama
    ORDER BY ipk_hitung DESC, m.nrp ASC
    LIMIT 10
    """,
)
def i02_top10_students_by_gpa(t: Tables) -> DataFrame:
    """Top-10 by weighted GPA; the MySQL functional-dependency GROUP BY
    becomes an explicit composite key; nrp tie-break for determinism."""
    return (
        _enrollment(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .groupBy("id_mahasiswa", "nrp", "nama")
        .agg(F.sum(_b10() * F.col("sks")).alias("_bs"), F.sum("sks").alias("_s"))
        .select("nrp", "nama", _w_rounded("_bs", "_s").alias("ipk_hitung"))
        .orderBy(F.desc("ipk_hitung"), F.asc("nrp"))
        .limit(10)
    )


# --- insight 3 (insight_transkrip.sql:27-34) --------------------------------


@insight(
    "i03_grade_distribution",
    """
    SELECT n.huruf, COUNT(*) AS jumlah
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    GROUP BY n.huruf
    """,
)
def i03_grade_distribution(t: Tables) -> DataFrame:
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_nilai"]), "id_nilai")
        .groupBy("huruf")
        .agg(F.count(F.lit(1)).alias("jumlah"))
    )


# --- insights 4/5 (insight_transkrip.sql:36-56) -----------------------------

_COURSE_AVG_SQL = f"""
        SELECT mk.kode_mk, mk.nama_mk, {_AVG_B10_SQL.format(col="n.bobot")} AS rata_bobot
        FROM fact_nilai_mk f
        JOIN dim_nilai n ON f.id_nilai = n.id_nilai
        JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
        GROUP BY mk.kode_mk, mk.nama_mk
"""


def _course_avg(t: Tables) -> DataFrame:
    return (
        _enrollment(t)
        .groupBy("kode_mk", "nama_mk")
        .agg(_avg_b10("bobot").alias("rata_bobot"))
    )


@insight(
    "i04_hardest_courses",
    f"SELECT * FROM ({_COURSE_AVG_SQL}) ORDER BY rata_bobot ASC, kode_mk ASC LIMIT 5",
)
def i04_hardest_courses(t: Tables) -> DataFrame:
    """Bottom-5 courses by mean grade weight."""
    return _course_avg(t).orderBy(F.asc("rata_bobot"), F.asc("kode_mk")).limit(5)


@insight(
    "i05_easiest_courses",
    f"SELECT * FROM ({_COURSE_AVG_SQL}) ORDER BY rata_bobot DESC, kode_mk ASC LIMIT 5",
)
def i05_easiest_courses(t: Tables) -> DataFrame:
    return _course_avg(t).orderBy(F.desc("rata_bobot"), F.asc("kode_mk")).limit(5)


# --- insights 6/7 (insight_transkrip.sql:58-77) -----------------------------


@insight(
    "i06_gpa_odd_vs_even_semester",
    f"""
    SELECT w.semester, {_W_SQL} AS rata_nilai
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    JOIN dim_waktu w ON f.id_waktu = w.id_waktu
    GROUP BY w.semester
    """,
)
def i06_gpa_odd_vs_even_semester(t: Tables) -> DataFrame:
    return (
        _enrollment(t)
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .groupBy("semester")
        .agg(F.sum(_b10() * F.col("sks")).alias("_bs"), F.sum("sks").alias("_s"))
        .select("semester", _w_rounded("_bs", "_s").alias("rata_nilai"))
    )


@insight(
    "i07_gpa_per_term",
    f"""
    SELECT w.tahun, w.semester, {_W_SQL} AS rata_nilai
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    JOIN dim_waktu w ON f.id_waktu = w.id_waktu
    GROUP BY w.tahun, w.semester
    """,
)
def i07_gpa_per_term(t: Tables) -> DataFrame:
    return (
        _enrollment(t)
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .groupBy("tahun", "semester")
        .agg(F.sum(_b10() * F.col("sks")).alias("_bs"), F.sum("sks").alias("_s"))
        .select("tahun", "semester", _w_rounded("_bs", "_s").alias("rata_nilai"))
    )


# --- insight 8 (insight_transkrip.sql:79-87) --------------------------------


@insight(
    "i08_most_taken_courses",
    """
    SELECT mk.kode_mk, mk.nama_mk, COUNT(*) AS jumlah_pengambilan
    FROM fact_nilai_mk f
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    GROUP BY mk.kode_mk, mk.nama_mk
    ORDER BY jumlah_pengambilan DESC, mk.kode_mk ASC
    LIMIT 5
    """,
)
def i08_most_taken_courses(t: Tables) -> DataFrame:
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_matakuliah"]), "id_mk")
        .groupBy("kode_mk", "nama_mk")
        .agg(F.count(F.lit(1)).alias("jumlah_pengambilan"))
        .orderBy(F.desc("jumlah_pengambilan"), F.asc("kode_mk"))
        .limit(5)
    )


# --- insight 9 (insight_transkrip.sql:89-98) --------------------------------


@insight(
    "i09_passed_credits_per_student",
    """
    SELECT m.nrp, m.nama, CAST(SUM(mk.sks) AS BIGINT) AS sks_lulus_hitung
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    WHERE n.bobot >= 2.0
    GROUP BY m.nrp, m.nama
    """,
)
def i09_passed_credits_per_student(t: Tables) -> DataFrame:
    """Filter on the joined grade dim (bobot >= 2.0 == pass), SUM(sks)."""
    return (
        _enrollment(t)
        .filter(F.col("bobot") >= 2.0)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .groupBy("nrp", "nama")
        .agg(F.sum("sks").alias("sks_lulus_hitung"))
    )


# --- insight 10 (insight_transkrip.sql:100-115) -----------------------------


@insight(
    "i10_unresolved_failures",
    """
    SELECT DISTINCT m.nrp, m.nama, mk.kode_mk, mk.nama_mk
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    WHERE n.huruf IN ('D', 'E')
      AND NOT EXISTS (
        SELECT 1
        FROM fact_nilai_mk f2
        JOIN dim_nilai n2 ON f2.id_nilai = n2.id_nilai
        WHERE f2.id_mahasiswa = f.id_mahasiswa
          AND f2.id_mk = f.id_mk
          AND n2.huruf NOT IN ('D', 'E')
      )
    """,
)
def i10_unresolved_failures(t: Tables) -> DataFrame:
    """D/E grades never cleared by a passing retake: anti-join on the
    (student, course) pair — the NOT EXISTS decorrelation emitted
    directly as left_anti."""
    graded = _fact_keys(t).join(F.broadcast(t["dim_nilai"]), "id_nilai")
    failing = graded.filter(F.col("huruf").isin("D", "E")).select("id_mahasiswa", "id_mk")
    passing = (
        graded.filter(~F.col("huruf").isin("D", "E")).select("id_mahasiswa", "id_mk").distinct()
    )
    return (
        failing.join(passing, ["id_mahasiswa", "id_mk"], "left_anti")
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .join(F.broadcast(t["dim_matakuliah"].select("id_mk", "kode_mk", "nama_mk")), "id_mk")
        .select("nrp", "nama", "kode_mk", "nama_mk")
        .distinct()
    )


# --- insight 11 (insight_transkrip.sql:117-127) -----------------------------


@insight(
    "i11_course_retakes",
    """
    SELECT m.nrp, mk.kode_mk, COUNT(*) AS jumlah_ambil
    FROM fact_nilai_mk f
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    GROUP BY m.nrp, mk.kode_mk
    HAVING COUNT(*) > 1
    """,
)
def i11_course_retakes(t: Tables) -> DataFrame:
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp")), "id_mahasiswa")
        .join(F.broadcast(t["dim_matakuliah"].select("id_mk", "kode_mk")), "id_mk")
        .groupBy("nrp", "kode_mk")
        .agg(F.count(F.lit(1)).alias("jumlah_ambil"))
        .filter(F.col("jumlah_ambil") > 1)
    )


# --- insight 12 (insight_transkrip.sql:129-134) -----------------------------


@insight(
    "i12_stage_gpa_comparison",
    f"""
    SELECT {_AVG_CENTS_SQL.format(col="ip_persiapan")} AS rata_persiapan,
           {_AVG_CENTS_SQL.format(col="ip_sarjana")} AS rata_sarjana
    FROM dim_mahasiswa
    WHERE ip_persiapan > 0 AND ip_sarjana > 0
    """,
)
def i12_stage_gpa_comparison(t: Tables) -> DataFrame:
    return (
        t["dim_mahasiswa"]
        .filter((F.col("ip_persiapan") > 0) & (F.col("ip_sarjana") > 0))
        .agg(
            _avg_cents("ip_persiapan").alias("rata_persiapan"),
            _avg_cents("ip_sarjana").alias("rata_sarjana"),
        )
    )


# --- insights 13/14 (insight_transkrip.sql:136-146) -------------------------


@insight(
    "i13_top5_prep_stage_gpa",
    """
    SELECT nrp, nama, ip_persiapan FROM dim_mahasiswa
    ORDER BY ip_persiapan DESC, nrp ASC LIMIT 5
    """,
)
def i13_top5_prep_stage_gpa(t: Tables) -> DataFrame:
    return (
        t["dim_mahasiswa"]
        .select("nrp", "nama", "ip_persiapan")
        .orderBy(F.desc("ip_persiapan"), F.asc("nrp"))
        .limit(5)
    )


@insight(
    "i14_top5_undergrad_gpa",
    """
    SELECT nrp, nama, ip_sarjana FROM dim_mahasiswa
    ORDER BY ip_sarjana DESC, nrp ASC LIMIT 5
    """,
)
def i14_top5_undergrad_gpa(t: Tables) -> DataFrame:
    return (
        t["dim_mahasiswa"]
        .select("nrp", "nama", "ip_sarjana")
        .orderBy(F.desc("ip_sarjana"), F.asc("nrp"))
        .limit(5)
    )


# --- insight 15 (insight_transkrip.sql:148-156) -----------------------------


@insight(
    "i15_pass_fail_per_course",
    """
    SELECT mk.kode_mk, mk.nama_mk,
           CAST(SUM(CASE WHEN n.huruf NOT IN ('D','E') THEN 1 ELSE 0 END) AS BIGINT) AS lulus,
           CAST(SUM(CASE WHEN n.huruf IN ('D','E') THEN 1 ELSE 0 END) AS BIGINT) AS gagal
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_matakuliah mk ON f.id_mk = mk.id_mk
    GROUP BY mk.kode_mk, mk.nama_mk
    """,
)
def i15_pass_fail_per_course(t: Tables) -> DataFrame:
    """Conditional aggregation (manual pivot on pass/fail)."""
    return (
        _enrollment(t)
        .groupBy("kode_mk", "nama_mk")
        .agg(
            F.sum(F.when(~F.col("huruf").isin("D", "E"), 1).otherwise(0)).alias("lulus"),
            F.sum(F.when(F.col("huruf").isin("D", "E"), 1).otherwise(0)).alias("gagal"),
        )
    )


# --- insights 16/17 (insight_transkrip.sql:158-186) -------------------------

_JALUR_SQL = """
        CASE
            WHEN substring(nrp, 8, 3) BETWEEN '001' AND '042' THEN 'SNBP'
            WHEN substring(nrp, 8, 3) BETWEEN '043' AND '116' THEN 'SNBT'
            WHEN substring(nrp, 8, 3) BETWEEN '117' AND '232' THEN 'Mandiri'
            ELSE 'Lainnya'
        END
"""


def _jalur_col():
    serial = F.substring("nrp", 8, 3)
    return (
        F.when(serial.between("001", "042"), "SNBP")
        .when(serial.between("043", "116"), "SNBT")
        .when(serial.between("117", "232"), "Mandiri")
        .otherwise("Lainnya")
    )


@insight(
    "i16_admission_path",
    f"SELECT nrp, nama, {_JALUR_SQL} AS jalur_masuk FROM dim_mahasiswa",
)
def i16_admission_path(t: Tables) -> DataFrame:
    """Admission path from NRP digits 8-10: string-range CASE binning."""
    return t["dim_mahasiswa"].select("nrp", "nama", _jalur_col().alias("jalur_masuk"))


@insight(
    "i17_gpa_by_admission_path",
    f"""
    SELECT jalur_masuk, {_AVG_CENTS_SQL.format(col="ipk")} AS rata_ipk,
           COUNT(*) AS jumlah_mahasiswa
    FROM (SELECT ipk, {_JALUR_SQL} AS jalur_masuk FROM dim_mahasiswa) j
    GROUP BY jalur_masuk
    """,
)
def i17_gpa_by_admission_path(t: Tables) -> DataFrame:
    return (
        t["dim_mahasiswa"]
        .select("ipk", _jalur_col().alias("jalur_masuk"))
        .groupBy("jalur_masuk")
        .agg(
            _avg_cents("ipk").alias("rata_ipk"),
            F.count(F.lit(1)).alias("jumlah_mahasiswa"),
        )
    )


# --- insight 18 (insight_transkrip.sql:188-197) -----------------------------


@insight(
    "i18_mean_grade_per_student",
    f"""
    SELECT m.nrp, m.nama, {_AVG_B10_SQL.format(col="n.bobot")} AS rata_bobot
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    GROUP BY m.nrp, m.nama
    """,
)
def i18_mean_grade_per_student(t: Tables) -> DataFrame:
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_nilai"]), "id_nilai")
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .groupBy("nrp", "nama")
        .agg(_avg_b10("bobot").alias("rata_bobot"))
    )


# --- insight 19 (insight_transkrip.sql:199-208) -----------------------------


@insight(
    "i19_semesters_attended",
    """
    SELECT m.nrp, m.nama,
           COUNT(DISTINCT concat_ws('-', w.tahun, w.semester)) AS jumlah_semester
    FROM fact_nilai_mk f
    JOIN dim_waktu w ON f.id_waktu = w.id_waktu
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    GROUP BY m.nrp, m.nama
    """,
)
def i19_semesters_attended(t: Tables) -> DataFrame:
    """COUNT(DISTINCT CONCAT(tahun,'-',semester)) per student."""
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .groupBy("nrp", "nama")
        .agg(F.countDistinct(F.concat_ws("-", "tahun", "semester")).alias("jumlah_semester"))
    )


# --- insight 20 (insight_transkrip.sql:210-219) -----------------------------


@insight(
    "i20_worst_grade_per_student",
    """
    SELECT m.nrp, m.nama, MIN(n.bobot) AS bobot_terendah
    FROM fact_nilai_mk f
    JOIN dim_nilai n ON f.id_nilai = n.id_nilai
    JOIN dim_mahasiswa m ON f.id_mahasiswa = m.id_mahasiswa
    GROUP BY m.nrp, m.nama
    """,
)
def i20_worst_grade_per_student(t: Tables) -> DataFrame:
    return (
        _fact_keys(t)
        .join(F.broadcast(t["dim_nilai"]), "id_nilai")
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .groupBy("nrp", "nama")
        .agg(F.min("bobot").alias("bobot_terendah"))
    )


# --- insight 21 (insight_transkrip.sql:221-230) -----------------------------


@insight(
    "i21_ips_trend",
    """
    SELECT m.nrp, w.tahun, w.semester, s.ips
    FROM fact_nilai_semester s
    JOIN dim_mahasiswa m ON s.id_mahasiswa = m.id_mahasiswa
    JOIN dim_waktu w ON s.id_waktu = w.id_waktu
    """,
)
def i21_ips_trend(t: Tables) -> DataFrame:
    """Detail projection; the reference's multi-key ORDER BY is
    presentation-only ('Gasal' < 'Genap' string sort is chronological)."""
    return (
        _sem(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp")), "id_mahasiswa")
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .select("nrp", "tahun", "semester", "ips")
    )


# --- insight 22 (insight_transkrip.sql:232-255) -----------------------------

_STUDENT_TERM_W_SQL = "PARTITION BY s.id_mahasiswa ORDER BY w.tahun, w.semester"


@insight(
    "i22_biggest_ips_jump",
    f"""
    SELECT * FROM (
        SELECT m.nrp,
               concat_ws('-', LAG(w.tahun) OVER ({_STUDENT_TERM_W_SQL}),
                              LAG(w.semester) OVER ({_STUDENT_TERM_W_SQL})) AS semester_sebelum,
               concat_ws('-', w.tahun, w.semester) AS semester_sekarang,
               LAG(s.ips) OVER ({_STUDENT_TERM_W_SQL}) AS ips_sebelum,
               s.ips,
               ROUND(s.ips - LAG(s.ips) OVER ({_STUDENT_TERM_W_SQL}), 2) AS kenaikan
        FROM fact_nilai_semester s
        JOIN dim_mahasiswa m ON s.id_mahasiswa = m.id_mahasiswa
        JOIN dim_waktu w ON s.id_waktu = w.id_waktu
    ) d
    WHERE ips_sebelum IS NOT NULL
    ORDER BY kenaikan DESC, nrp ASC, semester_sekarang ASC
    LIMIT 10
    """,
)
def i22_biggest_ips_jump(t: Tables) -> DataFrame:
    """LAG x3 over the per-student chronological window, diff, top-10.
    ips values are exact 2-decimal doubles, so ROUND of their difference
    is boundary-safe (the value is never near a .xx5 half)."""
    w = Window.partitionBy("id_mahasiswa").orderBy("tahun", "semester")
    joined = (
        _sem(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp")), "id_mahasiswa")
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
    )
    return (
        joined.select(
            "nrp",
            F.concat_ws("-", F.lag("tahun").over(w), F.lag("semester").over(w)).alias(
                "semester_sebelum"
            ),
            F.concat_ws("-", "tahun", "semester").alias("semester_sekarang"),
            F.lag("ips").over(w).alias("ips_sebelum"),
            "ips",
            F.round(F.col("ips") - F.lag("ips").over(w), 2).alias("kenaikan"),
        )
        .filter(F.col("ips_sebelum").isNotNull())
        .orderBy(F.desc("kenaikan"), F.asc("nrp"), F.asc("semester_sekarang"))
        .limit(10)
    )


# --- insight 23 (insight_transkrip.sql:258-266) -----------------------------


@insight(
    "i23_stable_high_gpa",
    """
    SELECT m.nrp, m.nama, MIN(s.ipk) AS ipk_min, MAX(s.ipk) AS ipk_max
    FROM fact_nilai_semester s
    JOIN dim_mahasiswa m ON s.id_mahasiswa = m.id_mahasiswa
    GROUP BY m.nrp, m.nama
    HAVING MIN(s.ipk) >= 3.5
    """,
)
def i23_stable_high_gpa(t: Tables) -> DataFrame:
    return (
        _sem(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp", "nama")), "id_mahasiswa")
        .groupBy("nrp", "nama")
        .agg(F.min("ipk").alias("ipk_min"), F.max("ipk").alias("ipk_max"))
        .filter(F.col("ipk_min") >= 3.5)
    )


# --- insight 24 (insight_transkrip.sql:268-280) -----------------------------


@insight(
    "i24_first_vs_last_ipk",
    f"""
    SELECT {_AVG_CENTS_SQL.format(col="ipk_awal")} AS rata_ipk_awal,
           {_AVG_CENTS_SQL.format(col="ipk_akhir")} AS rata_ipk_akhir
    FROM (
        SELECT DISTINCT s.id_mahasiswa,
               FIRST_VALUE(s.ipk) OVER ({_STUDENT_TERM_W_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ipk_awal,
               LAST_VALUE(s.ipk) OVER ({_STUDENT_TERM_W_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ipk_akhir
        FROM fact_nilai_semester s
        JOIN dim_waktu w ON s.id_waktu = w.id_waktu
    ) fl
    """,
)
def i24_first_vs_last_ipk(t: Tables) -> DataFrame:
    """FIRST/LAST_VALUE with the explicit unbounded frame, dedup, AVG x2."""
    w = (
        Window.partitionBy("id_mahasiswa")
        .orderBy("tahun", "semester")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        _sem(t)
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .select(
            "id_mahasiswa",
            F.first("ipk").over(w).alias("ipk_awal"),
            F.last("ipk").over(w).alias("ipk_akhir"),
        )
        .distinct()
        .agg(
            _avg_cents("ipk_awal").alias("rata_ipk_awal"),
            _avg_cents("ipk_akhir").alias("rata_ipk_akhir"),
        )
    )


# --- insight 25 (insight_transkrip.sql:283-294) -----------------------------


@insight(
    "i25_students_ending_below_2",
    """
    SELECT COUNT(*) AS jumlah_mahasiswa
    FROM (
        SELECT s.id_mahasiswa, s.ipk,
               RANK() OVER (PARTITION BY s.id_mahasiswa
                            ORDER BY w.tahun DESC, w.semester DESC) AS urutan
        FROM fact_nilai_semester s
        JOIN dim_waktu w ON s.id_waktu = w.id_waktu
    ) latest
    WHERE urutan = 1 AND ipk < 2.0
    """,
)
def i25_students_ending_below_2(t: Tables) -> DataFrame:
    """Latest-term-per-student via RANK DESC, filter, global COUNT.
    (tahun, semester) is unique per student at this grain, so rank 1 is
    a single row."""
    w = Window.partitionBy("id_mahasiswa").orderBy(F.desc("tahun"), F.desc("semester"))
    return (
        _sem(t)
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .select("id_mahasiswa", "ipk", F.rank().over(w).alias("urutan"))
        .filter((F.col("urutan") == 1) & (F.col("ipk") < 2.0))
        .agg(F.count(F.lit(1)).alias("jumlah_mahasiswa"))
    )


# --- insight 26 (insight_transkrip.sql:296-302) -----------------------------


@insight(
    "i26_ips_distribution",
    """
    SELECT m.nrp, s.ips
    FROM fact_nilai_semester s
    JOIN dim_mahasiswa m ON s.id_mahasiswa = m.id_mahasiswa
    """,
)
def i26_ips_distribution(t: Tables) -> DataFrame:
    return (
        _sem(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp")), "id_mahasiswa")
        .select("nrp", "ips")
    )


# --- insight 27 (insight_transkrip.sql:304-322) -----------------------------


@insight(
    "i27_consecutive_ips_pairs",
    f"""
    SELECT * FROM (
        SELECT m.nrp, w.tahun, w.semester, s.ips,
               LAG(s.ips) OVER ({_STUDENT_TERM_W_SQL}) AS ips_sebelum
        FROM fact_nilai_semester s
        JOIN dim_mahasiswa m ON s.id_mahasiswa = m.id_mahasiswa
        JOIN dim_waktu w ON s.id_waktu = w.id_waktu
    ) d
    WHERE ips_sebelum IS NOT NULL
    """,
)
def i27_consecutive_ips_pairs(t: Tables) -> DataFrame:
    """Consecutive-semester IPS pairs. The reference hand-rolls this as a
    theta self-join with a correlated NOT EXISTS between-exclusion whose
    OR/AND precedence actually binds the NOT EXISTS to only one disjunct
    (SURVEY.md §2.5 Q27); we implement the intended previous-row
    semantics via LAG — O(n log n) instead of the O(n²) self-join, which
    is the only viable form at 100 TB."""
    w = Window.partitionBy("id_mahasiswa").orderBy("tahun", "semester")
    return (
        _sem(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp")), "id_mahasiswa")
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .select(
            "nrp",
            "tahun",
            "semester",
            "ips",
            F.lag("ips").over(w).alias("ips_sebelum"),
        )
        .filter(F.col("ips_sebelum").isNotNull())
    )


# --- insight 28 (insight_transkrip.sql:324-335) -----------------------------


@insight(
    "i28_ranking_per_term",
    """
    SELECT m.nrp, w.tahun, w.semester, s.ips,
           RANK() OVER (PARTITION BY w.tahun, w.semester ORDER BY s.ips DESC) AS peringkat
    FROM fact_nilai_semester s
    JOIN dim_mahasiswa m ON s.id_mahasiswa = m.id_mahasiswa
    JOIN dim_waktu w ON s.id_waktu = w.id_waktu
    """,
)
def i28_ranking_per_term(t: Tables) -> DataFrame:
    w = Window.partitionBy("tahun", "semester").orderBy(F.desc("ips"))
    return (
        _sem(t)
        .join(F.broadcast(t["dim_mahasiswa"].select("id_mahasiswa", "nrp")), "id_mahasiswa")
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .select("nrp", "tahun", "semester", "ips", F.rank().over(w).alias("peringkat"))
    )


# --- insight 29 (insight_transkrip.sql:337-356) -----------------------------


@insight(
    "i29_biggest_collective_drop",
    f"""
    SELECT * FROM (
        SELECT tahun, semester, rata_ips,
               ROUND(rata_ips - LAG(rata_ips) OVER (ORDER BY tahun, semester), 2) AS penurunan
        FROM (
            SELECT w.tahun, w.semester,
                   {_AVG_CENTS_SQL.format(col="s.ips")} AS rata_ips
            FROM fact_nilai_semester s
            JOIN dim_waktu w ON s.id_waktu = w.id_waktu
            GROUP BY w.tahun, w.semester
        ) per_term
    ) d
    WHERE penurunan IS NOT NULL
    ORDER BY penurunan ASC, tahun ASC, semester ASC
    LIMIT 1
    """,
)
def i29_biggest_collective_drop(t: Tables) -> DataFrame:
    """Window-after-aggregate: per-term mean IPS, LAG diff, min. The
    global window runs over |terms| rows — aggregate first, window
    after."""
    per_term = (
        _sem(t)
        .join(F.broadcast(t["dim_waktu"]), "id_waktu")
        .groupBy("tahun", "semester")
        .agg(_avg_cents("ips").alias("rata_ips"))
    )
    w = Window.orderBy("tahun", "semester")
    return (
        per_term.select(
            "tahun",
            "semester",
            "rata_ips",
            F.round(F.col("rata_ips") - F.lag("rata_ips").over(w), 2).alias("penurunan"),
        )
        .filter(F.col("penurunan").isNotNull())
        .orderBy(F.asc("penurunan"), F.asc("tahun"), F.asc("semester"))
        .limit(1)
    )
