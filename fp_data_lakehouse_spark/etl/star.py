"""Star-schema build: extracted rows -> 4 dimensions + Fact_Nilai_MK.

Batch re-expression of the reference's row-at-a-time get-or-create load
(U1/U2, SURVEY.md §2.3; reference ETL_FINAL.py:128-223): each dimension
is a dedup on its natural key with a deterministic dense surrogate key,
and the fact resolves FKs by equi-joining the dims back on natural keys.

Scale design: the dims are tiny relative to the fact (students, courses,
terms, 7 grades), so every FK-resolution join broadcasts the dim side —
the fact is never shuffled during the build. Surrogate keys come from
``row_number`` over the natural-key ordering, NOT
``monotonically_increasing_id`` (non-deterministic across partitions,
SURVEY.md §1.3); the single-partition window runs over dim-sized data
only, never over the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Grade-letter -> weight map, seeded verbatim from the reference constant
# NILAI_BOBOT (ETL_FINAL.py:27-35; identical at etl_2fact.py:24-32).
NILAI_BOBOT: dict[str, float] = {
    "A": 4.0,
    "AB": 3.5,
    "B": 3.0,
    "BC": 2.5,
    "C": 2.0,
    "D": 1.0,
    "E": 0.0,
}


def _surrogate(df: DataFrame, id_col: str, *order_cols: str) -> DataFrame:
    """Dense deterministic surrogate key 1..N ordered by the natural key
    (replaces AUTO_INCREMENT, ETL_FINAL.py:51). Dim-sized input only."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(id_col, F.row_number().over(w))


def build_dim_nilai(spark: SparkSession, courses: DataFrame | None = None) -> DataFrame:
    """Grade dim: the 7 seeded rows (seed loop, ETL_FINAL.py:123-125)
    plus any unknown grade letters observed in the data, at weight 0.0 —
    the reference's get-or-create on Dim_Nilai admits unknown letters
    with NILAI_BOBOT.get(nilai, 0.0) (ETL_FINAL.py:196,213-218)."""
    rows = [(i + 1, huruf, float(bobot)) for i, (huruf, bobot) in enumerate(NILAI_BOBOT.items())]
    seeded = spark.createDataFrame(rows, "id_nilai INT, huruf STRING, bobot DOUBLE")
    if courses is None:
        return seeded
    unknown = (
        courses.select(F.col("nilai").alias("huruf"))
        .distinct()
        .join(seeded.select("huruf"), "huruf", "left_anti")
        .withColumn("bobot", F.lit(0.0))
    )
    w = Window.orderBy("huruf")
    unknown = unknown.withColumn("id_nilai", (F.row_number().over(w) + len(rows)).cast("int"))
    return seeded.unionByName(unknown.select("id_nilai", "huruf", "bobot"))


def build_dim_mahasiswa(students: DataFrame) -> DataFrame:
    """One row per student, natural key nrp (U1 with nrp, ETL_FINAL.py:182-187)."""
    dedup = students.dropDuplicates(["nrp"]).select(
        "nrp",
        "nama",
        "status",
        "ipk",
        "sks_persiapan",
        "ip_persiapan",
        "sks_sarjana",
        "ip_sarjana",
        "sks_tempuh",
        "sks_lulus",
    )
    return _surrogate(dedup, "id_mahasiswa", "nrp")


def build_dim_matakuliah(courses: DataFrame) -> DataFrame:
    """One row per course, natural key kode_mk (U1, ETL_FINAL.py:199-204).

    The reference keeps the first-seen (nama_mk, sks, tahap) for a code;
    batch equivalent: the lexicographically-smallest WHOLE ROW per code
    (min over a struct) — deterministic regardless of input
    partitioning, and the kept tuple is always one an input row actually
    contained (independent per-column mins could stitch attributes from
    different rows of the same code together).
    """
    dedup = (
        courses.groupBy("kode_mk")
        .agg(F.min(F.struct("nama_mk", "sks", "tahap")).alias("_row"))
        .select("kode_mk", "_row.*")
    )
    return _surrogate(dedup, "id_mk", "kode_mk")


def build_dim_waktu(courses: DataFrame) -> DataFrame:
    """One row per (tahun, semester) term (U1, ETL_FINAL.py:206-211).

    Surrogate ids are assigned in chronological order — the reference
    relies on insertion order matching chronology (etl_2fact.py:206-208,
    SURVEY.md §4.1); ordering by (tahun, semester) makes that explicit
    ('Gasal' < 'Genap' lexicographically == chronologically within a
    year, the reference's own load-bearing string sort).
    """
    dedup = courses.select("tahun", "semester").distinct()
    return _surrogate(dedup, "id_waktu", "tahun", "semester")


def build_fact_nilai_mk(
    courses: DataFrame,
    dim_mahasiswa: DataFrame,
    dim_matakuliah: DataFrame,
    dim_waktu: DataFrame,
    dim_nilai: DataFrame,
    students: DataFrame,
    with_row_ids: bool = False,
) -> DataFrame:
    """Enrollment fact: FK resolution via broadcast joins on natural keys.

    Measures: bobot = grade weight (unknown letters are in the dim at
    0.0, see build_dim_nilai; T9, ETL_FINAL.py:196), bobot_matkul =
    sks * bobot (T10, :197). Composite-key dedup replaces the UNIQUE
    constraint (id_mahasiswa, id_mk, id_waktu, id_nilai) (U2,
    ETL_FINAL.py:100).
    """
    # doc_id -> id_mahasiswa resolved dim-side (tiny x tiny join), so
    # the course-sized stream passes through FOUR broadcast probes, not
    # five — one less codegen'd probe and broadcast build on the only
    # relation that scales.
    nrp_map = students.select("doc_id", "nrp").dropDuplicates(["doc_id"])
    stu_map = nrp_map.join(dim_mahasiswa.select("id_mahasiswa", "nrp"), "nrp").select(
        "doc_id", "id_mahasiswa"
    )
    fact = (
        courses.join(F.broadcast(stu_map), "doc_id")
        .join(F.broadcast(dim_matakuliah.select("id_mk", "kode_mk")), "kode_mk")
        .join(F.broadcast(dim_waktu), ["tahun", "semester"])
        .join(
            F.broadcast(dim_nilai.withColumnRenamed("huruf", "nilai")),
            "nilai",
            "left",
        )
        .select(
            "id_mahasiswa",
            "id_mk",
            "id_waktu",
            "id_nilai",
            F.col("sks"),
            F.coalesce("bobot", F.lit(0.0)).alias("bobot"),
            (F.col("sks") * F.coalesce("bobot", F.lit(0.0))).alias("bobot_matkul"),
            "tahun",
            "semester",
        )
        .dropDuplicates(["id_mahasiswa", "id_mk", "id_waktu", "id_nilai"])
    )
    if with_row_ids:
        # Parity-only: a global row_number forces a single partition, so
        # the PK column is opt-in; nothing downstream (semester fact,
        # insights) consumes it — at 100 TB the composite natural key IS
        # the identity.
        w = Window.orderBy("id_mahasiswa", "id_mk", "id_waktu", "id_nilai")
        fact = fact.withColumn("id_transkrip", F.row_number().over(w))
    return fact


def build_star_schema(
    spark: SparkSession,
    docs: DataFrame,
    students: DataFrame | None = None,
    courses: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full silver build from bronze documents (entry point A lifecycle,
    SURVEY.md §3.1, minus the per-row N+1 round-trips). Callers that
    already extracted (the incremental loader) pass students/courses in
    so the regex pass over the text runs exactly once per batch."""
    from .extract import extract_courses, extract_students

    # Lazy checkpoints: four dims + the fact each trigger their own job
    # (broadcast builds), and every one would otherwise re-run the regex
    # extraction over the full document text. Materializing the
    # extracted frames (far smaller than the raw text) makes extraction
    # a once-per-build cost.
    if students is None:
        students = extract_students(docs).localCheckpoint(eager=False)
    if courses is None:
        courses = (
            extract_courses(docs)
            .join(students.select("doc_id"), "doc_id", "left_semi")
            .localCheckpoint(eager=False)
        )  # courses only from accepted documents (reject path drops the whole file)

    dim_nilai = build_dim_nilai(spark, courses)
    dim_mahasiswa = build_dim_mahasiswa(students)
    dim_matakuliah = build_dim_matakuliah(courses)
    dim_waktu = build_dim_waktu(courses)
    fact = build_fact_nilai_mk(
        courses, dim_mahasiswa, dim_matakuliah, dim_waktu, dim_nilai, students
    )
    return {
        "dim_mahasiswa": dim_mahasiswa,
        "dim_matakuliah": dim_matakuliah,
        "dim_waktu": dim_waktu,
        "dim_nilai": dim_nilai,
        "fact_nilai_mk": fact,
    }


def write_star_schema(tables: dict[str, DataFrame], out_dir: str) -> None:
    """Full-refresh parity with DROP DATABASE + rebuild
    (ETL_FINAL.py:42-44): overwrite-mode parquet writes. On a Delta
    deployment this becomes ``format("delta")`` + MERGE for increments."""
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
