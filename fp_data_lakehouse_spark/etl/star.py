"""Star-schema build: extracted rows -> 4 dimensions + Fact_Nilai_MK.

Batch re-expression of the reference's row-at-a-time get-or-create load
(U1/U2, SURVEY.md §2.3; reference ETL_FINAL.py:128-223): each dimension
is a dedup on its natural key with a deterministic dense surrogate key,
and the fact resolves FKs by equi-joining the dims back on natural keys.

Scale design: the dims are tiny relative to the fact (students, courses,
terms, 7 grades), so every FK-resolution join broadcasts the dim side —
the fact is never shuffled during the build. Surrogate keys are dense
ids in natural-key order, NOT ``monotonically_increasing_id``
(non-deterministic across partitions, SURVEY.md §1.3); assignment
auto-dispatches on measured size between a single-partition
``row_number`` window (tiny dims) and a two-pass range-partition +
count/offset + mapInPandas form with no single-partition exchange
(``_surrogate_scale_safe``, certified id-identical by et10) — so a
billion-key dim never funnels through one task.
"""

from __future__ import annotations

import pandas as pd  # module-global: Arrow-batch assigners resolve it at pickle time
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType
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


# Above this row count the surrogate assignment switches from the
# single-partition global window to the two-pass range-partitioned form
# (same ids, no single-partition exchange). The window form is kept for
# genuinely tiny dims where one extra Arrow stage costs more than a
# one-partition sort of a few thousand rows.
_WINDOW_MAX_ROWS = 1_000_000


def _surrogate_window(df: DataFrame, id_col: str, *order_cols: str) -> DataFrame:
    """Global-window surrogate form: dense ids 1..N by natural-key order
    via ``row_number`` over an unpartitioned window — one single-
    partition exchange, so DIM-SIZED (sub-``_WINDOW_MAX_ROWS``) input
    only. Kept both as the tiny-dim fast path and as the semantic
    ground truth the scale-safe form is certified against (et10)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(id_col, F.row_number().over(w))


def _arrange(df: DataFrame, num_partitions: int | None, *order_cols: str) -> DataFrame:
    """Range-partition + sort by the natural key and PIN the layout with
    a lazy localCheckpoint: the count/offset pass and the assignment
    pass must see byte-identical partitions, and downstream consumers
    (fact joins, dim writes) stop recomputing the dedup subtree.
    Idempotent marker: an already-arranged frame passes through."""
    if getattr(df, "_fp_arranged", None) == order_cols:
        return df
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=False)
    )
    arranged._fp_arranged = order_cols
    return arranged


def _surrogate_scale_safe(
    df: DataFrame, id_col: str, *order_cols: str, num_partitions: int | None = None
) -> DataFrame:
    """Two-pass surrogate assignment with NO single-partition exchange —
    the zipWithIndex shape expressed Arrow-side (SCALE.md's described
    fix for the global-window dim build, VERDICT r8 item 2):

    1. range-partition + sort by the natural key (one parallel shuffle;
       equal keys never straddle a boundary) and pin the layout with a
       lazy localCheckpoint so both passes see identical partitions;
    2. collect the per-partition row COUNTS (one tiny job: a
       ``spark_partition_id`` groupBy, #partitions rows), prefix-sum
       them into start offsets on the driver;
    3. assign ``offset[pid] + local_row_number`` in a single narrow
       ``mapInPandas`` pass (Arrow batches in partition-sort order,
       ``TaskContext.partitionId`` keys the offset lookup).

    Ids are identical to ``_surrogate_window``'s: range buckets are in
    key order and rows are sorted within each, so offset + local rank ==
    global rank. Deterministic for unique natural keys (every ``build_*``
    dedups first). Int ids match the window form's ``row_number`` type;
    a dim past 2^31 distinct natural keys would need the obvious LONG
    widening — at that point nothing else here is int either."""
    arranged = _arrange(df, num_partitions, *order_cols)
    counts = {
        r["pid"]: r["n"]
        for r in arranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # StructType.add mutates in place — build a fresh schema, never
    # touch the input frame's cached one
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        list(arranged.schema.fields) + [StructField(id_col, IntegerType(), False)]
    )
    order = [f.name for f in out_schema.fields]

    def _assign(batches):
        from pyspark import TaskContext

        nxt = offsets.get(TaskContext.get().partitionId(), 0) + 1
        for pdf in batches:
            k = len(pdf)
            pdf = pdf.copy()
            pdf[id_col] = pd.array(range(nxt, nxt + k), dtype="int32")
            nxt += k
            yield pdf[order]

    return arranged.mapInPandas(_assign, out_schema)


def _surrogate(
    df: DataFrame, id_col: str, *order_cols: str, scale_safe: bool | None = None
) -> DataFrame:
    """Dense deterministic surrogate key 1..N ordered by the natural key
    (replaces AUTO_INCREMENT, ETL_FINAL.py:51).

    ``scale_safe=None`` (default) decides by measured size: the input
    is lazily checkpointed once (so the probe count, the assignment,
    and every downstream consumer share ONE evaluation of the dedup
    subtree — measured cheaper than the window form's per-consumer
    recompute), then a dim under ``_WINDOW_MAX_ROWS`` takes the
    single-partition window while anything larger takes the two-pass
    offset assignment. The probe deliberately avoids
    ``repartitionByRange`` (its boundary-sampling job + shuffle cost
    ~12% of ETL throughput when every tiny dim paid it); only the
    above-threshold branch pays the range shuffle it actually needs.
    Explicit True/False forces a branch."""
    if scale_safe is False:
        return _surrogate_window(df, id_col, *order_cols)
    if scale_safe is True:
        return _surrogate_scale_safe(df, id_col, *order_cols)
    ck = df.localCheckpoint(eager=False)
    if ck.count() <= _WINDOW_MAX_ROWS:
        return _surrogate_window(ck, id_col, *order_cols)
    return _surrogate_scale_safe(ck, id_col, *order_cols)


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


def build_dim_mahasiswa(
    students: DataFrame, scale_safe: bool | None = None
) -> DataFrame:
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
    return _surrogate(dedup, "id_mahasiswa", "nrp", scale_safe=scale_safe)


def build_dim_matakuliah(
    courses: DataFrame, scale_safe: bool | None = None
) -> DataFrame:
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
    return _surrogate(dedup, "id_mk", "kode_mk", scale_safe=scale_safe)


def build_dim_waktu(courses: DataFrame, scale_safe: bool | None = None) -> DataFrame:
    """One row per (tahun, semester) term (U1, ETL_FINAL.py:206-211).

    Surrogate ids are assigned in chronological order — the reference
    relies on insertion order matching chronology (etl_2fact.py:206-208,
    SURVEY.md §4.1); ordering by (tahun, semester) makes that explicit
    ('Gasal' < 'Genap' lexicographically == chronologically within a
    year, the reference's own load-bearing string sort).
    """
    dedup = courses.select("tahun", "semester").distinct()
    return _surrogate(dedup, "id_waktu", "tahun", "semester", scale_safe=scale_safe)


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
    scale_safe: bool | None = None,
) -> dict[str, DataFrame]:
    """Full silver build from bronze documents (entry point A lifecycle,
    SURVEY.md §3.1, minus the per-row N+1 round-trips). Callers that
    already extracted (the incremental loader) pass students/courses in
    so the regex pass over the text runs exactly once per batch.

    ``scale_safe``: None (default) measures the batch once (the two
    sequential counts below) and dispatches every dim build; an
    explicit True/False skips those probe jobs for callers that
    already know their corpus size (the incremental loader passes it
    through for scheduled re-ingests of a known-shape batch)."""
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

    # ONE job bounds every dim's size (|dim| <= |its dedup input|) and
    # materializes the extraction checkpoints the first dim job would
    # pay for anyway — so the scale-safe dispatch costs the build no
    # extra per-dim probe actions (4 count jobs measured ~12% of ETL
    # throughput; this union is one). The bound is conservative: a
    # huge corpus with few distinct keys takes the scale path for a
    # small dedup output, which stays parallel and correct.
    if scale_safe is None:
        # TWO sequential counts, not one union count: courses' subtree
        # JOINS the students checkpoint, so a single union job races
        # both branches before the students cache is populated and
        # re-runs the regex extraction inside the courses branch
        # (measured ~12% of ETL throughput; sequential counts ~2%,
        # SCALE.md round-10 note). Counting students first materializes
        # its checkpoint once; the courses count then reuses it.
        n_bound = students.count() + courses.count()
        scale_safe = n_bound > _WINDOW_MAX_ROWS
    dim_nilai = build_dim_nilai(spark, courses)
    dim_mahasiswa = build_dim_mahasiswa(students, scale_safe=scale_safe)
    dim_matakuliah = build_dim_matakuliah(courses, scale_safe=scale_safe)
    dim_waktu = build_dim_waktu(courses, scale_safe=scale_safe)
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
