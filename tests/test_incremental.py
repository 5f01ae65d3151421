"""Incremental ELT semantics: surrogate-key stability, idempotent
redelivery, and convergence to the full-rebuild answer (modulo
surrogate id VALUES, which depend on arrival order exactly as the
reference's AUTO_INCREMENT did — equality is checked on natural keys).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from fp_data_lakehouse_spark.etl import build_star_schema
from fp_data_lakehouse_spark.etl.incremental import incremental_load

from .transcript_fixtures import make_documents


@pytest.fixture()
def wh():
    d = tempfile.mkdtemp(prefix="incr_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id STRING, text STRING")


def _fact_natural(spark, wh_dir):
    """Fact re-keyed to natural keys so it compares across id spaces."""
    f = spark.read.parquet(f"{wh_dir}/fact_nilai_mk.parquet")
    dm = spark.read.parquet(f"{wh_dir}/dim_mahasiswa.parquet")
    dk = spark.read.parquet(f"{wh_dir}/dim_matakuliah.parquet")
    dn = spark.read.parquet(f"{wh_dir}/dim_nilai.parquet")
    rows = (
        f.join(dm.select("id_mahasiswa", "nrp"), "id_mahasiswa")
        .join(dk.select("id_mk", "kode_mk"), "id_mk")
        .join(dn.select("id_nilai", "huruf"), "id_nilai")
        .select("nrp", "kode_mk", "tahun", "semester", "huruf", "sks", "bobot")
    )
    return {tuple(r) for r in rows.collect()}


def test_incremental_converges_to_full_rebuild(spark, wh):
    docs = make_documents()
    batch1 = docs[:20]
    batch2 = docs[10:]  # 10-doc overlap exercises redelivery + new keys

    incremental_load(spark, _docs_df(spark, batch1), wh)
    ids_after_b1 = {
        r.nrp: r.id_mahasiswa
        for r in spark.read.parquet(f"{wh}/dim_mahasiswa.parquet").collect()
    }
    incremental_load(spark, _docs_df(spark, batch2), wh)

    # surrogate stability: every batch-1 student keeps its id
    ids_after_b2 = {
        r.nrp: r.id_mahasiswa
        for r in spark.read.parquet(f"{wh}/dim_mahasiswa.parquet").collect()
    }
    for nrp, i in ids_after_b1.items():
        assert ids_after_b2[nrp] == i
    # new members got ids strictly above the old max
    new_ids = [i for nrp, i in ids_after_b2.items() if nrp not in ids_after_b1]
    assert new_ids and min(new_ids) > max(ids_after_b1.values())

    # natural-key content equals a one-shot full rebuild
    full = build_star_schema(spark, _docs_df(spark, docs))
    dm, dk, dn = full["dim_mahasiswa"], full["dim_matakuliah"], full["dim_nilai"]
    want = {
        tuple(r)
        for r in full["fact_nilai_mk"]
        .join(dm.select("id_mahasiswa", "nrp"), "id_mahasiswa")
        .join(dk.select("id_mk", "kode_mk"), "id_mk")
        .join(dn.select("id_nilai", "huruf"), "id_nilai")
        .select("nrp", "kode_mk", "tahun", "semester", "huruf", "sks", "bobot")
        .collect()
    }
    assert _fact_natural(spark, wh) == want


def test_incremental_redelivery_is_noop(spark, wh):
    docs = make_documents()
    incremental_load(spark, _docs_df(spark, docs[:15]), wh)
    before = _fact_natural(spark, wh)
    n_sem_before = spark.read.parquet(f"{wh}/fact_nilai_semester.parquet").count()

    incremental_load(spark, _docs_df(spark, docs[:15]), wh)  # same batch again
    assert _fact_natural(spark, wh) == before
    assert spark.read.parquet(f"{wh}/fact_nilai_semester.parquet").count() == n_sem_before


def test_incremental_semester_fact_recomputes(spark, wh):
    """A student gaining a new term must shift their cumulative IPK in
    the recomputed gold fact."""
    docs = make_documents()
    incremental_load(spark, _docs_df(spark, docs[:20]), wh)
    sem1 = spark.read.parquet(f"{wh}/fact_nilai_semester.parquet").count()
    incremental_load(spark, _docs_df(spark, docs[20:]), wh)
    sem2 = spark.read.parquet(f"{wh}/fact_nilai_semester.parquet").count()
    assert sem2 > sem1  # new students/terms appear in the derived fact
