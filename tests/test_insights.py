"""Golden end-to-end: the 29 insight queries over the transcript star
schema built by the full pipeline, each compared against its DuckDB SQL
twin on views of the same tables (SURVEY.md §5)."""

from __future__ import annotations

import duckdb
import pytest

from fp_data_lakehouse_spark.etl import build_fact_nilai_semester, build_star_schema
from fp_data_lakehouse_spark.etl.insights import INSIGHTS

from .oracle_util import assert_matches_oracle
from .transcript_fixtures import make_documents


@pytest.fixture(scope="module")
def star(spark):
    docs = spark.createDataFrame(make_documents(), "doc_id STRING, text STRING").coalesce(4)
    tables = build_star_schema(spark, docs)
    tables["fact_nilai_semester"] = build_fact_nilai_semester(tables["fact_nilai_mk"])
    for df in tables.values():
        df.cache().count()
    return tables


@pytest.fixture(scope="module")
def duck_star(star):
    con = duckdb.connect()
    for name, df in star.items():
        con.register(name, df.toPandas())
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(INSIGHTS))
def test_insight_matches_duckdb(star, duck_star, name):
    spec = INSIGHTS[name]
    assert_matches_oracle(spec.builder(star), duck_star, spec.sql, name=name)


def test_all_29_insights_present():
    assert len(INSIGHTS) == 29
