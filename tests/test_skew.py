"""salted_join must be result-identical to the plain join while
spreading a hot key over multiple shuffle partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fp_data_lakehouse_spark.operators.skew import salted_join

from .conftest import SF_ORACLE


def _skewed_fixture(spark):
    # 10k rows, 90% on one hot key — the classic power-law fact
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("attr"))
    return fact, dim


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _skewed_fixture(spark)
    plain = {(r.k, r.payload, r.attr) for r in fact.join(dim, "k").collect()}
    salted = {(r.k, r.payload, r.attr) for r in salted_join(fact, dim, "k").collect()}
    assert salted == plain


def test_salted_left_join_matches_plain(spark):
    fact, dim = _skewed_fixture(spark)
    small_dim = dim.filter(F.col("k") < 50)  # force unmatched left rows
    plain = {(r.k, r.payload, r.attr) for r in fact.join(small_dim, "k", "left").collect()}
    salted = {
        (r.k, r.payload, r.attr)
        for r in salted_join(fact, small_dim, "k", how="left").collect()
    }
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in more than one shuffle partition
    of the salted join key — the whole point of the salt."""
    fact, dim = _skewed_fixture(spark)
    salted = fact.withColumn("_salt", (F.rand(seed=0) * 8).cast("int"))
    n_parts = (
        salted.filter(F.col("k") == 7)
        .select(F.countDistinct("_salt").alias("n"))
        .collect()[0]
        .n
    )
    assert n_parts >= 4


def test_salted_join_rejects_right_join(spark):
    fact, dim = _skewed_fixture(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="right")
