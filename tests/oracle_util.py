"""Order-insensitive DataFrame-vs-DuckDB comparison, mirroring the
driver's correctness gate (row count + column names + value multiset)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_value(v):
    if v is None:
        return "∅"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 9 significant-ish digits: tolerate engine-order float noise far
        # below the 2-4 decimal rounding every query applies.
        return f"{v:.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "query"):
    got = spark_df.toPandas()
    want = duck_con.sql(sql).df()
    gcols, grows = _normalize(got)
    wcols, wrows = _normalize(want)
    assert gcols == wcols, f"{name}: column mismatch spark={gcols} duckdb={wcols}"
    assert len(grows) == len(wrows), (
        f"{name}: row count mismatch spark={len(grows)} duckdb={len(wrows)}"
    )
    if grows != wrows:
        diff_a = [r for r in grows if r not in set(wrows)][:5]
        diff_b = [r for r in wrows if r not in set(grows)][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_a} duckdb-only={diff_b}"
        )
