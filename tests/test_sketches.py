"""Error bounds for the sketch operators against their exact twins —
the same gate pattern as the LSH dedup family: exact operator is the
oracle-checked truth, the sketch must land within its advertised
tolerance of it."""

from __future__ import annotations

from fp_data_lakehouse_spark.operators.sketches import (
    sk01_user_cardinality_exact,
    sk02_user_cardinality_hll,
    sk03_value_quantiles_exact,
    sk04_value_quantiles_approx,
)

from .conftest import SF_ORACLE


def test_hll_cardinality_within_bound(spark):
    exact = {r.event_type: r.n_users for r in sk01_user_cardinality_exact(spark, SF_ORACLE).collect()}
    approx = {r.event_type: r.n_users_approx for r in sk02_user_cardinality_hll(spark, SF_ORACLE).collect()}
    assert set(exact) == set(approx)
    for et, n in exact.items():
        rel_err = abs(approx[et] - n) / max(n, 1)
        # 2% target RSD -> 10% is a ~5-sigma bound; a miss means the
        # sketch config regressed, not bad luck
        assert rel_err <= 0.10, f"{et}: HLL {approx[et]} vs exact {n} ({rel_err:.2%})"


def test_approx_quantiles_within_rank_tolerance(spark):
    """approx_percentile guarantees a RANK error bound (not a value
    bound — in a distribution tail a tiny rank slip is a large value
    gap), so the check is rank-space: the empirical rank of each
    estimate must sit within 2% of its target quantile."""
    approx = {r.event_type: r for r in sk04_value_quantiles_approx(spark, SF_ORACLE).collect()}
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    values = {}
    for r in events.select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)
    for et, r in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.99, "p99")):
            est = getattr(r, name)
            rank = sum(1 for v in vs if v <= est) / n
            assert abs(rank - q) <= 0.02, f"{et}.{name}: est {est} has rank {rank:.3f}"
        # monotonicity of the sketch output
        assert r.p25 <= r.p50 <= r.p75 <= r.p99


def test_count_min_overestimates_and_bounds(spark):
    """CMS guarantees estimate >= exact for every key; with d=4 rows the
    min over rows should keep collision error modest on this corpus."""
    from .conftest import SF_ORACLE
    from fp_data_lakehouse_spark.operators.sketches import sk06_count_min_heavy_users

    rows = sk06_count_min_heavy_users(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 20  # top-20, fewer if the corpus has <20 users
    assert all(r.cms_count >= r.exact_count for r in rows)
    # classic CMS bound: error <= eps * total mass with eps = e/w; keep a
    # loose empirical cap so hash regressions (all keys one bucket) fail
    total = sum(r.exact_count for r in rows)
    assert all(r.cms_count - r.exact_count <= total for r in rows)


def test_portable_hll_estimate_within_bound(spark):
    """sk10: apply the LinearCounting correction HERE (in Python — the
    oracle pins the branch flag + its exact inputs; ln stays out of the
    hashed surface as a conservative choice, see the sk10 design note) and bound
    the corrected estimate: m=64 ⇒ RSE ≈ 1.04/8 = 13%; allow 4 sigma.
    LinearCounting in its regime is tighter, but the same cap holds."""
    import math

    from fp_data_lakehouse_spark.operators.sketches import (
        _HLL_C,
        _HLL_M,
        sk10_portable_hll_state,
    )

    rows = sk10_portable_hll_state(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.n_buckets_used + r.v_empty == _HLL_M
        e_raw = float(_HLL_C) / r.z_scaled
        assert abs(e_raw - r.e_raw) < 1e-9
        est = (
            _HLL_M * math.log(_HLL_M / r.v_empty)
            if r.use_linear_counting
            else e_raw
        )
        rel = abs(est - r.n_users_exact) / max(r.n_users_exact, 1)
        assert rel <= 4 * 1.04 / _HLL_M**0.5, (r, est)


def test_sample_quantiles_within_rank_tolerance(spark):
    """sk11: a k=256 uniform sample has rank-space std ≈
    sqrt(q(1-q)/k) ≤ 0.031; allow 4 sigma, and exactness when the
    group is below k (the sample IS the group there)."""
    from fp_data_lakehouse_spark.operators.sketches import (
        _SKQ_K,
        sk11_sample_quantile_sketch,
    )

    approx = {
        r.event_type: r
        for r in sk11_sample_quantile_sketch(spark, SF_ORACLE).collect()
    }
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    values = {}
    for r in events.select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)
    for et, r in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        assert r.n_sample == min(n, _SKQ_K)
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.99, "p99")):
            est = getattr(r, name)
            rank = sum(1 for v in vs if v <= est) / n
            tol = 0.005 if n <= _SKQ_K else 4 * (q * (1 - q) / _SKQ_K) ** 0.5
            assert abs(rank - q) <= tol, f"{et}.{name}: rank {rank:.3f} vs {q}"
        assert r.p25 <= r.p50 <= r.p75 <= r.p99
