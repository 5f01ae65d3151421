"""Physical-plan regression suite: the 100 TB scale contract.

Correctness tests prove the answers match; these prove the PLANS stay
the ones designed for scale — broadcast star joins, pruned parquet
scans, pushed-down filters, no cartesian products, no row-at-a-time
Python. A regression here is invisible at sf0.001 runtime and fatal at
100 TB, which is exactly why it's asserted in CI.
"""

from __future__ import annotations

import pytest

from fp_data_lakehouse_spark.operators import REGISTRY
from fp_data_lakehouse_spark.plans import (
    count_op,
    has_op,
    physical_plan,
    pushed_filters,
    read_schemas,
)

from .conftest import SF_ORACLE


def _df(spark, name):
    return REGISTRY[name].builder(spark, SF_ORACLE)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_forbidden_operators(spark, name):
    """No query may plan a cartesian product or row-at-a-time Python
    eval (Arrow-batched ArrowEvalPython / mapInPandas are the sanctioned
    Python paths)."""
    plan = physical_plan(_df(spark, name))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_flagship_star_join_broadcasts_dims(spark):
    """The 3-way star join must broadcast both dimension sides; a
    shuffle join against customer-sized dims is wrong at any scale."""
    df = _df(spark, "q02_top10_customers_by_avg_item_value")
    assert count_op(df, "BroadcastHashJoin") >= 2
    assert count_op(df, "SortMergeJoin") == 0


def test_anti_join_keeps_fact_fact_as_shuffle_join(spark):
    """q10's NOT-EXISTS anti-join is lineitem-vs-lineitem: the fact-fact
    side must NOT be broadcast (it scales with the data), while the
    customer/orders dims still broadcast."""
    df = _df(spark, "q10_returned_never_reordered")
    plan = physical_plan(df)
    anti_lines = [
        ln for ln in plan.splitlines() if "LeftAnti" in ln and "Join" in ln
    ]
    assert anti_lines, "expected an anti-join in the plan"
    assert all(
        "SortMergeJoin" in ln or "ShuffledHashJoin" in ln for ln in anti_lines
    ), f"fact-fact anti-join should not broadcast: {anti_lines}"
    assert count_op(df, "BroadcastHashJoin") >= 1


def test_filter_pushdown_reaches_parquet_scan(spark):
    """The returnflag predicate must reach the lineitem scan as a pushed
    filter, not run post-scan only."""
    df = _df(spark, "q10_returned_never_reordered")
    assert "l_returnflag" in pushed_filters(df)


def test_column_pruning_on_wide_fact(spark):
    """q09 touches 3 of lineitem's 11 columns; every scan in the plan
    must read a strict subset, never the full schema."""
    df = _df(spark, "q09_discounted_quantity_per_customer")
    schemas = read_schemas(df)
    assert schemas, "expected parquet scans with ReadSchema annotations"
    for s in schemas:
        assert "l_comment" not in s, f"unpruned lineitem scan: {s}"
        assert "l_shipinstruct" not in s, f"unpruned lineitem scan: {s}"


def test_window_pipeline_shares_one_exchange(spark):
    """ev02's two windows + final groupBy all partition by user_id; the
    plan must contain exactly one shuffle for them (plus none after)."""
    df = _df(spark, "ev02_user_sessions")
    # hashpartitioning(user_id...) appears in exchange nodes; the plan
    # must not re-shuffle between the windows and the aggregation.
    assert count_op(df, "Exchange hashpartitioning") == 1


def test_lsh_band_join_is_equi_join(spark):
    """The MinHash LSH candidate generation must be an equi-join on the
    band key (shuffle or broadcast hash), never a nested-loop over all
    pairs — that's the entire point of banding."""
    df = _df(spark, "dd04_minhash_lsh_pairs")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_asof_join_uses_one_exchange(spark):
    """The union+window as-of join must cost exactly one shuffle (on the
    key) — if a second exchange appears, the formulation regressed to
    a join-shaped plan."""
    df = _df(spark, "ev05_purchase_click_attribution")
    assert count_op(df, "Exchange hashpartitioning") == 1


def test_range_join_is_equi_join_on_buckets(spark):
    """The interval join must plan as an equi-join on (key, bucket) —
    never a nested loop over all per-key pairs."""
    df = _df(spark, "ev08_error_click_proximity")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "_bucket" in plan


def test_rollup_expands_in_single_aggregate(spark):
    """rollup must plan one Expand + aggregation pipeline, not one job
    per grouping set."""
    df = _df(spark, "q32_revenue_rollup")
    assert has_op(df, "Expand")


def test_grouped_map_is_arrow_not_row_python(spark):
    """ag02 must evaluate through the Arrow grouped-map operator."""
    df = _df(spark, "ag02_event_value_outliers")
    assert has_op(df, "FlatMapGroupsInPandas")


def test_exact_dedup_shuffles_fingerprints_not_text(spark):
    """dd02's exchange must carry (fp, doc_id) only — shuffling document
    text to dedup it defeats the fingerprint design."""
    df = _df(spark, "dd02_exact_dedup_keep")
    plan = physical_plan(df)
    ex = plan[plan.index("Exchange") :].splitlines()[0] if "Exchange" in plan else ""
    assert "text" not in ex, f"dedup exchange carries raw text: {ex}"


def test_segment_dedup_shuffles_fingerprints_not_text(spark):
    """dd12's exchanges must carry md5 chunk hashes, never document
    text (the chunking projection happens before any shuffle)."""
    df = _df(spark, "dd12_duplicated_segments")
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, f"segment-dedup exchange carries raw text: {line}"


def test_language_rebalance_broadcasts_rates(spark):
    """sp03's per-language rate table (|langs| rows) must broadcast —
    a shuffle join against a 5-row side is the wrong plan at any scale."""
    df = _df(spark, "sp03_language_rebalance")
    assert has_op(df, "BroadcastHashJoin")


def test_context_packing_partitions_by_source(spark):
    """tx10's cumulative-sum window must partition by source (parallel
    per-source packing), not run as a single-partition global window."""
    df = _df(spark, "tx10_context_packing")
    plan = physical_plan(df)
    assert "SinglePartition" not in plan, "packing serializes through one partition"


def test_pii_scrub_is_map_only(spark):
    """tx11 is pure per-row regex work — no exchange anywhere."""
    df = _df(spark, "tx11_pii_scrub")
    assert not has_op(df, "Exchange")


def test_correlated_subquery_decorrelates_to_broadcast_aggs(spark):
    """q38's correlated scalar subqueries must rewrite to per-nation
    aggregates broadcast back — a per-row subplan (or a shuffle join
    against a 25-row side) is the wrong plan at any scale."""
    df = _df(spark, "q38_above_nation_avg_balance")
    assert count_op(df, "BroadcastHashJoin") >= 2
    assert not has_op(df, "SortMergeJoin")


def test_temporal_split_broadcasts_bounds(spark):
    """sp04's min/max bounds are a 1-row aggregate: they must broadcast
    (partial min/max map-side, then IdentityBroadcast), and assignment
    must stay map-only — no shuffle of the events table itself."""
    df = _df(spark, "sp04_temporal_split")
    plan = physical_plan(df)
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan, "events must not shuffle"


def test_interevent_gaps_share_one_exchange(spark):
    """ev12's LAG window and final groupBy both key on user_id — the
    plan must carry exactly one hash exchange for both."""
    df = _df(spark, "ev12_interevent_gaps")
    assert count_op(df, "Exchange hashpartitioning") == 1


def test_neardup_keep_is_anti_join(spark):
    """dd13's survivor selection must plan as corpus ANTI-JOIN drop-list
    (AQE broadcasts the tiny drop side at runtime) — never a corpus-wide
    text shuffle or product."""
    plan = physical_plan(_df(spark, "dd13_neardup_dedup_keep"))
    assert "LeftAnti" in plan


def test_frame_sample_is_arrow_map(spark):
    """mm03's fake codec must run through Arrow-batched MapInPandas —
    the plumbing a real decoder would drop into."""
    assert has_op(_df(spark, "mm03_frame_sample"), "MapInPandas")


def test_kfold_is_map_only(spark):
    """sp05's fold modulus fuses into the scan — no exchange anywhere."""
    assert not has_op(_df(spark, "sp05_kfold_assignment"), "Exchange")


def test_latest_per_key_single_exchange(spark):
    """dd14's row_number window is the only shuffle: one hash exchange
    on the key, nothing else."""
    df = _df(spark, "dd14_latest_per_key")
    assert count_op(df, "Exchange hashpartitioning") == 1
    assert not has_op(df, "SortMergeJoin")


def test_anomaly_zscore_shuffles_preaggregated_only(spark):
    """ev13 reduces raw events map-side first: two exchanges total
    (hour-count groupBy, then the per-type stats window over the tiny
    counted frame), no joins."""
    df = _df(spark, "ev13_hourly_anomaly_zscore")
    assert count_op(df, "Exchange hashpartitioning") == 2
    assert not has_op(df, "Join")


def test_gapfill_no_product(spark):
    """ev14's grid and observations meet in an equi-join (broadcast at
    fixture scale, co-partitioned SMJ beyond) — never a per-user
    cartesian of grid x events."""
    df = _df(spark, "ev14_gapfill_locf")
    assert not has_op(df, "CartesianProduct")
    assert count_op(df, "Exchange hashpartitioning") <= 3
    assert has_op(df, "Window")


def test_bigram_shuffles_are_aggregates(spark):
    """tx12 shuffles (bigram, doc) pre-aggregates, then |bigrams| counted
    rows — exactly two hash exchanges; the top-k window sorts only the
    final counts frame."""
    assert count_op(_df(spark, "tx12_bigram_topk"), "Exchange hashpartitioning") == 2


def test_grouping_sets_single_pass(spark):
    """q39's three grouping sets must plan as ONE Expand feeding ONE
    hash-aggregate shuffle — not one scan per set."""
    df = _df(spark, "q39_grouping_sets_revenue")
    assert has_op(df, "Expand")
    assert count_op(df, "Exchange hashpartitioning") == 1


def test_markov_transitions_one_corpus_shuffle(spark):
    """ev15: only the user_id LAG exchange scales with the corpus; the
    normalization window runs over the counted |types|^2 matrix."""
    df = _df(spark, "ev15_markov_transitions")
    assert count_op(df, "Exchange hashpartitioning") <= 3
    assert not has_op(df, "Join")


def test_heavy_hitters_broadcast_total(spark):
    """sk05's corpus total must arrive by broadcast, not a shuffle join
    or a collect: one hash exchange (the key groupBy), one broadcast."""
    df = _df(spark, "sk05_heavy_hitters")
    assert count_op(df, "Exchange hashpartitioning") == 1
    assert has_op(df, "BroadcastNestedLoopJoin") or has_op(df, "BroadcastExchange")
    assert not has_op(df, "SortMergeJoin")


def test_ewma_is_arrow_grouped_map(spark):
    """ag03 must run through Arrow FlatMapGroupsInPandas on one user_id
    exchange — never row-at-a-time Python."""
    df = _df(spark, "ag03_user_value_ewma")
    assert has_op(df, "FlatMapGroupsInPandas")
    assert count_op(df, "Exchange hashpartitioning") == 1
    assert not has_op(df, "BatchEvalPython")


def test_kmeans_step_broadcasts_centroids(spark):
    """sim05: each assignment is a k-row broadcast against the corpus —
    the corpus itself must not hash-shuffle for the distance argmin
    (the only hash exchange is the k-group centroid update)."""
    df = _df(spark, "sim05_kmeans_lloyd_step")
    assert count_op(df, "BroadcastNestedLoopJoin") == 2  # two assign passes
    assert not has_op(df, "SortMergeJoin")
    assert not has_op(df, "CartesianProduct")


def test_audio_windows_arrow_map(spark):
    """mm04's window features run through Arrow MapInPandas, no shuffle."""
    df = _df(spark, "mm04_audio_energy_windows")
    assert has_op(df, "MapInPandas")
    assert not has_op(df, "Exchange hashpartitioning")


def test_repetition_score_preaggregated_shuffles(spark):
    """tx13's wide shuffles carry (doc, trigram) pre-aggregates and
    doc-keyed rollups — the token-stat columns fuse into the scan and
    the final join is doc-keyed on both sides."""
    df = _df(spark, "tx13_repetition_score")
    assert not has_op(df, "CartesianProduct")
    assert not has_op(df, "BatchEvalPython")


def test_time_to_conversion_single_aggregate(spark):
    """ev16 is ONE conditional-min groupBy: a single hash exchange, no
    join, no window."""
    df = _df(spark, "ev16_time_to_conversion")
    assert count_op(df, "Exchange hashpartitioning") == 1
    assert not has_op(df, "Join")
    assert not has_op(df, "Window")


def test_prefix_filter_no_product_and_banded_joins(spark):
    """dd15's candidate generation must be an equi-join on (prefix)
    shingles and the verification an equi-join on doc ids — no cartesian
    anywhere, no row-Python."""
    df = _df(spark, "dd15_prefix_filter_jaccard")
    assert not has_op(df, "CartesianProduct")
    assert not has_op(df, "BroadcastNestedLoopJoin")
    assert not has_op(df, "BatchEvalPython")


def test_overlap_join_is_broadcast_equi_join(spark):
    """ev18's interval overlap must plan as a broadcast equi-join on the
    hour epoch — sessions explode into their covered hour buckets, so
    no BETWEEN-driven nested loop ever appears."""
    df = _df(spark, "ev18_session_error_hour_overlap")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_priority_sample_is_topk_not_global_sort(spark):
    """sp06's selection must be TakeOrderedAndProject (per-partition
    heaps + k-row driver merge), never a full Exchange rangepartitioning
    sort of the corpus."""
    df = _df(spark, "sp06_priority_sample")
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_repeated_spans_shuffle_fingerprints_not_text(spark):
    """dd17's exchanges carry (md5, doc_id, pos) triples only; the text
    column dies at the first projection."""
    df = _df(spark, "dd17_repeated_spans")
    plan = physical_plan(df)
    assert not has_op(df, "CartesianProduct")
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchanges and all("text" not in ln for ln in exchanges)


def test_char_diversity_preaggregates_before_exchange(spark):
    """tx15's shuffle must move partial (doc_id, char) counts, not raw
    exploded characters — partial_count before the exchange."""
    df = _df(spark, "tx15_char_diversity")
    plan = physical_plan(df)
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_scd2_shares_custkey_exchange(spark):
    """vt02's LAG change detection, running-sum versioning, groupBy and
    LEAD interval close are all keyed on the customer — the plan must
    not exceed the windows' single hashpartitioning on o_custkey plus
    the post-rename interval window."""
    df = _df(spark, "vt02_scd2_priority_history")
    assert count_op(df, "Exchange hashpartitioning") <= 2
    assert not has_op(df, "CartesianProduct")


def test_constraint_audit_one_pass_per_scalar_family(spark):
    """dq01: the scalar check families fold into single aggregates (no
    join) and the referential check broadcasts the dimension side —
    nothing in the audit may plan a nested loop."""
    df = _df(spark, "dq01_constraint_audit")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mixture_allocation_broadcasts_quota(spark):
    """sp07's allocation math runs on a |sources|-row aggregate that
    must come back to the corpus as a broadcast join, never a shuffle
    of the documents side against a 5-row table."""
    df = _df(spark, "sp07_mixture_allocation_sample")
    assert has_op(df, "BroadcastHashJoin")


def test_multimodal_packing_partitions_by_source(spark):
    """mm05's cumulative-cost window must partition by source (per-source
    batch assembly), not run a global single-partition window."""
    df = _df(spark, "mm05_multimodal_batch_assembly")
    plan = physical_plan(df)
    assert "hashpartitioning(source" in plan


def test_pagerank_copartitioned_round_never_broadcasts_rank_state(spark):
    """pr02's 100 TB contract: above the broadcast cap each round's
    join must be a co-partitioned shuffle join — the node-sized rank
    relation moves, the pinned edge list does not, and NOTHING
    broadcasts (a rank-state broadcast is tens of GB at 1e9 nodes,
    over Spark's 8 GB hard cap)."""
    from fp_data_lakehouse_spark.operators import graph as G

    edges_deg, n, parts = G._prepare_edges(spark, SF_ORACLE)
    rnd = G._pagerank_round(
        edges_deg, G._initial_ranks(edges_deg, n), n,
        broadcast_state=False, parts=parts,
    )
    plan = physical_plan(rnd)
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_salted_join_salt_in_join_keys(spark):
    """q42's join must actually be salted: the physical join keys carry
    the _salt column (hot key spread across reducers), and the fact
    side is never broadcast."""
    df = _df(spark, "q42_salted_skew_join")
    plan = physical_plan(df)
    assert "_salt" in plan


def test_partition_pruned_scan_has_partition_filter(spark):
    """io03's year predicate must prune at the DIRECTORY level: the
    scan carries a PartitionFilters entry on the partition column, so
    non-matching years are never listed, let alone read."""
    df = _df(spark, "io03_partition_pruned_scan")
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "year" in plan
