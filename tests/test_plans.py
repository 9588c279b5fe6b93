"""Physical-plan assertions: the scale properties we designed for must be
visible in the plan, not hoped for (broadcast joins on dim sides, parquet
filter pushdown, no Python boundary in pure-SQL paths, Arrow — not pickle —
for the one pandas UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.enrich import enrich_posts
from live_social_media_sentiment_trend_tracker_using_kafka_spark.plans import (
    assert_broadcast_join,
    assert_no_python_udf,
    count_plan_nodes,
    plan_text,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.plans.hints import (
    DIM_BROADCAST_THRESHOLD_CONF,
    broadcast_dim,
    estimated_plan_bytes,
)
from live_social_media_sentiment_trend_tracker_using_kafka_spark.schema import POST_SCHEMA

SF = "/root/testdata/sf0.01"


def test_shipping_priority_broadcasts_customer(spark):
    df = entrymod.q_shipping_priority(spark, SF)
    assert_broadcast_join(df, expected=1)
    assert_no_python_udf(df)


def test_local_supplier_volume_broadcasts_dims(spark):
    df = entrymod.q_local_supplier_volume(spark, SF)
    assert_broadcast_join(df, expected=3)
    assert_no_python_udf(df)


def test_pricing_summary_pushes_shipdate_filter(spark):
    df = entrymod.q_pricing_summary(spark, SF)
    plan = plan_text(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan
    assert_no_python_udf(df)


def test_scan_prunes_columns(spark):
    df = entrymod.q_top_customers(spark, SF)
    plan = plan_text(df)
    # orders scan must read only the 3 needed columns, not all 6
    scan = plan.split("ReadSchema: ")[1]
    assert "o_orderstatus" not in scan.split("\n")[0]
    assert_no_python_udf(df)


def test_analytics_paths_stay_jvm_side(spark):
    for name in ("flagship_event_summary", "token_topk", "doc_quality",
                 "sentiment_label_counts", "lang_id_counts", "exact_dedup_groups",
                 "minhash_near_dups", "simhash_near_dups"):
        df = entrymod.queries()[name](spark, SF)
        assert_no_python_udf(df)


def test_arrow_kernels_are_vectorized_not_rowwise(spark):
    """Kernel queries must cross into Python ONLY via ArrowEvalPython
    (vectorized batches) — a row-at-a-time BatchEvalPython is a regression."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.plans import plan_text

    for name in ("winnow_fingerprints", "cosine_near_dups", "ivf_topk",
                 "ann_search_join"):
        plan = plan_text(entrymod.queries()[name](spark, SF))
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" in plan, f"{name} lost its Arrow kernel:\n{plan}"


def test_promo_revenue_broadcasts_part_and_pushes_dates(spark):
    df = entrymod.q_promo_revenue_share(spark, SF)
    assert_broadcast_join(df, expected=1)
    plan = plan_text(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan, plan
    assert_no_python_udf(df)


def test_large_orders_broadcasts_customer(spark):
    df = entrymod.q_large_orders(spark, SF)
    assert_broadcast_join(df, expected=1)
    assert "TakeOrderedAndProject" in plan_text(df)
    assert_no_python_udf(df)


def test_customer_order_distribution_outer_join(spark):
    plan = plan_text(entrymod.q_customer_order_distribution(spark, SF))
    assert "LeftOuter" in plan, plan


def test_asof_join_is_window_not_cartesian(spark):
    """The as-of join must plan as one per-key window pass — no interval
    cross-product, no nested-loop join."""
    df = entrymod.q_asof_last_purchase(spark, SF)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan and "hashpartitioning(_k" in plan, plan
    assert_no_python_udf(df)


def test_window_query_partitions_not_global_sort(spark):
    df = entrymod.q_top_parts_per_brand(spark, SF)
    plan = plan_text(df)
    assert "Window" in plan
    assert "hashpartitioning(p_brand" in plan, plan
    assert_no_python_udf(df)


def test_sentiment_udf_is_arrow_vectorized(spark):
    posts = spark.createDataFrame(
        [("great stuff", "u", "tw", 1, 1, 1, ("c", "co"), "2024-01-01 00:00:00")],
        POST_SCHEMA,
    )
    df = enrich_posts(posts, with_sentiment_udf=True)
    plan = plan_text(df)
    assert "ArrowEvalPython" in plan, plan       # pandas UDF (Arrow batches)
    assert "BatchEvalPython" not in plan, plan   # not a pickled row-at-a-time UDF


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_nation_trade_volume_broadcasts_nation_dims(spark):
    df = entrymod.q_nation_trade_volume(spark, SF)
    assert_broadcast_join(df, expected=2)
    assert_no_python_udf(df)


def test_brand_market_share_single_fact_pass(spark):
    """Conditional aggregation: brand share computed in ONE pass over the
    joined fact stream — the plan must contain exactly one lineitem scan."""
    df = entrymod.q_brand_market_share(spark, SF)
    plan = plan_text(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert_no_python_udf(df)


def test_contamination_no_cartesian_and_jvm_side(spark):
    df = entrymod.q_benchmark_contamination(spark, SF)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert_no_python_udf(df)


def test_repetition_stats_partial_aggregation(spark):
    """The explode+count path must partial-aggregate map-side (two-phase
    HashAggregate), not shuffle raw gram rows."""
    df = entrymod.q_repetition_stats(spark, SF)
    plan = plan_text(df)
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert_no_python_udf(df)


def test_pii_redaction_stays_jvm_side(spark):
    assert_no_python_udf(entrymod.q_pii_redaction(spark, SF))


def test_dormant_customers_anti_join(spark):
    plan = plan_text(entrymod.q_dormant_customers(spark, SF))
    assert "LeftAnti" in plan, plan


def test_semantic_near_dups_cluster_local_join(spark):
    """SemDeDup pairs: one grouped applyInPandas per cell
    (FlatMapGroupsInPandas — vectors cross the Arrow boundary once, not
    once per candidate pair), never a cartesian/nested-loop or pair-row
    self-join over the corpus."""
    df = entrymod.q_semantic_near_dups(spark, SF)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan  # grouped GEMM per cell
    assert "SortMergeJoin" not in plan, plan  # the pair-row join is gone
    assert "BatchEvalPython" not in plan, plan  # Arrow kernels only


def test_bigram_logprob_partial_aggregation_jvm_side(spark):
    """Bigram model build: two-phase hash aggregation, broadcast totals,
    no Python boundary anywhere."""
    df = entrymod.q_bigram_logprob(spark, SF)
    plan = plan_text(df)
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert_no_python_udf(df)


def test_vocab_coverage_topk_is_take_ordered(spark):
    """The top-k slice must be TakeOrderedAndProject — the full-vocabulary
    sort never materializes."""
    df = entrymod.q_vocab_coverage(spark, SF)
    assert "TakeOrderedAndProject" in plan_text(df), plan_text(df)
    assert_no_python_udf(df)


def test_chunk_documents_stays_jvm_side(spark):
    df = entrymod.q_chunk_documents(spark, SF)
    plan = plan_text(df)
    assert_no_python_udf(df)
    # per-row fan-out: one Generate (explode), no join anywhere
    assert "Join" not in plan, plan


def test_value_outliers_broadcast_thresholds(spark):
    """Both median/MAD threshold tables join back as broadcasts onto the
    fact scan — the fact side never shuffles on event_type."""
    df = entrymod.q_value_outliers_mad(spark, SF)
    assert_broadcast_join(df, expected=2)
    assert_no_python_udf(df)


def test_range_join_fact_side_hash_join(spark):
    """The containment join plans as a hash equi-join on the bucket key;
    the only nested-loop is the documented 1-row anchor cross join."""
    df = entrymod.q_range_join_windows(spark, SF)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q17_shape_decorrelated_broadcasts(spark):
    """Q17's correlated avg subquery must decorrelate: part dim and the
    per-part threshold table both broadcast; lineitem never shuffles on
    partkey for the probe side."""
    df = entrymod.q_small_quantity_revenue(spark, SF)
    assert_broadcast_join(df, expected=2)
    assert_no_python_udf(df)


def test_q15_shape_max_is_single_row_broadcast(spark):
    df = entrymod.q_top_supplier_revenue(spark, SF)
    plan = plan_text(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert_no_python_udf(df)


def test_r4_queries_stay_jvm_side(spark):
    """None of the round-4 analytics queries route through Python — their
    plans must be pure Catalyst (no BatchEvalPython, no ArrowEvalPython)."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name in (
        "funnel_conversion", "cohort_retention", "rfm_segments",
        "lone_problem_suppliers", "ngram_novelty", "tokenizer_fertility",
        "embedding_coverage",
    ):
        plan = qs[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def count_hash_exchanges(spark, df) -> int:
    """Hash-exchange count from the FORMATTED explain, where each Exchange
    node's partitioning lives on its own ``Arguments: hashpartitioning(...)``
    detail line (the tree section prints bare ``Exchange`` so matching
    'Exchange hashpartitioning' over this mode silently counts zero).

    Callers that assert a BUDGET must pin the cache state first
    (``pin_cache_state``): cached-subplan substitution hides exchanges
    inside InMemoryRelations, so the count depends on which shared tables
    earlier tests left persisted — the r8 full-suite run measured
    rolling_active_users at 3 or 4 depending purely on suite order."""
    import re

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    return len(re.findall(r"Arguments: hashpartitioning\(", plan))


def pin_cache_state():
    """Release every tracked persisted table so exchange-budget counts are
    measured from ONE deterministic state (the query's own persists only),
    independent of which tests ran earlier in the session."""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark import caching

    caching.release_all()


def test_funnel_single_wide_exchange(spark):
    """funnel_conversion's window chain + per-user reduction must share ONE
    user_id hash exchange (the docstring's load-bearing claim)."""
    pin_cache_state()
    import re

    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMOKE

    df = entrymod.queries()["funnel_conversion"](spark, SF_SMOKE)
    # Formatted explain (pre-execution) rather than executedPlan.toString():
    # stable node-per-line layout across AQE stringification changes. The
    # claim under test is the docstring's "ONE wide user_id exchange" — so
    # assert AT MOST one hash exchange (a final orderBy's rangepartitioning
    # exchange is narrow/irrelevant and deliberately not counted).
    # exactly one: a second hash exchange breaks the shared-partitioning
    # claim, and ZERO would mean the per-user reduction stopped being
    # distributed at all (the trailing orderBy's rangepartitioning
    # exchange deliberately doesn't count)
    assert count_hash_exchanges(spark, df) == 1


def test_r5_queries_stay_jvm_side_and_bounded_exchanges(spark):
    """The r5 event-analytics queries are pure Catalyst (no Python boundary)
    and keep their documented exchange budget: rolling_active_users moves
    only user-day-sized tables after the dedup (3 hash exchanges: dedup,
    user window, day count — the broadcast max-day join adds none);
    last_touch_attribution is one user_id window + one tiny group (2);
    dup_rate_by_source is fingerprint window + source roll-up (2, the
    distinct-agg's internal re-exchange allowed)."""
    pin_cache_state()
    import re

    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    budget = {
        "rolling_active_users": 3,
        "last_touch_attribution": 2,
        "dup_rate_by_source": 3,
        "cohort_retention_salted": 5,  # salted dedup adds ONE extra narrow stage
    }
    for name, max_hash in budget.items():
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        # lower bound keeps the assertion non-vacuous: every one of these
        # queries has at least its corpus-sized shuffle
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"
        assert "CartesianProduct" not in plan_text(df), name


def test_r5_third_batch_jvm_side_and_exchange_budget(spark):
    """The r5 third-batch queries are pure Catalyst and keep their documented
    exchange budgets: returned_items is two fact-side shuffles + custkey
    agg/join with nation broadcast (<=5); token_pmi_pairs is the df agg, the
    doc_id self-join pair, and the pair agg (<=6 — the vocab TakeOrdered and
    the 1-row N broadcast add no hash exchange); value_trend_slope is
    exactly its two documented map-side-combinable hash aggs."""
    pin_cache_state()
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    budget = {
        "returned_items": 5,
        "token_pmi_pairs": 6,
        "value_trend_slope": 2,
    }
    for name, max_hash in budget.items():
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"
        assert "CartesianProduct" not in plan_text(df), name


def test_returned_items_pushes_filters_and_broadcasts_nation(spark):
    """Both fact filters reach the parquet scans (returnflag on lineitem,
    the date window on orders) and nation joins as a broadcast."""
    df = entrymod.q_returned_items(spark, SF)
    plan = plan_text(df)
    # substring, not the full bracketed list: the scan may append join-key
    # IsNotNull atoms inside the same PushedFilters bracket
    assert "EqualTo(l_returnflag,R)" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert_broadcast_join(df, expected=1)


def test_r5_fourth_batch_jvm_side_and_exchange_budget(spark):
    """The r5 fourth-batch queries are pure Catalyst within their documented
    exchange budgets: key_skew_audit is one count agg (+ the 1-row totals
    agg, broadcast back) (<=3); zipf_alpha is the token count agg, the
    per-group rank window, and the per-group sums agg (<=4);
    time_to_conversion is exactly its two map-side-combinable hash aggs."""
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    budget = {
        "key_skew_audit": 3,
        "zipf_alpha": 4,
        "time_to_conversion": 2,
    }
    for name, max_hash in budget.items():
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"
        assert "CartesianProduct" not in plan_text(df), name


def test_r5_fifth_batch_jvm_side_and_exchange_budget(spark):
    """Fifth-batch plan claims: bracket_revenue is a pushed-down broadcast
    join into a 3-row agg (1 hash exchange, 1 broadcast, no python);
    lang_confusion is one corpus agg + the tiny-matrix window (<=3);
    quality_by_dup_status rides the iterative CC chain so only the
    no-python/no-cartesian invariants are asserted (its exchange count
    varies with CC rounds)."""
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    df = qs["bracket_revenue"](spark, SF_SMOKE)
    assert_no_python_udf(df)
    assert 1 <= count_hash_exchanges(spark, df) <= 2
    assert_broadcast_join(df, expected=1)
    plan = plan_text(df)
    assert "In(p_brand" in plan, plan            # brand set pushed to part scan
    assert "LessThanOrEqual(l_quantity" in plan, plan  # qty cap pushed to lineitem scan

    df = qs["lang_confusion"](spark, SF_SMOKE)
    assert_no_python_udf(df)
    assert 1 <= count_hash_exchanges(spark, df) <= 3
    assert "CartesianProduct" not in plan_text(df)

    df = qs["quality_by_dup_status"](spark, SF_SMOKE)
    assert_no_python_udf(df)
    assert "CartesianProduct" not in plan_text(df)


def test_r5_sixth_batch_jvm_side_and_exchange_budget(spark):
    """Sixth-batch plan claims: event_transitions is one user_id window
    shuffle + the matrix agg + the tiny prob window (<=3 hash exchanges);
    interarrival_stats is the same window shuffle + one agg (<=2);
    event_type_lift is ONE corpus basket shuffle + three tiny downstream
    aggs (<=4) with the dim sides broadcast (no self-join, no cartesian on
    multi-row sides — the 1-row totals crossJoin broadcasts)."""
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name, max_hash in (
        ("event_transitions", 3),
        ("interarrival_stats", 2),
        ("event_type_lift", 4),
    ):
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"
        assert "CartesianProduct" not in plan_text(df), name
    assert_broadcast_join(qs["event_type_lift"](spark, SF_SMOKE), expected=2)


def test_r5_seventh_batch_jvm_side_and_exchange_budget(spark):
    """Seventh-batch plan claims: top_event_paths is one user_id window
    shuffle + the path agg (the 1-row total broadcasts; <=3 with the
    persisted count table's internals visible pre-execution);
    lexical_diversity is exactly the two hash aggs (vocab then group;
    fan_out's round-robin repartition is not a hash exchange);
    ship_latency_audit is the fact-fact orderkey join + the priority agg
    (<=3 — at sf0.001 the static planner may broadcast orders instead,
    hence >=1, and its scans must prune to the 2-3 needed columns)."""
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name, max_hash in (
        ("top_event_paths", 3),
        ("lexical_diversity", 2),
        ("ship_latency_audit", 3),
    ):
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"
        assert "CartesianProduct" not in plan_text(df), name
    # column pruning on both fact scans of the audit join
    plan = plan_text(qs["ship_latency_audit"](spark, SF_SMOKE))
    for scan_schema in [seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]]:
        assert "l_quantity" not in scan_schema and "o_totalprice" not in scan_schema


def test_r5_eighth_batch_jvm_side_and_exchange_budget(spark):
    """Eighth-batch plan claims, each measured at 3 hash exchanges when
    pinned: daily_new_vs_returning = (user,day) dedup + first-day agg +
    day rollup; user_concentration = key counts + decile agg (+ the
    percentile fit's 1-row aggregate; the cumulative window orders <= 10
    rows so its single partition is benign); supplier_diversity = combo
    dedup + the two-level distinct pair over combos (part side broadcast,
    never shuffled)."""
    pin_cache_state()
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name in ("daily_new_vs_returning", "user_concentration", "supplier_diversity"):
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        # user_concentration's budget rose in r11: decile boundaries now
        # ride exact_percentiles (distributed counts reconstruction) —
        # the corpus still crosses ONE exchange (the per-key counts agg,
        # persisted); every added exchange carries the distinct-counts /
        # probe / chunk-totals frames, all post-aggregation scale
        budget = 15 if name == "user_concentration" else 3
        assert 1 <= n <= budget, f"{name}: {n} hash exchanges (budget {budget})"
        assert "CartesianProduct" not in plan_text(df), name
    assert_broadcast_join(qs["supplier_diversity"](spark, SF_SMOKE), expected=1)


def test_r5_ninth_batch_jvm_side_and_exchange_budget(spark):
    """Ninth-batch plan claims: centroid_separation EXECUTES the
    |labels|*|dims| centroid agg + the |labels|-row zip agg once (the
    persisted centroid-array table feeds both join branches, so the
    formatted explain PRINTS that 2-exchange subplan under each branch —
    budget 4 printed, 2 executed); first_touch_attribution and
    repeat_purchase_intervals are ONE user_id window shuffle + a tiny
    agg each (<=2; the share window orders <= |types|/|buckets| rows)."""
    pin_cache_state()
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name, max_hash in (
        ("centroid_separation", 4),
        ("first_touch_attribution", 2),
        ("repeat_purchase_intervals", 2),
    ):
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"


def test_r5_tenth_batch_jvm_side_and_exchange_budget(spark):
    """Tenth-batch plan claims: events_profile is the melt + ONE
    (col, value) dedup exchange + the |cols|-row rollup (<=2 hash
    exchanges, NO Expand node — the melt replaces the corpus-level
    multi-countDistinct); weekly_revenue_growth is one |weeks|-row hash
    agg (<=2 with partial/final; the lag window orders the tiny series)."""
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name in ("events_profile", "weekly_revenue_growth"):
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= 2, f"{name}: {n} hash exchanges (budget 2)"
    assert "Expand" not in plan_text(qs["events_profile"](spark, SF_SMOKE))


def test_r5_twelfth_batch_jvm_side_and_exchange_budget(spark):
    """Twelfth-batch plan claims: monthly_order_mix is one hash agg to
    |months| x |statuses| rows + the tiny share window (<=2 exchanges);
    user_stickiness rides the shared activity table for BOTH series
    (dedup + DAU agg + the WAU lag window + day agg + the day join —
    <=5 printed; the persisted activity subplan prints under both
    branches), with no cartesian anywhere."""
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name, max_hash in (("monthly_order_mix", 2), ("user_stickiness", 5)):
        df = qs[name](spark, SF_SMOKE)
        assert_no_python_udf(df)
        n = count_hash_exchanges(spark, df)
        assert 1 <= n <= max_hash, f"{name}: {n} hash exchanges (budget {max_hash})"
        assert "CartesianProduct" not in plan_text(df), name


def test_fk_integrity_audit_broadcasts_dims_no_cartesian(spark):
    """The three dim-parent checks must broadcast (3 broadcast joins);
    the lineitem->orders fact check shuffles on the orderkey; nothing
    plans a cartesian."""
    from tests.conftest import SF_SMOKE

    df = entrymod.queries()["fk_integrity_audit"](spark, SF_SMOKE)
    assert_no_python_udf(df)
    assert_broadcast_join(df, expected=3)
    assert "CartesianProduct" not in plan_text(df)


def test_q9_shape_broadcasts_part_and_suppnation(spark):
    """nation_profit_by_year: the filtered part projection and the
    supplier->nation map must BROADCAST into the fact stream (plus the
    nation dim inside the map itself); lineitem x orders is the one
    shuffled join. Pure-SQL path — no Python boundary."""
    df = entrymod.q_nation_profit_by_year(spark, SF)
    assert_broadcast_join(df, expected=3)
    assert_no_python_udf(df)


def test_q16_shape_anti_join_broadcasts(spark):
    """part_supplier_counts: the denylist anti-join and the part-attribute
    join both broadcast; the only wide exchange is the composite-key dedup
    (plus the final tiny rollup)."""
    df = entrymod.q_part_supplier_counts(spark, SF)
    plan = plan_text(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert_no_python_udf(df)


def test_q20_shape_year_filter_pushes_to_scan(spark):
    """excess_shipment_suppliers: the calendar-year filter is written as
    an explicit NTZ range so it reaches the lineitem parquet scan as
    min/max-prunable PushedFilters (the year(ts)==k form would stay a
    post-scan DataFilter and read every year at 100 TB); dim joins
    broadcast."""
    df = entrymod.q_excess_shipment_suppliers(spark, SF)
    plan = plan_text(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan and "LessThan(l_shipdate" in plan, plan
    assert_no_python_udf(df)


def test_r6_queries_stay_jvm_side(spark):
    """Every r6 pure-SQL path must plan with no Python boundary."""
    for name in ("nation_profit_by_year", "part_supplier_counts",
                 "excess_shipment_suppliers", "corpus_drift",
                 "source_shingle_overlap", "embedding_outliers",
                 "discount_quantity_corr", "order_value_bands",
                 "span_corruption_stats"):
        df = entrymod.queries()[name](spark, SF)
        assert_no_python_udf(df)


def test_distributed_cume_dist_offsets_stay_distributed():
    """r8 VERDICT item 5 (+ the r9 sweep that found the same shape in
    capped_group_sample): per-(chunk, group) offsets must be a
    distributed two-level prefix sum, never a driver-side collect whose
    size is |chunks|x|groups|. Pin at the source level: neither operator
    may call .collect() at all (their only driver-side values are
    literals)."""
    import inspect

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import (
        sampling,
        window_funcs,
    )

    src = inspect.getsource(window_funcs.distributed_cume_dist)
    assert ".collect()" not in src, "driver-side offsets crept back in"
    assert "Window.partitionBy(*part_cols)" in src  # the prefix-sum window
    src2 = inspect.getsource(sampling.capped_group_sample)
    assert ".collect()" not in src2, "driver-side offsets crept back in"
    assert "partitionBy(group_col)" in src2  # the prefix-sum window


def test_dim_broadcast_gate_hints_below_threshold(spark):
    """broadcast_dim must still force the hint while the dim estimate fits
    the gate — even with Spark's own auto-broadcast disabled, the hinted
    customer/supplier/nation sides all plan as BroadcastHashJoin."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entrymod.q_local_supplier_volume(spark, SF)
        assert_broadcast_join(df, expected=3)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dim_broadcast_gate_falls_back_above_threshold(spark):
    """Above the gate the sf-proportional dims must NOT be hinted (r9
    VERDICT item 2: a forced multi-GB broadcast at 100 TB is an OOM, not a
    slow plan). With a 1-byte gate and auto-broadcast disabled, the
    customer/supplier joins fall back to shuffle joins, a warning names
    the refusal, and only the unconditionally-hinted nation/region dim
    still broadcasts."""
    import warnings as warnings_mod

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(DIM_BROADCAST_THRESHOLD_CONF, "1")
    try:
        with warnings_mod.catch_warnings(record=True) as caught:
            warnings_mod.simplefilter("always")
            df = entrymod.q_local_supplier_volume(spark, SF)
        assert any("exceeds" in str(w.message) for w in caught), caught
        plan = plan_text(df)
        # only the two unconditional nation/region-sized hints remain
        # (region⋈nation and the nations_in_region dim join); customer and
        # supplier fall back to shuffle joins
        assert count_plan_nodes(df, "BroadcastHashJoin") == 2, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.unset(DIM_BROADCAST_THRESHOLD_CONF)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # semantics unchanged by the fallback: same result as the hinted plan —
    # built AFTER the conf restore, so it genuinely carries the hints (the
    # gate reads the conf eagerly at construction; building it inside the
    # try block would compare the un-hinted plan against itself)
    hinted = entrymod.q_local_supplier_volume(spark, SF)
    assert_broadcast_join(hinted, expected=3)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, hinted.collect()))


def test_dim_broadcast_gate_estimates_are_scan_level(spark):
    """The gate's stats probe must be sane where we rely on it: parquet
    dim scans report file-derived estimates (small at sf0.01), and an
    in-memory frame's default-inflated estimate exceeds any sane gate, so
    it is refused via the over-threshold branch (warning names the
    excess)."""
    import warnings as warnings_mod

    part = spark.read.parquet(f"{SF}/part.parquet")
    est = estimated_plan_bytes(part.select("p_partkey", "p_brand"))
    assert 0 < est < 64 * 1024 * 1024, est
    mem = spark.range(10).toDF("k")  # LogicalRDD/LocalRelation-backed
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        hinted = broadcast_dim(mem, max_bytes=1)
    assert hinted is mem  # returned unhinted, AQE keeps authority
    assert any("exceeds" in str(w.message) for w in caught), caught


def test_dim_broadcast_gate_no_estimate_branch_stays_unhinted(monkeypatch, spark):
    """When Catalyst can't produce a size estimate at all (the except
    branch — e.g. a plan shape whose stats visitor raises), broadcast_dim
    must warn 'no size estimate' and return the frame unhinted rather
    than force a blind broadcast. The branch is unreachable with healthy
    batch frames, so simulate the failure at the probe seam."""
    import warnings as warnings_mod

    from live_social_media_sentiment_trend_tracker_using_kafka_spark.plans import hints

    def boom(df):
        raise RuntimeError("stats unavailable")

    monkeypatch.setattr(hints, "estimated_plan_bytes", boom)
    mem = spark.range(10).toDF("k")
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        out = hints.broadcast_dim(mem, max_bytes=1 << 30)
    assert out is mem
    assert any("no size estimate" in str(w.message) for w in caught), caught


def test_order_value_bands_distributed_not_per_segment_window(spark):
    """The exact distribution must ride distributed_cume_dist: a RANGE
    repartition plus chunk-local windows — never a bare
    Window.partitionBy(segment) whose parallelism is |segments|. The
    chunk id must appear in the window partition keys."""
    df = entrymod.q_order_value_bands(spark, SF)
    plan = plan_text(df)
    assert "rangepartitioning(c_mktsegment" in plan, plan
    assert "hashpartitioning(_chunk" in plan, plan
    assert "cume_dist" not in plan, plan


def test_knn_graph_stays_celled_no_cartesian(spark):
    """knn_graph must remain CELLED: one grouped applyInPandas per cell
    (FlatMapGroupsInPandas — each vector crosses the Arrow boundary once,
    not once per candidate pair), never a cartesian/nested-loop product
    or a pair-row self-join, and no row-at-a-time Python."""
    df = entrymod.q_knn_graph(spark, SF)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan  # grouped GEMM per cell
    assert "SortMergeJoin" not in plan, plan  # the pair-row join is gone
    assert "BatchEvalPython" not in plan, plan  # Arrow only, no row-at-a-time


def test_registry_wide_no_cartesian_product(spark):
    """GLOBAL invariant sweep (r8): NO registered batch query may plan a
    CartesianProduct — the one join shape that is quadratic at any scale.
    (BroadcastNestedLoopJoin is allowed: every crossJoin in the tree
    broadcasts a 1-row aggregate, which BNLJ handles in O(n).) Streaming
    queries are excluded here because building them EXECUTES the
    AvailableNow drain (they are memory-sink reads, ~full-drive cost);
    their join shapes are pinned by their own contract tests."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMOKE

    checked = 0
    for name, fn in entrymod.queries().items():
        if name.startswith("streaming_"):
            continue
        plan = plan_text(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan[:2000]}"
        checked += 1
    assert checked >= 150  # non-vacuous: the whole batch registry swept


def test_domain_cap_sample_distributed_not_per_group_window(spark):
    """The per-domain cap must ride the chunked rank: a RANGE repartition
    plus chunk-local row_number — never a bare Window.partitionBy(source)
    whose parallelism is |domains| (the hot domain IS the one being
    capped). Chunk id must appear in the window partition keys."""
    df = entrymod.q_domain_cap_sample(spark, SF)
    plan = plan_text(df)
    assert "rangepartitioning(source" in plan, plan
    assert "hashpartitioning(_chunk" in plan, plan
    assert_no_python_udf(df)


def test_posts_enrichment_single_exchange_no_python(spark):
    """The reference's end-to-end user path must plan as ONE fused
    codegen chain over the scan — no Python boundary (the lexicon scorer
    is the SQL twin), and the only exchange is the final presentation
    orderBy. At 100 TB this pipeline is embarrassingly parallel."""
    df = entrymod.q_posts_enrichment(spark, SF)
    assert_no_python_udf(df)
    plan = plan_text(df)
    # node-details count, not the "+- Exchange" tree rendering — the tree
    # indentation shifts with AQE/Spark-version changes even when the
    # single-shuffle property still holds (r9 ADVICE)
    assert count_plan_nodes(df, "Exchange") == 1, plan
    assert "rangepartitioning(doc_id" in plan, plan  # the orderBy…
    assert "hashpartitioning" not in plan, plan  # …and no agg/join shuffle


def test_duplicate_span_removal_linear_jvm_side(spark):
    """Span removal must stay pure Catalyst (no Python boundary), with the
    owner aggregation partial (map-side combinable) and no pair join —
    the global no-cartesian sweep covers the quadratic shapes; this pins
    the linear-shuffle design."""
    df = entrymod.q_duplicate_span_removal(spark, SF)
    assert_no_python_udf(df)
    plan = plan_text(df)
    assert "partial_count" in plan or "partial_min" in plan, plan


def test_scd2_both_windows_share_one_data_exchange(spark):
    # cdc.scd2_history promises: lag (change-detect) and lead (interval
    # close) run over ONE Exchange on the key — the display orderBy adds
    # a final rangepartitioning Exchange, so exactly 2 total and 2 Windows
    df = entrymod.q_scd2_value_band(spark, SF)
    assert count_plan_nodes(df, "Window") == 2
    assert count_plan_nodes(df, "Exchange") == 2
    assert_no_python_udf(df)


def test_cdc_snapshot_aggregates_partially_before_shuffle(spark):
    # cdc.latest_snapshot promises a partial+final agg (shuffle carries
    # ~|keys| pre-reduced rows) — NOT a row_number window over all rows
    df = entrymod.q_cdc_user_snapshot(spark, SF)
    plan = plan_text(df)
    assert count_plan_nodes(df, "Window") == 0, plan
    # partial + final (SortAggregate: max_by over struct is order-based) +
    # the display orderBy exchange
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2, plan
    assert count_plan_nodes(df, "Exchange") == 2, plan
    assert_no_python_udf(df)


def test_entity_resolution_join_is_not_forced_broadcast(spark):
    # linkage.blocked_edit_resolve must leave the join strategy to
    # Catalyst stats/AQE (clean registries are corpus-proportional at
    # 100 TB): at sf0.01 the parquet stats make it a broadcast join, but
    # no ResolvedHint may appear in the analyzed plan
    df = entrymod.q_customer_entity_resolution(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    plan = plan_text(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert_no_python_udf(df)


def test_rrf_fusion_inputs_stay_bounded_topk(spark):
    # hybrid_search_rrf: both retriever branches must end in a bounded
    # top-k (TakeOrderedAndProject), so the fusion windows sort <= k rows
    df = entrymod.q_hybrid_search_rrf(spark, SF)
    assert count_plan_nodes(df, "TakeOrderedAndProject") >= 2
    assert_no_python_udf(df)


def test_inverted_index_two_level_aggregation(spark):
    # corpus.inverted_index promises three agg levels ((term,doc) tf,
    # (term,salt) partial collect, term merge) with partial map-side
    # combines — no window, no join anywhere
    df = entrymod.q_inverted_index(spark, SF)
    plan = plan_text(df)
    assert count_plan_nodes(df, "Window") == 0, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") + plan.count("SortAggregate") + plan.count(
        "ObjectHashAggregate"
    ) >= 6, plan  # 3 logical aggs x (partial + final)
    assert_no_python_udf(df)


def test_embedding_covariance_single_partial_agg(spark):
    # r13: ONE Arrow GEMM partial stage (MapInPandas) emitting
    # dim·(dim+1)/2 partial-sum rows per batch, then one partial+final
    # hash agg; the exchange still carries O(partitions x dim^2)
    # pre-reduced rows. No row-at-a-time Python, no join, no window.
    df = entrymod.q_embedding_covariance(spark, SF)
    plan = plan_text(df)
    assert count_plan_nodes(df, "Window") == 0 and "Join" not in plan, plan
    assert count_plan_nodes(df, "Exchange") == 2, plan  # agg + display sort
    assert count_plan_nodes(df, "MapInPandas") == 1, plan  # the GEMM kernel
    assert_no_python_udf(df)


def test_snapshot_diff_join_not_broadcast(spark):
    # full-outer on two same-table snapshots: neither side may broadcast
    # (full outer can't broadcast-hash anyway — pin it stays that way)
    df = entrymod.q_orders_snapshot_diff(spark, SF)
    plan = plan_text(df)
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan, plan
    assert "CartesianProduct" not in plan
    assert_no_python_udf(df)


def test_mmr_rerank_candidates_bounded_before_python(spark):
    # the only Python boundary is the single-group Arrow batch over the
    # bounded candidate list — the corpus-side work ends in a top-k
    df = entrymod.q_mmr_rerank(spark, SF)
    plan = plan_text(df)
    assert count_plan_nodes(df, "TakeOrderedAndProject") >= 1, plan
    assert count_plan_nodes(df, "FlatMapGroupsInPandas") == 1, plan


def test_packed_sequences_chunked_window_and_broadcasts(spark):
    # r11 pack_documents: both control-plane sides (boundary arrays,
    # chunk offsets) must BROADCAST-hash-join onto the data path, the
    # cumsum window must partition by (shard, chunk) — never shard
    # alone — and no sort-merge join may sneak onto the row stream
    df = entrymod.q_packed_sequences(spark, SF)
    plan = plan_text(df)
    # the InMemoryRelation's child subtree repeats in plan TEXT (the
    # cached bounds join renders once per consumer), so assert presence,
    # not an exact count
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "windowspecdefinition(source" in plan and "_chunk" in plan, plan
    assert "CartesianProduct" not in plan
    assert_no_python_udf(df)


def test_quantile_normalize_rank_over_distinct_values(spark):
    # r11 count-based percent_rank: the per-group windows run over the
    # DISTINCT (group, score) aggregate, so a HashAggregate must sit
    # below the Window; rows rejoin on the well-spread (group, score)
    # key. Broadcast nested loops are every one a BOUNDED side. At this
    # SF the r12 distinct-count dispatch routes the grid to the GUARDED
    # frequency-weighted percentile (greatest(_gcnt marker), so the only
    # BNLJ is the 1-row grid-array cross join; forcing the
    # reconstruction conf restores the other two (the 2·grid_points
    # probe-index range join and the grid's global chunked_running_sum
    # boundary array) — both regimes pinned here. The rank path's
    # chunked_running_sum is GROUPED (per-source), so its bounds join is
    # a broadcast hash join, never nested-loop.
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators.sampling import (
        EXACT_PCT_MAX_DISTINCT_CONF,
    )

    df = entrymod.q_quality_quantile_normalize(spark, SF)
    plan = plan_text(df)
    assert "Window" in plan and "HashAggregate" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert count_plan_nodes(df, "BroadcastNestedLoopJoin") == 1, plan
    assert "greatest(_gcnt" in plan, plan  # guarded frequency grid
    assert_no_python_udf(df)
    spark.conf.set(EXACT_PCT_MAX_DISTINCT_CONF, "0")
    try:
        forced = entrymod.q_quality_quantile_normalize(spark, SF)
        assert count_plan_nodes(forced, "BroadcastNestedLoopJoin") == 3
    finally:
        spark.conf.unset(EXACT_PCT_MAX_DISTINCT_CONF)


def test_no_registered_query_plans_exact_percentile(spark):
    """Percentile-cliff regression guard (r12, VERDICT item 7): Spark's
    exact Percentile aggregate buffers each group's whole multiset on one
    reducer — measured SUPERLINEAR in distinct values (1M doubles: 24 s,
    3M: 220 s, 10M: DNF; PLANS.md r11). The class was eliminated by
    sampling.exact_percentiles; nothing stops a future query from calling
    F.expr("percentile(...)") or F.median (which IS Percentile(0.5) and
    renders as percentile( in the optimized plan — how this sweep caught
    value_outliers_mad and label_cosine_report when first run, both
    migrated r12) directly, so sweep every registered batch query's
    optimized plan for UNGUARDED exact aggregates. GUARDED is allowed:
    exact_percentiles' dispatch emits percentile(value, ps,
    greatest(_gcnt, 1L)) over its distinct-counts frame only when the
    measured per-group distinct count (or group count) makes the
    single-reducer buffer small/parallel — that form carries the
    greatest(_gcnt marker in the plan, a raw cliff call does not.
    percentile_approx / approx_percentile are fine (fixed-size sketch,
    map-side combinable) and must not trip the regex (\\b does not match
    across the _). The guard is checked PER CALL (r12 ADVICE): each
    percentile( occurrence must carry greatest(_gcnt inside its own
    balanced-paren argument list, so an unguarded raw call can no longer
    hide behind a guarded dispatch call elsewhere in the same plan."""
    import re

    from tests.conftest import SF_SMOKE

    def unguarded_percentile(plan: str) -> bool:
        for m in re.finditer(r"\bpercentile\(", plan):
            depth, j, n = 0, m.end() - 1, len(plan)
            while j < n:
                ch = plan[j]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if "greatest(_gcnt" not in plan[m.end() : j]:
                return True
        return False

    offenders = {}
    checked = 0
    for name, fn in entrymod.queries().items():
        if name.startswith("streaming_"):
            continue  # building executes the drain; the stream-static
            # twin's dim side is the same grouped_median_mad plan swept
            # via value_outliers_mad
        plan = plan_text(fn(spark, SF_SMOKE))
        if unguarded_percentile(plan):
            offenders[name] = True
        checked += 1
    assert not offenders, (
        f"UNGUARDED exact Percentile aggregate in registered plans: "
        f"{sorted(offenders)}"
    )
    assert checked >= 150


def test_text_kernels_evaluate_once_no_filter_pushdown(spark):
    """Single-evaluation regression guard (r13 changes 10-11): a
    deterministic predicate on a column computed by the tokenize/shingle
    kernel gets PUSHED below the projection, re-evaluating the whole
    kernel in a Filter (and, for bm25's two-consumer rows tier, 4x per
    call). Every fixed site uses the explode(filter(array(expr)))
    idiom, whose plan carries the kernel ONLY in Generate/Project nodes.
    Red if any site reverts to .filter(size > 0) / .filter(s.dl > 0):
    the tokenizer fingerprint `regexp_replace(lower(` reappears in a
    Condition line. (customer_entity_resolution's CASE-regexp and the
    planted-twin isnotnull(transform(embedding)) filters do NOT match
    this fingerprint — those are the documented examined-and-left
    sites, OPTIMIZATION_r13.md change 11.)"""
    from live_social_media_sentiment_trend_tracker_using_kafka_spark.operators import (
        corpus as corpus_ops,
        dedup as dedup_ops,
        pipeline as pipeline_ops,
    )

    docs = spark.createDataFrame(
        [(0, "spark join window spark"), (1, ""), (2, None), (3, "one two three four")],
        "doc_id long, text string",
    )

    def kernel_in_condition(df, fingerprint: str) -> list[str]:
        return [
            ln.strip()[:120]
            for ln in plan_text(df).splitlines()
            if ln.strip().startswith("Condition") and fingerprint in ln
        ]

    # Per-site kernel fingerprint (r13 ADVICE closed r14): the word
    # tokenizer is `regexp_replace(lower(`, but filter_by_quality's
    # heuristics tokenize via bare `split(trim(` — the r13 single
    # shared fingerprint made its Condition guard silently vacuous.
    for label, (df, fingerprint) in {
        "shingle_table": (
            dedup_ops.shingle_table(docs, persist=False),
            "regexp_replace(lower(",
        ),
        "simhash_signatures": (
            dedup_ops.simhash_signatures(docs),
            "regexp_replace(lower(",
        ),
        "filter_by_quality": (
            pipeline_ops.filter_by_quality(docs),
            "split(trim(",
        ),
        "bm25_rows_tier": (
            corpus_ops.bm25_search(docs, ["spark", "join"], k=5),
            "regexp_replace(lower(",
        ),
    }.items():
        bad = kernel_in_condition(df, fingerprint)
        assert not bad, f"{label} re-evaluates the tokenize kernel in a Filter: {bad}"
        # r13 ADVICE: the Condition check above keys on a kernel
        # fingerprint — if the kernel is ever rewritten with different
        # primitives the guard would silently become vacuous. Require
        # the fingerprint to appear SOMEWHERE in each plan (the single
        # legitimate evaluation, in a Project/Generate node), so a
        # kernel rewrite fails this test loudly instead.
        assert fingerprint in plan_text(df), (
            f"{label}: kernel fingerprint {fingerprint!r} no longer "
            f"appears anywhere in the plan — the single-evaluation guard "
            f"above is now vacuous; update the fingerprint to match the "
            f"rewritten kernel"
        )
