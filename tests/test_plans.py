"""Physical-plan property assertions — the engine's scale contract.

Each assertion encodes a property that, if regressed, multiplies cost
at 100 TB: pushdown reaching the scan, column pruning, dimension
broadcasting, map-side partial aggregation, and shuffle-free narrow
operators."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark import contracts
from k_means_using_mapreduce_spark.plans import (
    broadcast_join_count,
    broadcast_nlj_count,
    exchange_count,
    pushed_filters,
    read_schemas,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def sf(sf_oracle):
    return sf_oracle


def _q(name, spark, sf):
    return contracts.QUERIES[name](spark, sf)


def test_q1_filter_pushed_to_scan(spark, sf):
    df = _q("q1_pricing_summary", spark, sf)
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters


def test_q1_column_pruning(spark, sf):
    df = _q("q1_pricing_summary", spark, sf)
    (cols,) = read_schemas(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_tax"} <= set(cols)


def test_q3_broadcasts_dims_no_sort_merge(spark, sf):
    df = _q("q3_top_orders", spark, sf)
    assert broadcast_join_count(df) == 2
    assert sort_merge_join_count(df) == 0


def test_nation_revenue_all_dims_broadcast(spark, sf):
    df = _q("nation_revenue", spark, sf)
    assert broadcast_join_count(df) == 4
    assert sort_merge_join_count(df) == 0


def test_assign_is_shuffle_free(spark, sf):
    df = _q("kmeans_assign_events", spark, sf)
    assert exchange_count(df) == 0


def test_assign_prunes_unused_columns(spark, sf):
    df = _q("kmeans_assign_events", spark, sf)
    (cols,) = read_schemas(df)
    assert "props" not in cols and "event_type" not in cols


def test_update_single_shuffle_with_partial_agg(spark, sf):
    df = _q("kmeans_update_embeddings", spark, sf)
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    plan = executed_plan(df)
    assert exchange_count(df) == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_topk_uses_take_ordered(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("ann_topk_embeddings", spark, sf)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_knn_join_broadcasts_queries(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("knn_join_embeddings", spark, sf)
    assert "BroadcastNestedLoopJoin" in executed_plan(df)


def test_dedup_exact_shuffles_hash_not_text(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("dedup_exact_documents", spark, sf)
    plan = executed_plan(df)
    # the exchange partitions on the sha2 hash column, not raw text
    ex = plan[plan.index("Exchange hashpartitioning"):]
    assert "_h" in ex.split("\n")[0]


def test_sessionize_single_exchange_shared_by_windows(spark, sf):
    df = _q("user_sessions_events", spark, sf)
    # lag + running-sum windows and the session aggregate reuse one
    # user_id partitioning: 1 shuffle total (AQE may add none after)
    assert exchange_count(df) == 1


def test_asof_join_has_no_join_operator(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("purchase_click_asof", spark, sf)
    plan = executed_plan(df)
    # union+window formulation: zero join operators, one exchange
    assert sort_merge_join_count(df) == 0
    assert "Join" not in plan
    assert exchange_count(df) == 1


def test_rollup_single_expand_single_shuffle(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("acctbal_rollup_region_nation", spark, sf)
    plan = executed_plan(df)
    assert plan.count("Expand") == 1
    # dims broadcast; only the grouping shuffle remains (+1 AQE read)
    assert sort_merge_join_count(df) == 0


def test_pivot_is_single_aggregate_pass(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("user_event_pivot", spark, sf)
    plan = executed_plan(df)
    # explicit value list: one partial+final aggregate, no extra
    # distinct-discovery scan of events
    assert plan.count("Scan parquet") == 1
    assert exchange_count(df) == 1


def test_hash_sample_pushes_nothing_and_shuffles_nothing(spark, sf):
    df = _q("documents_hash_sample", spark, sf)
    assert exchange_count(df) == 0


def test_q10_broadcasts_dims(spark, sf):
    df = _q("q10_returned_revenue", spark, sf)
    filters = " ".join(pushed_filters(df))
    assert "l_returnflag" in filters  # predicate reached the scan
    assert broadcast_join_count(df) >= 2
    assert sort_merge_join_count(df) == 0


def test_interval_join_single_exchange_on_bucket(spark, sf):
    """The range join is one hash shuffle on the bucket key (plus the
    broadcast-eligible interval side) — never a cartesian product."""
    plan = _q("shipments_in_order_window", spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_single_fact_shuffle_no_self_join(spark, sf):
    """Correlated-MIN rewrite: one aggregate over the fact join + a
    window — the lineitem side is scanned ONCE (no re-executed
    subquery scan)."""
    df = _q("q2_min_cost_supplier", spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 3  # lineitem once + part + supplier
    assert sort_merge_join_count(df) == 0


def test_q18_broadcasts_filtered_agg_side(spark, sf):
    """The HAVING-filtered aggregate (small) must broadcast into the
    orders join, not shuffle orders."""
    df = _q("q18_large_orders", spark, sf)
    assert broadcast_join_count(df) >= 1


def test_gemm_near_dup_replication_is_broadcast(spark, sf):
    """The block-pair replication map joins as a broadcast (tiny), so
    the only wide op is the bucket-pair shuffle."""
    df = _q("embedding_near_dup_pairs", spark, sf)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_q8_dims_broadcast_like_pushed(spark, sf):
    """Q8's 6-way join: every dimension (part, supplier⋈nation,
    nation⋈region, the scalar-free customer semi side) broadcasts;
    the p_type filter reaches the part scan; no cartesian product."""
    df = _q("q8_market_share", spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert broadcast_join_count(df) >= 4
    assert "CartesianProduct" not in plan
    filters = " ".join(pushed_filters(df))
    assert "p_type" in filters and "o_orderdate" in filters


def test_q9_like_pushed_and_dims_broadcast(spark, sf):
    """Q9's LIKE filter prunes part BEFORE the broadcast, and both
    dimension sides broadcast — lineitem⋈orders is the only big join."""
    df = _q("q9_profit_by_nation_year", spark, sf)
    filters = " ".join(pushed_filters(df))
    assert "p_name" in filters
    assert broadcast_join_count(df) >= 2


def test_q11_scans_fact_once(spark, sf):
    """The HAVING-vs-scalar-subquery rewrite shares the per-part
    aggregate between the filter side and the scalar total: both
    branches build the identical shuffle, and AQE's ReuseExchange
    collapses them at runtime, so the fact is physically scanned and
    shuffled ONCE (vs the naive correlated form's two fact scans)."""
    df = _q("q11_important_part_values", spark, sf)
    df.collect()  # AQE finalizes reuse during execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_q20_semi_joins_no_distinct_pass(spark, sf):
    """Both INs compile to (broadcast) semi joins — no Aggregate-based
    DISTINCT on the supplier keys and no cartesian."""
    df = _q("q20_heavy_shippers", spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert sort_merge_join_count(df) == 0


def test_repetition_two_hash_aggregates_no_join(spark, sf):
    """repetition_stats is [fan_out →] Generate → hashAgg(id,gram) →
    hashAgg(id): two key-change exchanges plus at most the round-robin
    fan_out of the (id, text) projection (round-9: spreads the
    tokenize/shingle map side of single-row-group scans; a no-op on
    already-wide inputs), no join at all — the linear relational
    shape, not a per-row quadratic HOF."""
    df = _q("repetition_stats_documents", spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert exchange_count(df) <= 3
    # the only non-aggregate exchange allowed is the fan_out round-robin
    assert plan.count("Exchange hashpartitioning") <= 2
    (cols,) = read_schemas(df)
    assert "text" in cols and "source" not in cols  # pruned scan


def test_novelty_window_on_hash_no_join(spark, sf):
    """shingle_novelty's global frequency is a COUNT window partitioned
    on the 60-bit hash — no join at all, and the window's partition key
    is the hash column, never shingle strings."""
    df = _q("shingle_novelty_documents", spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines and all("sh#" not in ln for ln in win_lines)


def test_chunking_is_narrow(spark, sf):
    """chunk_documents plans zero exchanges — pure project + Generate."""
    df = _q("chunk_documents_32", spark, sf)
    assert exchange_count(df) == 0


def test_packing_shuffles_on_shard_only(spark, sf):
    """pack_documents' window partitions by shard: one exchange
    (hash on shard), no global single-partition sort."""
    df = _q("pack_documents_256", spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert exchange_count(df) == 1
    assert "SinglePartition" not in plan


# --- round-3 cleaning / winnow / classifier families ---------------------


def test_decontaminate_eval_broadcast_no_sort_merge(spark, sf):
    from k_means_using_mapreduce_spark.plans import formatted_plan

    df = _q("decontaminate_documents", spark, sf)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_classifier_weights_broadcast(spark, sf):
    df = _q("classifier_scores_documents", spark, sf)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_pii_redact_prunes_scan(spark, sf):
    """The PII query reads only (doc_id, text) from the documents scan."""
    df = _q("pii_redact_documents", spark, sf)
    cols = set().union(*read_schemas(df))
    assert "doc_id" in cols and "text" in cols
    assert "lang" not in cols and "n_chars" not in cols


def test_exact_profile_has_no_expand(spark, sf):
    """The exact profile must stay a union of single-distinct branches —
    reintroducing simultaneous count(DISTINCT)s brings back the Expand
    (x7 row amplification; measured 5x slower at sf0.1)."""
    from k_means_using_mapreduce_spark.plans import formatted_plan

    df = _q("table_profile_lineitem", spark, sf)
    assert "Expand" not in formatted_plan(df)


def test_mixture_sample_plan_broadcast_and_single_wide_agg(spark, sf):
    from k_means_using_mapreduce_spark.plans import formatted_plan

    df = _q("mixture_sample_summary", spark, sf)
    plan = formatted_plan(df)
    # rate table joins back as a broadcast hash join; the 1-row totals
    # attach as a broadcast nested-loop cross (1 row x |sources|) —
    # neither may degrade to sort-merge
    assert broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoopJoin" in plan
    assert sort_merge_join_count(df) == 0


def test_pq_adc_is_single_scan_no_exchange(spark, sf):
    """PQ encode+ADC must stay ONE narrow codegen projection over one
    scan — the codebooks and LUT are literals; any Exchange or second
    scan means the contract query stopped being a pure map."""
    df = _q("pq_adc_embeddings", spark, sf)
    assert exchange_count(df) == 0
    assert len(read_schemas(df)) == 1
    (cols,) = read_schemas(df)
    assert "label" not in cols  # pruning: only vec_id + embedding read


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf, tmp_path):
    """Spark's DPP: a partitioned fact joined to a FILTERED dim must
    prune fact partitions at runtime via the dim's subquery result —
    the plan carries `dynamicpruningexpression` on the fact scan. This
    is the mechanism a 100 TB date-partitioned table relies on for
    every dim-filtered join."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan
    from k_means_using_mapreduce_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf, "lineitem").withColumn(
        "ship_month", F.date_trunc("month", "l_shipdate").cast("date")
    )
    fact_path = str(tmp_path / "li_parted")
    li.write.partitionBy("ship_month").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
        .withColumn("o_month", F.date_trunc("month", "o_orderdate").cast("date"))
        .where(F.col("o_month") == "1995-03-01")
    )
    joined = fact.join(
        dim,
        (fact.l_orderkey == dim.o_orderkey) & (fact.ship_month == dim.o_month),
    ).agg(F.count("*").alias("n"))
    plan = executed_plan(joined)
    assert "dynamicpruning" in plan.lower()


def test_freq_sketch_partial_agg_two_exchanges(spark, sf):
    # count-min build is histogram-first: ONE value-keyed exchange of
    # partial-combined histogram rows, then the depth explode + md5
    # over VOCAB rows feeding a second exchange of <= depth x width
    # sketch rows — never depth x corpus hashing/shuffling
    df = _q("token_freq_sketch_documents", spark, sf)
    assert exchange_count(df) == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial + final, both aggs


def test_freq_estimate_broadcasts_sketch(spark, sf):
    # probing joins the bounded (depth x width) sketch as the
    # BROADCAST side; a sort-merge here would shuffle the sketch and
    # the probes for no reason
    df = _q("token_freq_estimate_documents", spark, sf)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_weighted_sample_single_exchange(spark, sf):
    # A-ES top-k: one hash exchange for the per-group window; the
    # priority expression is a pure projection (no join, no extra pass)
    df = _q("weighted_sample_documents", spark, sf)
    assert exchange_count(df) == 1
    assert sort_merge_join_count(df) == 0


def test_snapshot_diff_two_exchanges_pruned_scans(spark, sf):
    # snapshot diff: each side reduces to (key, md5) map-side, then ONE
    # full-outer sort-merge join — two key exchanges total, and the
    # parquet scans read only key + compared columns
    df = _q("corpus_snapshot_diff", spark, sf)
    assert exchange_count(df) == 2
    for cols in read_schemas(df):
        assert "doc_id" in cols


def test_url_canonicalization_is_narrow(spark, sf):
    """Canonicalization is regexp/array projection only — zero
    exchanges; anything else would shuffle the corpus to rewrite
    strings."""
    df = _q("url_canonical_documents", spark, sf)
    assert exchange_count(df) == 0


def test_url_dedup_shuffles_canonical_not_text(spark, sf):
    """The dedup aggregate's shuffle carries (canonical, doc_id) —
    the text column must be pruned at the scan."""
    df = _q("url_dedup_documents", spark, sf)
    (cols,) = read_schemas(df)
    assert "text" not in cols and "n_chars" not in cols


def test_heavy_keys_uses_take_ordered(spark, sf):
    """Top-N heavy keys must be TakeOrderedAndProject over the
    aggregated keys, never a global sort of the key table."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("heavy_keys_lineitem", spark, sf)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_cosine_pairs_no_cartesian(spark, sf):
    """The all-pairs join must go through the term key (posting
    self-join) — a cartesian/BNL product would be |docs|^2 at scale."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("cosine_pairs_documents", spark, sf)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_psi_binning_is_literal_comparison(spark, sf):
    """PSI bin assignment is a literal-comparison projection: the only
    joins in the plan are the tiny grid/totals broadcasts, never a
    join against an edges relation per row."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("orders_price_psi", spark, sf)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert sort_merge_join_count(df) == 0


def test_transition_edges_single_window_exchange(spark, sf):
    """Edge extraction: one user-keyed exchange feeds the lag window;
    the (src,dst) aggregate is map-side combinable on top of it."""
    df = _q("event_transition_edges", spark, sf)
    assert exchange_count(df) <= 2  # window shuffle + agg shuffle
    assert sort_merge_join_count(df) == 0


def test_rp_lsh_buckets_shuffle_free(spark, sf):
    """Sign-LSH bucket keys are a narrow projection (dot products +
    bit packing + band explode) — zero exchanges before the keys
    exist; only the candidate join later shuffles, and it shuffles
    8-byte keys."""
    df = _q("rp_lsh_buckets_embeddings", spark, sf)
    assert exchange_count(df) == 0


def test_bloom_prefilter_probe_unshuffled(spark, sf):
    """Both exchanges belong to the bitmap build; lineitem reaches its
    membership filter without shuffling."""
    df = _q("bloom_prefilter_lineitem", spark, sf)
    df.collect()
    # bitmap word groupBy + single-row assembly + final returnflag agg
    assert exchange_count(df) <= 4
    assert sort_merge_join_count(df) == 0


def test_cusum_contract_single_key_exchange(spark, sf):
    df = _q("cusum_shift_events", spark, sf)
    df.collect()
    # gapfill grid machinery + ONE key-partitioned window exchange for
    # all cusum passes; no join beyond the grid's
    assert sort_merge_join_count(df) <= 1


def test_coreset_is_two_aggregates_no_join_shuffle(spark, sf):
    df = _q("lightweight_coreset_embeddings", spark, sf)
    df.collect()
    assert broadcast_join_count(df) + (
        "BroadcastNestedLoopJoin" in __import__(
            "k_means_using_mapreduce_spark.plans.explain",
            fromlist=["executed_plan"],
        ).executed_plan(df)
    ) >= 1  # totals arrive by broadcast
    assert sort_merge_join_count(df) == 0


def test_covariance_prunes_to_vector_and_id(spark, sf):
    df = _q("embedding_covariance", spark, sf)
    df.collect()
    for cols in read_schemas(df):
        assert "label" not in cols  # untouched column pruned from scan


def test_quantile_normalize_probe_side_broadcast(spark, sf):
    df = _q("quantile_normalized_quality", spark, sf)
    df.collect()
    assert sort_merge_join_count(df) == 0  # quantile table broadcasts


def test_markov_probability_table_broadcasts(spark, sf):
    df = _q("user_markov_surprisal", spark, sf)
    df.collect()
    assert broadcast_join_count(df) >= 1


def test_dsir_weights_ratio_broadcast_no_sort_merge(spark, sf):
    # the B-row log-ratio model must broadcast to the exploded gram
    # stream, never sort-merge against it
    df = _q("dsir_weights_documents", spark, sf)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_als_half_step_item_factors_broadcast(spark, sf):
    # item factor table is catalog-sized (MBs at any scale): must be
    # on the broadcast side of the ratings join
    df = _q("als_user_half_step", spark, sf)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_noised_counts_single_exchange_pruned_scan(spark, sf):
    # one grouped aggregate; noise is per-group scalar math after it
    df = _q("noised_event_type_counts", spark, sf)
    assert exchange_count(df) == 1
    (cols,) = read_schemas(df)
    assert cols == ["event_type"]


def test_chi2_totals_broadcast(spark, sf):
    # contingency margins are |A| / |B| rows: broadcast, no sort-merge
    df = _q("chi2_lang_source", spark, sf)
    assert broadcast_join_count(df) >= 2
    assert sort_merge_join_count(df) == 0


def test_ks_scan_prunes_to_test_columns(spark, sf):
    df = _q("ks_click_vs_purchase", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"event_type", "value"}
    assert sort_merge_join_count(df) == 0


def test_bootstrap_replicates_partial_aggregated(spark, sf):
    # the xB fan-out must collapse map-side: one exchange for the
    # replicate groupBy, reading only (event_id, value, event_type)
    df = _q("bootstrap_purchase_mean", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"event_id", "value", "event_type"}
    assert sort_merge_join_count(df) == 0


def test_subsequence_search_single_series_exchange(spark, sf):
    # windows + znorm + distance are all array expressions over ONE
    # key-partitioned window; no joins at all
    df = _q("burst_windows_events", spark, sf)
    assert sort_merge_join_count(df) == 0
    assert broadcast_join_count(df) == 0


def test_rank_metrics_window_over_blocks_only(spark, sf):
    # AUC/KS: one groupBy(score) reduce; the ordered window must run
    # AFTER the aggregate (over blocks), so the plan has no corpus
    # sort-merge joins and prunes to the two scored columns
    df = _q("purchase_value_auc_events", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"event_type", "value"}
    assert sort_merge_join_count(df) == 0


def test_lambda_sweep_result_is_local(spark, sf):
    # the whole grid comes from ONE eager scan of conditional sums;
    # the returned relation is driver-local arithmetic — no scans, no
    # joins, no exchanges left in its plan
    df = _q("ridge_lambda_sweep_lineitem", spark, sf)
    assert read_schemas(df) == []
    assert exchange_count(df) == 0
    assert sort_merge_join_count(df) == 0


def test_concentration_no_cartesian_prunes_scan(spark, sf):
    df = _q("revenue_concentration_customer", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"o_custkey", "o_totalprice"}
    assert sort_merge_join_count(df) == 0


def test_quantile_normalize_broadcasts_grid(spark, sf):
    # the percentile grid is a 1-row broadcast; the only other
    # exchange partitions by source for percent_rank — never a global
    # row sort before an aggregate-free sink
    df = _q("qnorm_quality_by_source", spark, sf)
    assert broadcast_join_count(df) + broadcast_nlj_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_naive_bayes_model_joins_broadcast(spark, sf):
    # the (label, token) count model and denominators must reach the
    # scoring side as broadcasts, not sort-merge shuffles
    df = _q("nb_lang_confusion_documents", spark, sf)
    assert broadcast_join_count(df) >= 3
    # the only allowed shuffle join is the doc-keyed scoring join
    # (two corpus-sized sides — a legitimate data join)
    assert sort_merge_join_count(df) <= 1


def test_pvm_bridge_joins_aggregates_only(spark, sf):
    # both sides reduce to |groups| rows before the full-outer join;
    # scans prune to the three needed columns
    df = _q("revenue_bridge_1995_1996", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {
            "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate"
        }


def test_pareto_reduces_before_window(spark, sf):
    # distinct-pair aggregate precedes the ordered window; the scan
    # reads only the two axes
    df = _q("price_quantity_frontier", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"l_quantity", "l_extendedprice"}
    assert sort_merge_join_count(df) == 0
    assert broadcast_join_count(df) == 0


def test_gmm_final_pass_is_narrow(spark, sf):
    # the returned plan is the log-likelihood scan: one column read,
    # no joins (all parameters are folded literals)
    df = _q("gmm_price_components", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"l_extendedprice"}
    assert sort_merge_join_count(df) == 0


def test_rfm_windows_over_user_aggregates(spark, sf):
    df = _q("rfm_segment_summary", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"user_id", "ts", "value"}
    assert sort_merge_join_count(df) == 0
    # corpus-max rides in as a 1-row broadcast (nested-loop form)
    assert broadcast_join_count(df) + broadcast_nlj_count(df) >= 1


def test_weighted_percentile_reduces_to_blocks(spark, sf):
    # corpus -> distinct-value blocks before any ordered window; scan
    # pruned to the two inputs + group key
    df = _q("weighted_price_percentiles", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"l_returnflag", "l_extendedprice", "l_quantity"}
    assert sort_merge_join_count(df) == 0


def test_theil_joins_entity_aggregates_only(spark, sf):
    df = _q("theil_customer_revenue", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"o_custkey", "o_totalprice"}
    assert sort_merge_join_count(df) == 0
    # group totals ride in via a broadcast (hash or 1-row NLJ form)
    assert broadcast_join_count(df) + broadcast_nlj_count(df) >= 1


def test_effective_dim_prunes_to_vector_and_id(spark, sf):
    df = _q("embedding_effective_dim", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"embedding", "vec_id"}


def test_cohort_ltv_broadcasts_cohort_sizes(spark, sf):
    df = _q("cohort_ltv_events", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"user_id", "ts", "value"}
    assert broadcast_join_count(df) + broadcast_nlj_count(df) >= 1


def test_wasserstein_grid_no_raw_row_sort(spark, sf):
    # the corpus reduces to (group, value) counts; the cumulative
    # windows run over the grid, and scans prune to two columns
    df = _q("wasserstein_price_by_flag", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"l_returnflag", "l_extendedprice"}


def test_logistic_final_pass_is_narrow_scan(spark, sf):
    # returned plan is the metrics scan: literals-folded z, no joins
    df = _q("logistic_returnflag_lineitem", spark, sf)
    for cols in read_schemas(df):
        assert set(cols) <= {"l_quantity", "l_discount", "l_returnflag"}
    assert sort_merge_join_count(df) == 0
    assert broadcast_join_count(df) == 0


def test_salted_shapes_pinned(spark, sf):
    """Pin the salted-family plan shapes so a regression can't hide in
    bench noise (VERDICT r5 #9): the salted two-phase aggregation is
    exactly two exchanges (salt-bucket partials, then final merge);
    the salted replicated-dimension join stays broadcast with the lone
    exchange belonging to the final groupBy."""
    from k_means_using_mapreduce_spark.plans.explain import (
        broadcast_join_count,
        exchange_count,
    )

    agg = _q("salted_event_type_stats", spark, sf)
    assert exchange_count(agg) == 2

    joined = _q("salted_brand_revenue", spark, sf)
    assert exchange_count(joined) == 1
    assert broadcast_join_count(joined) >= 1


def test_trend_kernels_have_no_self_join(spark, sf):
    """Round-6 scale claim: Mann-Kendall and Theil-Sen run the pair
    space inside a per-key Arrow kernel — the plan must contain ZERO
    joins of any kind (round 5 had a T^2 self-join each)."""
    from k_means_using_mapreduce_spark.plans.explain import (
        broadcast_join_count,
        executed_plan,
        sort_merge_join_count,
    )

    for name in ("trend_test_events", "theil_sen_hourly_events"):
        df = _q(name, spark, sf)
        plan = executed_plan(df)
        # the only joins allowed are resample_counts' dense-grid
        # builders (broadcast of the key x bucket skeleton) — the
        # pair space itself must be inside the grouped kernel
        assert sort_merge_join_count(df) == 0, name
        assert broadcast_join_count(df) <= 2, name
        assert "CartesianProduct" not in plan, name
        assert "FlatMapGroupsInPandas" in plan, name


def test_fd_discovery_linear_rollup_shape(spark, sf):
    """Round-6 scale claim: fd_discovery is one Generate (the
    unordered-pair explode) plus a second tiny Generate (orientation
    fan-out on the deduped relation) feeding a LINEAR chain of
    aggregations — no Expand (multi-countDistinct), no Union, no
    join."""
    from k_means_using_mapreduce_spark.plans.explain import (
        executed_plan,
        sort_merge_join_count,
    )

    df = _q("fd_discovery_orders", spark, sf)
    plan = executed_plan(df)
    assert "Expand" not in plan
    assert "Union" not in plan
    assert sort_merge_join_count(df) == 0
    assert plan.count("Generate") >= 1


def test_cox_windows_run_over_duration_blocks(spark, sf):
    """Cox's risk-set cumulative window must consume the
    distinct-duration BLOCK table (HashAggregate feeds Window), and
    the only join is the 1-row corpus-end broadcast — no subject-level
    sort, no sort-merge join."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("cox_churn_users", spark, sf)
    plan = executed_plan(df)
    assert sort_merge_join_count(df) == 0
    assert "CartesianProduct" not in plan
    # blocks-then-window: an aggregate exists upstream of every Window
    assert plan.index("HashAggregate") < plan.index("Window")


def test_ivfpq_rerank_two_stage_shape(spark, sf):
    """IVF-PQ in-plan rerank: the shortlist cut must be a
    TakeOrderedAndProject (not a global sort), and the refine stage
    must BROADCAST the k·refine candidate ids against the corpus —
    full-precision bytes read ∝ shortlist, never corpus size."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("ivfpq_rerank_topk_embeddings", spark, sf)
    plan = executed_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2  # shortlist + final
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_skyline_prunes_before_dominance_join(spark, sf):
    """d-dim skyline: the quadratic dominance stage must be a BROADCAST
    nested-loop anti-join over the locally pruned candidates — never a
    sort-merge or shuffled cartesian over the input relation."""
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("part_type_skyline", spark, sf)
    plan = executed_plan(df)
    assert broadcast_nlj_count(df) >= 1
    assert sort_merge_join_count(df) == 0
    assert "CartesianProduct" not in plan


def test_ind_discovery_single_value_shuffle_and_broadcast_counts(
    spark, sf
):
    """IND discovery's scale claim: per-attribute DISTINCT projections
    feed ONE value-keyed aggregation; pairs explode from per-value
    attribute sets (bounded by |attrs|² per value), and the per-attr
    distinct counts join back broadcast — no sort-merge join anywhere."""
    from k_means_using_mapreduce_spark.plans.explain import (
        broadcast_join_count,
        sort_merge_join_count,
    )

    df = _q("ind_discovery_tpch", spark, sf)
    assert sort_merge_join_count(df) == 0
    assert broadcast_join_count(df) >= 1


def test_hmm_viterbi_emissions_fold_jvm_side(spark, sf):
    """The HMM decode's only Python stage is the per-user sequential
    kernel: emission log-probs are a literal CASE projection (no UDF
    before the groupBy), and the plan carries exactly the one
    user-keyed exchange feeding applyInPandas."""
    from k_means_using_mapreduce_spark.plans.explain import (
        exchange_count,
        executed_plan,
    )

    df = _q("hmm_viterbi_users", spark, sf)
    plan = executed_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF
    assert exchange_count(df) == 1


def test_synthetic_control_panel_broadcasts_nation(spark, sf):
    """The synthetic-control panel build broadcasts the 25-row nation
    dimension; the only exchanges are the customer join and the
    period groupBy."""
    from k_means_using_mapreduce_spark.plans.explain import (
        broadcast_join_count,
    )

    df = _q("synthetic_control_nation_revenue", spark, sf)
    assert broadcast_join_count(df) >= 1


def test_dtw_grid_reduces_before_kernel(spark, sf):
    """DTW's quadratic stage must see only the corpus-independent
    T-bucket grid: the plan aggregates counts per bucket BEFORE the
    single-group kernel, so the Arrow stage input is T rows, not the
    corpus."""
    from k_means_using_mapreduce_spark.plans.explain import (
        executed_plan,
    )

    df = _q("dtw_click_purchase", spark, sf)
    plan = executed_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    # counts aggregate (partial_count) runs upstream of the kernel
    assert "partial_count" in plan or "count(1)" in plan


def test_ransac_votes_are_aggregates_not_joins(spark, sf):
    """RANSAC's consensus scan: all seed votes are conditional sums in
    ONE aggregate over the base relation — no join, no shuffle wider
    than the 1-row reduce."""
    from k_means_using_mapreduce_spark.plans.explain import (
        sort_merge_join_count,
    )
    from k_means_using_mapreduce_spark.operators.robust import ransac_line
    from k_means_using_mapreduce_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf, "lineitem")
    out = ransac_line(
        li,
        "l_quantity",
        "l_extendedprice",
        F.concat_ws("-", "l_orderkey", "l_linenumber"),
        seeds=4,
        eps=10000.0,
    )
    assert sort_merge_join_count(out) == 0


def test_augment_dropout_is_shuffle_free(spark, sf):
    """Token dropout claims 'the cheapest possible corpus write': a
    pure narrow projection — zero exchanges, zero Python stages."""
    from k_means_using_mapreduce_spark.plans.explain import (
        exchange_count,
        executed_plan,
    )

    df = _q("augment_dropout_documents", spark, sf)
    assert exchange_count(df) == 0
    assert "BatchEvalPython" not in executed_plan(df)


def test_boxcox_profile_is_one_scan(spark, sf):
    """The lambda ladder is conditional sums in ONE aggregate: a
    single source scan feeds every candidate's sufficient statistics."""
    from k_means_using_mapreduce_spark.plans.explain import (
        executed_plan,
    )

    df = _q("boxcox_price_lineitem", spark, sf)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 1


def test_mondrian_summary_reads_two_columns(spark, sf):
    """Mondrian's split passes must prune the events scan to the two
    quasi-identifier inputs (value, ts) — no full-row shuffles."""
    from k_means_using_mapreduce_spark.plans.explain import read_schemas

    df = _q("mondrian_cells_events", spark, sf)
    for schema in read_schemas(df):
        assert set(schema) <= {"value", "ts"}


def test_ivf_recall_broadcasts_queries_and_probe_table(spark, sf):
    """The recall eval broadcasts the fixed query set and the tiny
    nprobe relation; the corpus side never sort-merge joins."""
    from k_means_using_mapreduce_spark.plans.explain import (
        broadcast_join_count,
        sort_merge_join_count,
    )

    df = _q("ivf_recall_embeddings", spark, sf)
    assert broadcast_join_count(df) >= 2
    assert sort_merge_join_count(df) == 0


def test_q5_family_broadcasts_filtered_orders(spark, sf):
    """Round-8 pin (VERDICT item 8): the year-filtered orders slice
    (~1/7 of the table) is BROADCAST in both Q5 derivatives, so every
    join is a broadcast hash join and the plan's only exchange is the
    final k-row groupBy — no li⋈orders shuffle."""
    for name, n_bcast in (
        ("asia_nation_revenue", 4),
        ("q5_local_supplier_revenue", 5),
    ):
        df = _q(name, spark, sf)
        assert broadcast_join_count(df) == n_bcast, name
        assert sort_merge_join_count(df) == 0, name
        assert exchange_count(df) == 1, name
