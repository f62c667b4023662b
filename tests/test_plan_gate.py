"""Registry-wide physical-plan regression gate.

Every registered query's pre-AQE physical plan is built at sf0.001
(construction only — `sparkPlan()` never executes the job) and
checked against the two plan classes that kill a 100 TB run:

* `CartesianProduct` — never allowed, anywhere;
* `BroadcastNestedLoopJoin` — allowed ONLY for the documented
  1-row/tiny-build scalar-broadcast class (corpus totals, centroid
  frames, query vectors, idf stats…), frozen in _BNLJ_ALLOWED. A new
  query that picks up a BNLJ must either justify itself onto the
  list or restructure the join.

Streaming queries are excluded: their callables run real streams to
produce the comparison frame, so "building the plan" would execute
micro-batches; their plan shapes are pinned in their own tests.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"

# The scalar-broadcast class: every build side here is a 1-row
# aggregate (totals/max/thresholds), a ≤centroids/≤query-vector
# literal frame, or a ≤vocab stats frame — audited in BENCH/PLANS.md.
_BNLJ_ALLOWED = frozenset(
    {
        "customer_spend_deciles",
        "dedup_lsh_banding_sweep",
        # session-13 scalar/bounded-frame broadcasts (PLANS.md
        # session-13 parts 2-4): 1-row totals (topterms, basket
        # n_orders, rfm anchor, wau bounds, concentration total +
        # 4-row cut frame), the ≤31-row day spine (cusum), the
        # 15-cell bitemporal grid, and the kNN eval-frame pairwise
        # class link_predict inherits from sim_knn_join_topk:
        # session-14 scalar broadcasts: KM's 1-row anchor date, ACF's
        # 1-row (n, sum) stats + 1-row denominator frames, and the
        # Bloom audit's 1-row train-count + 1-row bitmap-digest frames:
        "customer_survival_km",
        "events_acf",
        "dedup_bloom_fpr_audit",
        "orders_benford_audit",
        "events_hll_sketch",
        "orders_backlog_aging",
        "events_cuped_adjust",
        # clustering-depth audit: 1-row endpoint-ARRAY frame broadcast
        # (n_files is manifest-scale metadata, bounded):
        "table_clustering_depth_audit",
        "events_bootstrap_ci",
        "text_cdc_shift_certificate",
        # Markov stationary: alphabet-frame (≤5-row) broadcasts for
        # the cell grid and the folded vector:
        "events_markov_stationary",
        # DiD: the CUPED-style 1-row midpoint broadcast:
        "events_did_estimator",
        # power analysis: 1-row moments × 3-row MDE spine:
        "events_power_analysis",
        # burstiness: the 1-row corpus-count broadcast:
        "text_term_burstiness",
        "sim_cluster_topterms",
        "market_basket_pairs",
        "graph_link_predict",
        "events_cusum_changepoints",
        "events_bitemporal_asof",
        "customer_rfm_segments",
        "revenue_concentration",
        "events_wau_stickiness",
        "graph_community_modularity",
        "graph_provenance_rank",
        "text_ccnet_buckets",
        "text_langid_confusion",
        "graph_triangle_stats",
        "idle_rich_customers",
        "major_revenue_parts",
        "sim_cosine_topk",
        "sim_binary_quant_recall",
        "sim_ivf_recall_curve",
        "sim_matryoshka_recall",
        "table_partition_skew_report",
        "table_zonemap_prune_stats",
        "sim_embedding_outliers",
        "sim_hard_negatives",
        "sim_int8_quant_recall",
        "sim_ivf_delta_assign",
        "sim_ivf_topk",
        "sim_kmeans_refine",
        "sim_knn_join_topk",
        "sim_margin_pair_mining",
        "sim_pq_adc_recall",
        "sim_semdedup_prune",
        "text_allpairs_cosine",
        "text_bigram_logprob",
        "text_bm25_eval",
        "text_bm25_search",
        "text_bpe_apply_fertility",
        "text_bpe_learn_merges",
        "text_dsir_select",
        "text_heaps_fit",
        "text_langid_ngram",
        "text_mix_resample",
        "text_pmi_collocations",
        "text_quality_ensemble",
        "text_rrf_fusion",
        "text_source_kl_drift",
        "text_source_mix_weights",
        "text_tfidf_keywords",
        "text_unigram_logprob",
    }
)


def test_no_cartesian_anywhere_and_bnlj_only_scalar_class(spark):
    import __spark_entry__ as e

    offenders_cart = []
    offenders_bnlj = []
    for name, fn in e.queries().items():
        if name.startswith("stream_"):
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "CartesianProduct" in plan:
            offenders_cart.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            offenders_bnlj.append(name)
    assert not offenders_cart, f"CartesianProduct in: {offenders_cart}"
    assert not offenders_bnlj, (
        f"undocumented BroadcastNestedLoopJoin in: {offenders_bnlj} — "
        "either restructure the join or audit the build side and add "
        "the name to _BNLJ_ALLOWED with a PLANS.md row"
    )


def test_bnlj_allowlist_has_no_stale_names(spark):
    """Names on the allowlist must still exist in the registry —
    otherwise the list silently stops guarding anything."""
    import __spark_entry__ as e

    stale = _BNLJ_ALLOWED - set(e.queries())
    assert not stale, f"stale allowlist entries: {sorted(stale)}"
