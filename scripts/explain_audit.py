"""Plan-quality audit: print a physical-plan summary for the headline
queries — exchanges (shuffles), join strategies, pushed parquet filters,
whole-stage-codegen spans — and flag anti-patterns (cartesian products,
nested-loop joins where an equi-join was expected).

Usage: python scripts/explain_audit.py [query ...]
       python scripts/explain_audit.py --write-plans ROUND
           regenerate PLANS.md mechanically (header dated to ROUND) —
           part of the closing checklist since r10 (the r9 verdict
           caught a hand-maintained PLANS.md header going stale).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ab_metadata_pusher_spark.observability import (  # noqa: E402
    start_plan_capture, stop_plan_capture,
)
from ab_metadata_pusher_spark.plans.registry import queries  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

#: queries where a nested-loop/cross join is the *intended* strategy:
#: brute-force similarity broadcasts the tiny query side over the corpus;
#: IVF cross-joins every vector with the (10-row) centroid table; the
#: scalar-subquery shape is a broadcast one-row cross join by design.
EXPECTED_NON_EQUI = {"timeseries_gap_fill",  # dense grid = users x hour spine
                     "timeseries_interpolate",
                     "similarity_topk_cosine",
                     # (dedup_embedding_cosine and dedup_simhash_pairs
                     # left this set: LSH / pigeonhole blocking makes
                     # them pure equi-joins — enforced from r4 on)
                     "join_range_bands",
                     "similarity_ann_ivf", "text_tfidf_top_terms",
                     "subquery_above_avg", "join_cross_regions",
                     # 1-row corpus-total broadcast onto the token stream
                     "text_lm_score",
                     # 1-row aggregate cross joins (n_nodes x n_edges x
                     # n_triangles); corpus-stats broadcast in BM25
                     "graph_triangles", "text_bm25",
                     # 1-row corpus-total broadcast onto the ≤k candidates
                     "agg_heavy_hitters_guaranteed", "agg_heavy_hitters",
                     # brute-force comparison side is the intended baseline
                     "similarity_ann_recall", "similarity_ivf_recall",
                     # 1-row scalar broadcasts: corpus token total /
                     # mixture budget / percentile threshold
                     "corpus_token_budget", "sample_epoch_mixture",
                     "quality_adaptive_threshold",
                     # k-means cell assignment broadcasts the tiny
                     # centroid table (same as similarity_ann_ivf)
                     "dedup_semantic",
                     # 1-row broadcast cross joins by design: the bloom
                     # word-map row onto the batch; corpus token totals
                     # onto the bigram/DSIR streams; the n scalar onto
                     # the d^2 covariance partials
                     "dedup_bloom_incremental", "text_bigram_lm",
                     "sample_dsir", "embedding_covariance",
                     # corpus-total + 1-row tercile-threshold broadcasts
                     "quality_ppl_buckets",
                     # 1-row corpus-totals broadcast onto |sources| rows
                     "quality_mixture_kl",
                     # 1-row x 1-row count cross joins, one per candidate
                     # column pair
                     "metadata_fk_inference",
                     # 1-row scalar broadcasts: corpus doc total onto the
                     # line-df frame / min-max extents onto the rows /
                     # population totals onto the distinct-value ECDF
                     "text_boilerplate_lines", "layout_zorder_stats",
                     "analytics_ks_drift",
                     # 1-row broadcast of the global reference
                     # distribution array
                     "quality_quantile_normalize",
                     # 1-row x 1-row estimate-vs-truth cross join
                     "analytics_join_size_estimate",
                     # (quality_label_consistency_ann earned its way OUT
                     # of this set in r4: LSH candidates are equi-joins,
                     # 0 nestedloop — the audit now enforces that)
                     # 1-row x 1-row recall/agreement aggregate join
                     "quality_label_consistency_recall",
                     # 1-row time-extent broadcast onto the point stream
                     "timeseries_downsample_lttb",
                     # 1-row order-total broadcast onto the gated pairs
                     "orders_basket_lift"}

#: queries where a SINGLE-PARTITION sort/window is the intended plan —
#: legitimate only when the frame under it is provably bounded (vocab,
#: bucket spine, partition-skyline union, distinct grouped values), per
#: the docstring of each.  Everything else that funnels a Sort/Window
#: through Exchange SinglePartition is the round-4 bug class (weighted
#: sample / BM25 ran corpus-sized single-task sorts) and fails the audit.
GLOBAL_SORTWIN_OK = {
    # vocab-bounded token-id assignment (min-count filtered terms)
    "text_vocab",
    # ECDF window over DISTINCT order prices of two priority classes
    "analytics_ks_drift",
    # global sweep input is the union of per-partition skylines
    "analytics_skyline_2d",
    # user-count-sized RFM frame; ntile quintiles are inherently global
    # (approx_percentile cutpoints are the documented 100 TB form)
    "events_rfm_segments",
    # bucket-spine windows: 256/1024-row bounded frames
    "quality_ppl_buckets", "rollup_incremental_merge",
    # exact equi-depth ntile: the documented exact form (the 100 TB
    # path is approx_percentile cutpoints + map-side bucket assign)
    "agg_histogram_equi_depth",
    # |clusters|-bounded medoid rank / |segments|-bounded merge windows
    "dedup_clusters", "dedup_semantic",
    # |sources|-bounded domain frame normalization
    "sample_temperature",
    # ≤1001-row bucket-histogram running total (the docstring's whole
    # point: the corpus-sized rank runs WITHIN buckets, in parallel)
    "corpus_token_budget",
    # ≤k-candidate final ranking after the mergeable-MG reduction
    "agg_heavy_hitters_guaranteed", "agg_heavy_hitters",
    # catalog-sized id-assigning sort (operators/graph.py:199): a
    # metadata graph's node set is catalog-bounded by definition; the
    # count is inflated by cache-build reprints under every
    # InMemoryTableScan across the CC loop's checkpoint segments
    "metadata_graph_components",
    # contingency-cell frame (|event_types| x |user_buckets|)
    "analytics_chi_square",
    # 100-row bucket-mean spine (fixed-anchor LTTB)
    "timeseries_downsample_lttb",
}

DEFAULT = [
    "metadata_nodes", "join_multiway_revenue", "join_asof_clicks",
    "join_full_outer_nations", "agg_pricing_summary", "agg_statistics",
    "window_topk_per_group", "window_rank_functions", "dedup_minhash_lsh",
    "similarity_topk_cosine", "similarity_ann_ivf", "sessionize_events",
    "text_fingerprint", "text_tfidf_top_terms", "rollup_time_buckets",
    "unpivot_lineitem_measures", "subquery_above_avg",
    "decontaminate_ngram_overlap", "dedup_clusters", "dedup_incremental",
    "pack_sequences", "sample_stratified", "text_repetition",
    "timeseries_gap_fill", "timeseries_interpolate", "sample_domain_mixture",
    "funnel_steps", "cohort_retention", "window_range_1h", "agg_histogram",
    "agg_string_concat", "text_vocab", "text_bigrams", "embedding_kmeans",
    "metadata_graph_degree", "metadata_snapshot_diff",
    "join_lateral_topk", "join_null_safe", "dedup_chunks", "text_lm_score",
    "metadata_graph_two_hop", "agg_regression", "setop_intersect_all",
    "agg_bool_bitwise", "sample_length_curriculum",
    "rollup_ohlc", "text_char_entropy", "sample_temperature",
    "metadata_graph_pagerank", "subquery_not_in", "agg_filtered",
    "window_gap_islands", "dedup_keep_best",
    "join_range_binned", "window_moving_median", "setop_union_evolve",
    "graph_triangles", "graph_bfs_distance", "analytics_outliers_mad",
    "dedup_edit_distance", "text_bm25", "text_inverted_index",
    "sample_weighted", "cdc_latest_snapshot", "cdc_scd2_intervals",
    "map_higher_order_funcs",
    # round-3 additions
    "dedup_substring_spans", "jsonl_corpus_ingest", "text_html_strip",
    "text_unicode_nfc", "sample_global_shuffle", "quality_expectations",
    "agg_heavy_hitters_guaranteed", "multimodal_decode_audio",
    "multimodal_decode_video", "text_bpe_pair_counts",
    "corpus_build_pipeline", "window_ema_bounded", "warc_corpus_ingest",
    "similarity_ivf_recall", "xml_corpus_ingest", "csv_corpus_ingest",
    "text_quality_classifier", "corpus_token_budget", "sample_epoch_mixture",
    "dedup_url_canonical", "multimodal_audio_fingerprint",
    "dedup_paragraph_rewrite", "quality_adaptive_threshold",
    "dedup_incremental_minhash", "dedup_semantic", "text_bpe_apply",
    "dedup_bloom_incremental", "text_bigram_lm", "sample_dsir",
    "embedding_covariance", "graph_label_propagation", "text_bpe_train", "quality_ppl_buckets",
    "dedup_suffix_prefix", "quality_mixture_kl", "dedup_ppjoin", "timeseries_seasonal_decompose",
    "sample_kcenter", "text_ngram_novelty", "timeseries_anomaly_zscore",
    "join_asof_tolerance", "metadata_fk_inference",
    "events_markov_transitions", "graph_link_prediction",
    "dedup_weighted_minhash",
    # round-3 second batch
    "graph_kcore", "text_boilerplate_lines", "entity_resolution_customers",
    "layout_zorder_stats", "analytics_winsorize",
    "subquery_correlated_scalar", "agg_having_in", "join_disjunctive_pred",
    "cdc_join_view_delta", "analytics_ks_drift", "analytics_chi_square",
    "quality_quantile_normalize", "embedding_random_projection",
    "agg_countmin_sketch", "metadata_masked_view",
    "analytics_ols_normal_equations", "analytics_join_size_estimate",
    "quality_label_consistency_ann", "quality_label_consistency_recall",
    "timeseries_downsample_lttb",
    "orc_corpus_ingest",
    "join_geo_proximity",
    "analytics_skyline_2d",
    "events_trigram_paths",
    "events_rfm_segments",
    "orders_basket_lift",
    # round-4 audit-coverage sweep: every remaining batch query in the
    # registry (stream_* excluded — their explain is a memory-sink scan
    # and building them executes the stream)
    "agg_approx_count_distinct", "agg_percentiles_guaranteed",
    "agg_count_distinct", "agg_cube", "agg_grouping_sets",
    "agg_heavy_hitters", "agg_histogram_equi_depth",
    "agg_hll_sketch_union", "agg_max_by", "agg_mode", "agg_percentiles",
    "agg_rollup", "agg_weighted_avg", "array_funcs_embeddings",
    "corpus_snapshot_diff", "dedup_containment", "dedup_embedding_cosine",
    "dedup_exact", "dedup_minhash_verified", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "distinct_pairs",
    "embedding_pca_variance", "explode_word_counts", "join_anti",
    "join_asof_cogrouped", "join_cross_regions", "join_interval_overlap",
    "join_left_outer_orders", "join_range_bands", "join_salted_revenue",
    "join_semi", "join_temporal_dim", "map_event_type_counts",
    "metadata_catalog_columns", "metadata_graph_closure",
    "metadata_graph_components", "metadata_profile_columns",
    "metadata_relations", "metadata_tables",
    "metadata_tables_filtered", "multimodal_binary_meta",
    "multimodal_decode_features", "multimodal_frame_sample",
    "multimodal_phash_pairs", "multimodal_resize", "pivot_event_types",
    "pivot_multi_agg", "posexplode_outer_runs", "posexplode_tokens",
    "quality_fk_violations", "sample_hash_split",
    "scalar_conditional", "scalar_date_funcs", "scalar_json_funcs",
    "scalar_math_funcs", "scalar_regexp_funcs", "scalar_string_funcs",
    "scalar_try_funcs", "scalar_variant_funcs",
    "sessionize_builtin_window",
    # round-5 registrations (1:1 swaps for the retired near-duplicates
    # metadata_schema_drift / sessionize_events_pandas)
    "graph_link_prediction_capped", "sink_envelope_chunking",
    "setop_except", "setop_except_all", "setop_intersect",
    "setop_symmetric_diff", "setop_union_distinct", "similarity_ann_lsh",
    "similarity_ann_recall", "similarity_pq",
    "subquery_correlated_exists", "text_langid", "text_pii_redact",
    "text_quality_scores", "text_token_counts", "topk_global",
    "udf_grouped_geomean", "udf_map_in_arrow", "udf_scalar_log1p",
    "udtf_span_split", "window_distribution_funcs", "window_ignore_nulls",
    "window_lag_delta", "window_moving_avg", "window_running_distinct",
    "window_running_total",
]


def count_global_sortwin(plan: str) -> int:
    """Count Sort/Window operators fed by an Exchange SinglePartition —
    the single-task global sort that caps scale-out.  Parses the
    formatted explain: the tree section gives each node's parent (by
    indentation), the detail section says which Exchange ids are
    SinglePartition.  1-row aggregates (HashAggregate over
    SinglePartition) are NOT counted — collapsing to one row is the
    point there."""
    import re

    passthrough = ("AQEShuffleRead", "ShuffleQueryStage", "InputAdapter",
                   "WholeStageCodegen", "ReusedExchange", "Exchange")
    tree_nodes = []  # (depth, op, id)
    for ln in plan.splitlines():
        m = re.match(r"^([\s+:*\-]*)([A-Za-z][A-Za-z ]*\w)\s+\((\d+)\)\s*$",
                     ln)
        if m:
            tree_nodes.append((len(m.group(1)), m.group(2), int(m.group(3))))
    single_ids = set()
    for m in re.finditer(r"\((\d+)\) Exchange[\s\S]{0,200}?Arguments: "
                         r"SinglePartition", plan):
        single_ids.add(int(m.group(1)))
    n = 0
    for i, (depth, op, nid) in enumerate(tree_nodes):
        if nid not in single_ids:
            continue
        # walk up through shallower lines (ancestors), skipping
        # pass-through wrappers, and classify the first real ancestor
        cur = depth
        for j in range(i - 1, -1, -1):
            d, anc_op, _ = tree_nodes[j]
            if d >= cur:
                continue
            if anc_op.startswith(passthrough):
                cur = d
                continue
            if anc_op.startswith(("Sort", "Window")):
                n += 1
            break
    return n


_PLANS_HEADER = """# PLANS — physical-plan audit of every batch query (sf0.1)

Generated by `python scripts/explain_audit.py --write-plans {round}` (round {round}). Columns:
shuffle count, join strategies chosen, parquet scans with pushed filters;
nested-loop joins outside the expected set (tiny/1-row broadcast sides) fail the audit;
global_sortwin counts Sort/Window operators fed by an Exchange SinglePartition
(single-task global sorts) — allowed only for the documented bounded frames in
GLOBAL_SORTWIN_OK, any other occurrence fails the audit.
Iterative operators (localCheckpoint loops) report CUMULATIVE counts:
pre-checkpoint plan segments are captured via observability.capture_plan_segment
and summed (iter_segments=N shows how many truncated segments were added back).
Since round 7 the audit session pins MATERIALIZE_CONF=eager — the same mode
bench.py times — so shared-stream materializations appear as checkpointed
segments; the library's lazy-persist default has identical shuffle structure
with InMemoryTableScan consumers instead.

```
"""


def main() -> int:
    from ab_metadata_pusher_spark.operators._shared import MATERIALIZE_CONF

    args = sys.argv[1:]
    plans_round = None
    if args and args[0] == "--write-plans":
        plans_round, args = args[1], args[2:]

    spark = get_spark(app_name="explain-audit",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # Audit the BENCH's plan shapes: eager materialization (checkpointed
    # shared streams), matching bench.py's pinned mode.  The library's
    # lazy-persist default swaps those segments for InMemoryTableScans
    # of the same single materialization — same shuffle structure, but
    # the audit pins the shape the timed runs execute.
    spark.conf.set(MATERIALIZE_CONF, "eager")
    reg = queries()
    names = args or DEFAULT
    bad = 0
    lines: list[str] = []
    for name in names:
        # Iterative operators truncate lineage with localCheckpoint while
        # the query BUILDS, so the final EXPLAIN alone under-counts their
        # work; capture the pre-checkpoint plan segments and sum them.
        start_plan_capture()
        df = reg[name](spark, SF_DIR)
        segments = stop_plan_capture()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plans = segments + [buf.getvalue()]
        n_exchange = sum(p.count(") Exchange") for p in plans)
        n_bcast = sum(p.count("BroadcastHashJoin") for p in plans)
        n_smj = sum(p.count("SortMergeJoin") for p in plans)
        n_nl = sum(p.count("BroadcastNestedLoopJoin")
                   + p.count("CartesianProduct") for p in plans)
        pushed = sum(1 for p in plans for ln in p.splitlines()
                     if "PushedFilters: [" in ln and "PushedFilters: []" not in ln)
        n_gsw = sum(count_global_sortwin(p) for p in plans)
        flag = ""
        if n_nl and name not in EXPECTED_NON_EQUI:
            flag = "  <-- UNEXPECTED NESTED-LOOP/CARTESIAN"
            bad += 1
        if n_gsw and name not in GLOBAL_SORTWIN_OK:
            flag += "  <-- UNEXPECTED GLOBAL SORT/WINDOW"
            bad += 1
        seg = f" iter_segments={len(segments)}" if segments else ""
        gsw = f" global_sortwin={n_gsw}" if n_gsw else ""
        line = (f"{name:28s} shuffles={n_exchange} broadcast={n_bcast} "
                f"sortmerge={n_smj} nestedloop={n_nl} pushed_scans={pushed}"
                f"{gsw}{seg}{flag}")
        lines.append(line)
        print(line)
    verdict = "AUDIT " + ("FAIL" if bad else "PASS")
    lines.append(verdict)
    print(verdict)
    if plans_round is not None and not bad:
        out = REPO / "PLANS.md"
        out.write_text(_PLANS_HEADER.format(round=plans_round)
                       + "\n".join(lines) + "\n```\n")
        print(f"wrote {out}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
