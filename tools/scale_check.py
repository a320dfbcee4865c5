"""Scaling evidence: run headline queries at sf0.001 / sf0.01 / sf0.1 and
print per-query wall-clock with scale ratios.

A scale-correct plan grows sublinearly in this regime (fixed overhead
dominates at tiny SF); a pathological one (cartesian, driver loop,
re-read-per-batch) grows superlinearly. Writes SCALING.md.

Run: python tools/scale_check.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

HEADLINERS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q13_order_histogram",
    "xmatch_cone",
    "k1_classification",
    "ts_linfit",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_knn_bruteforce",
    "sim_lsh_search",
    "text_tfidf",
    "q21_sole_returner",
    "q9_product_profit",
    "q_asof_attribution",
    "q_interval_attribution",
    "pipe_pack_sequences",
    "dedup_components",
    "q2_min_cost_supplier",
    "pipe_decontaminate",
    "q_stat_moments",
    "w_range_frame",
    "skew_hot_users",
    "text_bigrams",
    "sim_quantize_int8",
    "w_funnel_stages",
    "agg_cms_topk",
    "q_bloom_filter_join",
    "ts_gapfill_daily",
    "q_upsert_merge",
    "w_cum_distinct_users",
    "q_pagerank3",
    "dedup_semantic",
    "dedup_substring",
    "dedup_substring_rewrite",
    "dedup_minhash_lsh",
    "dedup_winnowing",
    "layout_hilbert",
    "dedup_components_distributed",
    "pipe_contamination_frac",
    "pipe_mixture",
    "sim_pq_adc",
    "text_pmi",
    "pipe_source_cap",
    "pipe_outlier_mad",
    "text_sparse_cosine",
    "sim_kmeans2",
    "dedup_incremental",
    "dedup_containment",
    "chunk_fixed_overlap",
    "chunk_cdc",
    "dedup_chunk_cdc",
    "layout_zorder",
    "pipe_unimax_epochs",
    "text_vocab_coverage",
    "pipe_dsir_select",
    "pipe_curation_funnel",
    "sim_maxdot",
    "sim_maxdot_lsh",
    "sim_rrf_fusion",
    "pipe_temperature_sample",
    "pipe_quota_sample",
    "ev_retention_cohorts",
    "pipe_pareto_front",
    "pipe_shard_balance",
    "er_candidate_pairs",
    "er_golden_record",
    "pipe_standardize",
    "layout_compaction_bins",
    "dedup_lsh_recall",
    "layout_zone_map",
    "pipe_k_anonymity",
    "text_bm25",
    "w_ema",
    "dedup_split_leakage",
    "er_fellegi_sunter",
    "pipe_l_diversity",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from fink_filters_spark.session import get_session

    import __spark_entry__ as entry

    spark = get_session("scale_check")
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()
    qs = entry.queries()

    rows = []
    for name in HEADLINERS:
        per_sf = []
        for sf in SFS:
            # drop caches left by previous queries/SFs: accumulated operator
            # caches (dedup collapse tables etc.) distort later rows via GC
            # and storage pressure; min-of-2 below still rides a query's OWN
            # cache on its second run, same as bench.py
            spark.catalog.clearCache()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            per_sf.append(best)
        rows.append((name, per_sf))
        print(f"# {name}: " + " / ".join(f"{t:.2f}s" for t in per_sf), file=sys.stderr)

    lines = [
        "# SCALING — headline query wall-clock across scale factors",
        "",
        "min-of-2 per cell, single local[N] JVM. The 100x data step",
        "(sf0.001 -> sf0.1) should cost far less than 100x time while fixed",
        "overhead dominates; a superlinear column would flag a plan that",
        "does not scale.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | t(0.1)/t(0.001) |",
        "|---|---|---|---|---|",
    ]
    for name, (a, b, c) in rows:
        lines.append(f"| {name} | {a:.2f}s | {b:.2f}s | {c:.2f}s | {c / a:.1f}x |")
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("SCALING.md written")
    spark.stop()


if __name__ == "__main__":
    main()
