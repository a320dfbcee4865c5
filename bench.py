"""Benchmark runner (driver contract).

Runs every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], times each end-to-end
(plan + execute + collect-to-count), and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    from fink_filters_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session("bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers + Python workers once so per-query
    # numbers measure the queries, not session/interpreter startup
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    # single-run timings on this box vary +-40%; min-of-N is the standard
    # low-noise estimator of a query's true cost (N=2 keeps the suite fast)
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    times: dict[str, float] = {}
    for name, fn in qs.items():
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                n = fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                print(f"# bench error {name}: {e}", file=sys.stderr)
                best = -1.0
                break
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
        times[name] = best
        if best >= 0:
            print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)
        # operators that cache() intermediates (jaccard, minhash, components)
        # would otherwise accumulate blocks across 100+ queries and skew the
        # later measurements with GC pressure
        spark.catalog.clearCache()

    total = round(sum(t for t in times.values() if t >= 0), 3)
    # Full per-query detail (all queries) goes to stderr; the stdout contract
    # line must stay well under 2000 chars because the driver records only the
    # last 2000 chars of output and parses the JSON from that tail window.
    print("# ALL " + json.dumps(times), file=sys.stderr)
    headliners = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_nation_revenue",
        "q9_product_profit",
        "q13_order_histogram",
        "q18_large_orders",
        "q21_sole_returner",
        "topk_anomalies",
        "f_sn_candidates",
        "k1_classification",
        "w_topn_per_user",
        "sess_hourly",
        "ts_linfit",
        "ts_hist_array",
        "xmatch_cone",
        "xmatch_enrich",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_components",
        "dedup_embedding_cosine",
        "sim_knn_bruteforce",
        "sim_ivf_search",
        "sim_lsh_search",
        "text_tfidf",
        "text_bigrams",
        "pipe_decontaminate",
        "pipe_pack_sequences",
        "q_asof_attribution",
        "q_recursive_chain",
        "agg_incremental",
        "w_funnel_stages",
        "agg_cms_topk",
        "q_upsert_merge",
        "sim_ivf_recall",
        "ev_variant_parse",
        "sim_pq_adc",
        "sim_kmeans2",
        "text_sparse_cosine",
        "text_pmi",
        "dedup_containment",
        "stream_event_pairs",
        "chunk_cdc",
        "dedup_chunk_cdc",
        "pipe_dsir_select",
        "pipe_curation_funnel",
        "pipe_shard_balance",
        "dedup_winnowing",
        "layout_hilbert",
        "mm_avro_roundtrip",
        "xmatch_large_pairs",
    ]
    compact = {k: times[k] for k in headliners if k in times}
    failed = sorted(k for k, v in times.items() if v is not None and v < 0)
    line = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": compact,
        "sf": sf,
        "n_queries": len(times),
        "n_failed": len(failed),
    }
    out = json.dumps(line, separators=(",", ":"))
    if len(out) > 1800:  # hard guard for the driver's tail window
        line["queries"] = dict(list(compact.items())[:15])
        out = json.dumps(line, separators=(",", ":"))
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
