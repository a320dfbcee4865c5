"""Physical-plan lint across the whole declared query suite.

Every declared query's executed plan is checked for scale anti-patterns:
unintended cartesian products and nested-loop joins. The brute-force
similarity/embedding queries are the only plans ALLOWED a nested-loop —
that is their documented semantics (all-pairs baseline); everything else
must plan as hash/broadcast joins.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# all-pairs by design (documented brute-force baselines)
NESTED_LOOP_ALLOWED = {
    "dedup_embedding_cosine",  # block-pair nested-loop join over B block rows (matmul kernel)
    "text_tfidf",  # 1-row corpus-count cross join (broadcast NLJ is the right plan)
    "sim_knn_bruteforce",  # query-set x corpus broadcast NLJ
    "sim_maxdot",  # query-set x corpus broadcast NLJ (exact MIPS baseline)
    "sim_ivf_assign",  # corpus x centroids broadcast NLJ
    "dedup_semantic",  # composes sim_ivf_assign's corpus x centroids broadcast NLJ
    "sim_ivf_search",  # probe join includes a non-equi condition
    "sim_ivf_recall",  # composes sim_knn_bruteforce + sim_ivf_search above
    "q22_idle_customers",  # 1-row scalar-aggregate cross join (broadcast NLJ is the right plan)
    "q11_important_stock",  # 1-row scalar-aggregate cross join (fraction-of-total HAVING)
    "pipe_group_split",  # 1-row leakage-audit aggregate cross join (broadcast NLJ)
    "text_pmi",  # 1-row unigram/bigram-total cross joins (broadcast NLJ)
    "text_sparse_cosine",  # 1-row corpus-count cross join (broadcast NLJ)
    "pipe_unimax_epochs",  # 1-row water-fill-level aggregate cross join (broadcast NLJ)
    "text_bm25",  # 1-row corpus-stats (N/avgdl/df) cross join (broadcast NLJ)
    "text_vocab_coverage",  # 4-row threshold table x ranked vocab non-equi broadcast NLJ
    "pipe_dsir_select",  # 1-row corpus-total aggregate cross join (broadcast NLJ)
    "sim_maxdot_lsh",  # 1-row max-norm aggregate cross join (MIPS augmentation)
    "dedup_ngram_jaccard",  # 1-row shingled-doc-count cross join (max_df_frac gate)
    "dedup_containment",  # 1-row shingled-doc-count cross join (max_df_frac gate)
    "pipe_range_bounds",  # 7-rank broadcast range join over the value-domain table
    "sim_rrf_fusion",  # composes the sim_knn_bruteforce + sim_maxdot NLJ baselines
}


def _unpartitioned_windows(root) -> list[str]:
    """Window-family physical nodes with an EMPTY partition spec — Spark
    executes those on a single partition (every input row moves to one
    task), so on a row-scale input they are a scale-killer. JVM-tree
    traversal, not plan-string parsing: a partitioned-but-unordered
    window prints the same bracket-group count as an unpartitioned one."""
    bad = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if cls in ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec"):
            if node.partitionSpec().isEmpty():
                bad.append(cls)
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))
        if cls == "InMemoryTableScanExec":
            try:
                walk(node.relation().cachedPlan())
            except Exception:
                pass

    walk(root)
    return bad


@pytest.fixture(scope="module")
def plan_info(spark):
    import __spark_entry__ as entry

    out = {}
    for name, fn in entry.queries().items():
        # cached subtrees (InMemoryRelation) hide their upstream exchanges,
        # making shuffle counts depend on execution order — clear per query
        # so the snapshot is deterministic
        spark.catalog.clearCache()
        df = fn(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        out[name] = (qe.executedPlan().toString(), _unpartitioned_windows(qe.executedPlan()))
    return out


@pytest.fixture(scope="module")
def plans(plan_info):
    return {k: v[0] for k, v in plan_info.items()}


def test_no_unintended_cartesian_or_nested_loop(plans):
    bad = []
    for name, plan in plans.items():
        if name in NESTED_LOOP_ALLOWED:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"nested-loop/cartesian plans in: {bad}"


# Queries whose unpartitioned windows run over BOUNDED-cardinality inputs
# (aggregate/value-domain tables whose size does not grow linearly with the
# corpus) — the single task holds domain-sized state, which is the intended
# order-statistics shape (operators/rank.py, queries/mlprep.pipe_range_bounds).
# Anything NOT listed here that plans an unpartitioned Window over a query
# input fails the lint (round-9 verdict: three row-scale instances survived
# nine rounds because no lint covered this node).
GLOBAL_WINDOW_BOUNDED_OK = {
    "text_bm25": "window over the <=TOPK rows kept by TakeOrderedAndProject",
    "w_ntile_deciles": "grid_rank cum-counts over the bal_cents value-DOMAIN table",
    "pipe_shard_balance": "grid_rank cum-counts over the n_tok value-DOMAIN table",
    "pipe_range_bounds": "order statistics over the price value-DOMAIN table",
    "pipe_temperature_sample": "per-source stats table (cardinality = #sources)",
    "pipe_class_weights": "per-event-type counts (5 rows)",
    "pipe_drift_psi": "per-event-type counts (5 rows)",
    "pipe_pareto_front": "per-quality-score maxima (bounded ppm grid)",
    "pipe_unimax_epochs": "per-source cap/water-fill table (cardinality = #sources)",
    "text_vocab_coverage": "vocab count table (aggregate, Heaps-law sublinear)",
}


def test_no_unpartitioned_windows_over_row_scale_inputs(plan_info):
    bad = {
        name: nodes
        for name, (_, nodes) in plan_info.items()
        if nodes and name not in GLOBAL_WINDOW_BOUNDED_OK
    }
    assert not bad, (
        "unpartitioned (single-partition) Window nodes outside the bounded "
        f"allowlist: {bad} — rewrite with operators/rank.grid_rank, "
        "orderBy().limit(), or a keyed window, or justify in "
        "GLOBAL_WINDOW_BOUNDED_OK"
    )


def test_no_row_at_a_time_python(plans):
    """Python in the execution path must be Arrow-vectorized
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) — a
    BatchEvalPython node means a row-at-a-time UDF slipped into a query,
    the ~10-100x slow path (SURVEY §4 'Vectorized execution')."""
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF in: {bad}"


# genuinely non-SQL-expressible queries (iterative algorithms): the driver
# applies its weaker rows-only check to these
NO_ORACLE_OK = {
    "ts_sigmoid_fit",  # iterative Levenberg-Marquardt fit
    "ts_tde_score",  # fit + Monte-Carlo + classifier (not SQL-expressible)
    "ts_rainbow_multiband",  # iterative joint multiband fit
    "ts_tde_score_real",  # multiband fit + MC + the real packaged model
    "text_bpe_trained",  # iterative BPE vocabulary training
}


def test_every_query_plans_and_declares_oracle_or_is_listed(plans):
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    missing = [n for n in plans if n not in oracles and n not in NO_ORACLE_OK]
    assert not missing, f"queries without oracle: {missing}"


def test_parquet_scans_prune_columns(plans):
    """Wide-table queries must not read every column: the q1 scan reads only
    the 7 columns it needs of lineitem's 11."""
    plan = plans["q1_pricing_summary"]
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    # the plan string truncates the struct, but the pruned keys would appear
    # FIRST in schema order if they were read at all
    assert "l_orderkey" not in read and "l_partkey" not in read and "l_suppkey" not in read
    assert "l_quantity" in read


SHUFFLE_BUDGETS = {
    # scan-only / per-row arithmetic: zero shuffles
    "f_quality_cuts": 0,
    "pipe_shuffle_shard": 0,
    "text_normalize": 0,
    "f_example": 0,
    "astro_coords": 0,
    # one-shuffle aggregates / windows / broadcast-join pipelines
    "q1_pricing_summary": 1,
    "sess_hourly": 1,
    "w_lag_delta": 1,
    "dedup_exact": 1,
    "q5_nation_revenue": 1,
    "topk_anomalies": 1,
    "xmatch_cone": 1,
    "pipe_kfold": 1,
    "k1_classification": 1,
    "q3_shipping_priority": 1,
    # multi-stage by design
    "w_funnel_stages": 2,   # window partition + final single-row agg
    "ts_gapfill_daily": 2,  # daily agg + grid window (key reused)
    "agg_cms_topk": 2,      # cell table + exact top-k
    "w_cum_distinct_users": 3,  # first-seen, daily, running sum
    "q_upsert_merge": 3,    # full-outer both sides + rollup
}


def _count_shuffles(plan: str) -> int:
    """Distinct shuffle exchanges (by [plan_id=N]) — cached subtrees print
    once per reader, so raw text counts overcount them. Twin of
    tools/update_plan_budgets.py::count_shuffles — edit in lockstep."""
    import re

    with_id = re.findall(
        r"Exchange (?:hash|range|SinglePartition)\S*[^\n]*\[plan_id=(\d+)\]",
        plan,
    )
    without_id = re.findall(
        r"Exchange (?:hash|range|SinglePartition)(?![^\n]*\[plan_id=)", plan
    )
    return len(set(with_id)) + len(without_id)


def test_shuffle_exchange_budgets(plans):
    """Plan-quality regression guard: each pinned query must not grow new
    shuffle exchanges (broadcast exchanges excluded — those are the cheap
    side). A budget increase needs a deliberate edit here, with a reason."""
    over = {}
    for name, budget in SHUFFLE_BUDGETS.items():
        n = _count_shuffles(plans[name])
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle budget exceeded (got, budget): {over}"


def test_shuffle_budgets_whole_suite(plans):
    """Every query's shuffle count is pinned in tests/plan_budgets.json
    (generated by tools/update_plan_budgets.py). A query growing shuffles
    fails here; a deliberate plan change = rerun the tool, commit the
    diff. New queries missing from the snapshot also fail — snapshot them."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "plan_budgets.json")
    budgets = json.load(open(path))
    problems = {}
    for name, plan in plans.items():
        n = _count_shuffles(plan)
        if name not in budgets:
            problems[name] = (n, "missing from snapshot")
        elif n > budgets[name]:
            problems[name] = (n, budgets[name])
    assert not problems, f"shuffle regressions (got, budget): {problems}"
