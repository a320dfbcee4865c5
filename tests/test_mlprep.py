"""Unit tests for the ML-prep query surface (queries/mlprep.py):
invariants that must hold on any input, checked at sf0.001 (the DuckDB
hash-parity check runs separately via tools/check_oracle.py / the driver).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_count(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").count()


def test_kfold_partitions_all_docs(spark, docs_count):
    from fink_filters_spark.queries.mlprep import KFOLD_K, pipe_kfold

    rows = pipe_kfold(spark, SF_DIR).collect()
    assert {r["fold"] for r in rows} <= set(range(KFOLD_K))
    assert sum(r["n_docs"] for r in rows) == docs_count
    for r in rows:
        assert r["avg_chars_ppm"] == r["sum_chars"] * 1000000 // r["n_docs"]


def test_class_weights_balanced_formula(spark):
    from fink_filters_spark.queries.mlprep import pipe_class_weights

    rows = pipe_class_weights(spark, SF_DIR).collect()
    total = sum(r["n_events"] for r in rows)
    k = len(rows)
    for r in rows:
        assert r["weight_ppm"] == total * 1000000 // (k * r["n_events"])
    # weighted event mass is uniform across classes by construction
    masses = [r["n_events"] * r["weight_ppm"] / 1e6 for r in rows]
    assert max(masses) - min(masses) < 1e-2


def test_histogram_covers_every_row(spark):
    from fink_filters_spark.queries.mlprep import agg_histogram

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rows = agg_histogram(spark, SF_DIR).collect()
    assert sum(r["n_items"] for r in rows) == li.count()
    for r in rows:
        assert r["lo_qty"] == r["bucket"] * 5 + 1
        assert r["hi_qty"] == (r["bucket"] + 1) * 5
        # bucket mean quantity must lie inside the bucket bounds
        mean_q = r["sum_qty"] / r["n_items"]
        assert r["lo_qty"] - 0.5 <= mean_q <= r["hi_qty"] + 0.5


def test_bigrams_ranked_and_bounded(spark):
    from fink_filters_spark.queries.mlprep import BIGRAM_TOPK, text_bigrams

    rows = text_bigrams(spark, SF_DIR).collect()
    assert 0 < len(rows) <= BIGRAM_TOPK
    counts = [r["n_occ"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len({r["gram"] for r in rows}) == len(rows)


def test_quantize_int8_error_bound(spark):
    from fink_filters_spark.queries.mlprep import sim_quantize_int8

    rows = sim_quantize_int8(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["scale_e6"] > 0
        scale = r["scale_e6"] / 1e6
        # per-dim |err| <= 0.5/scale  =>  mse <= (0.5/scale)^2 (+1 for the
        # integer rounding of both scale_e6 and mse_e6)
        bound_e6 = (0.5 / scale) ** 2 * 1e6
        assert 0 <= r["mse_e6"] <= bound_e6 + 1


def test_incremental_merge_handles_disjoint_and_overlapping_keys(spark):
    from pyspark.sql import functions as F

    from fink_filters_spark.operators.incremental import (
        finalize,
        merge_states,
        partial_state,
    )

    a = spark.createDataFrame([("x", 1), ("x", 3), ("y", 10)], "k string, v long")
    b = spark.createDataFrame([("y", 20), ("z", 5)], "k string, v long")
    m = {"v": F.col("v")}
    merged = finalize(
        merge_states(
            [partial_state(a, ["k"], m), partial_state(b, ["k"], m)], ["k"]
        ),
        ["k"],
    )
    got = {r["k"]: r.asDict() for r in merged.collect()}
    assert got["x"]["v_count"] == 2 and got["x"]["v_sum"] == 4
    assert got["x"]["v_min"] == 1 and got["x"]["v_max"] == 3
    assert got["y"]["v_count"] == 2 and got["y"]["v_sum"] == 30  # overlapping key
    assert got["z"]["v_count"] == 1 and got["z"]["v_avg_ppm"] == 5_000_000  # disjoint
    # merge of partials == one-shot aggregate over the union
    oneshot = finalize(partial_state(a.unionByName(b), ["k"], m), ["k"])
    assert {tuple(r) for r in oneshot.collect()} == {tuple(r) for r in merged.collect()}


def test_drift_psi_terms_finite_and_signed_consistently(spark):
    from fink_filters_spark.queries.mlprep import pipe_drift_psi

    rows = pipe_drift_psi(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert math.isfinite(r["psi_term_e6"])
        # (p-q)*ln(p/q) >= 0 always
        assert r["psi_term_e6"] >= 0


def test_dsir_prefers_target_like_documents(spark):
    """DSIR invariant: among raw candidates, the one sharing the target
    slice's vocabulary outscores the one that doesn't, and the weight
    table never exceeds the bucket count (broadcastable by construction)."""
    from fink_filters_spark.operators.dsir import (
        DSIR_BUCKETS, dsir_bucket_weights, dsir_scores,
    )

    target = spark.createDataFrame(
        [(i, "quantum flux lattice boson fermion hadron") for i in range(5)],
        "id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "quantum flux lattice boson fermion hadron"),
            (101, "recipe butter sugar flour oven whisk"),
        ],
        "id long, text string",
    )
    w = dsir_bucket_weights(target, raw, "id", "text")
    assert w.count() <= DSIR_BUCKETS
    scores = {r.id: r.micro_sum for r in dsir_scores(raw, w, "id", "text").collect()}
    assert scores[100] > scores[101]


def test_dsir_flagged_weights_match_two_pass_fit(spark):
    """The single-pass flagged fit (round 10: one Arrow tokenize/hash pass
    over the union table) must produce the EXACT weight table of the
    two-slice fit on the same data — including null-text rows, empty
    strings (which tokenize to one ''-token, matching the native split
    semantics), and multi-token docs."""
    from fink_filters_spark.operators.dsir import (
        DSIR_BUCKETS, dsir_bucket_weights, dsir_bucket_weights_flagged,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "src0", "quantum flux lattice boson"),
        (2, "src0", ""),
        (3, "src0", None),
        (4, "src1", "recipe butter sugar flour oven whisk"),
        (5, "src1", "quantum recipe"),
        (6, "src2", None),
        (7, "src2", "  padded   whitespace  text  "),
    ]
    df = spark.createDataFrame(rows, "id long, source string, text string")
    target = df.filter(F.col("source") == "src0")
    raw = df.filter(F.col("source") != "src0")
    want = {
        r.bucket: r.w_micro
        for r in dsir_bucket_weights(target, raw, "id", "text").collect()
    }
    got = {
        r.bucket: r.w_micro
        for r in dsir_bucket_weights_flagged(
            df, "id", "text", F.col("source") == "src0"
        ).collect()
    }
    assert len(want) == len(got) == DSIR_BUCKETS
    assert got == want


def test_pareto_front_matches_bruteforce(spark):
    """Frontier equals the brute-force dominance definition, including
    equal-pair ties (mutual non-domination)."""
    import itertools
    import random

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 8), rng.randint(0, 8)) for i in range(60)]
    df = spark.createDataFrame(pts, "doc_id long, q long, n long")

    from pyspark.sql import Window, functions as F

    per_q = df.groupBy("q").agg(F.max("n").alias("max_n"))
    w = Window.orderBy(F.desc("q")).rowsBetween(Window.unboundedPreceding, -1)
    fp = (
        per_q.withColumn("pm", F.max("max_n").over(w))
        .filter(F.col("pm").isNull() | (F.col("max_n") > F.col("pm")))
        .select("q", F.col("max_n").alias("n"))
    )
    got = {r.doc_id for r in df.join(fp, ["q", "n"]).collect()}

    def dominated(a, b):  # b strictly dominates a
        return b[1] >= a[1] and b[2] >= a[2] and (b[1] > a[1] or b[2] > a[2])

    want = {
        a[0] for a in pts if not any(dominated(a, b) for b in pts if b[0] != a[0])
    }
    assert got == want


def test_dsir_weight_table_complete_and_scores_novel_vocab(spark):
    """The weight table must carry ALL n_buckets rows (unseen buckets get
    the finite smoothed weight), so scoring a later corpus with novel
    vocabulary drops no tokens — n_tok equals the document's token count
    even when every token hashes to a bucket the fit never saw."""
    from fink_filters_spark.operators.dsir import (
        DSIR_BUCKETS, dsir_bucket_weights, dsir_scores,
    )

    target = spark.createDataFrame([(1, "alpha beta")], "id long, text string")
    raw = spark.createDataFrame([(2, "gamma delta")], "id long, text string")
    w = dsir_bucket_weights(target, raw, "id", "text")
    assert w.count() == DSIR_BUCKETS
    # a candidate corpus of entirely novel tokens still scores every token
    novel = spark.createDataFrame(
        [(9, "zeta01 zeta02 zeta03 zeta04 zeta05")], "id long, text string"
    )
    row = dsir_scores(novel, w, "id", "text").collect()[0]
    assert row.n_tok == 5
    assert row.micro_sum is not None
