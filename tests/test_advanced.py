"""Round-3 advanced surface: funnel staging, count-min sketch invariants,
weighted sampling determinism, runtime bloom-filter injection."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_ordering_semantics(spark):
    """click counts only at-or-after the first view; purchase only
    at-or-after that click — crafted rows hit every branch."""
    rows = [
        # user 1: full ordered funnel
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # user 2: click BEFORE first view -> no click stage
        (2, "click", 50), (2, "view", 100), (2, "purchase", 300),
        # user 3: purchase before click -> no purchase stage
        (3, "view", 100), (3, "purchase", 150), (3, "click", 200),
        # user 4: never views -> counted as user only
        (4, "click", 10), (4, "purchase", 20),
        # user 5: simultaneous view/click (>= boundary is inclusive)
        (5, "view", 100), (5, "click", 100), (5, "purchase", 100),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")

    from fink_filters_spark.queries.advanced import w_funnel_stages

    # run the same pipeline the query builds, on the crafted frame
    import fink_filters_spark.queries.advanced as adv

    orig = adv.load_events
    adv.load_events = lambda s, d: df
    try:
        out = w_funnel_stages(spark, "ignored").collect()[0]
    finally:
        adv.load_events = orig
    assert out.n_users == 5
    assert out.n_view == 4       # users 1,2,3,5
    assert out.n_click == 3      # users 1,3,5 (user 2's click precedes view)
    assert out.n_purchase == 2   # users 1,5 (user 3 purchased before click)


def test_cms_never_underestimates_and_matches_exact_small(spark):
    from fink_filters_spark.queries.advanced import agg_cms_topk

    out = agg_cms_topk(spark, SF_DIR).toPandas()
    assert len(out) == 10
    assert bool(out.lower_bound_ok.all())
    # with 256 cells and few distinct users, most estimates are exact
    assert (out.n_cms >= out.n_exact).all()


def test_weighted_sample_deterministic_and_length_biased(spark):
    from fink_filters_spark.queries.advanced import pipe_weighted_sample

    a = pipe_weighted_sample(spark, SF_DIR).toPandas().sort_values("doc_id")
    b = pipe_weighted_sample(spark, SF_DIR).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # longer docs must be over-represented vs the corpus mean
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    if len(a) >= 20:
        assert a.n_chars.mean() > docs.n_chars.mean()


def test_bloom_filter_injection_under_shuffle_join(spark):
    """When the dim side can't broadcast (as at 100 TB), the optimizer must
    inject a bloom runtime filter on the fact side of the selective join."""
    from fink_filters_spark.queries.advanced import q_bloom_filter_join

    touched = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    ]
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        df = q_bloom_filter_join(spark, SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        # and the result is still correct regardless of the injected filter
        rows = {r.p_type: r.sum_qty for r in df.collect()}
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
            F.col("p_brand") == "Brand#23"
        )
        expect = {
            r.p_type: r.sum_qty
            for r in li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_type")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
            .collect()
        }
        assert rows == expect
    finally:
        # unset (NOT conditional restore): reverts each conf to its default
        # so nothing leaks into the shared session — a leaked scan-size
        # threshold of 0 would inject bloom filters into every later plan
        for k in touched:
            try:
                spark.conf.unset(k)
            except Exception:
                pass


def test_merge_upsert_semantics(spark, tmp_path):
    """update wins (even with NULL payload), unmatched updates insert,
    unmatched base survives; partitioned variant rewrites only touched
    partitions."""
    from fink_filters_spark.operators.upsert import merge_upsert, upsert_partitioned

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    upd = spark.createDataFrame(
        [(2, None, 99), (4, "d", 40)], "k long, s string, v long"
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(base, upd, ["k"]).collect()}
    assert got == {1: ("a", 10), 2: (None, 99), 3: ("c", 30), 4: ("d", 40)}

    # partitioned write path: only partition p=2 is rewritten
    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 1, "x"), (2, 1, "y"), (3, 2, "z")], "k long, p long, s string"
    ).write.partitionBy("p").parquet(p)
    upsert_partitioned(
        p,
        spark.createDataFrame([(3, 2, "Z"), (9, 2, "new")], "k long, p long, s string"),
        ["k"],
        "p",
    )
    after = {r.k: (r.p, r.s) for r in spark.read.parquet(p).collect()}
    assert after == {1: (1, "x"), 2: (1, "y"), 3: (2, "Z"), 9: (2, "new")}


def test_upsert_partitioned_null_partition_keeps_base_rows(spark, tmp_path):
    """Regression: an update touching the NULL partition must MERGE with the
    base rows already in __HIVE_DEFAULT_PARTITION__, not dynamically
    overwrite them away (isin() is NULL for NULL partition values, so the
    base side silently vanished before the null-safe membership fix)."""
    from fink_filters_spark.operators.upsert import upsert_partitioned

    p = str(tmp_path / "tbl_null")
    spark.createDataFrame(
        [(1, None, "keep-me"), (2, None, "update-me"), (3, 7, "other-part")],
        "k long, p long, s string",
    ).write.partitionBy("p").parquet(p)
    upsert_partitioned(
        p,
        spark.createDataFrame([(2, None, "UPDATED")], "k long, p long, s string"),
        ["k"],
        "p",
    )
    after = {r.k: (r.p, r.s) for r in spark.read.parquet(p).collect()}
    assert after == {
        1: (None, "keep-me"),  # survived the NULL-partition rewrite
        2: (None, "UPDATED"),
        3: (7, "other-part"),  # untouched partition never read/written
    }
