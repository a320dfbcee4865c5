"""Filter-predicate and classification queries — the reference's core product
surface (SURVEY §2.C topics, §2.K classification) re-expressed as native
Column predicates over the synthetic ``events`` stream table.

Each query mirrors the *shape* of a reference filter family (set membership,
prefix tests, threshold conjunctions, deterministic modulo sampling,
precedence-ordered multi-way CASE with ambiguity counting) so Catalyst gets
plain expressions it can push into the parquet scan — the load-bearing
difference from the reference's opaque pandas-UDF predicates
(SURVEY §4: "Catalyst can't reorder around black-box Python").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_events
from . import QuerySpec

# Shared oracle fragment: events with epoch-us timestamp and json k.
EV_SQL = (
    "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, "
    "CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events"
)


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )


def f_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 `example_filter` shape (reference ``ztf/filter_example/filter.py:23-65``):
    set-membership veto + prefix veto + magnitude threshold."""
    ev = _ev(spark, sf_dir)
    return ev.filter(
        ~F.col("event_type").isin("error", "view")
        & ~F.col("event_type").startswith("sig")
        & (F.col("value") > 20.5)
    ).select("event_id", "event_type", "value")


F_EXAMPLE_SQL = f"""
SELECT event_id, event_type, value
FROM ({EV_SQL})
WHERE event_type NOT IN ('error', 'view')
  AND NOT starts_with(event_type, 'sig')
  AND value > 20.5
"""


def f_sn_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 `sn_candidates` shape (reference
    ``ztf/livestream/filter_sn_candidates/filter.py:86-104``): conjunction of
    score thresholds, class membership, recency window, quality cuts, SSO veto."""
    ev = _ev(spark, sf_dir)
    return ev.filter(
        (F.col("value") > 50.0)  # snn score threshold analogue
        & F.col("event_type").isin("purchase", "click")  # EG-class membership
        & (F.col("k") >= 10) & (F.col("k") <= 90)  # recency window analogue
        & (F.col("user_id") % 7 != 3)  # quality cut analogue
        & (F.col("event_id") % 5 != 0)  # roid != 3 veto analogue
    ).select("event_id", "user_id", "event_type", "value", "k")


F_SN_SQL = f"""
SELECT event_id, user_id, event_type, value, k
FROM ({EV_SQL})
WHERE value > 50.0
  AND event_type IN ('purchase', 'click')
  AND k >= 10 AND k <= 90
  AND user_id % 7 != 3
  AND event_id % 5 != 0
"""


def f_quality_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23 `ztf_quality_cuts` shape (reference
    ``ztf/filter_quality_cuts/filter.py:48-51``: rb>=0.55 ∧ nbad==0)."""
    from ..tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") <= 0.05) & (F.col("l_tax") == 0.0)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


F_QUALITY_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_discount <= 0.05 AND l_tax = 0.0
"""


def f_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38 `uniform_sample` — deterministic-by-key 1/113 sampling, exactly the
    reference's semantics (``rubin/livestream/filter_uniform_sample/filter.py:50``:
    ``diaSourceId % 113 == 0``), NOT ``df.sample`` (not reproducible by key)."""
    from ..operators.sample import uniform_sample

    ev = load_events(spark, sf_dir)
    return uniform_sample(ev, "event_id", 113).select("event_id", "user_id", "event_type")


F_SAMPLE_SQL = """
SELECT event_id, user_id, event_type
FROM events
WHERE event_id % 113 = 0
"""


def f_mm_module(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34 multi-messenger tiers (reference ``ztf/filter_mm_module/filter.py``):
    bronze ⊂ silver ⊂ gold conjunctions, emitted as a tier column."""
    ev = _ev(spark, sf_dir)
    bronze = (
        (F.col("value") >= 70.0)
        & F.col("event_type").isin("purchase", "click", "signup")
    )
    silver = bronze & (F.col("k") > 50)
    gold = silver & (F.col("value") >= 90.0) & (F.col("user_id") % 2 == 0)
    return (
        ev.withColumn(
            "tier",
            F.when(gold, "gold").when(silver, "silver").when(bronze, "bronze"),
        )
        .filter(F.col("tier").isNotNull())
        .select("event_id", "event_type", "value", "k", "tier")
    )


F_MM_SQL = f"""
SELECT event_id, event_type, value, k,
       CASE
         WHEN value >= 70.0 AND event_type IN ('purchase','click','signup')
              AND k > 50 AND value >= 90.0 AND user_id % 2 = 0 THEN 'gold'
         WHEN value >= 70.0 AND event_type IN ('purchase','click','signup')
              AND k > 50 THEN 'silver'
         WHEN value >= 70.0 AND event_type IN ('purchase','click','signup') THEN 'bronze'
       END AS tier
FROM ({EV_SQL})
WHERE value >= 70.0 AND event_type IN ('purchase','click','signup')
"""


def k1_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 multi-way classification with ambiguity counting (reference
    ``ztf/classification.py:47-211``): flags are summed, >1 non-override flag
    -> 'Ambiguous', a catalog match overrides with its own label, precedence
    order otherwise; grouped histogram like the reference doctest
    (``classification.py:125-137``)."""
    from ..operators.classify import classify_events

    ev = _ev(spark, sf_dir)
    return classify_events(ev).groupBy("class").agg(F.count(F.lit(1)).alias("n"))


K1_SQL = f"""
SELECT CASE
         WHEN event_type IN ('signup', 'purchase') THEN event_type
         WHEN (CASE WHEN value > 300.0 THEN 1 ELSE 0 END
             + CASE WHEN user_id % 10 = 0 THEN 1 ELSE 0 END
             + CASE WHEN k >= 80 THEN 1 ELSE 0 END) > 1 THEN 'Ambiguous'
         WHEN value > 300.0 THEN 'HighValue'
         WHEN user_id % 10 = 0 THEN 'RoundUser'
         WHEN k >= 80 THEN 'HighK'
         ELSE 'Unknown'
       END AS class,
       count(*) AS n
FROM ({EV_SQL})
GROUP BY 1
"""


SPECS = [
    QuerySpec("f_example", f_example, F_EXAMPLE_SQL, "C1 predicate shape"),
    QuerySpec("f_sn_candidates", f_sn_candidates, F_SN_SQL, "C2 conjunction shape"),
    QuerySpec("f_quality_cuts", f_quality_cuts, F_QUALITY_SQL, "C23 quality cuts"),
    QuerySpec("f_uniform_sample", f_uniform_sample, F_SAMPLE_SQL, "C38 modulo sample"),
    QuerySpec("f_mm_module", f_mm_module, F_MM_SQL, "C34 tiered conjunctions"),
    QuerySpec("k1_classification", k1_classification, K1_SQL, "K1 CASE chain"),
]
