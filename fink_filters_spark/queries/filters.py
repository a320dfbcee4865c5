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
from . import QuerySpec, e6

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


_US_PER_DAY = 86_400_000_000


def f_orphan_grb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30 orphan-GRB shape through the REAL registered topic expression
    (``filters/ztf.py`` ``orphan_grb``, reference
    ``ztf/filter_orphan_grb_candidates/filter.py:24-157``): the events
    table is folded into an alert-shaped frame — 3-epoch history arrays
    (cjd/cmagpsf/cfid from each user's last three events, sorted by time),
    alert jd/jdstarthist, an SSO-name veto column — and the topic's
    higher-order array predicate (detection count, faintness forall,
    10-day window, fading tail, g-r color from per-band means) selects
    over it. Magnitudes are integer-valued doubles and band means are
    integer sums over counts, so every float the two engines compare is
    bit-identical."""
    from ..filters.registry import get_filter

    ev = load_events(spark, sf_dir).select(
        "user_id", F.col("ts_us").alias("t"), "event_id",
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    arr = F.slice(
        F.array_sort(F.collect_list(F.struct("t", "event_id", "v"))), -3, 3
    )
    g = ev.groupBy("user_id").agg(arr.alias("__a")).filter(F.size("__a") == 3)
    frame = g.select(
        "user_id",
        F.transform("__a", lambda e: e["t"] / F.lit(float(_US_PER_DAY))).alias("cjd"),
        F.transform("__a", lambda e: (18 + e["v"] % 8).cast("double")).alias(
            "cmagpsf"
        ),
        F.transform("__a", lambda e: (1 + e["event_id"] % 2).cast("int")).alias(
            "cfid"
        ),
    ).select(
        "user_id", "cjd", "cmagpsf", "cfid",
        F.element_at("cjd", -1).alias("jd"),
        F.element_at("cjd", 1).alias("jdstarthist"),
        # per-epoch SSO names (the reference vetoes on the HISTORY array,
        # not a scalar): every epoch of a %7 user carries a name
        F.transform(
            "cjd",
            lambda _: F.when(F.col("user_id") % 7 == 0, F.lit("sso123"))
            .otherwise(F.lit("null")),
        ).alias("cssnamenr"),
    )
    sel = frame.filter(get_filter("ztf.orphan_grb").builder(frame))
    return sel.select(
        "user_id",
        # hash-stability: e6 integer micro-units (queries/__init__.e6)
        e6("jd", "jd_e6"),
        F.element_at("cmagpsf", -1).alias("last_mag"),
    )


F_ORPHAN_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC)
            AS rdesc,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM ev
),
h AS (  -- last three epochs, rdesc 1 = newest
  SELECT user_id,
         CAST(18 + v % 8 AS DOUBLE) AS m,
         CAST(1 + event_id % 2 AS INTEGER) AS fid,
         t / {float(_US_PER_DAY)!r} AS jd_d, rdesc
  FROM r WHERE rdesc <= 3 AND cnt >= 3
),
a AS (
  SELECT user_id,
         max(CASE WHEN rdesc = 1 THEN jd_d END) AS jd,
         max(CASE WHEN rdesc = 3 THEN jd_d END) AS jdstart,
         max(CASE WHEN rdesc = 1 THEN m END) AS m3,
         max(CASE WHEN rdesc = 2 THEN m END) AS m2,
         max(CASE WHEN rdesc = 1 THEN fid END) AS f3,
         max(CASE WHEN rdesc = 2 THEN fid END) AS f2,
         min(m) AS m_min,
         sum(CASE WHEN fid = 1 THEN m END) AS g_sum,
         count(CASE WHEN fid = 1 THEN 1 END) AS g_n,
         sum(CASE WHEN fid = 2 THEN m END) AS r_sum,
         count(CASE WHEN fid = 2 THEN 1 END) AS r_n
  FROM h GROUP BY user_id
)
SELECT user_id, CAST(round(jd * 1e6) AS BIGINT) AS jd_e6, m3 AS last_mag
FROM a
WHERE (jd - jdstart) <= 30
  AND m_min > 18
  AND (jd - jdstart) < 10
  AND user_id % 7 <> 0
  AND (CASE WHEN f2 = f3 THEN m3 - m2 > 0
            WHEN f3 > f2 THEN m2 - m3 <= 0.3
            ELSE m3 - m2 > 0 END)
  AND g_n > 0 AND r_n > 0 AND (g_sum / g_n - r_sum / r_n >= 0)
"""


def q_ev_band_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.E6 cross-column greatest/least (the Rubin per-band flux columns
    compared with ``F.greatest``/``F.least``, ``filters/rubin.py:266-271``):
    per-user per-band means pivoted to one column per band, then the
    brightest/faintest band mean via greatest/least. Missing bands are
    coalesced to an explicit sentinel so NULL semantics cannot diverge
    between engines."""
    from . import BAND_TYPES, band_means_pivot

    stats = band_means_pivot(spark, sf_dir)
    cols = [F.coalesce(F.col(b), F.lit(-1.0)) for b in BAND_TYPES]
    return stats.select(
        "user_id",
        e6(F.greatest(*cols), "max_band_mean_e6"),
        e6(F.least(*cols), "min_band_mean_e6"),
    )


BAND_EXTREMES_SQL = """
WITH m AS (
  SELECT user_id, event_type AS band,
         CAST(sum(CAST(round(value*1000) AS BIGINT)) AS DOUBLE) / count(*) AS mean
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT user_id,
         coalesce(max(CASE WHEN band = 'click' THEN mean END), -1.0) AS c,
         coalesce(max(CASE WHEN band = 'view' THEN mean END), -1.0) AS vw,
         coalesce(max(CASE WHEN band = 'purchase' THEN mean END), -1.0) AS pu,
         coalesce(max(CASE WHEN band = 'signup' THEN mean END), -1.0) AS s,
         coalesce(max(CASE WHEN band = 'error' THEN mean END), -1.0) AS e
  FROM m GROUP BY user_id
)
SELECT user_id,
       CAST(round(greatest(c, vw, pu, s, e) * 1e6) AS BIGINT) AS max_band_mean_e6,
       CAST(round(least(c, vw, pu, s, e) * 1e6) AS BIGINT) AS min_band_mean_e6
FROM p
"""


SPECS = [
    QuerySpec("f_orphan_grb", f_orphan_grb, F_ORPHAN_SQL,
              "C30 orphan-GRB array-logic shape (real topic expression)"),
    QuerySpec("ev_band_extremes", q_ev_band_extremes, BAND_EXTREMES_SQL,
              "E6 cross-column greatest/least over per-band means"),
    QuerySpec("f_example", f_example, F_EXAMPLE_SQL, "C1 predicate shape"),
    QuerySpec("f_sn_candidates", f_sn_candidates, F_SN_SQL, "C2 conjunction shape"),
    QuerySpec("f_quality_cuts", f_quality_cuts, F_QUALITY_SQL, "C23 quality cuts"),
    QuerySpec("f_uniform_sample", f_uniform_sample, F_SAMPLE_SQL, "C38 modulo sample"),
    QuerySpec("f_mm_module", f_mm_module, F_MM_SQL, "C34 tiered conjunctions"),
    QuerySpec("k1_classification", k1_classification, K1_SQL, "K1 CASE chain"),
]
