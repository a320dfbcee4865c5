"""Per-key time-series analytics in BOTH encodings the engine supports
(SURVEY §2.F):

- **array encoding** — the reference's data model: each key's ordered history
  packed into array columns, analyzed with native higher-order functions
  (``ts_hist_array``). This is the streaming-friendly form: all temporal
  context rides inside the row, no state store needed.
- **long/relational encoding** — window functions over exploded rows
  (``w_topn_per_user``, ``ts_rate_last2``) and grouped Σ-statistics
  (``ts_linfit``), the idiomatic Spark dual.

Parity: value -> milli-units bigint, ts -> microseconds bigint; linear-fit
slope / r² via exact-integer Σ-statistics (functions/arrays.py); x axis =
whole hours since the key's first event, so all folds are integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.arrays import linfit_r2, linfit_slope
from ..tables import load_events
from . import QuerySpec, e6

US_PER_HOUR = 3_600_000_000

# events projected to exact-integer measure/time (oracle fragment).
EVQ_SQL = (
    "SELECT event_id, user_id, epoch_us(ts) AS t, "
    "CAST(round(value*1000) AS BIGINT) AS v, value FROM events"
)


def _evq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
        "value",
    )


def w_topn_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 events per user by value (G1 dedup-then-top-k
    building block, reference ``filter_anomaly_notification/filter.py:176-188``)."""
    ev = _evq(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


W_TOPN_SQL = """
SELECT user_id, event_id, value, rn
FROM (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS INTEGER) AS rn
  FROM events
)
WHERE rn <= 3
"""


def ts_rate_last2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 two-point rate (reference ``filter_kn_candidates/filter.py:236-265``)
    in the relational encoding: lag over an event-time window, last two
    observations per key, rate in milli-units/hour."""
    ev = _evq(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("t"), F.desc("event_id"))
    last2 = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    pivoted = last2.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("v"))).alias("v1"),
        F.max(F.when(F.col("rn") == 2, F.col("v"))).alias("v2"),
        F.max(F.when(F.col("rn") == 1, F.col("t"))).alias("t1"),
        F.max(F.when(F.col("rn") == 2, F.col("t"))).alias("t2"),
        F.count(F.lit(1)).alias("npts"),
    )
    return pivoted.filter(F.col("npts") == 2).select(
        "user_id",
        # hash-stability: e6 integer micro-units (queries/__init__.e6)
        e6(
            (F.col("v1") - F.col("v2")).cast("double")
            * F.lit(float(US_PER_HOUR))
            / (F.col("t1") - F.col("t2")).cast("double"),
            "rate_per_hour_e6",
        ),
    )


TS_RATE_SQL = f"""
WITH r AS (
  SELECT user_id, t, v,
         row_number() OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC) AS rn
  FROM ({EVQ_SQL})
), p AS (
  SELECT user_id,
         max(CASE WHEN rn = 1 THEN v END) AS v1,
         max(CASE WHEN rn = 2 THEN v END) AS v2,
         max(CASE WHEN rn = 1 THEN t END) AS t1,
         max(CASE WHEN rn = 2 THEN t END) AS t2,
         count(*) AS npts
  FROM r WHERE rn <= 2 GROUP BY user_id
)
SELECT user_id,
       CAST(round(CAST(v1 - v2 AS DOUBLE) * {US_PER_HOUR}.0 / CAST(t1 - t2 AS DOUBLE) * 1e6) AS BIGINT) AS rate_per_hour_e6
FROM p WHERE npts = 2
"""


def ts_linfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F5 closed-form least-squares per key (relational encoding): grouped
    exact-integer Σ-statistics -> slope + r² (reference computes these with
    scipy ``curve_fit`` / manual r² inside pandas UDFs —
    ``filter_rate_based_kn_candidates/filter.py:146-167``,
    ``filter_yso_spicy_candidates/filter.py:28-76``)."""
    ev = _evq(spark, sf_dir)
    t0 = ev.groupBy("user_id").agg(F.min("t").alias("t0"))
    # t0 is a per-key aggregate OF the same events table (scales with keys):
    # no broadcast hint — both sides hash on user_id, so the aggregate's
    # exchange is reused and AQE broadcasts only when genuinely small
    x = ev.join(t0, "user_id").withColumn(
        "xh", F.expr(f"(t - t0) div {US_PER_HOUR}")
    )
    s = x.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xh").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("xh") * F.col("xh")).alias("sxx"),
        F.sum(F.col("xh") * F.col("v")).alias("sxy"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    den_x = s.n * s.sxx - s.sx * s.sx
    den_y = s.n * s.syy - s.sy * s.sy
    cov = s.n * s.sxy - s.sx * s.sy
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.when(den_x != 0, e6(cov.cast("double") / den_x.cast("double"), None)).alias("slope_e6"),
        F.when(
            (den_x != 0) & (den_y != 0),
            e6(
                cov.cast("double") * cov.cast("double")
                / (den_x.cast("double") * den_y.cast("double")),
                None,
            ),
        ).alias("r2_e6"),
    )


TS_LINFIT_SQL = f"""
WITH e AS ({EVQ_SQL}),
m AS (SELECT user_id, min(t) AS t0 FROM e GROUP BY user_id),
x AS (SELECT e.user_id, (t - t0) // {US_PER_HOUR} AS xh, v FROM e JOIN m USING (user_id)),
s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xh) AS BIGINT) AS sx,
         CAST(sum(v) AS BIGINT) AS sy,
         CAST(sum(xh*xh) AS BIGINT) AS sxx,
         CAST(sum(xh*v) AS BIGINT) AS sxy,
         CAST(sum(v*v) AS BIGINT) AS syy
  FROM x GROUP BY user_id
)
SELECT user_id, n,
       CASE WHEN n*sxx - sx*sx != 0
            THEN CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) * 1e6) AS BIGINT) END AS slope_e6,
       CASE WHEN n*sxx - sx*sx != 0 AND n*syy - sy*sy != 0
            THEN CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
                       / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) * 1e6) AS BIGINT) END AS r2_e6
FROM s
"""


def ts_hist_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's embedded-history encoding (SURVEY §1.1, A3/F1/F2/F3):
    pack each key's ordered history into array columns, then analyze with
    native HOFs only — element_at for last/previous, zip_with+aggregate folds
    for the fit. This is the row-carries-its-own-time-series model that lets
    the streaming path stay stateless."""
    ev = _evq(spark, sf_dir)
    hist = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "v"))).alias("h")
    )
    ts = F.transform("h", lambda s: s.t)
    vs = F.transform("h", lambda s: s.v)
    t0 = F.element_at(ts, 1)
    xh = F.transform(ts, lambda t: ((t - t0) / US_PER_HOUR).cast("long"))
    return hist.select(
        "user_id",
        F.size("h").cast("long").alias("n"),
        F.element_at(vs, -1).alias("last_v"),
        F.element_at(vs, 1).alias("first_v"),
        (F.element_at(ts, -1) - F.element_at(ts, -2)).alias("gap_last2_us"),
        e6(
            (F.element_at(vs, -1) - F.element_at(vs, -2)).cast("double")
            * F.lit(float(US_PER_HOUR))
            / (F.element_at(ts, -1) - F.element_at(ts, -2)).cast("double"),
            "rate_per_hour_e6",
        ),
        e6(linfit_slope(xh, vs), "slope_e6"),
        e6(linfit_r2(xh, vs), "r2_e6"),
    )


# Same results derived relationally: integer Σ-statistics are associative, so
# the array fold and the grouped aggregate are exactly equal.
TS_HIST_SQL = f"""
WITH e AS ({EVQ_SQL}),
m AS (SELECT user_id, min(t) AS t0 FROM e GROUP BY user_id),
x AS (SELECT e.user_id, t, v, (t - t0) // {US_PER_HOUR} AS xh FROM e JOIN m USING (user_id)),
s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xh) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy,
         CAST(sum(xh*xh) AS BIGINT) AS sxx, CAST(sum(xh*v) AS BIGINT) AS sxy,
         CAST(sum(v*v) AS BIGINT) AS syy,
         arg_max(v, t) AS last_v, arg_min(v, t) AS first_v
  FROM x GROUP BY user_id
),
r AS (
  SELECT user_id, t, v,
         row_number() OVER (PARTITION BY user_id ORDER BY t DESC) AS rn
  FROM e
),
l AS (
  SELECT user_id,
         max(CASE WHEN rn = 1 THEN t END) AS t1,
         max(CASE WHEN rn = 2 THEN t END) AS t2,
         max(CASE WHEN rn = 1 THEN v END) AS v1,
         max(CASE WHEN rn = 2 THEN v END) AS v2
  FROM r WHERE rn <= 2 GROUP BY user_id
)
SELECT s.user_id, n, last_v, first_v,
       l.t1 - l.t2 AS gap_last2_us,
       CAST(round(CAST(l.v1 - l.v2 AS DOUBLE) * {US_PER_HOUR}.0 / CAST(l.t1 - l.t2 AS DOUBLE) * 1e6) AS BIGINT) AS rate_per_hour_e6,
       CASE WHEN n*sxx - sx*sx != 0
            THEN CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) * 1e6) AS BIGINT) END AS slope_e6,
       CASE WHEN n*sxx - sx*sx != 0 AND n*syy - sy*sy != 0
            THEN CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
                       / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) * 1e6) AS BIGINT) END AS r2_e6
FROM s JOIN l USING (user_id)
"""


def sess_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch form of the streaming
    windowed agg — SURVEY §2.J; the same expression runs under readStream
    with a watermark, see streaming/)."""
    ev = _evq(spark, sf_dir)
    return (
        ev.withColumn("hour_bucket", F.expr(f"t div {US_PER_HOUR}"))
        .withColumn("user_mod", F.col("user_id") % 10)
        .groupBy("hour_bucket", "user_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )


SESS_HOURLY_SQL = f"""
SELECT t // {US_PER_HOUR} AS hour_bucket,
       user_id % 10 AS user_mod,
       count(*) AS n,
       CAST(sum(v) AS BIGINT) AS sum_v
FROM ({EVQ_SQL})
GROUP BY 1, 2
"""


def ev_json_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access (§2.I JSON): extract props.k, bucket by decile,
    aggregate."""
    from ..tables import load_events

    ev = load_events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return (
        ev.withColumn("k_bucket", F.expr("k div 10"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_v"),
        )
    )


EV_JSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v
FROM events
GROUP BY 1
"""


def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 in the relational encoding with the full analytic-window
    surface: lag (previous value delta), lead (next event id), and an
    explicit ROWS frame (trailing 3-row moving sum) per key, event-time
    ordered. The exploded-format dual of the reference's per-row
    ``element_at(arr, -1) - element_at(arr, -2)`` arithmetic
    (``filter_kn_candidates/filter.py:230-265``)."""
    ev = _evq(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    wf = w.rowsBetween(-2, 0)
    return ev.select(
        "user_id",
        "event_id",
        "v",
        (F.col("v") - F.lag("v").over(w)).alias("delta_v"),
        F.sum("v").over(wf).alias("mov_sum3"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


W_LAG_SQL = f"""
SELECT user_id, event_id, v,
       v - lag(v) OVER w AS delta_v,
       CAST(sum(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum3,
       lead(event_id) OVER w AS next_event_id
FROM ({EVQ_SQL})
WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
"""


US_PER_DAY = 86_400_000_000


def ts_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill (the time-bucket-gapfill
    operator of timeseries engines): per user, daily value sums on a dense
    day grid from the user's first to last event; empty days carry the
    last observed value forward and are flagged.

    Scale: the grid is generated per key with sequence() (no cross join,
    no driver loop); the fill is one last(ignorenulls) window over the
    same user_id partitioning the daily aggregate already produced — two
    shuffles total (agg, then grid explode + window reuse the key)."""
    ev = load_events(spark, sf_dir)
    daily = (
        ev.select(
            "user_id",
            F.expr(f"ts_us div {US_PER_DAY}").alias("day"),  # exact int floor
            F.round(F.col("value") * 1000).cast("long").alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v").alias("v_day"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("v_day", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v_day").isNull().alias("filled"),
    )


TS_GAPFILL_SQL = """
WITH e AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(round(value * 1000) AS BIGINT) AS v
  FROM events
),
agg AS (SELECT user_id, day, CAST(sum(v) AS BIGINT) AS v_day FROM e GROUP BY 1, 2),
bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM agg GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM bounds),
j AS (
  SELECT g.user_id, g.day, a.v_day
  FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.day = a.day
)
SELECT user_id, day,
       last_value(v_day IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
       v_day IS NULL AS filled
FROM j
"""


def w_cum_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day — windowed COUNT
    DISTINCT, which Spark's window functions don't support directly, in
    its scalable form: distinct = "first time seen", so aggregate each
    (type, user) to its first day, count new arrivals per day, and running-
    sum those. No per-row growing state (collect_set over a window holds
    the whole key set per row — the non-scalable encoding this replaces)."""
    ev = load_events(spark, sf_dir)
    first_seen = (
        ev.select(
            "event_type",
            "user_id",
            F.expr(f"ts_us div {US_PER_DAY}").alias("day"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.min("day").alias("day"))
    )
    daily_new = first_seen.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "event_type", "day", "n_new", F.sum("n_new").over(w).alias("n_cum_users")
    )


W_CUM_DISTINCT_SQL = """
WITH fs AS (
  SELECT event_type, user_id,
         min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS day
  FROM events GROUP BY event_type, user_id
),
dn AS (SELECT event_type, day, count(*) AS n_new FROM fs GROUP BY 1, 2)
SELECT event_type, day, n_new,
       CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_cum_users
FROM dn
"""


def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (trailing 5 rows) per user — order statistics
    over a moving frame, which Spark has no native window function for:
    collect the frame into an array, sort, index the lower median. Exact
    integer values make it engine-reproducible. The frame is O(1) rows so
    the per-row array is bounded — this encoding is safe at any scale
    (contrast unbounded collect_set windows, see w_cum_distinct_users)."""
    ev = _evq(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(F.collect_list("v").over(w))
    med = F.expr(
        "element_at(__arr, int((size(__arr) + 1) div 2))"
    )
    return (
        ev.select("user_id", "event_id", "v", arr.alias("__arr"))
        .select(
            "user_id",
            "event_id",
            "v",
            F.size("__arr").alias("frame_n"),
            med.alias("med5"),
        )
    )


W_ROLLING_MEDIAN_SQL = f"""
SELECT user_id, event_id, v,
       CAST(len(l) AS INT) AS frame_n,
       list_sort(l)[(len(l) + 1) // 2] AS med5
FROM (
  SELECT user_id, event_id, v,
         list(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS l
  FROM ({EVQ_SQL})
)
"""


US_PER_DAY = 24 * US_PER_HOUR
RETENTION_OFFSETS = (1, 7)


def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort analysis: group users by first-active day (the
    cohort), then report how many return exactly 1 and 7 days later —
    the standard product-analytics D1/D7 retention table.

    Scale: ONE shuffle on user_id builds the per-user profile
    (min(day) + collect_set(day); the set is bounded by the corpus'
    calendar span, not its row count, and collect_set combines
    map-side), then a groups-sized aggregate on cohort_day. No
    self-join of events against events.

    NULL-key alignment (groupBy-vs-join asymmetry audit, round 7): Spark's
    groupBy would keep a NULL user as a group while the oracle's
    ``u JOIN e`` drops NULL keys — both sides now filter NULL user_ids
    EXPLICITLY (a NULL user is not a retainable cohort member), so the
    pair stays hash-equal even on a NULL-bearing events build
    (property-pinned in test_properties.py)."""
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    days = ev.where(F.col("user_id").isNotNull()).select(
        "user_id", F.expr(f"ts_us div {US_PER_DAY}").alias("day")
    )
    prof = days.groupBy("user_id").agg(
        F.min("day").alias("cohort_day"), F.collect_set("day").alias("__ds")
    )
    flags = [
        F.array_contains("__ds", F.col("cohort_day") + d).cast("long").alias(f"__r{d}")
        for d in RETENTION_OFFSETS
    ]
    prof = prof.select("cohort_day", *flags)
    aggs = [F.count(F.lit(1)).alias("n_users")]
    for d in RETENTION_OFFSETS:
        aggs.append(F.sum(f"__r{d}").alias(f"d{d}_retained"))
    out = prof.groupBy("cohort_day").agg(*aggs)
    # Rates as exact integer parts-per-million: floor((retained*1e6)/n) in
    # 64-bit integer arithmetic is bit-identical in every engine, unlike
    # round(double-ratio, 6) which can split by one ulp between Spark's
    # BigDecimal HALF_UP and a DuckDB build's double-path round()
    # (DESIGN.md, "integer micro-units" convention).
    for d in RETENTION_OFFSETS:
        out = out.withColumn(
            f"d{d}_rate_ppm",
            F.expr(
                f"CAST((CAST(d{d}_retained AS DECIMAL(38,0)) * 1000000)"
                " div n_users AS LONG)"
            ),
        )
    return out


RETENTION_SQL = f"""
WITH e AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY} AS day FROM events
  WHERE user_id IS NOT NULL
),
u AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
p AS (
  SELECT u.user_id, u.cohort_day,
         max(CASE WHEN e.day = u.cohort_day + 1 THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN e.day = u.cohort_day + 7 THEN 1 ELSE 0 END) AS r7
  FROM u JOIN e ON u.user_id = e.user_id
  GROUP BY u.user_id, u.cohort_day
)
SELECT cohort_day,
       count(*) AS n_users,
       CAST(sum(r1) AS BIGINT) AS d1_retained,
       CAST(sum(r7) AS BIGINT) AS d7_retained,
       CAST((CAST(sum(r1) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS d1_rate_ppm,
       CAST((CAST(sum(r7) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS d7_rate_ppm
FROM p GROUP BY cohort_day
"""


EMA_ALPHA = 0.25  # dyadic: 0.25/0.75 are exact binary doubles


def w_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponential moving average (the smoothing estimator every
    monitoring/forecasting pipeline keeps per series): for each user the
    fold ``ema <- alpha*x + (1-alpha)*ema`` over events in (t, event_id)
    order, seeded with the first value. Emits the final EMA, the last raw
    value, and the event count per key.

    Determinism: an EMA is an inherently sequential fold, so parity comes
    from pinning the FOLD ORDER, not from integer math — both engines fold
    the identical (t, event_id)-sorted sequence of exact milli-unit
    integers, and with a dyadic alpha ({EMA_ALPHA}) each step is two IEEE
    multiplies and one add in the same order: bit-identical doubles,
    emitted as e6 integer micro-units at the edge (hash-stability).

    Scale: one shuffle on user_id; per-key history rides as one array
    (same bounded-state argument as ts_hist_array — at 100 TB the key
    would be (series, day-shard) so no array outgrows a task). The fold
    is a native higher-order ``aggregate`` — whole-stage codegen, no
    Python. A streaming deployment keeps (ema, last_t) as 16 bytes of
    state per key (see streaming/), which is why EMA — unlike a rolling
    median — survives unbounded series."""
    ev = _evq(spark, sf_dir)
    hist = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "event_id", "v"))).alias("__h")
    )
    vals = F.transform("__h", lambda s: s["v"].cast("double"))
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: x * F.lit(EMA_ALPHA) + acc * F.lit(1.0 - EMA_ALPHA),
    )
    return hist.select(
        "user_id",
        F.size("__h").cast("long").alias("n_events"),
        e6(ema, "ema_milli_e6"),
        F.element_at(vals, -1).alias("last_milli"),
    )


W_EMA_SQL = f"""
SELECT user_id,
       CAST(len(l) AS BIGINT) AS n_events,
       CAST(round(list_reduce(l, (acc, x) -> x * {EMA_ALPHA} + acc * {1.0 - EMA_ALPHA})
             * 1e6) AS BIGINT) AS ema_milli_e6,
       l[-1] AS last_milli
FROM (
  SELECT user_id,
         list(CAST(v AS DOUBLE) ORDER BY t, event_id) AS l
  FROM ({EVQ_SQL})
  GROUP BY user_id
)
"""


SPECS = [
    QuerySpec("ev_retention_cohorts", ev_retention_cohorts, RETENTION_SQL,
              "D1/D7 retention cohort table (one user-keyed shuffle)"),
    QuerySpec("w_ema", w_ema, W_EMA_SQL,
              "per-key exponential moving average (order-pinned sequential fold)"),
    QuerySpec("w_topn_per_user", w_topn_per_user, W_TOPN_SQL, "ranking window (§2.F/G)"),
    QuerySpec("w_rolling_median", w_rolling_median, W_ROLLING_MEDIAN_SQL,
              "exact rolling median over a bounded trailing frame"),
    QuerySpec("ts_gapfill_daily", ts_gapfill_daily, TS_GAPFILL_SQL,
              "dense-grid resample + forward fill (gap-fill operator)"),
    QuerySpec("w_cum_distinct_users", w_cum_distinct_users, W_CUM_DISTINCT_SQL,
              "cumulative distinct via first-seen aggregation (scalable form)"),
    QuerySpec("sess_hourly", sess_hourly, SESS_HOURLY_SQL, "tumbling-window agg (§2.J)"),
    QuerySpec("ev_json_bucket", ev_json_bucket, EV_JSON_SQL, "JSON access + agg (§2.I)"),
    QuerySpec("ts_rate_last2", ts_rate_last2, TS_RATE_SQL, "F2 two-point rate"),
    QuerySpec("ts_linfit", ts_linfit, TS_LINFIT_SQL, "F3/F5 closed-form fit"),
    QuerySpec("ts_hist_array", ts_hist_array, TS_HIST_SQL, "array-encoded history HOFs"),
    QuerySpec("w_lag_delta", w_lag_delta, W_LAG_SQL,
              "lag/lead + ROWS-frame moving sum (§2.F)"),
]
