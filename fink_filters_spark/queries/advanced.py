"""Advanced analytics surface (round 3 additions):

- funnel conversion (ordered-stage analytics) — the multi-stage dual of
  q_sessionize: stage N's timestamp depends on stage N-1's, computed with
  stacked window aggregates over ONE hash-partition of user_id (no
  re-shuffle between stages, partitioning is preserved through WindowExec
  and into the final per-user aggregate).
- count-min sketch heavy hitters — the mergeable-sketch answer to "top
  users" at 100 TB: cell counts are a partial-aggregable 4x256 table
  (map-side combine collapses each partition to <=1024 rows), estimates
  never underestimate; both the sketch and the exact side are deterministic
  integer arithmetic, so the DuckDB oracle reproduces the sketch bit-for-bit.
- deterministic weighted sampling — P(keep) proportional to n_chars via a
  multiplicative hash of the key (pipe_kfold's scheme): pure per-row
  arithmetic, no shuffle, reproducible across runs and engines.
- runtime bloom-filter join — Spark's runtime-filter injection
  (spark.sql.optimizer.runtime.bloomFilter.*): a selective dim predicate is
  turned into a bloom pre-filter on the fact scan, the physical analogue of
  the reference's manual cheap-before-expensive staging (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..tables import load_events, load_table
from . import QuerySpec

# ---------------------------------------------------------------- funnel

FUNNEL_STAGES = ("view", "click", "purchase")


def w_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel: per user, the first view, the
    first click at-or-after that view, the first purchase at-or-after that
    click; one row of stage conversion counts.

    Scale: one shuffle on user_id; the three stage timestamps are window
    aggregates over the same partition spec (no intermediate exchange), the
    per-user rollup reuses the same partitioning, and only |users| rows
    reach the final single-row aggregate.

    NULL-key alignment (round-7 audit): Spark's window/groupBy would keep
    a NULL user as one funnel participant while the oracle's stage JOINs
    (e JOIN u / e JOIN c) drop NULL keys — both sides filter NULL
    user_ids explicitly (testdata has none; test_testdata_has_no_null_keys
    pins that invariant).
    """
    ev = (
        load_events(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts_us")
    )
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    st1 = ev.withColumn("tv", tv)
    tc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") >= F.col("tv")),
            F.col("ts_us"),
        )
    ).over(w)
    st2 = st1.withColumn("tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") >= F.col("tc")),
            F.col("ts_us"),
        )
    ).over(w)
    st3 = st2.withColumn("tp", tp)
    per_user = st3.groupBy("user_id").agg(
        F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_click"),
        F.count("tp").alias("n_purchase"),
    )


FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
           WHERE user_id IS NOT NULL),
u AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN t END) AS tv
  FROM e GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.t) AS tc
  FROM e JOIN u ON e.user_id = u.user_id
  WHERE e.event_type = 'click' AND e.t >= u.tv
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.t) AS tp
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.t >= c.tc
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(u.tv) AS BIGINT) AS n_view,
       CAST(count(c.tc) AS BIGINT) AS n_click,
       CAST(count(p.tp) AS BIGINT) AS n_purchase
FROM u
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""

# ------------------------------------------------- count-min heavy hitters

CMS_P = 1000003  # prime modulus
CMS_W = 256      # cells per hash row
CMS_PARAMS = [(0, 131, 17), (1, 137, 29), (2, 139, 41), (3, 149, 53)]
CMS_K = 10


def _cms_cell(key, a, b):
    return ((key * a + b) % CMS_P) % CMS_W


def agg_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch vs exact: top-10 users by event count with the CMS
    estimate alongside and the never-underestimates invariant asserted.

    Scale: the sketch is the scalable side — 4x256 cells regardless of key
    cardinality, built with map-side partial aggregation (each partition
    contributes <=1024 partial rows to the shuffle); the exact top-k is
    TakeOrderedAndProject. The candidate->cell lookup broadcasts the tiny
    cell table.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    prm = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, a, b in CMS_PARAMS
        ]
    )
    cells = (
        ev.select("user_id", F.explode(prm).alias("p"))
        .select(
            F.col("p.i").alias("i"),
            _cms_cell(F.col("user_id"), F.col("p.a"), F.col("p.b")).alias("cell"),
        )
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(CMS_K)
    )
    est = (
        exact.select("user_id", "n_exact", F.explode(prm).alias("p"))
        .select(
            "user_id",
            "n_exact",
            F.col("p.i").alias("i"),
            _cms_cell(F.col("user_id"), F.col("p.a"), F.col("p.b")).alias("cell"),
        )
        .join(F.broadcast(cells), ["i", "cell"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").alias("n_cms"))
    )
    return est.select(
        "user_id",
        "n_exact",
        "n_cms",
        (F.col("n_cms") >= F.col("n_exact")).alias("lower_bound_ok"),
    )


CMS_SQL = f"""
WITH ev AS (SELECT user_id FROM events),
params AS (
  SELECT * FROM (VALUES {", ".join(f"({i},{a},{b})" for i, a, b in CMS_PARAMS)})
    AS t(i, a, b)
),
cells AS (
  SELECT p.i AS i,
         ((e.user_id * p.a + p.b) % {CMS_P}) % {CMS_W} AS cell,
         count(*) AS cnt
  FROM ev e CROSS JOIN params p
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, count(*) AS n_exact FROM ev GROUP BY user_id
  ORDER BY n_exact DESC, user_id ASC LIMIT {CMS_K}
),
est AS (
  SELECT x.user_id, x.n_exact, min(c.cnt) AS n_cms
  FROM exact x
  CROSS JOIN params p
  JOIN cells c
    ON c.i = p.i
   AND c.cell = ((x.user_id * p.a + p.b) % {CMS_P}) % {CMS_W}
  GROUP BY x.user_id, x.n_exact
)
SELECT user_id, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_cms AS BIGINT) AS n_cms,
       n_cms >= n_exact AS lower_bound_ok
FROM est
"""

# ------------------------------------------------ weighted sampling

W_MOD = 4294967296   # 2^32 (8 md5 hex digits)
W_DENOM = 4096       # P(keep) = n_chars / 4096  (n_chars <= 553 in testdata)


def pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional deterministic sampling: keep a document with
    probability n_chars/4096, decided by the md5-bucket hash of doc_id
    (uniform in [0, 2^32)) — per-row arithmetic only (no shuffle, no RNG
    state), so the sample is identical on every run, engine, and
    partitioning. (Was a multiplicative ``(id*knuth) % 2^32``: that
    overflows long under ANSI for ids >= ~3.5e9 and inherits id-allocation
    structure; see ``md5_bucket``.)"""
    from ..operators.sample import md5_bucket

    docs = load_table(spark, sf_dir, "documents")
    u = md5_bucket("doc_id", W_MOD, n_hex=8)
    return docs.filter(u * W_DENOM < F.col("n_chars") * W_MOD).select(
        "doc_id", "n_chars", u.cast("long").alias("sample_key")
    )


def _weighted_sample_sql() -> str:
    from .curation import md5_bucket_sql

    u = md5_bucket_sql("doc_id", W_MOD, n_hex=8)
    return f"""
SELECT doc_id, n_chars,
       CAST({u} AS BIGINT) AS sample_key
FROM documents
WHERE {u} * {W_DENOM} < n_chars * {W_MOD}
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()

# ------------------------------------------------ runtime bloom-filter join

def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim -> fact join with runtime bloom-filter injection: the
    p_brand predicate becomes a bloom pre-filter on the lineitem scan, so
    the fact side drops non-matching rows before the join exchange — at
    100 TB this is the difference between shuffling the whole fact table
    and shuffling the ~1/25 that can match.

    No session confs are touched here: runtime bloom-filter injection is ON
    by default in Spark 4 (``runtime.bloomFilter.enabled=true``) and fires
    at production scan sizes; mutating thresholds inside a query builder
    would leak plan-affecting state into every later query in the shared
    session. The injection behavior itself is asserted in
    tests/test_advanced.py with test-scoped (saved/restored) confs."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


BLOOM_SQL = """
SELECT p_type,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
GROUP BY p_type
"""

# ------------------------------------------------ keyed upsert (MERGE)


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet (operators/upsert.py): a
    simulated update batch (every 100th order repriced, a slice of new
    orders) full-outer-merged into the base table, then rolled up by
    status so the whole merged state is hash-checked. One shuffle on the
    merge key; at scale the write side rewrites only touched partitions
    (upsert_partitioned)."""
    from ..operators.upsert import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    upd_mod = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    upd_new = (
        orders.filter(F.col("o_orderkey") % 100 == 1)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(1000000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    merged = merge_upsert(orders, upd_mod.unionByName(upd_new), ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
    )


UPSERT_SQL = """
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 1
),
merged AS (
  SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
              ELSE b.o_orderstatus END AS o_orderstatus,
         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
              ELSE b.o_totalprice END AS o_totalprice
  FROM orders b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
)
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM merged GROUP BY o_orderstatus
"""

SPECS = [
    QuerySpec("q_upsert_merge", q_upsert_merge, UPSERT_SQL,
              "parquet-native MERGE upsert (full-outer, update wins) + rollup"),
    QuerySpec("w_funnel_stages", w_funnel_stages, FUNNEL_SQL,
              "multi-stage funnel conversion (stacked windows, one shuffle)"),
    QuerySpec("agg_cms_topk", agg_cms_topk, CMS_SQL,
              "count-min sketch heavy hitters vs exact (mergeable 4x256 sketch)"),
    QuerySpec("pipe_weighted_sample", pipe_weighted_sample, WEIGHTED_SAMPLE_SQL,
              "length-weighted deterministic sampling (multiplicative hash)"),
    QuerySpec("q_bloom_filter_join", q_bloom_filter_join, BLOOM_SQL,
              "runtime bloom-filter injected selective dim-fact join"),
]
