"""Training-data pipeline operators: the curation steps a 100 TB corpus run
needs between raw ingest and tokenized shards — deterministic sampling,
dataset profiling, train/test splitting, and sequence packing.

These complement dedup.py / similarity.py / text.py: together they cover the
standard curation DAG (profile -> clean -> dedup -> split -> pack).

Determinism notes: all sampling/splitting here is modulus-on-key (the
reference's own convention — ``diaSourceId % 113 == 0`` at
``fink_filters/rubin/livestream/filter_uniform_sample/filter.py:50``), never
``rand()``: re-runs, retries, and engine swaps (Spark vs DuckDB oracle)
must select identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..tables import load_table
from . import QuerySpec

TOKS = lambda: F.split(F.lower(F.trim(F.col("text"))), r"\s+")  # noqa: E731


def pipe_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: high-volume event types keep 1/20,
    the rest 1/5 — per-stratum rates via modulus on the key (C38 semantics
    generalized). At scale this is a pure narrow map: no shuffle until the
    verification aggregate."""
    ev = load_table(spark, sf_dir, "events")
    rate = F.when(F.col("event_type").isin("click", "view"), F.lit(20)).otherwise(F.lit(5))
    return (
        ev.filter(F.col("event_id") % rate == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_value_milli"),
        )
    )


SAMPLE_STRAT_SQL = """
SELECT event_type, count(*) AS n_sampled,
       CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events
WHERE event_id % (CASE WHEN event_type IN ('click','view') THEN 20 ELSE 5 END) = 0
GROUP BY event_type
"""


def pipe_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling: per-column null count + distinct cardinality over
    the documents table, one output row per profiled column.

    Scale: one pass per profile batch via a single multi-aggregate (Spark
    computes all counts in one scan, then ``stack`` pivots to rows) — NOT
    one job per column."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.agg(
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0)).alias("null_lang"),
        F.count_distinct("lang").alias("dist_lang"),
        F.sum(F.when(F.col("source").isNull(), 1).otherwise(0)).alias("null_source"),
        F.count_distinct("source").alias("dist_source"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_text"),
        F.count_distinct("text").alias("dist_text"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'lang', null_lang, dist_lang,"
            " 'source', null_source, dist_source,"
            " 'text', null_text, dist_text)"
        ).alias("col_name", "n_nulls", "n_distinct")
    )


PROFILE_SQL = """
WITH a AS (
  SELECT CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang,
         count(DISTINCT lang) AS dist_lang,
         CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source,
         count(DISTINCT source) AS dist_source,
         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
         count(DISTINCT text) AS dist_text
  FROM documents
)
SELECT 'lang' AS col_name, null_lang AS n_nulls, dist_lang AS n_distinct FROM a
UNION ALL
SELECT 'source', null_source, dist_source FROM a
UNION ALL
SELECT 'text', null_text, dist_text FROM a
"""


def pipe_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test split by key modulus, verified by
    per-(split, lang) counts. Narrow map + small aggregate; the split
    column would be the partition column of the written shards."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "split", F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test")
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


SPLIT_SQL = """
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'test' END AS split,
       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""


def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in deterministic doc_id order,
    per language) to fixed-budget token packs of 1024 — the greedy
    exclusive-cumulative-sum packing used to build LLM training shards.

    pack_id = floor(cumsum_of_previous_doc_tokens / 1024); output is one row
    per (lang, pack) with its document count and token total.

    Scale: a running sum over a whole partition key is inherently
    sequential per key — at 100 TB the partition key must be composite
    (lang × shard/day), giving bounded per-key state; 5 global language
    partitions would skew. The window here demonstrates the per-shard
    shape."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.withColumn("n_tok", F.size(TOKS()).cast("long"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        toked.withColumn("prev_toks", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("pack_id", (F.col("prev_toks") / 1024).cast("long"))
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
        )
    )


PACK_SQL = """
SELECT lang, CAST(floor(prev_toks / 1024) AS BIGINT) AS pack_id,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
FROM (
  SELECT lang, doc_id, n_tok,
         COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS prev_toks
  FROM (
    SELECT lang, doc_id,
           CAST(length(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
    FROM documents
  )
)
GROUP BY lang, CAST(floor(prev_toks / 1024) AS BIGINT)
"""


def pipe_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/test split — the leakage guard a per-row split
    lacks: EVERY document from one ``source`` lands in the same split
    (near-duplicate rows from a shared source can never straddle
    train/test and leak evaluation content into training). The split
    hashes the GROUP key through the engine's portable md5 bucket, so
    membership is deterministic, well-mixed even for strided key spaces,
    and bit-reproducible in the oracle. Output audits the split: per-split
    document/source counts plus ``leaky_sources`` — sources seen in more
    than one split — which the structural guarantee pins at 0."""
    from ..operators.sample import md5_bucket

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.withColumn(
        "split",
        F.when(md5_bucket("source", 10) < 8, "train").otherwise("test"),
    )
    per_split = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
    )
    leaky = (
        tagged.groupBy("source")
        .agg(F.count_distinct("split").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaky_sources"))
    )
    return per_split.crossJoin(F.broadcast(leaky))


def _group_split_sql() -> str:
    from .curation import md5_bucket_sql

    bucket = md5_bucket_sql("source", 10)
    return f"""
WITH tagged AS (
  SELECT *, CASE WHEN {bucket} < 8 THEN 'train' ELSE 'test' END AS split
  FROM documents
),
leaky AS (
  SELECT count(*) AS leaky_sources FROM (
    SELECT source FROM tagged GROUP BY source HAVING count(DISTINCT split) > 1
  )
)
SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       (SELECT leaky_sources FROM leaky) AS leaky_sources
FROM tagged GROUP BY split
"""


K_ANON = 5
BAL_OFFSET_C = 100_000   # shift cents non-negative before exact int division
BAL_BUCKET_C = 500_000   # 5000-unit balance generalization buckets


def pipe_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) — the privacy gate a training-data
    release runs before shipping records with quasi-identifiers: group by
    the QI tuple (nation, market segment, generalized balance bucket),
    emit every equivalence class with its size and an ``at_risk`` flag
    (class smaller than k={K_ANON} re-identifies its members). The
    released-or-suppressed decision downstream is a filter on this output.

    Balance is generalized by exact integer arithmetic — cents shifted
    non-negative then integer-divided into {BAL_BUCKET_C}-cent buckets —
    so the bucketing is bit-identical cross-engine (no float division;
    same discipline as the samplers' ``_int_floor_div``).

    Scale: one aggregation shuffled on the QI tuple; class cardinality is
    bounded by the QI domain product, not the corpus, so the output stays
    tiny at any scale. A skewed QI class is just a big count (map-side
    partials absorb it)."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").cast("long").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            f"(CAST(round(c_acctbal * 100) AS BIGINT) + {BAL_OFFSET_C})"
            f" DIV {BAL_BUCKET_C}"
        ).alias("bal_bucket"),
    )
    return (
        qi.groupBy("nat", "seg", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < K_ANON)
    )


K_ANONYMITY_SQL = f"""
SELECT nat, seg, bal_bucket, class_size, class_size < {K_ANON} AS at_risk
FROM (
  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
         (CAST(round(c_acctbal * 100) AS BIGINT) + {BAL_OFFSET_C}) // {BAL_BUCKET_C}
             AS bal_bucket,
         count(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
"""


L_DIV = 3  # minimum distinct sensitive values per released class


def pipe_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — the gate k-anonymity
    misses: a class can be large (k-anonymous) yet have every member
    share one sensitive value, so membership still discloses it
    (homogeneity attack). Group by the QI tuple (nation, segment), count
    members AND distinct generalized balance buckets (the sensitive
    attribute, same exact-integer bucketing as pipe_k_anonymity); a class
    with fewer than l={L_DIV} distinct sensitive values is at risk even
    when its size passes k.

    Scale: one aggregation shuffled on the QI tuple with a distinct-count
    (partial aggregation applies; the distinct set per class is bounded
    by the sensitive domain, not the corpus)."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").cast("long").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            f"(CAST(round(c_acctbal * 100) AS BIGINT) + {BAL_OFFSET_C})"
            f" DIV {BAL_BUCKET_C}"
        ).alias("bal_bucket"),
    )
    return (
        qi.groupBy("nat", "seg")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct("bal_bucket").alias("l_distinct"),
        )
        .withColumn("at_risk", F.col("l_distinct") < L_DIV)
    )


L_DIVERSITY_SQL = f"""
SELECT nat, seg, class_size, l_distinct, l_distinct < {L_DIV} AS at_risk
FROM (
  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
         count(*) AS class_size,
         count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + {BAL_OFFSET_C})
               // {BAL_BUCKET_C}) AS l_distinct
  FROM customer
  GROUP BY 1, 2
)
"""


SPECS = [
    QuerySpec("pipe_sample_stratified", pipe_sample_stratified, SAMPLE_STRAT_SQL,
              "per-stratum deterministic modulus sampling"),
    QuerySpec("pipe_l_diversity", pipe_l_diversity, L_DIVERSITY_SQL,
              "l-diversity audit over QI classes (homogeneity-attack gate)"),
    QuerySpec("pipe_group_split", pipe_group_split, _group_split_sql(),
              "group-aware split with zero cross-split source leakage"),
    QuerySpec("pipe_profile_columns", pipe_profile_columns, PROFILE_SQL,
              "one-scan multi-column null/distinct profile"),
    QuerySpec("pipe_split_train_test", pipe_split_train_test, SPLIT_SQL,
              "deterministic 80/20 split by key"),
    QuerySpec("pipe_pack_sequences", pipe_pack_sequences, PACK_SQL,
              "greedy token packing via exclusive cumsum window"),
    QuerySpec("pipe_k_anonymity", pipe_k_anonymity, K_ANONYMITY_SQL,
              "k-anonymity equivalence-class audit over quasi-identifiers"),
]
