"""Approximate-nearest-neighbor search over an embedding column.

- ``knn_bruteforce``  — exact top-k for a (small) query set: broadcast the
  queries, scan the corpus once, per-query top-k via window. Linear in
  corpus size, embarrassingly parallel — the correct *baseline* even at
  100 TB when the query set is small.
- ``ivf_assign`` / ``ivf_search`` — IVF (inverted-file) scale path: corpus
  rows are assigned to their nearest coarse centroid (the partition key);
  a query probes only ``nprobe`` nearest centroids' partitions. Centroids
  here are caller-provided (e.g. a fixed seed subset or k-means output), so
  assignment is deterministic and oracle-checkable.

All cosine math uses the quantized-integer convention (functions/vectors.py)
for cross-engine bit parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine_sim_q, quantize_vec


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excludes self-matches by id)."""
    q = queries.select(F.col(q_id).alias("__qid"), quantize_vec(q_vec).alias("__qv"))
    c = corpus.select(F.col(c_id).alias("__cid"), quantize_vec(c_vec).alias("__cv"))
    pairs = c.join(F.broadcast(q), F.col("__qid") != F.col("__cid")).select(
        F.col("__qid").alias("q_id"),
        F.col("__cid").alias("neighbor_id"),
        cosine_sim_q(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    c_id: str = "vec_id",
    cent_id: str = "centroid_id",
    c_vec: str = "embedding",
    cent_vec: str = "centroid_vec",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    ties by centroid id). Output: (vec_id, centroid_id, cosine)."""
    c = corpus.select(F.col(c_id).alias("vec_id"), quantize_vec(c_vec).alias("__cv"))
    cents = centroids.select(
        F.col(cent_id).alias("centroid_id"), quantize_vec(cent_vec).alias("__kv")
    )
    scored = c.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        cosine_sim_q(F.col("__cv"), F.col("__kv")).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "centroid_id", F.round("cosine", 6).alias("cosine"))
    )


def ivf_search(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid_vec",
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest centroid partitions per query,
    exact top-k within the probed subset.

    At scale the corpus is stored partitioned/bucketed by ``centroid_id``
    (partition pruning makes the probe a targeted scan, not a full pass).
    """
    assigned = ivf_assign(corpus, centroids, c_id=c_id, c_vec=c_vec,
                          cent_id=cent_id, cent_vec=cent_vec).select(
        F.col("vec_id").alias("__cid"), F.col("centroid_id").alias("__ccent")
    )
    c = corpus.select(F.col(c_id).alias("__cid"), quantize_vec(c_vec).alias("__cv")).join(
        assigned, "__cid"
    )
    q = queries.select(F.col(q_id).alias("__qid"), quantize_vec(q_vec).alias("__qv"))
    cents = centroids.select(
        F.col(cent_id).alias("__kcent"), quantize_vec(cent_vec).alias("__kv")
    )
    probe_scored = q.join(F.broadcast(cents)).select(
        "__qid", "__qv", "__kcent", cosine_sim_q(F.col("__qv"), F.col("__kv")).alias("__pc")
    )
    wq = Window.partitionBy("__qid").orderBy(F.desc("__pc"), F.asc("__kcent"))
    probes = (
        probe_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("__qid", "__qv", "__kcent")
    )
    pairs = c.join(
        F.broadcast(probes),
        (F.col("__ccent") == F.col("__kcent")) & (F.col("__qid") != F.col("__cid")),
    ).select(
        F.col("__qid").alias("q_id"),
        F.col("__cid").alias("neighbor_id"),
        cosine_sim_q(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
