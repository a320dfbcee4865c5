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

from ..functions.vectors import dot_q, norm_sq_q, quantize_vec


def _quantized(df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str, nsq_alias: str) -> DataFrame:
    """(id, quantized vec, squared norm) — norms precomputed once per row so
    the O(pairs) stage folds only the dot product (1 fold/pair, not 3)."""
    q = df.select(F.col(id_col).alias(id_alias), quantize_vec(vec_col).alias(vec_alias))
    return q.select(
        id_alias, vec_alias, norm_sq_q(F.col(vec_alias)).cast("double").alias(nsq_alias)
    )


def _cos(av, bv, ansq, bnsq) -> "F.Column":
    # same expression tree as cosine_sim_q: dot / sqrt(na) / sqrt(nb)
    return dot_q(F.col(av), F.col(bv)).cast("double") / F.sqrt(F.col(ansq)) / F.sqrt(F.col(bnsq))


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
    q = _quantized(queries, q_id, q_vec, "__qid", "__qv", "__qn")
    c = _quantized(corpus, c_id, c_vec, "__cid", "__cv", "__cn")
    pairs = c.join(F.broadcast(q), F.col("__qid") != F.col("__cid")).select(
        F.col("__qid").alias("q_id"),
        F.col("__cid").alias("neighbor_id"),
        _cos("__qv", "__cv", "__qn", "__cn").alias("cosine"),
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
    c = _quantized(corpus, c_id, c_vec, "vec_id", "__cv", "__cn")
    cents = _quantized(centroids, cent_id, cent_vec, "centroid_id", "__kv", "__kn")
    scored = c.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        _cos("__cv", "__kv", "__cn", "__kn").alias("cosine"),
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
    c = _quantized(corpus, c_id, c_vec, "__cid", "__cv", "__cn").join(assigned, "__cid")
    q = _quantized(queries, q_id, q_vec, "__qid", "__qv", "__qn")
    cents = _quantized(centroids, cent_id, cent_vec, "__kcent", "__kv", "__kn")
    probe_scored = q.join(F.broadcast(cents)).select(
        "__qid", "__qv", "__qn", "__kcent",
        _cos("__qv", "__kv", "__qn", "__kn").alias("__pc"),
    )
    wq = Window.partitionBy("__qid").orderBy(F.desc("__pc"), F.asc("__kcent"))
    probes = (
        probe_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("__qid", "__qv", "__qn", "__kcent")
    )
    pairs = c.join(
        F.broadcast(probes),
        (F.col("__ccent") == F.col("__kcent")) & (F.col("__qid") != F.col("__cid")),
    ).select(
        F.col("__qid").alias("q_id"),
        F.col("__cid").alias("neighbor_id"),
        _cos("__qv", "__cv", "__qn", "__cn").alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
