"""Similarity-search queries over the ``embeddings`` table
(operators/similarity.py): exact brute-force top-k as the baseline, IVF
coarse-quantizer assignment as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.similarity import ivf_assign, knn_bruteforce, maxdot_topk, mips_lsh_search
from ..tables import load_table
from . import QuerySpec, e6
from .dedup import QVEC_SQL

N_QUERIES = 20  # vec_id < 20 are the query set
N_CENTROIDS = 8  # vec_id < 8 are the IVF seed centroids
K = 5

# Zero-norm guard mirrors operators/similarity._cos: Spark's guarded
# cosine is NULL for a zero-norm side (never NaN), and NULL orders LAST
# under both engines' DESC default — whereas an unguarded 0/0 would be a
# hard ANSI error in Spark and a NaN in DuckDB that sorts FIRST in DESC,
# silently flipping centroid assignments.
_NA_SQL = "CAST(CAST(list_sum(list_transform(a.qv, x -> x * x)) AS BIGINT) AS DOUBLE)"
_NB_SQL = "CAST(CAST(list_sum(list_transform(b.qv, x -> x * x)) AS BIGINT) AS DOUBLE)"

_COS_RAW = (
    f"(CASE WHEN {_NA_SQL} > 0 AND {_NB_SQL} > 0 THEN "
    "CAST(CAST(list_sum(list_transform(generate_series(1, len(a.qv)), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS DOUBLE)"
    f" / sqrt({_NA_SQL}) / sqrt({_NB_SQL}) END)"
)


def q_sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    # hash-stability: e6 integer micro-units on the hash surface; cosine is
    # bit-identical in both engines up to rounding (exact-int dot, IEEE
    # sqrt/div), and INTEGER rounding agrees across engines incl. ties
    return knn_bruteforce(queries, em, k=K, q_id="q_id", q_vec="embedding").select(
        "q_id", "neighbor_id", e6("cosine", "cosine_e6"), "rank"
    )


SIM_KNN_SQL = f"""
WITH q AS ({QVEC_SQL}),
p AS (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_COS_RAW} AS cosine
  FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id != a.vec_id
),
r AS (
  SELECT q_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM p
)
SELECT q_id, neighbor_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_e6, rank FROM r WHERE rank <= {K}
"""


def q_sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    centroids = em.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return ivf_assign(em, centroids, c_id="vec_id", c_vec="embedding",
                      cent_id="centroid_id", cent_vec="centroid_vec").select(
        "vec_id", "centroid_id", e6("cosine", "cosine_e6")
    )


SIM_IVF_SQL = f"""
WITH q AS ({QVEC_SQL}),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS centroid_id, {_COS_RAW} AS cosine
  FROM q a JOIN q b ON b.vec_id < {N_CENTROIDS}
),
r AS (
  SELECT vec_id, centroid_id, cosine,
         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM p
)
SELECT vec_id, centroid_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_e6 FROM r WHERE rn = 1
"""


NPROBE = 2


def q_sim_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search: probe the NPROBE nearest centroid partitions per
    query, exact top-k inside the probed subset — the sub-linear scale path
    whose recall/speed trade-off is tuned by nprobe. The oracle replicates
    the algorithm (assignment + probe + scoped top-k) exactly."""
    from ..operators.similarity import ivf_search

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    centroids = em.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return ivf_search(queries, em, centroids, k=K, nprobe=NPROBE).select(
        "q_id", "neighbor_id", e6("cosine", "cosine_e6"), "rank"
    )


SIM_IVF_SEARCH_SQL = f"""
WITH q AS ({QVEC_SQL}),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, b.vec_id AS centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_COS_RAW} DESC, b.vec_id ASC
           ) AS rn
    FROM q a JOIN q b ON b.vec_id < {N_CENTROIDS}
  ) WHERE rn = 1
),
probes AS (
  SELECT q_id, centroid_id FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_COS_RAW} DESC, b.vec_id ASC
           ) AS rn
    FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id < {N_CENTROIDS}
  ) WHERE rn <= {NPROBE}
),
pairs AS (
  SELECT p.q_id, c.vec_id AS neighbor_id,
         (SELECT {_COS_RAW} FROM q a, q b
          WHERE a.vec_id = p.q_id AND b.vec_id = c.vec_id) AS cosine
  FROM probes p
  JOIN assign ca ON ca.centroid_id = p.centroid_id
  JOIN q c ON c.vec_id = ca.vec_id AND c.vec_id != p.q_id
),
r AS (
  SELECT q_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM pairs
)
SELECT q_id, neighbor_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_e6, rank FROM r WHERE rank <= {K}
"""


def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of IVF ANN vs the exact brute-force baseline, per query —
    the evaluation harness an ANN deployment runs before trusting nprobe.
    Both sides are deterministic, so recall itself is oracle-checkable
    (not just bounded): the DuckDB oracle replays both algorithms and the
    same overlap join."""
    bf = q_sim_knn(spark, sf_dir).select("q_id", "neighbor_id")
    iv = q_sim_ivf_search(spark, sf_dir).select("q_id", "neighbor_id")
    ov = bf.join(iv, ["q_id", "neighbor_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    qs = bf.select("q_id").distinct()
    n_ov = F.coalesce(F.col("n_overlap"), F.lit(0))
    return qs.join(ov, "q_id", "left").select(
        "q_id",
        n_ov.cast("long").alias("n_overlap"),
        # hash-stability: exact integer ppm (DESIGN.md "integer micro-units")
        F.expr(f"(CAST(coalesce(n_overlap, 0) AS BIGINT) * 1000000L) div {K}")
        .cast("long")
        .alias("recall_ppm"),
    )


SIM_IVF_RECALL_SQL = f"""
WITH q AS ({QVEC_SQL}),
bfp AS (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_COS_RAW} AS cosine
  FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id != a.vec_id
),
bf AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM bfp
  ) WHERE rank <= {K}
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, b.vec_id AS centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_COS_RAW} DESC, b.vec_id ASC
           ) AS rn
    FROM q a JOIN q b ON b.vec_id < {N_CENTROIDS}
  ) WHERE rn = 1
),
probes AS (
  SELECT q_id, centroid_id FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_COS_RAW} DESC, b.vec_id ASC
           ) AS rn
    FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id < {N_CENTROIDS}
  ) WHERE rn <= {NPROBE}
),
ivfp AS (
  SELECT p.q_id, c.vec_id AS neighbor_id,
         (SELECT {_COS_RAW} FROM q a, q b
          WHERE a.vec_id = p.q_id AND b.vec_id = c.vec_id) AS cosine
  FROM probes p
  JOIN assign ca ON ca.centroid_id = p.centroid_id
  JOIN q c ON c.vec_id = ca.vec_id AND c.vec_id != p.q_id
),
ivf AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ivfp
  ) WHERE rank <= {K}
),
ov AS (
  SELECT bf.q_id, count(*) AS n_overlap
  FROM bf JOIN ivf ON bf.q_id = ivf.q_id AND bf.neighbor_id = ivf.neighbor_id
  GROUP BY bf.q_id
)
SELECT qs.q_id,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST((CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) * 1000000) // {K} AS BIGINT) AS recall_ppm
FROM (SELECT DISTINCT q_id FROM bf) qs
LEFT JOIN ov ON qs.q_id = ov.q_id
"""


N_PLANES = 16
BAND_BITS = 8
EMB_DIM = 64


def q_sim_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-projection LSH ANN (operators/similarity.lsh_search): 16 ±1
    hyperplanes → two 8-bit band signatures; candidate = shares a band with
    the query; exact cosine top-k within candidates. The training-free
    bucket-join scale path next to IVF."""
    from ..operators.similarity import lsh_search, sign_planes

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    planes = sign_planes(N_PLANES, EMB_DIM, seed=0)
    return lsh_search(queries, em, k=K, planes=planes, band_bits=BAND_BITS).select(
        "q_id", "neighbor_id", e6("cosine", "cosine_e6"), "rank"
    )


def _lsh_oracle_sql() -> str:
    """Oracle replicating the LSH algorithm with the SAME hyperplane
    literals (sign_planes is pure Python, shared by both sides)."""
    from ..operators.similarity import sign_planes

    planes = sign_planes(N_PLANES, EMB_DIM, seed=0)
    bit_exprs = ",\n         ".join(
        "CASE WHEN list_sum(list_transform(generate_series(1, %d), i -> qv[i] * ([%s])[i])) >= 0 THEN 1 ELSE 0 END AS bit%d"
        % (EMB_DIM, ",".join(str(s) for s in plane), p)
        for p, plane in enumerate(planes)
    )
    n_bands = N_PLANES // BAND_BITS
    sig_exprs = ", ".join(
        " + ".join(f"{1 << j} * bit{b * BAND_BITS + j}" for j in range(BAND_BITS))
        + f" AS sig{b}"
        for b in range(n_bands)
    )
    banded = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band, sig{b} AS sig FROM packed" for b in range(n_bands)
    )
    return f"""
WITH q AS ({QVEC_SQL}),
bits AS (
  SELECT vec_id, qv,
         {bit_exprs}
  FROM q
),
packed AS (SELECT vec_id, {sig_exprs} FROM bits),
banded AS (
{banded}
),
cand AS (
  SELECT DISTINCT ba.vec_id AS q_id, bb.vec_id AS neighbor_id
  FROM banded ba JOIN banded bb ON ba.band = bb.band AND ba.sig = bb.sig
  WHERE ba.vec_id < {N_QUERIES} AND bb.vec_id != ba.vec_id
),
pairs AS (
  SELECT cand.q_id, cand.neighbor_id, {_COS_RAW} AS cosine
  FROM cand
  JOIN q a ON a.vec_id = cand.q_id
  JOIN q b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT q_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM pairs
)
SELECT q_id, neighbor_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_e6, rank FROM r WHERE rank <= {K}
"""


def q_sim_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid training: per-label mean embedding — the k-means update step
    of IVF index training, as pure relational ops (posexplode -> groupBy on
    (label, pos)). Scale: the shuffle carries |labels|·dim partial sums, not
    vectors; partial aggregation collapses each partition's contribution
    map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    agg = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.round(F.col("val").cast("double") * 1e6).cast("long")).alias("sum_e6"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # mean in micro-units, rounded half-away IN INTEGER ARITHMETIC: a double
    # mean that lands on a .5e-6 decimal boundary rounds differently in
    # Spark (BigDecimal shortest-repr) vs DuckDB (binary value) — found as a
    # 1-ulp hash flake at sf0.1. sign * ((2|s| + n) div 2n) is engine-proof.
    mean_e6 = F.when(F.col("sum_e6") < 0, -1).otherwise(1) * F.expr(
        "(2 * abs(sum_e6) + n) div (2 * n)"
    )
    return agg.withColumn("centroid", mean_e6.cast("double") / 1e6)


SIM_CENTROID_SQL = """
SELECT label, pos, sum_e6, n,
       CAST((CASE WHEN sum_e6 < 0 THEN -1 ELSE 1 END)
            * ((2 * abs(sum_e6) + n) // (2 * n)) AS DOUBLE) / 1e6 AS centroid
FROM (
  SELECT label, CAST(pos AS INT) AS pos,
         CAST(sum(CAST(round(CAST(val AS DOUBLE)*1e6) AS BIGINT)) AS BIGINT) AS sum_e6,
         count(*) AS n
  FROM (
    SELECT label, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
    FROM embeddings
  )
  GROUP BY label, CAST(pos AS INT)
)
"""


SEMDEDUP_TAU = 0.4


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-then-prune embedding dedup — assign every vector
    to its nearest seed centroid, drop vectors with a lower-id cluster-mate
    at cosine >= tau (operators/dedup.py ``semantic_dedup``). The all-pairs
    comparison is confined to within-cluster pairs, so the one heavy join
    shuffles on the centroid id — the shape that keeps semantic dedup
    tractable at corpus scale."""
    from ..operators.dedup import semantic_dedup

    em = load_table(spark, sf_dir, "embeddings")
    centroids = em.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return semantic_dedup(em, centroids, tau=SEMDEDUP_TAU)


SEMDEDUP_SQL = f"""
WITH q AS ({QVEC_SQL}),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, b.vec_id AS centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_COS_RAW} DESC, b.vec_id ASC
           ) AS rn
    FROM q a JOIN q b ON b.vec_id < {N_CENTROIDS}
  ) WHERE rn = 1
),
j AS (SELECT q.vec_id, q.qv, assign.centroid_id
      FROM q JOIN assign ON q.vec_id = assign.vec_id),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM j a JOIN j b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {_COS_RAW} >= {SEMDEDUP_TAU}
)
SELECT j.vec_id, j.centroid_id,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM j LEFT JOIN dup d ON j.vec_id = d.vec_id
"""


PQ_M = 4  # subspaces: 64-dim embeddings -> 4 x 16-dim subvectors


def q_sim_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ train + encode: codebooks are per-(label, subspace) mean
    subvectors (one deterministic k-means update step, same convention as
    ``sim_centroid_train``), then every corpus vector is compressed to
    ``PQ_M`` codes by nearest-codeword squared L2. The output IS the
    compressed corpus a billion-row ANN deployment keeps in RAM."""
    from ..operators.similarity import pq_encode, pq_train

    em = load_table(spark, sf_dir, "embeddings")
    # codebook is codes x subspaces rows (tiny) but feeds several plan
    # branches; cache it so training runs once (clearCache between passes,
    # as bench/stress do)
    cb = pq_train(em, PQ_M, label_col="label").cache()
    return pq_encode(em, cb, PQ_M)


def _pq_common_sql() -> str:
    """Shared CTE prefix: quantized vectors, subvector split, codebook
    (floored per-(label, m, pos) means), squared-L2 encoding."""
    m = PQ_M
    d2 = ("CAST(list_sum(list_transform(generate_series(1, len(s.sv)), "
          "i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT)")
    return f"""
q AS ({QVEC_SQL}),
sub AS (
  SELECT q.vec_id, g.m,
         list_slice(q.qv, g.m * (len(q.qv) // {m}) + 1,
                    (g.m + 1) * (len(q.qv) // {m})) AS sv
  FROM q, (SELECT unnest(generate_series(0, {m - 1})) AS m) g
),
cbe AS (
  SELECT e.label AS code, s.m, i.pos,
         CAST(floor(CAST(sum(s.sv[i.pos]) AS DOUBLE) / count(*)) AS BIGINT) AS cv
  FROM sub s
  JOIN embeddings e ON e.vec_id = s.vec_id,
       LATERAL (SELECT unnest(generate_series(1, len(s.sv))) AS pos) i
  GROUP BY e.label, s.m, i.pos
),
cb AS (
  SELECT code, m, list(cv ORDER BY pos) AS cw FROM cbe GROUP BY code, m
),
enc AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {d2} ASC, c.code ASC
           ) AS rn
    FROM sub s JOIN cb c ON s.m = c.m
  ) WHERE rn = 1
)"""


SIM_PQ_ENCODE_SQL = f"""
WITH {_pq_common_sql()}
SELECT vec_id, m, code FROM enc
"""


def q_sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search: the first {N_QUERIES} vectors query
    the PQ-compressed corpus — per-query distance tables against the
    codebook broadcast onto the codes, top-{K} by summed squared L2. The
    oracle replays train -> encode -> ADC exactly."""
    from ..operators.similarity import pq_adc_search, pq_encode, pq_train

    em = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(em, PQ_M, label_col="label").cache()  # see q_sim_pq_encode
    codes = pq_encode(em, cb, PQ_M)
    queries = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return pq_adc_search(queries, codes, cb, k=K, n_sub=PQ_M)


SIM_PQ_ADC_SQL = f"""
WITH {_pq_common_sql()},
dt AS (
  SELECT s.vec_id AS q_id, s.m, c.code,
         CAST(list_sum(list_transform(generate_series(1, len(s.sv)),
              i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT) AS d2
  FROM sub s JOIN cb c ON s.m = c.m
  WHERE s.vec_id < {N_QUERIES}
),
adc AS (
  SELECT dt.q_id, e.vec_id AS neighbor_id, sum(dt.d2) AS adc_d2
  FROM enc e JOIN dt ON e.m = dt.m AND e.code = dt.code
  WHERE e.vec_id != dt.q_id
  GROUP BY dt.q_id, e.vec_id
)
SELECT q_id, neighbor_id, adc_d2, rank FROM (
  SELECT q_id, neighbor_id, CAST(adc_d2 AS BIGINT) AS adc_d2,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY adc_d2 ASC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM adc
) WHERE rank <= {K}
"""


KMEANS_ITER = 2


def q_sim_kmeans2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full iterative k-means, oracle-replayed: {KMEANS_ITER} Lloyd
    iterations from the same {N_CENTROIDS} seed vectors as IVF — assign
    (max cosine, deterministic ties) then floored-integer-mean update,
    empty clusters keeping their centroid — with the FINAL assignment
    checked against a DuckDB oracle that replays the identical trajectory
    CTE by CTE. The iterative-refinement counterpart to the single update
    step ``sim_centroid_train`` pins."""
    from ..operators.similarity import kmeans_lloyd

    em = load_table(spark, sf_dir, "embeddings")
    seeds = em.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return kmeans_lloyd(em, seeds, n_iter=KMEANS_ITER).select(
        "vec_id", "centroid_id", e6("cosine", "cosine_e6")
    )


def _kmeans_oracle_sql(n_iter: int = KMEANS_ITER) -> str:
    """Generate the Lloyd-trajectory oracle: one assign CTE + one
    floored-mean update CTE per iteration, then the final assignment."""

    def cos(qv: str, cv: str) -> str:
        dot = (f"CAST(CAST(list_sum(list_transform(generate_series(1, len({qv})), "
               f"i -> {qv}[i] * {cv}[i])) AS BIGINT) AS DOUBLE)")
        nx = f"CAST(CAST(list_sum(list_transform({qv}, x -> x * x)) AS BIGINT) AS DOUBLE)"
        ny = f"CAST(CAST(list_sum(list_transform({cv}, x -> x * x)) AS BIGINT) AS DOUBLE)"
        return (f"(CASE WHEN {nx} > 0 AND {ny} > 0 THEN "
                f"{dot} / sqrt({nx}) / sqrt({ny}) END)")

    parts = [f"q AS ({QVEC_SQL})",
             f"c0 AS (SELECT vec_id AS centroid_id, qv AS cv FROM q "
             f"WHERE vec_id < {N_CENTROIDS})"]
    for k in range(1, n_iter + 1):
        c = cos("q.qv", "c.cv")
        parts.append(f"""a{k} AS (
  SELECT vec_id, centroid_id, cosine, qv FROM (
    SELECT q.vec_id, c.centroid_id, {c} AS cosine, q.qv AS qv,
           row_number() OVER (
             PARTITION BY q.vec_id ORDER BY {c} DESC, c.centroid_id ASC
           ) AS rn
    FROM q CROSS JOIN c{k - 1} c
  ) WHERE rn = 1
)""")
        parts.append(f"""m{k} AS (
  SELECT centroid_id, list(mv ORDER BY pos) AS nv FROM (
    SELECT a.centroid_id, i.pos,
           CAST(floor(CAST(sum(a.qv[i.pos]) AS DOUBLE) / count(*)) AS BIGINT) AS mv
    FROM a{k} a, LATERAL (SELECT unnest(generate_series(1, len(a.qv))) AS pos) i
    GROUP BY a.centroid_id, i.pos
  ) GROUP BY centroid_id
)""")
        parts.append(f"""c{k} AS (
  SELECT c.centroid_id, coalesce(m.nv, c.cv) AS cv
  FROM c{k - 1} c LEFT JOIN m{k} m ON c.centroid_id = m.centroid_id
)""")
    fc = cos("q.qv", "c.cv")
    joined = ",\n".join(parts)
    return f"""
WITH {joined}
SELECT vec_id, centroid_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_e6 FROM (
  SELECT q.vec_id, c.centroid_id, {fc} AS cosine,
         row_number() OVER (
           PARTITION BY q.vec_id ORDER BY {fc} DESC, c.centroid_id ASC
         ) AS rn
  FROM q CROSS JOIN c{n_iter} c
) WHERE rn = 1
"""



def q_sim_maxdot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MIPS baseline (operators/similarity.maxdot_topk): top-k by
    raw inner product for the first 20 vectors as queries — ranks differ
    from the cosine kNN wherever norms differ, which is the point."""
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return maxdot_topk(queries, em, k=K, q_id="q_id", q_vec="embedding").select(
        "q_id", "neighbor_id", "dot_q12", "rank"
    )


SIM_MAXDOT_SQL = f"""
WITH q AS ({QVEC_SQL}),
p AS (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, len(a.qv)), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dq
  FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id != a.vec_id
),
r AS (
  SELECT q_id, neighbor_id, dq,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY dq DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM p
)
SELECT q_id, neighbor_id, CAST(dq AS BIGINT) AS dot_q12, rank
FROM r WHERE rank <= {K}
"""


MAXDOT_PLANES = 60  # 10 bands of 6 bits
MAXDOT_BAND_BITS = 6


def q_sim_maxdot_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate MIPS at scale (operators/similarity.mips_lsh_search):
    norm-augmentation reduction + the sign-projection band probe — the
    65-coordinate planes are seed-1 literals shared with the oracle.
    Band geometry (10 bands x 6 bits) is sized for the HARDEST case this
    synthetic corpus presents — isotropic gaussian vectors, where top-k
    dot margins are tiny and angular LSH has nothing to grab: measured
    recall 0.47 vs exact MIPS probing ~15% of all pairs at sf0.001
    (pinned by test). Structured real embeddings cluster, which is what
    band probes exploit; the geometry knobs are per-call parameters."""
    from ..operators.similarity import sign_planes

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    planes = sign_planes(MAXDOT_PLANES, EMB_DIM + 1, seed=1)
    return mips_lsh_search(queries, em, k=K, planes=planes,
                           band_bits=MAXDOT_BAND_BITS).select(
        "q_id", "neighbor_id", "dot_q12", "rank"
    )


def _maxdot_lsh_oracle_sql() -> str:
    """Oracle replaying augmentation + banding + integer-dot ranking with
    the SAME 65-dim hyperplane literals."""
    from ..operators.similarity import sign_planes

    planes = sign_planes(MAXDOT_PLANES, EMB_DIM + 1, seed=1)
    dim1 = EMB_DIM + 1

    def bit_exprs():
        return ",\n         ".join(
            "CASE WHEN list_sum(list_transform(generate_series(1, %d), i -> av[i] * ([%s])[i])) >= 0 THEN 1 ELSE 0 END AS bit%d"
            % (dim1, ",".join(str(x) for x in plane), p)
            for p, plane in enumerate(planes)
        )

    n_bands = MAXDOT_PLANES // MAXDOT_BAND_BITS
    sig_exprs = ", ".join(
        " + ".join(f"{1 << j} * bit{b * MAXDOT_BAND_BITS + j}" for j in range(MAXDOT_BAND_BITS))
        + f" AS sig{b}"
        for b in range(n_bands)
    )

    def banded(packed):
        return "\n  UNION ALL\n".join(
            f"  SELECT vec_id, {b} AS band, sig{b} AS sig FROM {packed}"
            for b in range(n_bands)
        )

    return f"""
WITH q AS ({QVEC_SQL}),
m AS (
  SELECT max(list_sum(list_transform(qv, x -> x * x))) AS m2 FROM q
),
caug AS (
  SELECT vec_id,
         list_append(qv, CAST(round(sqrt(CAST(m.m2 - list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))) AS BIGINT)) AS av
  FROM q, m
),
qaug AS (
  SELECT vec_id, list_append(qv, CAST(0 AS BIGINT)) AS av
  FROM q WHERE vec_id < {N_QUERIES}
),
packedc AS (
  SELECT vec_id, {bit_exprs()}
  FROM caug
),
packedq AS (
  SELECT vec_id, {bit_exprs()}
  FROM qaug
),
sigc AS (SELECT vec_id, {sig_exprs} FROM packedc),
sigq AS (SELECT vec_id, {sig_exprs} FROM packedq),
bandc AS (
{banded("sigc")}
),
bandq AS (
{banded("sigq")}
),
cand AS (
  SELECT DISTINCT bq.vec_id AS q_id, bc.vec_id AS neighbor_id
  FROM bandq bq JOIN bandc bc ON bq.band = bc.band AND bq.sig = bc.sig
  WHERE bc.vec_id != bq.vec_id
),
scored AS (
  SELECT cand.q_id, cand.neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, {EMB_DIM}), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dq
  FROM cand
  JOIN q a ON a.vec_id = cand.q_id
  JOIN q b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT q_id, neighbor_id, dq,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY dq DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, CAST(dq AS BIGINT) AS dot_q12, rank
FROM r WHERE rank <= {K}
"""

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def q_sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion: merge the cosine top-k and MIPS top-k
    lists per query with reciprocal-rank fusion — score(d) = sum over
    lists of 1/(60 + rank_list(d)) (Cormack et al. 2009), the standard
    way to combine retrieval signals whose raw scores aren't comparable
    (cosine in [-1,1] vs unbounded inner product). Parity: each RRF term
    is one exact-integer division and the two-term sum is written in a
    fixed order on both engines, so the double is bit-identical; ranking
    uses the UNROUNDED score (ties broken by neighbor_id).

    Scale: composes the two top-k lists (already per-query-bounded, k
    rows each) — the fusion join and re-rank touch k*|queries| rows, not
    the corpus."""
    cos = q_sim_knn(spark, sf_dir).select(
        "q_id", "neighbor_id", F.col("rank").alias("__rc")
    )
    mip = q_sim_maxdot(spark, sf_dir).select(
        "q_id", "neighbor_id", F.col("rank").alias("__rm")
    )
    from pyspark.sql import Window

    fused = cos.join(mip, ["q_id", "neighbor_id"], "full")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("__rc")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("__rm")), F.lit(0.0))
    w = Window.partitionBy("q_id").orderBy(F.desc("__s"), F.asc("neighbor_id"))
    return (
        fused.withColumn("__s", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("q_id", "neighbor_id", e6("__s", "rrf_e6"), "rank")
    )


SIM_RRF_SQL = f"""
WITH cosl AS ({SIM_KNN_SQL}),
mipl AS ({SIM_MAXDOT_SQL}),
u AS (
  SELECT q_id, neighbor_id FROM cosl
  UNION
  SELECT q_id, neighbor_id FROM mipl
),
f AS (
  SELECT u.q_id, u.neighbor_id,
         coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + c.rank), 0)
         + coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + m.rank), 0) AS s
  FROM u
  LEFT JOIN cosl c ON u.q_id = c.q_id AND u.neighbor_id = c.neighbor_id
  LEFT JOIN mipl m ON u.q_id = m.q_id AND u.neighbor_id = m.neighbor_id
),
r AS (
  SELECT q_id, neighbor_id, s,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY s DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM f
)
SELECT q_id, neighbor_id, CAST(round(s * 1e6) AS BIGINT) AS rrf_e6, rank FROM r WHERE rank <= {K}
"""


SPECS = [
    QuerySpec("sim_knn_bruteforce", q_sim_knn, SIM_KNN_SQL, "exact top-k cosine ANN baseline"),
    QuerySpec("sim_rrf_fusion", q_sim_rrf_fusion, SIM_RRF_SQL,
              "reciprocal-rank fusion of cosine and MIPS retrieval lists"),
    QuerySpec("sim_maxdot", q_sim_maxdot, SIM_MAXDOT_SQL, "exact MIPS top-k (raw inner product)"),
    QuerySpec("sim_maxdot_lsh", q_sim_maxdot_lsh, _maxdot_lsh_oracle_sql(),
              "approximate MIPS: norm-augmented sign-LSH probe"),
    QuerySpec("dedup_semantic", q_dedup_semantic, SEMDEDUP_SQL,
              "SemDeDup cluster-then-prune embedding dedup (shuffle on centroid)"),
    QuerySpec("sim_centroid_train", q_sim_centroids, SIM_CENTROID_SQL,
              "per-label mean embedding (IVF k-means update step)"),
    QuerySpec("sim_ivf_assign", q_sim_ivf_assign, SIM_IVF_SQL, "IVF coarse-quantizer assignment"),
    QuerySpec("sim_ivf_search", q_sim_ivf_search, SIM_IVF_SEARCH_SQL,
              "IVF ANN search (nprobe=2)"),
    QuerySpec("sim_lsh_search", q_sim_lsh_search, _lsh_oracle_sql(),
              "sign-projection LSH ANN (2 bands x 8 bits)"),
    QuerySpec("sim_ivf_recall", q_sim_ivf_recall, SIM_IVF_RECALL_SQL,
              "recall@k of IVF ANN vs exact brute force, per query"),
    QuerySpec("sim_pq_encode", q_sim_pq_encode, SIM_PQ_ENCODE_SQL,
              "product-quantization train + encode (compressed corpus)"),
    QuerySpec("sim_pq_adc", q_sim_pq_adc, SIM_PQ_ADC_SQL,
              "PQ asymmetric-distance top-k over the encoded corpus"),
    QuerySpec("sim_kmeans2", q_sim_kmeans2, _kmeans_oracle_sql(),
              "2 full Lloyd k-means iterations, trajectory oracle-replayed"),
]
