"""Deduplication operators for large-scale training-data pipelines.

Five families, all native Catalyst expressions (no Python in the hot path):

- exact        — normalize + hash-groupBy; one shuffle on the text hash.
- n-gram Jaccard — exact set similarity over word n-gram shingles via an
  inverted-index join (shingle -> postings), NOT an all-pairs cross join:
  pairs are generated only for docs sharing >=1 shingle, then Jaccard is
  |∩| / (|A|+|B|-|∩|) from the co-occurrence count. This is the
  scale-correct exact path (shuffle keyed by shingle; AQE splits skewed
  postings).
- MinHash + LSH — signature = min over shingle hashes of (a·h+b) mod P for
  H fixed (a,b) pairs; band keys of r rows; candidate pairs via equi-join on
  band key; verified against exact Jaccard. Integer-only math so the DuckDB
  oracle reproduces it bit-for-bit.
- SimHash      — 48-bit fingerprint from word hashes; near-dup = Hamming
  distance <= k. Candidates via 4x12-bit band join: Hamming<=3 guarantees
  >=1 identical band (pigeonhole), so the band join is lossless vs the
  cross join.
- embedding cosine — quantized-integer cosine over an array<float> column
  (see functions/vectors.py); exact all-pairs here, LSH/IVF variants in
  operators/similarity.py for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import FP_MOD, shingle_hash, word_shingles
from ..functions.vectors import cosine_sim_q, quantize_vec

# Fixed MinHash permutation parameters (a odd, < 2^26; b < 2^26).
# H=16 hash functions, banded r=2 x b=8 (catches Jaccard>=0.5 with p~0.9,
# >=0.9 with p~0.9999).
MINHASH_AB: list[tuple[int, int]] = [
    (40503559, 23411011), (61201223, 9182477), (33550337, 51328141),
    (54018521, 2873599), (22801763, 44930087), (17624813, 60752743),
    (48271349, 13597331), (28644091, 35082101), (65011493, 7776901),
    (36700159, 58102393), (12890393, 27244159), (59604643, 4485277),
    (20132659, 63167743), (44739241, 16777213), (31622777, 39916801),
    (57885161, 11184811),
]
MINHASH_BANDS = 8
MINHASH_ROWS = 2  # per band

SIMHASH_BITS = 48
SIMHASH_BAND_BITS = 12  # 4 bands -> lossless for Hamming <= 3


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized text: survivor = min id per group.

    Reference precedent: ``dropDuplicates`` / ``drop_duplicates(['objectId'])``
    (``ztf/filter_anomaly_notification/filter.py:182``), made deterministic
    (min-id survivor instead of arbitrary first row).
    """
    norm = F.lower(F.trim(F.col(text_col)))
    return df.groupBy(norm.alias("__norm")).agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_dups"),
    ).drop("__norm").select("survivor_id", "n_dups")


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"), word_shingles(text_col, n).alias("__sh")
    ).filter(F.size("__sh") > 0)


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, tau: float = 0.5
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= tau)
    via inverted-index join."""
    sh = _shingled(df, id_col, text_col, n)
    sizes = sh.select("__id", F.size("__sh").alias("__n"))
    postings = sh.select("__id", F.explode("__sh").alias("__s"))
    a, b = postings.alias("a"), postings.alias("b")
    co = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    jac = (
        co.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
        )
    )
    return jac.filter(F.col("jaccard") >= tau).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_signature(sh_col: Column) -> list[Column]:
    """16 minhash values over a hashed-shingle array column (integer math)."""
    hashes = shingle_hash(sh_col)

    def _perm(a: int, b: int):
        return lambda h: (h * a + b) % FP_MOD

    return [F.array_min(F.transform(hashes, _perm(a, b))) for a, b in MINHASH_AB]


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, tau: float = 0.5
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Returns (id_a < id_b, jaccard) for candidate pairs sharing >=1 LSH band
    whose true Jaccard >= tau. Semantics are the *algorithm* (candidates may
    miss sub-threshold-probability pairs); the exact operator is
    ``jaccard_pairs``.
    """
    sh = _shingled(df, id_col, text_col, n)
    sig = sh.select("__id", "__sh", *[m.alias(f"m{i}") for i, m in enumerate(minhash_signature(F.col("__sh")))])
    band_cols = []
    for j in range(MINHASH_BANDS):
        parts = [F.col(f"m{j * MINHASH_ROWS + r}").cast("string") for r in range(MINHASH_ROWS)]
        band_cols.append(F.concat_ws("_", F.lit(str(j)), *parts))
    bands = sig.select("__id", F.explode(F.array(*band_cols)).alias("__bk"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.__bk") == F.col("b.__bk")) & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    sh_a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    sh_b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("__inter", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.size("__sha") + F.size("__shb") - F.col("__inter")).cast("double"),
        )
    )
    return verified.filter(F.col("jaccard") >= tau).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def simhash(text_col: str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint from distinct word hashes (unit weights).

    bit_j = 1  iff  2 * |{w : hash(w) has bit j set}| > |words|.
    """
    words = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    hashes = shingle_hash(words)
    nwords = F.size(hashes).cast("long")

    def _bit_fold(j: int):
        return lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1))

    out = F.lit(0).cast("long")
    for j in range(bits):
        bitsum = F.aggregate(hashes, F.lit(0).cast("long"), _bit_fold(j))
        out = out + F.when(bitsum * 2 > nwords, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidates via 4 x 12-bit band equi-join (lossless for Hamming <= 3:
    3 differing bits cannot touch all 4 bands), then exact popcount verify.
    """
    sh = df.select(F.col(id_col).alias("__id"), simhash(text_col).alias("__sim"))
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    band_cols = [
        F.concat_ws(
            "_",
            F.lit(str(j)),
            F.shiftright(F.col("__sim"), j * SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .cast("string"),
        )
        for j in range(n_bands)
    ]
    bands = sh.select("__id", "__sim", F.explode(F.array(*band_cols)).alias("__bk"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.__bk") == F.col("b.__bk")) & (F.col("a.__id") < F.col("b.__id")))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sim").alias("__sa"),
            F.col("b.__sim").alias("__sb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))))
    )
    return cand.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def embedding_pairs(df: DataFrame, id_col: str, vec_col: str, tau: float) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cosine >= tau).

    All-pairs with quantized-integer cosine; correct-but-quadratic — the
    sub-quadratic path is operators/similarity.py (IVF / sign-LSH blocking).
    """
    q = df.select(F.col(id_col).alias("__id"), quantize_vec(vec_col).alias("__q"))
    a, b = q.alias("a"), q.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine_sim_q(F.col("a.__q"), F.col("b.__q")).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= tau).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )
