"""Same-session A/B of the round-10 NARROW band-probe rewrite of
lsh_search / mips_lsh_search vs the previous WIDE shape, at a synthetic
corpus scale where the band shuffle dominates (the packaged embeddings
table is 2k rows — per-job fixed overhead hides any join-shape delta
there, which is why round 10 deferred this rewrite until it could be
measured honestly).

Corpus: N deterministic 64-dim vectors built from pure column expressions
(hash-folded, no RNG state), written once to parquet so both arms scan the
same file. The WIDE arm reconstructs the exact pre-rewrite join inline
(vectors + norms through the band join and the (q,c) dedup) on top of the
same _band_signatures_arrow kernel; the NARROW arm is the shipped
operators. Outputs are asserted identical (sorted collect) before timing.

Run: python tools/r10_sim_scale_ab.py [N_CORPUS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from fink_filters_spark.session import get_session
from fink_filters_spark.operators.similarity import (
    _band_signatures_arrow,
    _cos,
    _quantized,
    _topk_by_dot,
    lsh_search,
    mips_lsh_search,
    sign_planes,
)
from fink_filters_spark.functions.vectors import dot_q, norm_sq_q, quantize_vec
from pyspark.sql import Window

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
N_QUERIES = 50
K = 5
DIM = 64
REPEATS = 3


def corpus_df(spark) -> DataFrame:
    # deterministic pseudo-vectors: component j of row i =
    # ((hash(i*DIM + j) mod 2_000_001) - 1_000_000) / 1e6  in [-1, 1]
    return (
        spark.range(N)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: (
                    (F.pmod(F.xxhash64(F.col("id") * DIM + j), F.lit(2_000_001))
                     - F.lit(1_000_000)).cast("double")
                    / F.lit(1_000_000.0)
                ),
            ).alias("embedding"),
        )
    )


def wide_lsh(queries, corpus, k, planes, band_bits):
    """The pre-rewrite (round-9) lsh_search arrow shape, verbatim."""
    q = _band_signatures_arrow(queries, "q_id", "embedding", planes, band_bits,
                               "__qid", "__qv", "__qn")
    c = _band_signatures_arrow(corpus, "vec_id", "embedding", planes, band_bits,
                               "__cid", "__cv", "__cn")
    cand = (
        c.join(q, ["band", "sig"])
        .filter(F.col("__qid") != F.col("__cid"))
        .select("__qid", "__qv", "__qn", "__cid", "__cv", "__cn")
        .dropDuplicates(["__qid", "__cid"])
    )
    pairs = cand.select(
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


def wide_mips(queries, corpus, k, planes, band_bits):
    """The pre-rewrite (round-9) mips_lsh_search shape, verbatim."""
    dim = len(planes[0]) - 1
    c = corpus.select(F.col("vec_id").alias("__cid0"), F.col("embedding").alias("__cv0"))
    m2 = c.groupBy().agg(
        F.max(norm_sq_q(quantize_vec("__cv0")).cast("long")).alias("__m2s")
    )
    c_aug = c.crossJoin(F.broadcast(m2))
    sc = _band_signatures_arrow(c_aug, "__cid0", "__cv0", planes, band_bits,
                                "__cid", "__cv", "__cn", aug_m2_col="__m2s")
    sq = _band_signatures_arrow(
        queries, "q_id", "embedding", [p[:dim] for p in planes], band_bits,
        "__qid", "__qv", "__qn",
    )
    cand = (
        sc.join(sq, ["band", "sig"])
        .filter(F.col("__qid") != F.col("__cid"))
        .select("__qid", "__qv", "__cid", "__cv")
        .dropDuplicates(["__qid", "__cid"])
    )
    pairs = cand.select(
        F.col("__qid").alias("q_id"),
        F.col("__cid").alias("neighbor_id"),
        dot_q(F.col("__qv"), F.col("__cv")).alias("__dq"),
    )
    return _topk_by_dot(pairs, k)


def time_arm(label: str, fn, spark) -> float:
    best = None
    for r in range(REPEATS):
        spark.sparkContext.setJobDescription(f"{label} run {r}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"#   {label} run {r}: {dt:.3f}s", file=sys.stderr)
    return best


def main() -> None:
    spark = get_session("r10_sim_scale_ab")
    path = f"/tmp/r10_simcorpus_{N}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        corpus_df(spark).repartition(32).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    lsh_planes = sign_planes(16, DIM, seed=0)
    mips_planes = sign_planes(60, DIM + 1, seed=1)

    arms = {
        "lsh_wide": lambda: wide_lsh(queries, corpus, K, lsh_planes, 8),
        "lsh_narrow": lambda: lsh_search(queries, corpus, K, lsh_planes,
                                         band_bits=8, q_id="q_id"),
        "mips_wide": lambda: wide_mips(queries, corpus, K, mips_planes, 6),
        "mips_narrow": lambda: mips_lsh_search(queries, corpus, K, mips_planes,
                                               band_bits=6, q_id="q_id"),
    }

    # equivalence first (sorted collect; rounded cols are part of output)
    for fam in ("lsh", "mips"):
        a = sorted(map(tuple, arms[f"{fam}_wide"]().collect()))
        b = sorted(map(tuple, arms[f"{fam}_narrow"]().collect()))
        assert a == b, f"{fam}: wide/narrow outputs differ ({len(a)} vs {len(b)} rows)"
        print(f"# {fam}: outputs identical ({len(a)} rows)", file=sys.stderr)

    # interleaved min-of-N, both orders within each repeat block
    results = {}
    for name in ("lsh_wide", "lsh_narrow", "mips_wide", "mips_narrow"):
        results[name] = time_arm(name, arms[name], spark)
    print(f"\n== N={N} corpus, {N_QUERIES} queries, k={K}, min-of-{REPEATS} noop ==")
    for fam in ("lsh", "mips"):
        w, n = results[f"{fam}_wide"], results[f"{fam}_narrow"]
        print(f"{fam}: wide {w:.3f}s -> narrow {n:.3f}s ({w / n:.2f}x)")


if __name__ == "__main__":
    main()
