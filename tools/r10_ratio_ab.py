"""Same-session A/B of the round-10 tau size-ratio co-posting prefilter
(operators/dedup._cooccurrence min_size_ratio) at the 100x stress scale,
where the Σ df(s)² co-occurrence aggregate dominates the exact-pair family.

Arms (both built from the SAME operator code, one parameter apart —
min_size_ratio=None IS the pre-round-10 plan):
  jac_off / jac_on    — jaccard_pairs tail replicated on _cooccurrence
  comp_off / comp_on  — dedup_components body (pairs -> connected_components)

Outputs asserted identical before timing. Run AFTER tools/stress_docs100.py
build (or any run that left .stress_docs100 complete).

Run: python tools/r10_ratio_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fink_filters_spark.session import get_session
from fink_filters_spark.tables import load_table
from fink_filters_spark.operators.dedup import _cooccurrence, connected_components

TAU = 0.5
REPEATS = 3
DST = sys.argv[1] if len(sys.argv) > 1 else ".stress_docs100"


def pairs_df(spark, ratio):
    docs = load_table(spark, DST, "documents")
    grp, co, kept = _cooccurrence(
        docs, "doc_id", "text", 3, max_df_frac=None, collapse="auto",
        min_size_ratio=ratio,
    )
    assert grp is None, "stress corpus has no duplicate texts; collapse must skip"
    return (
        co.withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= TAU)
        .select(
            F.col("__ra").alias("id_a"),
            F.col("__rb").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def comp_df(spark, ratio):
    docs = load_table(spark, DST, "documents")
    comp = connected_components(pairs_df(spark, ratio))
    return (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.node, "left")
        .select("doc_id", F.coalesce("component", F.col("doc_id")).alias("component"))
    )


def main() -> None:
    spark = get_session("r10_ratio_ab")
    spark.sparkContext.setCheckpointDir(f"{DST}/_ckpt")

    # equivalence at this scale (pair multiset; cheap to collect — few pairs)
    a = sorted(map(tuple, pairs_df(spark, None).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, pairs_df(spark, TAU).collect()))
    spark.catalog.clearCache()
    assert a == b, f"pair sets differ: {len(a)} vs {len(b)}"
    print(f"# pairs identical at 100x: {len(a)} rows", file=sys.stderr)

    arms = {
        "jac_off": lambda: pairs_df(spark, None),
        "jac_on": lambda: pairs_df(spark, TAU),
        "comp_off": lambda: comp_df(spark, None),
        "comp_on": lambda: comp_df(spark, TAU),
    }
    results = {}
    for name, fn in arms.items():
        best = None
        for r in range(REPEATS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"#   {name} run {r}: {dt:.3f}s", file=sys.stderr)
        results[name] = best
    print(f"\n== {DST}, tau={TAU}, min-of-{REPEATS} noop ==")
    for fam in ("jac", "comp"):
        off, on = results[f"{fam}_off"], results[f"{fam}_on"]
        print(f"{fam}: ratio-off {off:.3f}s -> ratio-on {on:.3f}s ({off / on:.2f}x)")


if __name__ == "__main__":
    main()
