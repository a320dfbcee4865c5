"""Same-session interleaved A/B of the round-11 sparse-cosine tokenize
restructure (fold-per-distinct-token vs fold-per-occurrence).

Arm 0 = round-10 shape (word_hashes per occurrence, monkeypatched in);
arm 1 = current operators/dedup.sparse_cosine_pairs. Runs the REAL
text_sparse_cosine query via the module symbol; noop-sink min-of-N,
interleaved, plus output identity at sf0.1 (the gate slice is
sf-independent: doc_id < 1000).

Usage: python tools/r11_cosine_ab.py [--repeats N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def legacy_sparse_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau: float,
    max_df_frac: float = 1.0,
    idf_scale: int = 1000,
) -> DataFrame:
    """Round-10 shape: per-occurrence char fold (word_hashes + explode)."""
    from fink_filters_spark.functions.text import word_hashes
    from fink_filters_spark.operators.dedup import _spread

    toks = _spread(df).select(
        F.col(id_col).alias("__id"), F.explode(word_hashes(text_col)).alias("__w")
    )
    tf = toks.groupBy("__id", "__w").agg(F.count(F.lit(1)).alias("__tf"))
    return _tail(df, id_col, tf, tau, max_df_frac, idf_scale)


def _tail(df, id_col, tf, tau, max_df_frac, idf_scale):
    """Everything downstream of tf — identical in both arms (copied from
    the round-10 operator body so arm 0 is byte-for-byte the old plan)."""
    dfreq = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    n = tf.select(F.count_distinct("__id").alias("__n"))
    wt = (
        tf.join(dfreq, "__w")
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("__df").cast("double")
            <= F.col("__n").cast("double") * F.lit(max_df_frac)
        )
        .select(
            "__id", "__w",
            (
                F.col("__tf")
                * F.round(
                    F.log(F.col("__n").cast("double") / F.col("__df").cast("double"))
                    * idf_scale
                ).cast("long")
            ).alias("__wgt"),
        )
    )
    wgt_cap = 3_000_000_000
    wt = wt.withColumn(
        "__wgt",
        F.when(F.abs(F.col("__wgt")) <= wgt_cap, F.col("__wgt")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("overflow: "), F.col("__wgt").cast("string")
                )
            ).cast("long")
        ),
    )
    wt = wt.cache()
    nrm = wt.groupBy("__id").agg(F.sum(F.col("__wgt") * F.col("__wgt")).alias("__nn"))
    a, b = wt.alias("a"), wt.alias("b")
    joined = a.join(
        b, (F.col("a.__w") == F.col("b.__w")) & (F.col("a.__id") < F.col("b.__id"))
    )
    stats = df.agg(
        F.min(F.col(id_col)).alias("mn"), F.max(F.col(id_col)).alias("mx")
    ).collect()[0]
    if stats["mn"] is not None and stats["mn"] >= 0 and stats["mx"] < 2**31:
        dot = (
            joined.select(
                (
                    F.shiftleft(F.col("a.__id").cast("long"), 32)
                    + F.col("b.__id").cast("long")
                ).alias("__pk"),
                (F.col("a.__wgt") * F.col("b.__wgt")).alias("__p"),
            )
            .groupBy("__pk")
            .agg(F.sum("__p").alias("__dot"))
            .select(
                F.shiftright("__pk", 32).alias("__ida"),
                F.col("__pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("__idb"),
                "__dot",
            )
        )
    else:
        dot = joined.groupBy(
            F.col("a.__id").alias("__ida"), F.col("b.__id").alias("__idb")
        ).agg(F.sum(F.col("a.__wgt") * F.col("b.__wgt")).alias("__dot"))
    na = nrm.select(F.col("__id").alias("__ida"), F.col("__nn").alias("__na"))
    nb = nrm.select(F.col("__id").alias("__idb"), F.col("__nn").alias("__nb"))
    cos = (
        dot.join(na, "__ida")
        .join(nb, "__idb")
        .withColumn(
            "cosine",
            F.when(
                (F.col("__na") > 0) & (F.col("__nb") > 0),
                F.col("__dot").cast("double")
                / F.sqrt(F.col("__na").cast("double"))
                / F.sqrt(F.col("__nb").cast("double")),
            ),
        )
        .filter(F.col("cosine") >= tau)
    )
    return cos.select(
        F.col("__ida").alias("id_a"),
        F.col("__idb").alias("id_b"),
        F.round("cosine", 6).alias("cosine"),
    )


def main() -> None:
    repeats = 3
    for o in sys.argv[1:]:
        if o.startswith("--repeats="):
            repeats = int(o.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fink_filters_spark.operators import dedup as dedupmod
    from fink_filters_spark.queries import queries_dict
    from fink_filters_spark.session import get_session
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    new_impl = dedupmod.sparse_cosine_pairs
    spark = get_session("r11_cosine_ab")
    qs = queries_dict()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    arms = {0: legacy_sparse_cosine_pairs, 1: new_impl}
    best: dict[int, float] = {}
    for r in range(repeats):
        for i, impl in arms.items():
            dedupmod.sparse_cosine_pairs = impl
            spark.sparkContext.setJobDescription(f"cos_ab:arm{i}:r{r}")
            t0 = time.perf_counter()
            qs["text_sparse_cosine"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            best[i] = min(best.get(i, 1e9), dt)
            spark.catalog.clearCache()
    for i, v in sorted(best.items()):
        print(json.dumps({"q": "text_sparse_cosine", "arm": i, "min_sec": v}))

    outs = []
    for i, impl in arms.items():
        dedupmod.sparse_cosine_pairs = impl
        rows = sorted(
            map(tuple, qs["text_sparse_cosine"](spark, sf_dir).collect())
        )
        outs.append(rows)
        spark.catalog.clearCache()
    dedupmod.sparse_cosine_pairs = new_impl
    print(json.dumps({"identical": outs[0] == outs[1], "rows": len(outs[0])}))
    spark.stop()


if __name__ == "__main__":
    main()
