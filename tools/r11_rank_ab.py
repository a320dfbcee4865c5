"""Same-session interleaved A/B of the round-11 grid_rank fuse.

Arm 0 = legacy shape (separate counts aggregate off the source);
arm 1 = current operators/rank.grid_rank (counts derived from the window
output, sharing its exchange). Both arms run the REAL queries
(w_ntile_deciles, pipe_shard_balance) by monkeypatching the symbol the
query modules imported; noop-sink min-of-N per arm, interleaved.

Usage: python tools/r11_rank_ab.py [--repeats N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, Window, functions as F  # noqa: E402


def legacy_grid_rank(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    *,
    rank_col: str = "rank",
    descending: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Round-10 shape: counts aggregated straight off the source."""
    order = [F.col(value_col).desc()] if descending else [F.col(value_col).asc()]
    counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__c"))
    cw = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    offs_cols = [
        F.col(value_col).alias("__v"),
        F.coalesce(F.sum("__c").over(cw), F.lit(0)).alias("__lo"),
    ]
    if total_col is not None:
        tw = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offs_cols.append(F.sum("__c").over(tw).alias(total_col))
    offs = counts.select(*offs_cols)
    ww = Window.partitionBy(value_col).orderBy(*[F.col(c).asc() for c in tie_cols])
    return (
        df.withColumn("__rn", F.row_number().over(ww))
        .join(F.broadcast(offs), F.col(value_col).eqNullSafe(F.col("__v")))
        .withColumn(rank_col, (F.col("__lo") + F.col("__rn")).cast("long"))
        .drop("__v", "__lo", "__rn")
    )


def main() -> None:
    repeats = 3
    for o in sys.argv[1:]:
        if o.startswith("--repeats="):
            repeats = int(o.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fink_filters_spark.operators import rank as rankmod
    from fink_filters_spark.queries import analytic, layout, queries_dict
    from fink_filters_spark.session import get_session
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    new_grid_rank = rankmod.grid_rank
    spark = get_session("r11_rank_ab")
    qs = queries_dict()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    names = ["w_ntile_deciles", "pipe_shard_balance"]
    arms = {0: legacy_grid_rank, 1: new_grid_rank}
    best: dict[tuple[str, int], float] = {}
    for r in range(repeats):
        for name in names:
            for i, impl in arms.items():
                analytic.grid_rank = impl
                layout.grid_rank = impl
                spark.sparkContext.setJobDescription(f"rank_ab:{name}:arm{i}:r{r}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                key = (name, i)
                best[key] = min(best.get(key, 1e9), dt)
                spark.catalog.clearCache()
    for (name, i), v in sorted(best.items()):
        print(json.dumps({"q": name, "arm": i, "min_sec": v}))

    # output-identity check on both queries, both arms, sf0.01
    for name in names:
        outs = []
        for i, impl in arms.items():
            analytic.grid_rank = impl
            layout.grid_rank = impl
            rows = sorted(
                map(tuple, qs[name](spark, "/root/testdata/sf0.01").collect())
            )
            outs.append(rows)
        print(json.dumps({"q": name, "identical": outs[0] == outs[1],
                          "rows": len(outs[0])}))
    spark.stop()


if __name__ == "__main__":
    main()
