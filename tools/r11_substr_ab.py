"""Core-seconds A/B of the round-10 shared gram exchange in _span_flags
(VERDICT r10 item #8: pin the wall-vs-core-seconds trade with stage
metrics, not wall alone).

Arm 0 = legacy round-9 shape (dup-flag aggregate over its own partial-agg
subtree + join back — nothing shared, the Arrow gram kernel runs once per
branch); arm 1 = current shape (one explicit repartition("__g") consumed
by both the aggregate and the probe). Runs dedup_substring and
dedup_substring_rewrite with the Spark UI on; per run reports wall AND the
sum of executorRunTime over the run's new stages (core-seconds — the
cluster-utilization cost a wall number hides at 32 local threads).

Usage: python tools/r11_substr_ab.py [--repeats N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def legacy_span_flags(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    from fink_filters_spark.operators.dedup import _positional_grams

    spans = _positional_grams(df, id_col, text_col, n)
    dup_grams = spans.groupBy("__g").agg(
        (F.count_distinct("__id") >= 2).alias("__dup")
    )
    return spans.join(dup_grams, "__g").select("__id", "__pos", "__dup")


def main() -> None:
    repeats = 3
    for o in sys.argv[1:]:
        if o.startswith("--repeats="):
            repeats = int(o.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from fink_filters_spark.operators import dedup as dedupmod
    from fink_filters_spark.queries import queries_dict
    from fink_filters_spark.session import DYNAMIC_CONF, apply_dynamic_conf
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    builder = (
        SparkSession.builder.appName("r11_substr_ab")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4098")
    )
    for k, v in DYNAMIC_CONF.items():
        builder = builder.config(k, v)
    spark = apply_dynamic_conf(builder.getOrCreate())

    qs = queries_dict()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    def stages():
        app = json.load(
            urllib.request.urlopen("http://localhost:4098/api/v1/applications")
        )[0]["id"]
        return json.load(
            urllib.request.urlopen(
                f"http://localhost:4098/api/v1/applications/{app}/stages?status=complete"
            )
        )

    current = dedupmod._span_flags
    arms = {0: legacy_span_flags, 1: current}
    names = ["dedup_substring", "dedup_substring_rewrite"]
    best: dict[tuple[str, int], tuple[float, float]] = {}
    for r in range(repeats):
        for name in names:
            for i, impl in arms.items():
                dedupmod._span_flags = impl
                seen = {s["stageId"] for s in stages()}
                spark.sparkContext.setJobDescription(f"substr_ab:{name}:arm{i}:r{r}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall = round(time.perf_counter() - t0, 3)
                spark.catalog.clearCache()
                new = [s for s in stages() if s["stageId"] not in seen]
                cores = round(
                    sum(s.get("executorRunTime") or 0 for s in new) / 1000, 2
                )
                key = (name, i)
                if key not in best or wall < best[key][0]:
                    best[key] = (wall, cores)
    dedupmod._span_flags = current
    for (name, i), (wall, cores) in sorted(best.items()):
        print(json.dumps({"q": name, "arm": i, "min_wall": wall,
                          "core_sec_at_min_wall": cores}))

    for name in names:
        outs = []
        for i, impl in arms.items():
            dedupmod._span_flags = impl
            rows = sorted(
                map(tuple, qs[name](spark, "/root/testdata/sf0.01").collect())
            )
            outs.append(rows)
            spark.catalog.clearCache()
        print(json.dumps({"q": name, "identical": outs[0] == outs[1],
                          "rows": len(outs[0])}))
    dedupmod._span_flags = current
    spark.stop()


if __name__ == "__main__":
    main()
