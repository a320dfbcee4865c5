"""Per-stage profile of one or more declared queries (guide §7.1 without
a live UI): runs each query against the noop sink with the Spark UI
enabled, then reads the UI REST API for stage-level wall/shuffle/input
metrics, printing the top stages by duration.

Usage: python tools/r10_profile.py <query> [query ...] [--sf=DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for o in sys.argv[1:]:
        if o.startswith("--sf="):
            sf_dir = o.split("=", 1)[1]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from fink_filters_spark.session import DYNAMIC_CONF, apply_dynamic_conf
    from fink_filters_spark.queries import queries_dict
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    builder = (
        SparkSession.builder.appName("r10_profile")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
    )
    for k, v in DYNAMIC_CONF.items():
        builder = builder.config(k, v)
    spark = apply_dynamic_conf(builder.getOrCreate())

    qs = queries_dict()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    def stages() -> list[dict]:
        app = json.load(
            urllib.request.urlopen("http://localhost:4099/api/v1/applications")
        )[0]["id"]
        return json.load(
            urllib.request.urlopen(
                f"http://localhost:4099/api/v1/applications/{app}/stages?status=complete"
            )
        )

    for name in names:
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages ===")
        tot_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"    executorRunTime total {tot_run/1000:.2f}s (core-seconds)")
        for s in new[:14]:
            dur = (s.get("executorRunTime") or 0) / 1000
            sub = (
                f"submit->done "
                f"{(s.get('numCompleteTasks') or s.get('numTasks') or 0)}t"
            )
            print(
                f"  run={dur:6.2f}s tasks={s.get('numTasks'):>3} "
                f"in={s.get('inputBytes', 0)/1e6:7.1f}MB "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:7.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB  "
                f"{(s.get('name') or '')[:110]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
