"""Same-session interleaved A/B of the round-11 streaming no-data-batch skip.

Arm 0 = round-10 behavior (trailing no-data micro-batch forced ON for every
query, via a wrapper over queries.streamq._run_to_memory); arm 1 = current
code (unwatermarked queries skip it; stream_hourly_append keeps it).
Wall-clock per query, min-of-N interleaved, plus an output-identity check.

Usage: python tools/r11_stream_ab.py [--repeats N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = 3
    for o in sys.argv[1:]:
        if o.startswith("--repeats="):
            repeats = int(o.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fink_filters_spark.queries import streamq
    from fink_filters_spark.session import get_session
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    current = streamq._run_to_memory

    def forced_on(out, name, mode, partitions=8, no_data_batch=True):
        return current(out, name, mode, partitions=partitions, no_data_batch=True)

    spark = get_session("r11_stream_ab")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    names = [
        "stream_hourly_stats",
        "stream_distinct_keys",
        "stream_sliding_stats",
        "stream_session_stats",
        "stream_chunk_dedup",
        "stream_hourly_append",
    ]
    qs = {s.name: s.spark for s in streamq.SPECS}
    arms = {0: forced_on, 1: current}
    best: dict[tuple[str, int], float] = {}
    for r in range(repeats):
        for name in names:
            for i, impl in arms.items():
                streamq._run_to_memory = impl
                spark.sparkContext.setJobDescription(f"stream_ab:{name}:arm{i}:r{r}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                key = (name, i)
                best[key] = min(best.get(key, 1e9), dt)
    streamq._run_to_memory = current
    for (name, i), v in sorted(best.items()):
        print(json.dumps({"q": name, "arm": i, "min_sec": v}))

    for name in names:
        outs = []
        for i, impl in arms.items():
            streamq._run_to_memory = impl
            rows = sorted(map(tuple, qs[name](spark, "/root/testdata/sf0.01").collect()))
            outs.append(rows)
        print(json.dumps({"q": name, "identical": outs[0] == outs[1],
                          "rows": len(outs[0])}))
    streamq._run_to_memory = current
    spark.stop()


if __name__ == "__main__":
    main()
