"""Same-session A/B of session-settable confs over named queries.

Usage: python tools/r10_conf_ab.py "k=v,k=v|k=v,k=v" q1 q2 ...
Each '|'-separated conf set is applied (spark.conf.set) and every named
query timed with the noop sink, interleaved A,B,A,B per query so host
drift hits both arms equally. Prints one JSON line per (query, arm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    arms = []
    for spec in sys.argv[1].split("|"):
        confs = {}
        for kv in spec.split(","):
            if kv.strip():
                k, v = kv.split("=", 1)
                confs[k.strip()] = v.strip()
        arms.append(confs)
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fink_filters_spark.queries import queries_dict
    from fink_filters_spark.session import get_session
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    spark = get_session("r10_conf_ab")
    qs = queries_dict()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    best: dict[tuple[str, int], float] = {}
    for r in range(rounds):
        for name in names:
            for i, confs in enumerate(arms):
                for k, v in confs.items():
                    spark.conf.set(k, v)
                spark.sparkContext.setJobDescription(f"ab:{name}:arm{i}:r{r}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                key = (name, i)
                best[key] = min(best.get(key, 1e9), dt)
                spark.catalog.clearCache()
    for (name, i), v in sorted(best.items()):
        print(json.dumps({"q": name, "arm": i, "confs": arms[i], "min_sec": v}))


if __name__ == "__main__":
    main()
