"""Round-11 optimization measurement harness.

For each named query: capture ``.explain('formatted')`` to
``plans/r10/<query>_<tag>.txt`` and time the computation with the noop
sink (guide §1.4 — eager, computes every column, no count() pruning and
no collect), min-of-N within ONE session (the variance protocol this
host requires: identical code draws +-40% across sessions, so only
same-session comparisons are meaningful).

Usage:
    python tools/r11_measure.py <tag> [--sf DIR] [--repeats N] [--plans-only]
        [query ...]
If no query names are given, times the full declared surface (no plan
files — 185 plans is noise; name queries explicitly to capture plans).
Prints one JSON line per query to stdout: {"q": name, "sec": best, "tag": tag}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    tag = args[0]
    names = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    repeats = 2
    plans_only = "--plans-only" in opts
    for o in opts:
        if o.startswith("--sf="):
            sf_dir = o.split("=", 1)[1]
        if o.startswith("--repeats="):
            repeats = int(o.split("=", 1)[1])

    from fink_filters_spark.queries import queries_dict
    from fink_filters_spark.session import get_session
    from fink_filters_spark.tables import TABLE_NAMES, load_table

    spark = get_session("r11_measure")
    qs = queries_dict()
    targets = names or list(qs)

    # warm-up (same as bench.py): parquet footers + python workers
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r11")
    os.makedirs(outdir, exist_ok=True)

    results = {}
    for name in targets:
        fn = qs[name]
        if names:  # capture plans only for explicitly named queries
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        if plans_only:
            continue
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"r11:{tag}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        results[name] = best
        print(json.dumps({"q": name, "sec": best, "tag": tag}), flush=True)
    if results:
        print(json.dumps({"tag": tag, "total": round(sum(results.values()), 3),
                          "n": len(results)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
