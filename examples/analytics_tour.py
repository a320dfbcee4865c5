"""Tour of the round-3 analytics surface on the synthetic tables.

Run: python examples/analytics_tour.py  [sf_dir]

Shows, end to end on one SparkSession:
- funnel conversion (stacked windows, one shuffle)
- count-min sketch heavy hitters beside exact counts
- daily gap-fill resampling with forward fill
- cumulative distinct users (scalable first-seen form)
- MERGE upsert of a simulated update batch
- ANN recall@k of IVF vs brute force
- the custom REST DataSource (one task per page)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from fink_filters_spark.queries.advanced import (
        agg_cms_topk,
        q_upsert_merge,
        w_funnel_stages,
    )
    from fink_filters_spark.queries.similarity import q_sim_ivf_recall
    from fink_filters_spark.queries.timeseries import (
        ts_gapfill_daily,
        w_cum_distinct_users,
    )
    from fink_filters_spark.session import get_session
    from fink_filters_spark.sources.rest_datasource import register

    spark = get_session("analytics-tour", cpus=4)

    f = w_funnel_stages(spark, SF_DIR).first()
    print(
        f"funnel: {f.n_users} users -> {f.n_view} viewed -> "
        f"{f.n_click} clicked -> {f.n_purchase} purchased"
    )

    print("count-min sketch top-5 (exact vs estimate):")
    for r in agg_cms_topk(spark, SF_DIR).orderBy("n_exact", ascending=False).take(5):
        print(f"  user {r.user_id}: exact={r.n_exact} cms={r.n_cms}")

    gf = ts_gapfill_daily(spark, SF_DIR)
    filled = gf.filter("filled").count()
    print(f"gap-fill: {gf.count()} grid days, {filled} forward-filled")

    cd = w_cum_distinct_users(spark, SF_DIR)
    last = cd.orderBy("event_type", "day").groupBy("event_type").agg(
        {"n_cum_users": "max"}
    )
    print("cumulative distinct users (final):")
    for r in last.collect():
        print(f"  {r[0]}: {r[1]}")

    up = {r.o_orderstatus: r.n_orders for r in q_upsert_merge(spark, SF_DIR).collect()}
    print(f"upsert-merged order status counts: {up}")

    rec = q_sim_ivf_recall(spark, SF_DIR)
    mean_recall = rec.agg({"recall_ppm": "avg"}).first()[0] / 1e6
    print(f"IVF ANN mean recall@5 vs brute force: {mean_recall:.2f}")

    register(spark)
    pages = spark.read.format("rest_snapshot").option("pages", "2").load()
    print(f"REST DataSource: {pages.count()} rows across "
          f"{pages.rdd.getNumPartitions()} page-partitions")
    spark.stop()


if __name__ == "__main__":
    main()
