"""Quickstart: the full alert-broker lifecycle on this engine.

Mirrors what a fink-filters user does today (SURVEY §3.1), Spark-first:

    stream -> enrich (classification + crossmatch) -> topic filters -> sinks

Run: python examples/quickstart.py   (uses a synthetic alert batch; the same
pipeline runs unchanged under readStream — see StreamPipeline below).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> None:
    from conftest import make_ztf_pdf

    from fink_filters_spark.filters import apply_named_filter, filter_catalog
    from fink_filters_spark.filters.classification import extract_fink_classification
    from fink_filters_spark.session import get_session
    from fink_filters_spark.sinks import CollectingTransport, NotificationSink
    from fink_filters_spark.streaming import StreamPipeline

    spark = get_session("quickstart", cpus=4)

    # ---- 1. a micro-batch of alerts (stand-in for the Kafka source) --------
    alerts = spark.createDataFrame(make_ztf_pdf(300))
    print(f"alerts: {alerts.count()} rows, {len(alerts.columns)} columns")

    # ---- 2. enrich: multi-way classification (K1) --------------------------
    enriched = extract_fink_classification(alerts)
    enriched.groupBy("fink_class").count().orderBy("count", ascending=False).show(8)

    # ---- 3. topic filters from the registry (A1 parity) --------------------
    print(f"{len(filter_catalog())} registered topics; applying a few:")
    for topic in ["ztf.sn_candidates", "ztf.kn_candidates", "ztf.quality_cuts"]:
        print(f"  {topic}: {apply_named_filter(enriched, topic).count()} selected")

    # ---- 4. the same thing as a STREAM with a notification sink ------------
    with tempfile.TemporaryDirectory() as d:
        pdf = make_ztf_pdf(300).drop(columns=["mangrove", "blazar_stats"])
        pdf.to_parquet(f"{d}/batch.parquet")
        schema = spark.read.parquet(d).schema
        stream = spark.readStream.schema(schema).parquet(d)

        transport = CollectingTransport()
        sink = NotificationSink(
            transport,
            formatter=lambda row: {"objectId": row["objectId"], "mag": row["magpsf"]},
            key_cols=("candid",),
        )
        query = (
            StreamPipeline(stream)
            .topic("ztf.sn_candidates")
            .sink(sink)
            .start(checkpoint=f"{d}/ck", once=True)
        )
        query.awaitTermination(120)
        print(f"stream delivered {len(transport.sent)} notifications, e.g. "
              f"{transport.sent[0] if transport.sent else '(none)'}")

    spark.stop()


if __name__ == "__main__":
    main()
