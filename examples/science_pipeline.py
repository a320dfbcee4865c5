"""Science-kernel tour (round 4): the dependency-free astronomy surface.

Run: python examples/science_pipeline.py  [sf_dir]

Shows, end to end on one SparkSession:
- gzipped-FITS cutout decode -> sigma-clip -> KS statistics -> hostless topic
  (pure-numpy codec; the reference needs astropy + fink-science for this)
- per-key Rainbow-shape sigmoid fit (Levenberg-Marquardt, grouped Arrow
  kernel) and the full fit -> Monte-Carlo -> classifier scoring loop with a
  broadcast XGBoost-format model (UBJSON reader; no xgboost wheel)
- exact Roman-1987 constellation determination (native-Column precession)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.operators.constellation import constellation_exact
    from fink_filters_spark.operators.fits import write_fits
    from fink_filters_spark.operators.fit import rainbow_mc_score_per_key
    from fink_filters_spark.operators.multimodal import stamp_kstest
    from fink_filters_spark.queries.extras import _DEMO_TDE_MODEL
    from fink_filters_spark.operators.xgb_ubj import XGBEnsemble
    from fink_filters_spark.session import get_session
    from fink_filters_spark.tables import load_events

    spark = get_session("science-pipeline", cpus=8)

    # --- 1. FITS stamps -> KS -> hostless topic --------------------------
    rng = np.random.default_rng(7)
    rows = []
    for i in range(30):
        sky = rng.normal(100.0, 8.0, (63, 63))
        if i % 3:  # hosted: saturated extended galaxy
            sky[:, :] = 5000.0
        stamp = bytearray(write_fits(sky.astype(np.float32)))
        rows.append((i, stamp, stamp, 2.0, "Unknown", "nan", 0, 1))
    alerts = spark.createDataFrame(
        rows,
        "candid long, cutout_science binary, cutout_template binary, "
        "distnr double, cdsxmatch string, DR3Name string, roid int, ndethist int",
    )
    ks = stamp_kstest(alerts, "candid", "cutout_science", "cutout_template")
    enriched = alerts.join(ks.withColumnRenamed("doc_id", "candid"), "candid")
    hostless = apply_named_filter(enriched, "ztf.new_hostless")
    n_alerts, n_hostless = len(rows), hostless.count()  # one kernel pass
    print(f"hostless topic: {n_hostless} of {n_alerts} alerts")

    # --- 2. Rainbow fit -> MC -> classifier ------------------------------
    ev = load_events(spark, SF_DIR).select(
        "user_id",
        F.col("ts_us").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    model = XGBEnsemble.from_model_dict(_DEMO_TDE_MODEL)
    scored = rainbow_mc_score_per_key(
        ev, model, t_col="t", y_col="v", rebase_div=3_600_000_000,
        max_r_chisq=float("inf"), min_snr_rise_time=0.0,
    )
    # one pass over the expensive fit kernel: aggregate both counts at once
    n_total, n_valid = scored.agg(
        F.count(F.lit(1)), F.count_if("valid")
    ).collect()[0]
    print(f"TDE scoring loop: {n_valid} accepted of {n_total} objects")

    # --- 3. exact constellation labels -----------------------------------
    pts = spark.createDataFrame(
        [(1, 83.0, -5.4), (2, 10.7, 41.3), (3, 266.4, -29.0)],
        "id long, ra double, dec double",
    )
    constellation_exact(pts, id_col="id").show()

    spark.stop()


if __name__ == "__main__":
    main()
