"""Early-TDE candidate pipeline skeleton (SURVEY §3.3,
``ztf/filter_early_tde_candidates/filter.py:305-351`` + ``prefilter.py``).

Reference lifecycle: native prefilters -> concat_col history arrays -> UDF
cuts (nneg<=1, per-band detections, |b|>=20, is_rising) -> .toPandas() ->
PER-CANDIDATE DRIVER LOOP: REST light-curve fetch, Rainbow fit, Monte-Carlo
sampling, 2x XGBoost predict -> Slack/Telegram.

Spark recomposition, stage by stage:
1. prefilter   — all cuts as Column expressions (pushdown-visible);
2. history     — functions.arrays.hist_concat + Σ-statistics, native;
3. fit         — operators/fit: the REAL Rainbow-shape sigmoid fit
                 (pure-numpy Levenberg-Marquardt, rainbow_fit_arrays /
                 sigmoid_fit_per_key) plus seeded Monte-Carlo sampling and
                 broadcast-classifier scoring in one grouped kernel
                 (rainbow_mc_score_per_key); ``rising_rate`` below keeps
                 the cheap closed-form rise-rate as the prefilter feature;
4. score       — operators/ml.predict_proba with a broadcast model
                 (.ubj models served by the numpy UBJSON reader
                 operators/xgb_ubj.py where xgboost is absent);
5. notify      — sinks.NotificationSink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.arrays import hist_concat, linfit_slope
from ..functions.astro import gal_b
from ..operators.ml import load_model, predict_proba

TDE_CLASS_ALLOWLIST = [
    "Unknown",
    "Transient",
    "SN",
    "SN candidate",
    "Candidate_SN*",
    "Galaxy",
    "AGN",
    "QSO",
]


def prefilter_alerts(df: DataFrame) -> DataFrame:
    """Stage 1-2: native cuts + vectorized history (prefilter.py:189-382)."""
    cut = (
        (F.col("roid") != 3)
        & F.col("cdsxmatch").isin(TDE_CLASS_ALLOWLIST)
        & (F.col("nalerthist") >= 5)
        & (F.abs(gal_b("ra", "dec")) >= 20)
    )
    out = df.filter(cut)
    for leaf in ("jd", "magpsf", "fid", "isdiffpos"):
        if f"prv_{leaf}" not in out.columns and "prv_candidates" in out.columns:
            # real alert shape: pull the leaf array straight out of the
            # nested prv_candidates struct array (reference concat_col)
            out = out.withColumn(f"prv_{leaf}", F.col(f"prv_candidates.{leaf}"))
        if f"prv_{leaf}" in out.columns:
            out = out.withColumn(f"c{leaf}", hist_concat(f"prv_{leaf}", leaf))
    # per-row array aggregates (E5, prefilter.py:29-53): negative-difference
    # count and per-band detection counts over the embedded history
    out = (
        out.withColumn("nneg", F.size(F.filter(F.col("cisdiffpos"), lambda x: x == "f")))
        .withColumn("nfid_1", F.size(F.filter(F.col("cfid"), lambda x: x == 1)))
        .withColumn("nfid_2", F.size(F.filter(F.col("cfid"), lambda x: x == 2)))
    )
    return out.filter(
        (F.col("nneg") <= 1) & (F.col("nfid_1") > 0) & (F.col("nfid_2") > 0)
    )


def rising_rate(df: DataFrame) -> DataFrame:
    """Stage 3 (native stand-in for the Rainbow fit): per-row rise rate from
    the embedded history via exact Σ least squares on (jd, magpsf)."""
    jd_days = F.transform("cjd", lambda j: (j * 10).cast("long"))  # 0.1-day ticks
    mag_milli = F.transform("cmagpsf", lambda m: (m * 1000).cast("long"))
    return df.withColumn("rise_rate", linfit_slope(jd_days, mag_milli))


def early_tde_candidates(
    df: DataFrame,
    model=None,
    score_threshold: float = 0.5,
) -> DataFrame:
    """Full pipeline: prefilter -> rates -> broadcast-model score -> select."""
    staged = rising_rate(prefilter_alerts(df))
    staged = staged.filter(F.col("rise_rate") < 0)  # brightening (mag decreasing)
    model = model or load_model()
    scored = predict_proba(
        staged.withColumn("rate_feature", -F.col("rise_rate")),
        ["rate_feature", "nneg", "nfid_1", "nfid_2"],
        model,
        out_col="tde_score",
    )
    return scored.filter(F.col("tde_score") >= score_threshold)
