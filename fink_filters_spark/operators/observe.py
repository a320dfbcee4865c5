"""Pipeline observability via Spark's observe() metrics API.

A 100 TB pipeline needs row-count / null-rate / domain-violation metrics
from the SAME pass that does the work — a separate validation scan doubles
the I/O bill. ``observe()`` attaches aggregate metrics to a plan node:
they are computed incrementally as the action runs (no extra scan, no
extra shuffle) and surface on the driver after the action (batch) or per
micro-batch via QueryProgress (streaming).

Reference tie-in: the anomaly program's emptiness guard and night totals
(SURVEY §2.E E2) are exactly such metrics — here they ride along with the
real job instead of being separate count() jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    null_cols: list[str] | None = None,
    domain_checks: dict[str, "F.Column"] | None = None,
) -> tuple[DataFrame, Observation | None]:
    """Attach row-count, per-column null-count, and named domain-violation
    metrics to ``df``'s plan. Returns (observed_df, observation); read
    ``observation.get`` AFTER an action on the observed frame. For a
    STREAMING frame the observation handle is None — read the metrics per
    micro-batch from ``QueryProgress.observedMetrics[name]`` instead.

    Example::

        df, obs = observe_quality(alerts, null_cols=["magpsf"],
                                  domain_checks={"neg_flux": F.col("flux") < 0})
        df.write.parquet(out)          # the real job
        stats = obs.get                # free metrics from the same pass
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    for label, cond in (domain_checks or {}).items():
        metrics.append(
            F.sum(F.coalesce(cond, F.lit(False)).cast("long")).alias(f"n_{label}")
        )
    if df.isStreaming:
        # Observation objects are batch-only; streaming uses a string-named
        # observe node whose per-micro-batch values arrive in
        # QueryProgress.observedMetrics[name]
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
