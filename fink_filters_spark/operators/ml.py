"""Broadcast-model batch inference (SURVEY §2.I "ML inference").

Reference behavior: packaged XGBoost ``.ubj`` classifiers loaded per call and
applied inside driver loops (``ztf/filter_early_tde_candidates/
filter.py:79-85,203-218``). Spark-first: the model ships to executors ONCE
via a broadcast variable and scores Arrow batches inside a pandas UDF —
constant model-load cost per executor, vectorized predict per batch.

xgboost is not installed in this container, so ``load_model`` falls back to
a deterministic linear stub scorer (clearly marked). The broadcast + batch
plumbing is identical either way; drop a real ``.ubj`` in and the same code
serves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType


class LinearStubModel:
    """Deterministic fallback scorer: sigmoid(mean of standardized features).

    NOT a trained model — a stand-in keeping the inference plumbing testable
    where xgboost is unavailable.
    """

    def __init__(self, weights=None):
        self.weights = weights

    def predict_proba_batch(self, mat):
        import numpy as np

        w = (
            np.asarray(self.weights, dtype=float)
            if self.weights is not None
            else np.ones(mat.shape[1]) / mat.shape[1]
        )
        z = (mat * w).sum(axis=1)
        return 1.0 / (1.0 + np.exp(-z))


def load_model(path: str | None = None, weights=None):
    """Load an XGBoost model: the real library if installed, else the
    pure-numpy UBJSON tree-ensemble reader (operators/xgb_ubj.py) for
    ``.ubj`` files, else the linear stub. All three expose batch scoring
    compatible with ``predict_proba``."""
    try:  # pragma: no cover - xgboost absent in this environment
        import xgboost as xgb

        booster = xgb.Booster()
        if path:
            booster.load_model(path)
        return booster
    except ImportError:
        if path and path.endswith(".ubj"):
            from .xgb_ubj import XGBEnsemble

            return XGBEnsemble.from_file(path)
        return LinearStubModel(weights)


# The reference snapshot's packaged early-TDE classifiers
# (``ztf/filter_early_tde_candidates/data/model_{nuclear,broad}.ubj``,
# loaded at ``filter.py:79-85``). Read-only fixture data — present when the
# reference checkout is mounted, absent in standalone deployments.
REFERENCE_TDE_MODEL_DIR = (
    "/root/reference/fink_filters/ztf/filter_early_tde_candidates/data"
)

# Feature contracts baked into the packaged models (their stored
# ``feature_names``): nuclear adds the host-nucleus offset.
REFERENCE_TDE_FEATURES = {
    "broad": ("e_reference_time", "rise_time", "temperature"),
    "nuclear": ("e_reference_time", "rise_time", "temperature", "distnr"),
}


def load_reference_tde_model(which: str = "broad"):
    """Load one of the reference's REAL packaged early-TDE XGBoost
    classifiers through the numpy UBJSON reader, or None when the
    reference snapshot is not mounted (callers fall back to the demo
    model). ``which``: "broad" or "nuclear"."""
    import os

    path = os.path.join(REFERENCE_TDE_MODEL_DIR, f"model_{which}.ubj")
    if not os.path.isfile(path):
        return None
    from .xgb_ubj import XGBEnsemble

    return XGBEnsemble.from_file(path)


def predict_proba(df: DataFrame, feature_cols: list[str], model, out_col: str = "score") -> DataFrame:
    """Append a probability column scored by the broadcast ``model``."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    # no type annotations: pandas_udf's hint parser rejects varargs
    # signatures; the explicit returnType selects the scalar eval type
    def _score(*cols):
        import numpy as np

        m = bc.value
        mat = np.column_stack([s.to_numpy(dtype=float) for s in cols])
        if hasattr(m, "predict_proba_batch"):
            proba = m.predict_proba_batch(mat)
        else:  # pragma: no cover - real xgboost path
            import xgboost as xgb

            proba = m.predict(xgb.DMatrix(mat))
        return pd.Series(proba)

    udf = F.pandas_udf(_score, DoubleType())
    return df.withColumn(out_col, udf(*[F.col(c) for c in feature_cols]))
