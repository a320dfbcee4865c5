"""Dual-traversal cross-validation of the UBJ XGBoost reader.

Round-5 verdict action #2: the pinned goldens in
``test_reference_fixtures.py`` are produced by the reader itself, so a
structural bug present from day one could hide behind them. Here the
reference's REAL packaged models are decoded AND scored through two
independently-written stacks (``operators/xgb_ubj`` vectorized batch walk
vs ``operators/xgb_check`` decision-table scalar walk, each with its own
UBJSON parser) and must agree bit-for-bit — a surviving bug would have to
exist identically in both implementations.

No SparkSession needed: this is pure-Python/numpy model plumbing.
"""

from __future__ import annotations

import math
import os
import random

import pytest

REF_TDE_MODELS = "/root/reference/fink_filters/ztf/filter_early_tde_candidates/data"
_MODELS = ("model_nuclear.ubj", "model_broad.ubj")

needs_models = pytest.mark.skipif(
    not os.path.isdir(REF_TDE_MODELS), reason="packaged models absent"
)


def _payload(name: str) -> bytes:
    with open(os.path.join(REF_TDE_MODELS, name), "rb") as f:
        return f.read()


@needs_models
@pytest.mark.parametrize("name", _MODELS)
def test_independent_ubjson_decoders_agree(name):
    """Both UBJSON parsers produce the identical document for the real
    model payloads (dict equality covers every key, container shape, int
    and float bit pattern — float equality is exact because both decode
    the same big-endian bytes)."""
    from fink_filters_spark.operators.xgb_check import ubj_decode
    from fink_filters_spark.operators.xgb_ubj import ubjson_loads

    payload = _payload(name)
    assert ubj_decode(payload) == ubjson_loads(payload)


@needs_models
@pytest.mark.parametrize("name", _MODELS)
def test_independent_traversals_agree_on_random_grid(name):
    """The vectorized frontier walk (xgb_ubj.XGBEnsemble) and the scalar
    decision-table walk (xgb_check.score_one) return IDENTICAL
    probabilities over a seeded random feature grid spanning the split
    thresholds, exact threshold hits, negatives, zeros, and NaNs
    (default_left routing). Leaf values accumulate in tree order in both
    walks, so the float sums are bit-identical — exact equality, no
    tolerance."""
    import numpy as np

    from fink_filters_spark.operators.xgb_check import score_model_dict, ubj_decode
    from fink_filters_spark.operators.xgb_ubj import XGBEnsemble

    payload = _payload(name)
    doc = ubj_decode(payload)
    learner = doc["learner"]
    nfeat = int(learner["learner_model_param"]["num_feature"])
    trees = learner["gradient_booster"]["model"]["trees"]

    # feature grid: random draws around the model's own threshold range,
    # plus adversarial rows — exact split thresholds (tie routing), all-NaN
    # (pure default_left), zeros, extremes
    thresholds = [
        float(c)
        for t in trees
        for c, lc in zip(t["split_conditions"], t["left_children"])
        if lc != -1
    ]
    lo, hi = min(thresholds), max(thresholds)
    rng = random.Random(20260815)
    rows = [
        [rng.uniform(lo - abs(lo), hi + abs(hi)) for _ in range(nfeat)]
        for _ in range(200)
    ]
    for _ in range(50):  # rows with sprinkled NaNs
        row = [rng.uniform(lo, hi) for _ in range(nfeat)]
        row[rng.randrange(nfeat)] = float("nan")
        rows.append(row)
    rows.append([float("nan")] * nfeat)
    rows.append([0.0] * nfeat)
    rows.append([1e30] * nfeat)
    rows.append([-1e30] * nfeat)
    for i in range(min(25, len(thresholds))):  # exact threshold hits
        rows.append([thresholds[i]] * nfeat)

    from fink_filters_spark.operators.xgb_check import flatten_tree, score_one

    model = XGBEnsemble.from_ubj(payload)
    X = np.array(rows)
    # margins are pure float adds in the same tree order in both walks:
    # bit-identical, no tolerance
    tables = [flatten_tree(t) for t in trees]
    batch_margin = model.margin(X).tolist()
    scalar_margin = [
        score_one(tables, 0.0, "reg:squarederror", row) for row in rows
    ]
    assert batch_margin == scalar_margin
    # probabilities: np.exp (SIMD) and math.exp (libm) may differ by one
    # ulp — that is the arithmetic library, not the reader under test
    batch = model.predict_proba_batch(X).tolist()
    scalar = score_model_dict(doc, rows)
    assert len(batch) == len(scalar)
    for b, s in zip(batch, scalar):
        assert b == pytest.approx(s, rel=1e-14, abs=1e-300)


def test_scalar_walk_on_handbuilt_tree_known_answers():
    """The decision-table walk scores a hand-built two-node tree to
    hand-computed probabilities — anchors the SCALAR path to arithmetic
    done by hand, independent of both parsers."""
    from fink_filters_spark.operators.xgb_check import flatten_tree, score_one

    tree = {
        "split_indices": [0, 0, 0],
        "split_conditions": [2.0, -1.0, 3.0],  # leaf values at 1, 2
        "left_children": [1, -1, -1],
        "right_children": [2, -1, -1],
        "default_left": [True, False, False],
    }
    tables = [flatten_tree(tree)]
    # margin -1 on the left branch, +3 on the right; base 0.5 -> logit 0
    assert score_one(tables, 0.5, "binary:logistic", [1.0]) == pytest.approx(
        1 / (1 + math.exp(1.0))
    )
    assert score_one(tables, 0.5, "binary:logistic", [2.0]) == pytest.approx(
        1 / (1 + math.exp(-3.0))
    )  # x == threshold routes right (IEEE <)
    assert score_one(tables, 0.5, "binary:logistic", [float("nan")]) == (
        pytest.approx(1 / (1 + math.exp(1.0)))
    )  # NaN follows default_left
    assert score_one(tables, 0.25, "reg:squarederror", [0.0]) == -0.75
