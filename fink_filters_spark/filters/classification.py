"""Fink multi-way classification (SURVEY §2.K) as a native CASE chain.

Reference: ``ztf/classification.py:47-211`` (``extract_fink_classification_``,
a pandas UDF): start 'Unknown'; compute per-class flags (tracklet, SIMBAD,
early SN Ia, SN, microlensing, kilonova, SSO ZTF, SSO Fink); if >1
non-SIMBAD flag -> 'Ambiguous'; apply flags in precedence order; a SIMBAD
match overrides everything with its own otype string (``:209``).

Here: the shared generic operator (operators/classify.classify) instantiated
with the reference's exact flags/precedence — pure Column expressions, which
also makes the ``ztf.unknowns`` topic (C8) a trivial equality filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.classify import classify
from .ztf import EG_HOST_CLASSES


def extract_fink_classification(df: DataFrame, out_col: str = "fink_class") -> DataFrame:
    """Append the Fink classification label column.

    Flag definitions mirror ``ztf/classification.py:139-191``; mask
    precedence mirrors ``:193-199`` (later entries win in the reference's
    sequential masking, so the when-chain lists them in reverse reference
    order); 'Ambiguous' when >1 flag (``:202-207``); SIMBAD override
    (``:209``).
    """
    early_sn = (
        ((F.col("snn_snia_vs_nonia") > 0.5) | (F.col("snn_sn_vs_all") > 0.5))
        & (F.col("rf_snia_vs_nonia") > 0.5)
        & F.col("cdsxmatch").isin(EG_HOST_CLASSES)
        & (F.col("drb") > 0.5)
        & (F.col("classtar") > 0.4)
        & (F.col("ndethist") <= 20)
        & (F.col("roid") != 3)
    )
    sn = (
        ((F.col("snn_snia_vs_nonia") > 0.5) | (F.col("snn_sn_vs_all") > 0.5))
        & F.col("cdsxmatch").isin(EG_HOST_CLASSES)
        & ((F.col("jd") - F.col("jdstarthist")) <= 90)
        & (F.col("drb") > 0.5)
        & (F.col("classtar") > 0.4)
        & (F.col("ndethist") > 1)
        & (F.col("roid") != 3)
    )
    kn = (
        (F.col("rf_kn_vs_nonkn") > 0.5)
        & (F.col("drb") > 0.5)
        & (F.col("classtar") > 0.4)
        & ((F.col("jd") - F.col("jdstarthist")) < 5)
        & (F.col("ndethist") < 20)
        & (F.col("roid") != 3)
    )
    flags = {
        # precedence order of the final label (reference mask order :193-199,
        # applied sequentially so the LAST mask wins; the when-chain below
        # therefore lists the reference's later masks first)
        "Kilonova candidate": kn,
        "SN candidate": sn,
        "Early SN Ia candidate": early_sn,
        "Microlensing candidate": F.col("mulens") > 0,
        "Solar System MPC": F.col("roid") == 3,
        "Solar System candidate": F.col("roid") == 2,
        "Tracklet": F.col("tracklet").startswith("TRCK_"),
    }
    simbad_override = F.when(
        ~F.col("cdsxmatch").isin("Unknown", "Transient", "Fail")
        & ~F.col("cdsxmatch").startswith("Fail"),
        F.col("cdsxmatch"),
    )
    return classify(df, flags, override=simbad_override, out_col=out_col)
