"""Rubin/LSST blocks and topics (SURVEY §2.C C36-C38) as composable Column
expressions — the Spark-native version of ``rubin/blocks.py``'s reusable
boolean blocks.

Column model: flattened ``diaSource.*`` leaves (psfFlux, psfFluxErr, snr,
band, midpointMjdTai, diaSourceId, ra, dec, 16 pixel/psf quality flags),
``diaObject.*`` per-band running statistics ({band}_psfFluxMean etc. —
F6's struct-carried state), crossmatch struct ``xm.*`` leaves, and
classifier scores ``clf.*``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.astro import flux2mag, gal_b
from .registry import register

QUALITY_FLAGS = [
    "pixelFlags_bad",
    "pixelFlags_cr",
    "pixelFlags_crCenter",
    "pixelFlags_edge",
    "pixelFlags_interpolatedCenter",
    "pixelFlags_nodataCenter",
    "pixelFlags_saturated",
    "pixelFlags_saturatedCenter",
    "pixelFlags_suspect",
    "pixelFlags_suspectCenter",
    "centroid_flag",
    "apFlux_flag",
    "apFlux_flag_apertureTruncated",
    "isNegative",
    "psfFlux_flag",
    "psfFlux_flag_noGoodPixels",
]

BANDS = ["u", "g", "r", "i", "z", "y"]


# ---- blocks (C36, rubin/blocks.py:32-418) -----------------------------------

def b_is_solar_system(df: DataFrame) -> Column:
    """blocks.py: ssSource association present."""
    return F.col("is_sso")


def b_outside_galactic_plane(df: DataFrame, deg: float) -> Column:
    """blocks.py:70-75: |galactic b| > deg (native trig, no astropy)."""
    return F.abs(gal_b("ra", "dec")) > deg


def b_xmatched_simbad_galaxy(df: DataFrame) -> Column:
    return F.col("xm_simbad_otype").isin(
        "Galaxy", "EmG", "Seyfert_1", "Seyfert_2", "AGN", "QSO", "RadioG", "LINER"
    )


def b_xmatched_simbad_unknown(df: DataFrame) -> Column:
    return F.col("xm_simbad_otype").isNull() | (F.col("xm_simbad_otype") == "Unknown")


def b_xmatched_mangrove(df: DataFrame) -> Column:
    return F.col("xm_mangrove_name").isNotNull()


def b_xmatched_gaia_star(df: DataFrame) -> Column:
    """blocks.py: significant Gaia parallax => star (Plx/e_Plx > 5)."""
    return (F.col("xm_gaia_plx") / F.col("xm_gaia_e_plx")) > 5


def b_xmatched_vsx(df: DataFrame) -> Column:
    return F.col("xm_vsx_type").isNotNull()


def _band_stat(stat: str) -> Column:
    """F6: per-band struct-carried statistic lookup — chained CASE on the
    band column over the 6 {band}_{stat} columns (rubin/utils.py:49-112)."""
    expr = F.lit(None).cast("double")
    for b in BANDS:
        expr = F.when(F.col("band") == b, F.col(f"{b}_{stat}")).otherwise(expr)
    return expr


def b_is_rising(df: DataFrame) -> Column:
    """blocks.py:262-339: flux significantly above the per-band running mean."""
    mean = _band_stat("psfFluxMean")
    mean_err = _band_stat("psfFluxMeanErr")
    return (F.col("psfFlux") - mean > mean_err) & (F.col("psfFlux") > mean)


def b_is_fading(df: DataFrame) -> Column:
    mean = _band_stat("psfFluxMean")
    mean_err = _band_stat("psfFluxMeanErr")
    return (mean - F.col("psfFlux") > mean_err) & (F.col("psfFlux") < mean)


def b_is_new(df: DataFrame, days: float = 1.0) -> Column:
    """blocks.py: first seen within ``days``."""
    return (F.col("midpointMjdTai") - F.col("firstSeenMjdTai")) < days


def b_good_quality(df: DataFrame) -> Column:
    """blocks.py:396-415: all 16 pixel/psf flags clean ∧ psfFlux>=0 ∧ SNR>=6."""
    cond = (F.col("psfFlux") >= 0) & (F.col("snr") >= 6)
    for flag in QUALITY_FLAGS:
        cond = cond & ~F.col(flag)
    return cond


# ---- topics (C37/C38) -------------------------------------------------------

@register(
    "rubin.extragalactic_loose",
    reference="rubin/blocks.py:534-602",
)
def extragalactic_loose(df: DataFrame) -> Column:
    """C37: off-plane, not SSO, not a known star, galaxy-or-unknown host."""
    return (
        b_good_quality(df)
        & ~b_is_solar_system(df)
        & b_outside_galactic_plane(df, 5)
        & ~b_xmatched_gaia_star(df)
        & ~b_xmatched_vsx(df)
        & (b_xmatched_simbad_galaxy(df) | b_xmatched_simbad_unknown(df))
    )


@register(
    "rubin.near_galaxy_candidate",
    reference="rubin/blocks.py:603-668",
)
def near_galaxy_candidate(df: DataFrame) -> Column:
    """C37: extragalactic ∧ matched to a Mangrove galaxy."""
    return extragalactic_loose(df) & b_xmatched_mangrove(df)


@register(
    "rubin.sn_near_galaxy_candidate",
    reference="rubin/livestream/filter_sn_near_galaxy_candidate/filter.py",
)
def sn_near_galaxy_candidate(df: DataFrame) -> Column:
    """C37: the livestream topic name for the near-galaxy candidate block
    composition."""
    return near_galaxy_candidate(df)


@register(
    "rubin.extragalactic_lt20mag",
    reference="rubin/livestream/filter_extragalactic_lt20mag_candidate/filter.py:86-110",
)
def extragalactic_lt20mag(df: DataFrame) -> Column:
    """C37: bright (mag<20), rising, sampled (>4 sources), older than 1 day."""
    return (
        extragalactic_loose(df)
        & (flux2mag("psfFlux") < 20)
        & b_is_rising(df)
        & (F.col("nDiaSources") > 4)
        & ((F.col("midpointMjdTai") - F.col("firstSeenMjdTai")) > 1)
    )


@register(
    "rubin.extragalactic_new",
    reference="rubin/livestream/filter_extragalactic_new_candidate/filter.py:142-190",
)
def extragalactic_new(df: DataFrame) -> Column:
    """C37: young (<5d), mag<24, per-band rate gates: rising fast and young,
    or fading at band-dependent thresholds (rate from F9's
    latest-same-band lookup upstream)."""
    age = F.col("midpointMjdTai") - F.col("firstSeenMjdTai")
    rising_gate = (F.col("mag_rate") < -0.2) & (age < 3)
    fading_gate = (
        (F.col("band").isin("r", "i") & (F.col("mag_rate") > 0.2))
        | (F.col("band").isin("g", "u") & (F.col("mag_rate") > 0.5))
    )
    return (
        extragalactic_loose(df)
        & (age < 5)
        & (flux2mag("psfFlux") < 24)
        & (rising_gate | fading_gate)
    )


@register(
    "rubin.extragalactic_svom",
    reference="rubin/livestream/filter_extragalactic_svom/filter.py:89-108",
)
def extragalactic_svom(df: DataFrame) -> Column:
    """C37: extragalactic, young and bright — SVOM follow-up shortlist."""
    return (
        extragalactic_loose(df)
        & ((F.col("midpointMjdTai") - F.col("firstSeenMjdTai")) < 5)
        & (flux2mag("psfFlux") < 22)
    )


@register(
    "rubin.hostless_candidate",
    reference="rubin/livestream/filter_hostless_candidate/filter.py:57-67",
)
def hostless_candidate(df: DataFrame) -> Column:
    """C37: hostless image statistic ∧ bright ∧ quality ∧ off-plane."""
    return (
        (F.col("kstest_template") < 0.95)
        & (flux2mag("psfFlux") <= 21.5)
        & b_good_quality(df)
        & b_outside_galactic_plane(df, 20)
    )


@register(
    "rubin.in_tns",
    reference="rubin/livestream/filter_in_tns/filter.py:49",
    hbase_support=True,
)
def in_tns(df: DataFrame) -> Column:
    """C37: already reported to TNS."""
    return F.col("tns_fullname").isNotNull()


@register(
    "rubin.most_likely_sn",
    reference="rubin/livestream/filter_most_likely_sn/filter.py:69-85",
)
def most_likely_sn(df: DataFrame) -> Column:
    """C37: high-SNR multi-detection with concordant classifiers. NOTE the
    reference conjoins ``~f_good_quality`` (filter.py:75-83) — surprising but
    replicated as written (SURVEY §7 'replicate as written')."""
    return (
        (F.col("snr") > 10)
        & (F.col("nDiaSources") >= 2)
        & (F.col("clf_snn_score") >= 0.7)
        & (F.col("clf_cats_class") == 11)
        & (F.col("clf_cats_score") >= 0.9)
        & ~b_good_quality(df)
    )


@register(
    "rubin.remove_unlikely_transients",
    reference="rubin/livestream/filter_remove_unlikely_transients/filter.py:59-68",
)
def remove_unlikely_transients(df: DataFrame) -> Column:
    """C37: keep plausible transients (quality ∧ not star ∧ not SSO)."""
    return (
        b_good_quality(df)
        & ~b_is_solar_system(df)
        & ~b_xmatched_gaia_star(df)
        & ~b_xmatched_vsx(df)
    )


@register(
    "rubin.early_snia_candidate",
    reference="rubin/attic/filter_early_snia_candidate/filter.py:50-59",
)
def early_snia_candidate(df: DataFrame) -> Column:
    """C37 (attic): score>0.76, or score>0.5 with a large flux rise."""
    ratio = F.log10(_flux_max(df) / _flux_min(df))
    return (F.col("clf_snia_score") > 0.76) | (
        (F.col("clf_snia_score") > 0.5) & (ratio > 0.5)
    )


def _flux_max(df: DataFrame) -> Column:
    """E6: cross-column max over the 6 per-band maxima (rubin/utils.py:137-190)."""
    return F.greatest(*[F.col(f"{b}_psfFluxMax") for b in BANDS])


def _flux_min(df: DataFrame) -> Column:
    return F.least(*[F.col(f"{b}_psfFluxMin") for b in BANDS])


@register(
    "rubin.uniform_sample",
    reference="rubin/livestream/filter_uniform_sample/filter.py:50",
)
def uniform_sample(df: DataFrame) -> Column:
    """C38: deterministic-by-key ~1% sample: diaSourceId % 113 == 0."""
    return F.col("diaSourceId") % 113 == 0
