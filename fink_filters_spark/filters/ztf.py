"""ZTF topic filters (SURVEY §2.C C1-C35) as native Column expressions.

Column model: the flattened alert frame — ``candidate.*`` fields addressed by
leaf name (magpsf, drb, classtar, jd, jdstarthist, ndethist, roid,
isdiffpos, ssdistnr, distnr, neargaia, distpsnr1, rb, nbad, ra, dec),
science-module scores (snn_snia_vs_nonia, snn_sn_vs_all, rf_snia_vs_nonia,
rf_kn_vs_nonkn, mulens, anomaly_score), crossmatch enrichments (cdsxmatch,
DR3Name, tns, tracklet, spicy_id, spicy_class, mangrove map,
blazar_stats map), and history arrays (cjd, cmagpsf, cfid, ... from
``functions.arrays.hist_concat``). Each builder cites the reference
predicate it reproduces; thresholds are copied as written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.arrays import pair_gap
from ..functions.astro import gal_b
from .registry import register

# SIMBAD extragalactic host classes accepted by the SN-like filters.
# The reference pulls this allowlist from fink-utils ``return_list_of_eg_host``
# (used at ztf/livestream/filter_sn_candidates/filter.py:94-98); this is the
# same family of SIMBAD otypes (galaxies, AGN, quasars, unknown hosts).
# VENDORED TRANSCRIPTION — provenance + pinned upstream copy in
# filters/provenance.py; tests/test_provenance.py guards drift.
EG_HOST_CLASSES = [
    "Unknown",
    "Transient",
    "Fail",
    "Candidate_SN*",
    "SN",
    "SN candidate",
    "Galaxy",
    "galaxy",
    "AGN",
    "AGN_Candidate",
    "QSO",
    "QSO_Candidate",
    "EmG",
    "Seyfert",
    "Seyfert_1",
    "Seyfert_2",
    "BlueCompG",
    "StarburstG",
    "LSB_G",
    "HII_G",
    "GinPair",
    "GinGroup",
    "GinCl",
    "BClG",
    "PartofG",
    "RadioG",
    "LINER",
]

GRAV_CLASSES = [
    "Gravitation",
    "LensingEv",
    "GravLensSystem",
    "GravLens",
    "LensedImage",
    "LensedG",
    "LensedQ",
    "BlackHole",
    "GravWaveEvent",
]

BLAZAR_CLASSES = ["Blazar", "Blazar_Candidate", "BLLac", "BLLac_Candidate"]

# the reference selects CANDIDATE classes only (filter_yso_candidates/
# filter.py:51-58) — definite YSO otypes are deliberately absent
YSO_CLASSES = [
    "Candidate_YSO", "Candidate_TTau*", "YSO_Candidate", "TTau*_Candidate",
]

RRLYR_CLASSES = ["RRLyr", "RRLyrae"]


def _quality(df: DataFrame) -> Column:
    """Common quality cuts drb>0.5 ∧ classtar>0.4 (e.g.
    ztf/livestream/filter_sn_candidates/filter.py:96-97)."""
    return (F.col("drb") > 0.5) & (F.col("classtar") > 0.4)


def _recent(days: float) -> Column:
    """Recency: jd - jdstarthist <= days."""
    return (F.col("jd") - F.col("jdstarthist")) <= days


@register(
    "ztf.example",
    reference="ztf/filter_example/filter.py:23-65",
)
def example_filter(df: DataFrame) -> Column:
    """C1: known-SIMBAD veto + prefix vetoes + faint cut."""
    return (
        ~F.col("cdsxmatch").isin("Unknown", "Transient")
        & ~F.col("cdsxmatch").startswith("Fail")
        & ~F.col("cdsxmatch").startswith("Galaxy")
        & (F.col("magpsf") > 20.5)
    )


@register(
    "ztf.sn_candidates",
    reference="ztf/livestream/filter_sn_candidates/filter.py:86-104",
)
def sn_candidates(df: DataFrame) -> Column:
    """C2: SN score ∧ EG host ∧ <=90d ∧ quality ∧ ndethist>1 ∧ not SSO."""
    return (
        ((F.col("snn_snia_vs_nonia") > 0.5) | (F.col("snn_sn_vs_all") > 0.5))
        & F.col("cdsxmatch").isin(EG_HOST_CLASSES)
        & _recent(90)
        & _quality(df)
        & (F.col("ndethist") > 1)
        & (F.col("roid") != 3)
    )


@register(
    "ztf.early_sn_candidates",
    reference="ztf/livestream/filter_early_sn_candidates/filter.py:78-88",
)
def early_sn_candidates(df: DataFrame) -> Column:
    """C3: C2-like, early (ndethist<=20) and random-forest confirmed."""
    return (
        ((F.col("snn_snia_vs_nonia") > 0.5) | (F.col("snn_sn_vs_all") > 0.5))
        & (F.col("rf_snia_vs_nonia") > 0.5)
        & F.col("cdsxmatch").isin(EG_HOST_CLASSES)
        & _recent(90)
        & _quality(df)
        & (F.col("ndethist") <= 20)
        & (F.col("roid") != 3)
    )


@register(
    "ztf.kn_candidates",
    reference="ztf/livestream/filter_kn_candidates/filter.py:87-97",
)
def kn_candidates(df: DataFrame) -> Column:
    """C4: kilonova score ∧ quality ∧ <5d ∧ ndethist<20 ∧ EG host ∧ not SSO."""
    return (
        (F.col("rf_kn_vs_nonkn") > 0.5)
        & _quality(df)
        & ((F.col("jd") - F.col("jdstarthist")) < 5)
        & (F.col("ndethist") < 20)
        & (F.col("roid") != 3)
        & F.col("cdsxmatch").isin(EG_HOST_CLASSES)
    )


@register(
    "ztf.early_kn_candidates",
    reference="ztf/livestream/filter_early_kn_candidates/filter.py:52-60",
)
def early_kn_candidates(df: DataFrame) -> Column:
    """C5 (native cuts; the Mangrove host crossmatch + the (-17,-15)
    absolute-magnitude window are the operators/crossmatch.py stage
    upstream): quality ∧ very early (<0.25 d) ∧ EG host ∧ not SSO —
    exactly reference filter.py:52-61 (the pre-round-7 version added an
    ndethist<20 cut the reference lacks and galactic/ecliptic plane cuts
    from no reference stage, and dropped the EG-host cut)."""
    return (
        _quality(df)
        & ((F.col("jd") - F.col("jdstarthist")) < 0.25)
        & F.col("cdsxmatch").isin(EG_HOST_CLASSES)
        & (F.col("roid") != 3)
    )


@register(
    "ztf.rate_based_kn_candidates",
    reference="ztf/livestream/filter_rate_based_kn_candidates/filter.py:102-167",
)
def rate_based_kn_candidates(df: DataFrame) -> Column:
    """C6 (Andreoni+2021 cuts): tight quality, positive subtraction, SSO
    distance veto, off-plane, fading faster than 0.3 mag/day (rate column
    from functions.arrays.linfit_slope upstream)."""
    return (
        (F.col("drb") > 0.9)
        & (F.col("classtar") > 0.4)
        & ((F.col("jd") - F.col("jdstarthist")) < 5)
        & (F.col("ndethist") < 20)
        & F.col("isdiffpos").isin("t", "1")
        & ((F.col("ssdistnr") > 10) | (F.col("ssdistnr") < 0))
        & (F.abs(gal_b("ra", "dec")) > 10)
        # SIGNED rate (reference :167 `rate > 0.3`): only FADING sources;
        # abs() would admit the brightening ones Andreoni+2021 excludes
        & (F.col("mag_rate") > 0.3)
    )


@register(
    "ztf.tns_match",
    reference="ztf/livestream/filter_tns_match/filter.py:107-109",
)
def tns_match(df: DataFrame) -> Column:
    """C7: already in TNS, recent."""
    return (F.col("tns") != "") & _recent(30)


@register(
    "ztf.unknowns",
    reference="ztf/livestream/filter_unknowns/filter.py:108-124",
)
def unknowns(df: DataFrame) -> Column:
    """C8: full classification says Unknown (requires the
    filters.classification column ``fink_class``)."""
    return F.col("fink_class") == "Unknown"


def _uncataloged(df: DataFrame) -> Column:
    """The hostless family's shared gate (reference
    filter_new_hostless/utils.py:34-85 ``is_uncataloged``): not in the ZTF
    reference image (distnr > 1.5), NOT a definite SIMBAD type (the
    complement of ``simbad_candidates`` — so Unknown/Transient, Fail*-
    AND Galaxy*-prefixed all count as uncataloged), not in Gaia DR3, not
    in the MPC."""
    return (
        (F.col("distnr") > 1.5)
        & ~simbad_candidates(df)
        & ~(F.col("DR3Name").isNotNull() & (F.col("DR3Name") != "nan"))
        & (F.col("roid") != 3)
    )


def _kstest_gate() -> Column:
    """ELEPHANT statistic bounds (utils.py:139-140): BOTH sides of each
    interval — a negative statistic (the pipeline's failure sentinel)
    must not pass."""
    return (
        (F.col("kstest_science") >= 0)
        & (F.col("kstest_science") <= 0.5)
        & (F.col("kstest_template") >= 0)
        & (F.col("kstest_template") <= 0.85)
    )


@register(
    "ztf.new_hostless",
    reference="ztf/livestream/filter_new_hostless/filter.py:82-96",
)
def new_hostless(df: DataFrame) -> Column:
    """C9: uncataloged ∧ first detection ∧ ELEPHANT KS statistics on cutouts
    (kstest columns produced by the multimodal image kernel upstream)."""
    return _uncataloged(df) & (F.col("ndethist") == 1) & _kstest_gate()


@register(
    "ztf.intra_night_hostless",
    reference="ztf/livestream/filter_intra_night_hostless/filter.py:111-128",
)
def intra_night_hostless(df: DataFrame) -> Column:
    """C10: hostless with exactly 2 detections within 12 h (history array
    ``cjd``)."""
    return (
        _uncataloged(df)
        & (F.col("ndethist") == 2)
        & (pair_gap("cjd", 1, 2) < 0.5)
        & _kstest_gate()
    )


@register(
    "ztf.inter_night_hostless",
    reference="ztf/livestream/filter_inter_night_hostless/filter.py:28-128",
)
def inter_night_hostless(df: DataFrame) -> Column:
    """C11: hostless, 3 detections, LAST gap > 12h ∧ FIRST gap < 12h
    over the newest three epochs (reference utils.py:229-237: cond1 =
    x[2]-x[1] > lapse/24, cond2 = x[1]-x[0] < 12/24 — a same-night pair
    followed by a next-night detection; the pre-round-7 version had the
    two conditions swapped and selected the OPPOSITE temporal pattern)."""
    return (
        _uncataloged(df)
        & (F.col("ndethist") == 3)
        & (pair_gap("cjd", 1, 2) > 0.5)
        & (pair_gap("cjd", 2, 3) < 0.5)
        & _kstest_gate()
    )


@register(
    "ztf.magnetic_cvs",
    reference="ztf/livestream/filter_magnetic_cvs/filter.py:64-119",
)
def magnetic_cvs(df: DataFrame) -> Column:
    """C12: positive subtraction ∧ matched against the packaged MCV catalog
    (mcv_name from the crossmatch enrich stage)."""
    return F.col("isdiffpos").isin("t", "1") & (F.col("mcv_name") != "Unknown")


@register(
    "ztf.microlensing_candidates",
    reference="ztf/livestream/filter_microlensing_candidates/filter.py:48",
)
def microlensing_candidates(df: DataFrame) -> Column:
    """C13: mulens score positive."""
    return F.col("mulens") > 0


@register(
    "ztf.simbad_grav_candidates",
    reference="ztf/livestream/filter_simbad_grav_candidates/filter.py:52-63",
)
def simbad_grav_candidates(df: DataFrame) -> Column:
    """C14: SIMBAD gravitational-physics classes."""
    return F.col("cdsxmatch").isin(GRAV_CLASSES)


@register(
    "ztf.sso_ztf_candidates",
    reference="ztf/livestream/filter_sso_ztf_candidates/filter.py:48",
)
def sso_ztf_candidates(df: DataFrame) -> Column:
    """C15: MPC-flagged solar-system object."""
    return F.col("roid") == 3


@register(
    "ztf.sso_fink_candidates",
    reference="ztf/livestream/filter_sso_fink_candidates/filter.py:48",
)
def sso_fink_candidates(df: DataFrame) -> Column:
    """C16: Fink-flagged solar-system candidate."""
    return F.col("roid") == 2


@register(
    "ztf.blazar",
    reference="ztf/livestream/filter_blazar/filter.py:62-64",
)
def blazar(df: DataFrame) -> Column:
    """C17: SIMBAD blazar classes."""
    return F.col("cdsxmatch").isin(BLAZAR_CLASSES)


@register(
    "ztf.vra",
    reference="ztf/livestream/filter_vra/filter.py:59-64",
)
def vra(df: DataFrame) -> Column:
    """C18: virtual research assistant pre-selection."""
    return (
        (F.col("cdsxmatch") == "Unknown")
        & (F.col("roid") != 3)
        & (F.col("magpsf") > 19.5)
        & (F.col("drb") > 0.5)
    )


@register(
    "ztf.yso_candidates",
    reference="ztf/livestream/filter_yso_candidates/filter.py:51-58",
)
def yso_candidates(df: DataFrame) -> Column:
    """C19: young-stellar-object SIMBAD classes (old + new taxonomy)."""
    return F.col("cdsxmatch").isin(YSO_CLASSES)


@register(
    "ztf.yso_spicy_candidates",
    reference="ztf/livestream/filter_yso_spicy_candidates/filter.py:128-156",
)
def yso_spicy_candidates(df: DataFrame) -> Column:
    """C20: SPICY catalog class known ∧ significant r-band slope with good
    linear fit (slope/r2 from functions.arrays upstream)."""
    return (
        (F.col("spicy_class") != "Unknown")
        & (F.abs(F.col("linear_fit_slope")) > 0.025)
        & (F.col("linear_fit_r2") > 0.6)
    )


@register(
    "ztf.simbad_candidates",
    reference="ztf/filter_simbad_candidates/filter.py:54-62",
)
def simbad_candidates(df: DataFrame) -> Column:
    """C21: any definite SIMBAD type — except Galaxy-prefixed ones
    (the reference's 'Remove static objects' mask, filter.py:59-61)."""
    return (
        ~F.col("cdsxmatch").isin("Unknown", "Transient")
        & ~F.col("cdsxmatch").startswith("Fail")
        & ~F.col("cdsxmatch").startswith("Galaxy")
    )


@register(
    "ztf.gaia_dr3_candidates",
    reference="ztf/filter_gaia_candidates/filter.py:46",
)
def gaia_dr3_candidates(df: DataFrame) -> Column:
    """C22: matched in Gaia DR3."""
    return F.col("DR3Name").isNotNull() & (F.col("DR3Name") != "nan")


@register(
    "ztf.quality_cuts",
    reference="ztf/filter_quality_cuts/filter.py:48-51",
)
def quality_cuts(df: DataFrame) -> Column:
    """C23: rb >= 0.55 ∧ nbad == 0."""
    return (F.col("rb") >= 0.55) & (F.col("nbad") == 0)


@register(
    "ztf.rrlyr",
    reference="ztf/filter_rrlyr/filter.py:50",
)
def rrlyr(df: DataFrame) -> Column:
    """C24: SIMBAD RR Lyrae classes."""
    return F.col("cdsxmatch").isin(RRLYR_CLASSES)


@register(
    "ztf.snialike",
    reference="ztf/filter_snlike/filter.py:43-47",
)
def snialike(df: DataFrame) -> Column:
    """C25: SN-Ia-like score on an unknown host with star-distance
    vetoes — strictly > 5.0 like the reference (filter.py:43-47): ZTF's
    -999 no-neighbor sentinel FAILS the cut there, so no sentinel branch
    here either."""
    return (
        (F.col("rf_snia_vs_nonia") > 0)
        & (F.col("cdsxmatch") == "Unknown")
        & (F.col("neargaia") > 5)
        & (F.col("distpsnr1") > 5)
    )


@register(
    "ztf.superluminous",
    reference="ztf/filter_superluminous/filter.py:47",
)
def superluminous(df: DataFrame) -> Column:
    """C26: SLSN score above per-row threshold."""
    return F.col("slsn_score") >= F.col("slsn_threshold")


@register(
    "ztf.tracklet_candidates",
    reference="ztf/filter_tracklet_candidates/filter.py:46",
)
def tracklet_candidates(df: DataFrame) -> Column:
    """C27: tracklet id assigned."""
    return F.col("tracklet").startswith("TRCK_")


@register(
    "ztf.vast_supernovae",
    reference="ztf/filter_vast_supernovae/filter.py:50-53",
)
def vast_supernovae(df: DataFrame) -> Column:
    """C28: nearby Mangrove host (map access), southern sky, TNS-confirmed."""
    return (
        (F.col("mangrove").getItem("lum_dist").cast("double") < 200)
        & (F.col("dec") < -10)
        & ~F.col("tns").isin("", "Unknown")
    )


@register(
    "ztf.vast_supernovae_candidates",
    reference="ztf/filter_vast_supernovae_candidates/filter.py:50-53",
)
def vast_supernovae_candidates(df: DataFrame) -> Column:
    """C29: nearby host, southern sky, SN-score candidate."""
    return (
        (F.col("mangrove").getItem("lum_dist").cast("double") < 200)
        & (F.col("dec") < -10)
        & (F.col("snn_sn_vs_all") > 0.5)
    )


@register(
    "ztf.orphan_grb",
    reference="ztf/filter_orphan_grb_candidates/filter.py:24-157",
)
def orphan_grb(df: DataFrame) -> Column:
    """C30: exactly 3 faint detections within 10 days, no SSO name, fading,
    red g-r — all as higher-order expressions over the NaN-mag-MASKED
    history arrays (cjd/cmagpsf/cfid/cssnamenr), mirroring the reference's
    ``v = lambda val, mag: val[~np.isnan(mag)]`` per-row masking
    (filter.py:118-152 — ZTF histories nearly always carry NaN-mag upper
    limits, so every condition runs on the detections only):

    - at_most_a_month: jd − jdstarthist ≤ 30;
    - above_18: every VALID mag > 18; at_least_3_det: exactly 3 valid;
    - tmp1: valid_jd[2] − valid_jd[0] < 10;
    - tmp2 (get_valid_rate, :24-46): same band 2nd/3rd → m3 − m2 > 0
      (fading); g then r → m2 − m3 ≤ 0.3 (within the g−r baseline);
      r then g → m3 − m2 > 0;
    - tmp3: mean(valid g) − mean(valid r) ≥ 0 — a SINGLE-band triple is
      rejected (the reference's empty-band mean is NaN → False), and the
      means are CASE-guarded so ANSI never divides by zero;
    - tmp4: every valid cssnamenr entry is None/'null' (the per-epoch SSO
      veto, not the scalar alert field)."""
    z = F.arrays_zip(
        F.col("cmagpsf"), F.col("cjd"), F.col("cfid"), F.col("cssnamenr")
    )
    v = F.filter(z, lambda e: ~F.isnan(e["cmagpsf"]))
    vm = F.transform(v, lambda e: e["cmagpsf"])
    vt = F.transform(v, lambda e: e["cjd"])
    vf = F.transform(v, lambda e: e["cfid"])
    vs = F.transform(v, lambda e: e["cssnamenr"])
    m2, m3 = F.try_element_at(vm, F.lit(2)), F.try_element_at(vm, F.lit(3))
    f2, f3 = F.try_element_at(vf, F.lit(2)), F.try_element_at(vf, F.lit(3))
    rate_ok = (
        F.when(f2 == f3, (m3 - m2) > 0)
        .when(f3 > f2, (m2 - m3) <= 0.3)  # g (1) then r (2)
        .otherwise((m3 - m2) > 0)
    )
    g_mags = F.filter(v, lambda e: e["cfid"] == 1)
    r_mags = F.filter(v, lambda e: e["cfid"] == 2)
    mean = lambda arr: F.when(  # noqa: E731 — ANSI: no /0 on an empty band
        F.size(arr) > 0,
        F.aggregate(arr, F.lit(0.0), lambda a, e: a + e["cmagpsf"]) / F.size(arr),
    )
    return (
        _recent(30)
        & (F.size(vm) == 3)
        & F.forall(vm, lambda m: m > 18)
        & ((F.try_element_at(vt, F.lit(3)) - F.try_element_at(vt, F.lit(1))) < 10)
        & rate_ok
        # NULL mean (empty band) -> NULL -> filtered out, like the
        # reference's NaN comparison
        & ((mean(g_mags) - mean(r_mags)) >= 0)
        & F.forall(vs, lambda k: k.isNull() | (k == "null"))
    )


@register(
    "ztf.transient_complete",
    reference="ztf/filter_transient_complete/filter.py:81-118",
)
def transient_complete(df: DataFrame) -> Column:
    """C31: 8-flag conjunction over upstream-computed booleans."""
    return (
        ~F.col("faint")
        & F.col("positivesubtraction")
        & F.col("real")
        & ~F.col("pointunderneath")
        & ~F.col("brightstar")
        & ~F.col("variablesource")
        & F.col("stationary")
        & (F.col("roid") == 0)
    )


@register(
    "ztf.blazar_low_state",
    reference="ztf/filter_blazar_low_state/filter.py:123-125",
)
def blazar_low_state(df: DataFrame) -> Column:
    """C32: blazar_stats map thresholds (low state)."""
    inst = F.col("blazar_stats").getItem("m0").cast("double")
    rob = F.col("blazar_stats").getItem("m1").cast("double")
    return (inst >= 0) & (inst < 1) & (rob >= 0) & (rob < 1)


@register(
    "ztf.blazar_high_state",
    reference="ztf/filter_blazar_high_state/filter.py:123-124",
)
def blazar_high_state(df: DataFrame) -> Column:
    """C33: blazar_stats map thresholds (high state)."""
    return (F.col("blazar_stats").getItem("m0").cast("double") > 1) & (
        F.col("blazar_stats").getItem("m1").cast("double") > 1
    )


# C34 multi-messenger tiers (ztf/filter_mm_module/filter.py). The silver
# threshold erf(5/sqrt(2)) constant-folds.
import math as _math

_ERF_5 = _math.erf(5 / _math.sqrt(2))


def _mm_base(observatories: list[str]) -> Column:
    return (
        (F.col("rb") >= 0.7)
        & F.col("observatory").isin(observatories)
        & (
            F.col("fink_class").isin(EG_HOST_CLASSES)
            | F.col("fink_class").isin(
                # the reference's fink_extragalactic additions
                # (filter_mm_module/filter.py:50-56)
                "Kilonova candidate",
                "SN candidate",
                "Early SN Ia candidate",
                "Ambiguous",
            )
        )
    )


@register(
    "ztf.mm_grb_bronze",
    reference="ztf/filter_mm_module/filter.py:29-62",
)
def mm_grb_bronze(df: DataFrame) -> Column:
    """C34: GRB bronze tier."""
    return _mm_base(["Fermi", "SWIFT", "INTEGRAL"])


@register(
    "ztf.mm_grb_silver",
    reference="ztf/filter_mm_module/filter.py:112-147",
)
def mm_grb_silver(df: DataFrame) -> Column:
    """C34: GRB silver tier — bronze ∧ association probability above 5σ."""
    return _mm_base(["Fermi", "SWIFT", "INTEGRAL"]) & (
        (1 - F.col("grb_proba")) > _ERF_5
    )


@register(
    "ztf.mm_grb_gold",
    reference="ztf/filter_mm_module/filter.py:166-208",
)
def mm_grb_gold(df: DataFrame) -> Column:
    """C34: GRB gold tier — silver ∧ rb>=0.9 ∧ tight localization ∧ fast rate."""
    return (
        _mm_base(["Fermi", "SWIFT", "INTEGRAL"])
        & ((1 - F.col("grb_proba")) > _ERF_5)
        & (F.col("rb") >= 0.9)
        # grb_loc_error is in ARCMINUTES; the cut is 5 degrees
        # (filter_mm_module/filter.py:205 f_sky_loc)
        & (F.col("grb_loc_error") / 60 <= 5)
        & (F.abs(F.col("rate")) > 0.3)
    )


@register(
    "ztf.mm_gw_bronze",
    reference="ztf/filter_mm_module/filter.py:233-261",
)
def mm_gw_bronze(df: DataFrame) -> Column:
    """C34: gravitational-wave bronze tier."""
    return _mm_base(["LVK"])


# C35 xmatch-enrich topics: the crossmatch operator produces the matched-name
# column; the topic keeps rows with a real match.
@register(
    "ztf.known_tde",
    reference="ztf/filter_known_tde/filter.py:31-129",
)
def known_tde(df: DataFrame) -> Column:
    """C35: matched against the packaged TDE catalog."""
    return F.col("tde_name") != "Unknown"


@register(
    "ztf.dwarf_agn",
    reference="ztf/filter_dwarf_agn/filter.py:33-94",
)
def dwarf_agn(df: DataFrame) -> Column:
    """C35: matched against the dwarf-AGN catalog (per-source radius)."""
    return F.col("dwarf_agn_name") != "Unknown"


@register(
    "ztf.symbiotic_stars",
    reference="ztf/filter_symbiotic_stars/filter.py:33-102",
)
def symbiotic_stars(df: DataFrame) -> Column:
    """C35: matched against the symbiotic-star catalog."""
    return F.col("symbiotic_name") != "Unknown"
