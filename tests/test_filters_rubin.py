"""Dual-path tests for Rubin blocks and topics (SURVEY §2.C C36-C38)."""

from __future__ import annotations

import math

from fink_filters_spark.filters import apply_named_filter
from fink_filters_spark.filters.rubin import BANDS, QUALITY_FLAGS


def _mag(flux):
    return -2.5 * math.log10(flux) + 31.4 if flux > 0 else float("inf")


def _good_quality(r):
    if not (r.psfFlux >= 0 and r.snr >= 6):
        return False
    return not any(getattr(r, f) for f in QUALITY_FLAGS)


def _egal_loose(r):
    return (
        _good_quality(r)
        and not r.is_sso
        and abs(_gal_b(r.ra, r.dec)) > 5
        and not (r.xm_gaia_plx / r.xm_gaia_e_plx > 5)
        and r.xm_vsx_type is None
        and (
            r.xm_simbad_otype
            in ("Galaxy", "EmG", "Seyfert_1", "Seyfert_2", "AGN", "QSO", "RadioG", "LINER")
            or r.xm_simbad_otype in (None, "Unknown")
        )
    )


def _gal_b(ra, dec):
    d2r = math.pi / 180
    ra_g, dec_g = 192.85948 * d2r, 27.12825 * d2r
    rr, d = ra * d2r, dec * d2r
    sinb = math.sin(dec_g) * math.sin(d) + math.cos(dec_g) * math.cos(d) * math.cos(rr - ra_g)
    return math.degrees(math.asin(max(-1.0, min(1.0, sinb))))


def _ids(df):
    return {r.diaSourceId for r in df.select("diaSourceId").collect()}


def test_uniform_sample_deterministic(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.uniform_sample"))
    want = {r.diaSourceId for r in rubin_pdf.itertuples() if r.diaSourceId % 113 == 0}
    assert got == want
    # determinism: same result on re-application (unlike df.sample)
    assert got == _ids(apply_named_filter(rubin_df, "rubin.uniform_sample"))


def test_in_tns(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.in_tns"))
    want = {r.diaSourceId for r in rubin_pdf.itertuples() if r.tns_fullname is not None}
    assert got == want


def test_extragalactic_loose(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_loose"))
    want = {r.diaSourceId for r in rubin_pdf.itertuples() if _egal_loose(r)}
    assert got == want


def test_near_galaxy_is_subset(rubin_df, rubin_pdf):
    loose = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_loose"))
    near = _ids(apply_named_filter(rubin_df, "rubin.near_galaxy_candidate"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _egal_loose(r) and r.xm_mangrove_name is not None
    }
    assert near == want
    assert near <= loose


def test_extragalactic_lt20mag(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_lt20mag"))

    def band_mean(r):
        return getattr(r, f"{r.band}_psfFluxMean")

    def band_mean_err(r):
        return getattr(r, f"{r.band}_psfFluxMeanErr")

    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _egal_loose(r)
        and r.psfFlux > 0
        and _mag(r.psfFlux) < 20
        and (r.psfFlux - band_mean(r) > band_mean_err(r) and r.psfFlux > band_mean(r))
        and r.nDiaSources > 4
        and (r.midpointMjdTai - r.firstSeenMjdTai) > 1
    }
    assert got == want


def test_most_likely_sn_replicates_quality_negation(rubin_df, rubin_pdf):
    """The reference's surprising ~good_quality conjunct is preserved."""
    got = _ids(apply_named_filter(rubin_df, "rubin.most_likely_sn"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if r.snr > 10
        and r.nDiaSources >= 2
        and r.clf_snn_score >= 0.7
        and r.clf_cats_class == 11
        and r.clf_cats_score >= 0.9
        and not _good_quality(r)
    }
    assert got == want


def test_early_snia_candidate(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.early_snia_candidate"))

    def replica(r):
        fmax = max(getattr(r, f"{b}_psfFluxMax") for b in BANDS)
        fmin = min(getattr(r, f"{b}_psfFluxMin") for b in BANDS)
        ratio = math.log10(fmax / fmin)
        return r.clf_snia_score > 0.76 or (r.clf_snia_score > 0.5 and ratio > 0.5)

    want = {r.diaSourceId for r in rubin_pdf.itertuples() if replica(r)}
    assert got == want


def test_remove_unlikely_transients(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.remove_unlikely_transients"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _good_quality(r)
        and not r.is_sso
        and not (r.xm_gaia_plx / r.xm_gaia_e_plx > 5)
        and r.xm_vsx_type is None
    }
    assert got == want
