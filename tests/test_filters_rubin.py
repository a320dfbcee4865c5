"""Dual-path tests for Rubin blocks and topics (SURVEY §2.C C36-C38): each
topic is replicated in plain Python with the reference's pandas semantics
(NaN comparison -> False) and the Spark selection must match id-for-id on
a synthetic frame that includes None/NaN holes."""

from __future__ import annotations

import math

from fink_filters_spark.filters import apply_named_filter
from fink_filters_spark.filters.rubin import BANDS, QUALITY_MASK_FLAGS
from fink_filters_spark.filters.ztf import EG_HOST_CLASSES


def _isnan(x) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


def _mag(flux):
    return -2.5 * math.log10(flux) + 31.4 if flux > 0 else float("inf")


def _good_quality(r):
    """reference blocks.py:372-418 replica."""
    if any(getattr(r, f) for f in QUALITY_MASK_FLAGS):
        return False
    if r.psfFlux < 0 or r.psfFlux / r.psfFluxErr < 6:
        return False
    return True


def _gaia_star(r):
    if _isnan(r.xm_gaiadr3_DR3Name) or r.xm_gaiadr3_DR3Name in (
        "Unknown", "Fail", "Fail 504",
    ):
        return False
    if _isnan(r.xm_gaiadr3_Plx) or _isnan(r.xm_gaiadr3_e_Plx):
        return False
    return r.xm_gaiadr3_Plx / r.xm_gaiadr3_e_Plx > 5


def _simbad_galaxy(r):
    return (not _isnan(r.xm_simbad_otype)) and r.xm_simbad_otype in EG_HOST_CLASSES


def _simbad_unknown(r):
    return _isnan(r.xm_simbad_otype) or r.xm_simbad_otype in (
        "Unknown", "Fail", "Fail 504",
    )


def _vsx_star(r):
    """reference blocks.py:213-235 replica: stellar VSX classes only —
    a nonstellar match (AGN/BLLAC/QSO) does NOT count as a star."""
    from fink_filters_spark.filters.rubin import VSX_NONSTELLAR_CLASSES

    return (
        not _isnan(r.xm_vsx_Type)
        and r.xm_vsx_Type not in ("Unknown", "Fail", "Fail 504")
        and r.xm_vsx_Type not in VSX_NONSTELLAR_CLASSES
    )


def _egal_base(r, flavor):
    """reference blocks.py:421-531 replica."""
    mangrove = (not _isnan(r.xm_mangrove_lum_dist)) and r.xm_mangrove_lum_dist > 0
    legacy_valid = (
        (not _isnan(r.xm_legacydr8_zphot))
        and r.xm_legacydr8_zphot > 0
        and (_simbad_unknown(r) or _simbad_galaxy(r))
    )
    common = (
        _good_quality(r)
        and abs(_gal_b(r.ra, r.dec)) > 20
        and not r.is_sso
        and not _gaia_star(r)
        and not _vsx_star(r)
    )
    if flavor == "near_galaxy":
        return common and (_simbad_galaxy(r) or mangrove or legacy_valid)
    return common and (
        _simbad_galaxy(r) or mangrove or legacy_valid or _simbad_unknown(r)
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
    want = {
        r.diaSourceId for r in rubin_pdf.itertuples() if _egal_base(r, "loose")
    }
    assert got == want
    assert 0 < len(want) < len(rubin_pdf)  # the gate actually discriminates


def test_near_galaxy_is_subset(rubin_df, rubin_pdf):
    loose = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_loose"))
    near = _ids(apply_named_filter(rubin_df, "rubin.near_galaxy_candidate"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _egal_base(r, "near_galaxy")
    }
    assert near == want
    assert near <= loose


def test_extragalactic_lt20mag(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_lt20mag"))

    def rising(r):
        mean = getattr(r, f"{r.band}_psfFluxMean")
        err = getattr(r, f"{r.band}_psfFluxMeanErr")
        if _isnan(mean) or _isnan(err):
            return False
        diff = r.psfFlux - mean
        return abs(diff) > err and diff > 0

    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _egal_base(r, "loose")
        and r.psfFlux > 0
        and _mag(r.psfFlux) < 20
        and rising(r)
        and r.nDiaSources > 4
        and (r.midpointMjdTai - r.firstDiaSourceMjdTaiFink) > 1
    }
    assert got == want


def test_extragalactic_svom(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_svom"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _egal_base(r, "near_galaxy")
        and (r.midpointMjdTai - r.firstDiaSourceMjdTaiFink) < 5
        and r.psfFlux > 0
        and _mag(r.psfFlux) < 24
    }
    assert got == want


def test_extragalactic_new(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.extragalactic_new"))

    def rate_gate(r):
        age = r.midpointMjdTai - r.firstDiaSourceMjdTaiFink
        rising = r.mag_rate < -0.2 and age < 3
        fading = (r.band in ("r", "i") and r.mag_rate > 0.2) or (
            r.band in ("g", "u") and r.mag_rate > 0.5
        )
        return rising or fading

    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _egal_base(r, "near_galaxy")
        and (r.midpointMjdTai - r.firstDiaSourceMjdTaiFink) < 5
        and getattr(r, f"{r.band}_psfFluxNdata") >= 2
        and r.psfFlux > 0
        and _mag(r.psfFlux) < 24
        and rate_gate(r)
    }
    assert got == want


def test_sn_near_galaxy_mabs_gate(rubin_df, rubin_pdf):
    """Peak absolute magnitude (−23, −13) via the packaged mu(z) polynomial
    — replica integrates the same flat-LCDM comoving distance numerically,
    with a tolerance band excluded (poly max error 0.005 mag)."""
    import numpy as np

    C, H0, Om0 = 299792.458, 70.0, 0.3

    def mu(z):
        zs = np.linspace(0, z, 2048)
        ez = np.sqrt(Om0 * (1 + zs) ** 3 + (1 - Om0))
        dc = C / H0 * np.trapz(1 / ez, zs)
        return 5 * math.log10((1 + z) * dc * 1e6 / 10)

    def mabs(r):
        fmax = max(getattr(r, f"{b}_psfFluxMax") for b in BANDS)
        if _isnan(fmax) or fmax <= 0 or _isnan(r.xm_legacydr8_zphot) or r.xm_legacydr8_zphot <= 0:
            return None
        return _mag(fmax) - mu(r.xm_legacydr8_zphot)

    got = _ids(apply_named_filter(rubin_df, "rubin.sn_near_galaxy_candidate"))
    must = set()
    may = set()
    for r in rubin_pdf.itertuples():
        if not (_egal_base(r, "near_galaxy") and r.nDiaSources > 5):
            continue
        m = mabs(r)
        if m is None:
            continue
        if -23 + 0.01 < m < -13 - 0.01:
            must.add(r.diaSourceId)
        elif -23 - 0.01 < m < -13 + 0.01:
            may.add(r.diaSourceId)
    assert must <= got <= (must | may)


def test_most_likely_sn_replicates_quality_negation(rubin_df, rubin_pdf):
    """The reference's surprising ~(good ∧ ~isNegative) conjunct is kept."""
    got = _ids(apply_named_filter(rubin_df, "rubin.most_likely_sn"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if r.snr > 10
        and r.nDiaSources >= 2
        and r.clf_snnSnVsOthers_score >= 0.7
        and r.clf_cats_class == 11
        and r.clf_cats_score >= 0.9
        and not r.is_sso
        and not (_good_quality(r) and not r.isNegative)
    }
    assert got == want


def test_hostless_candidate(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.hostless_candidate"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if _good_quality(r)
        and r.clf_elephant_kstest_template < 0.95
        and abs(_gal_b(r.ra, r.dec)) > 20
        and r.psfFlux > 0
        and _mag(r.psfFlux) <= 21.5
    }
    assert got == want


def test_early_snia_candidate(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.early_snia_candidate"))

    def replica(r):
        # reference clamps (attic filter.py:50-55): fmin floored at 10,
        # non-positive/missing fmax falls back to 1e-10
        fmax = max(getattr(r, f"{b}_psfFluxMax") for b in BANDS)
        fmin = min(getattr(r, f"{b}_psfFluxMin") for b in BANDS)
        fmin = max(10.0, fmin)
        fmax = fmax if fmax > 0 else 1e-10
        ratio = math.log10(fmax / fmin)
        return r.clf_earlySNIa_score > 0.76 or (
            r.clf_earlySNIa_score > 0.5 and ratio > 0.5
        )

    want = {r.diaSourceId for r in rubin_pdf.itertuples() if replica(r)}
    assert got == want


def test_remove_unlikely_transients(rubin_df, rubin_pdf):
    got = _ids(apply_named_filter(rubin_df, "rubin.remove_unlikely_transients"))
    want = {
        r.diaSourceId
        for r in rubin_pdf.itertuples()
        if not r.is_sso
        and r.snr > 10
        and r.nDiaSources >= 2
        and not (_good_quality(r) and not r.isNegative)
    }
    assert got == want


def test_gaia_star_zero_parallax_error_matches_pandas(spark):
    """pandas Plx/0.0 is +-inf (inf > 5 true iff Plx > 0); Spark's
    non-ANSI /0 yields NULL — the block branches explicitly so a
    degenerate zero-error star is still vetoed."""
    import pandas as pd

    from fink_filters_spark.filters.rubin import b_xmatched_gaia_star

    pdf = pd.DataFrame(
        {
            "xm_gaiadr3_DR3Name": ["Gaia DR3 1", "Gaia DR3 2", "Gaia DR3 3", None],
            "xm_gaiadr3_Plx": [8.0, -2.0, 8.0, 8.0],
            "xm_gaiadr3_e_Plx": [0.0, 0.0, 1.0, 0.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = [r[0] for r in df.select(b_xmatched_gaia_star(df)).collect()]
    # pandas replica: 8/0=inf>5 True; -2/0=-inf>5 False; 8/1>5 True; unnamed False
    assert got == [True, False, True, False]


def test_early_snia_clamps_and_nan_bands(spark):
    """Reference clamp/NaN semantics on a hand frame (the synthetic
    fixture has no flux holes, so these paths need their own probe):
    f_min floored at 10; missing bands skipped per-band; all-missing
    f_max falls to 1e-10; all-missing f_min keeps ratio undefined."""
    import numpy as np
    import pandas as pd

    from fink_filters_spark.filters.rubin import early_snia_candidate

    nan = float("nan")
    rows = {
        # (score, maxes..., mins...) -> expected
        "clamp_selects": (0.6, [1000.0] * 6, [5.0] * 6, True),   # log10(1000/10)=2
        "low_score": (0.4, [1000.0] * 6, [5.0] * 6, False),
        "nan_bands_skipped": (0.6, [nan, 1000.0, nan, nan, nan, nan],
                              [nan, 50.0, nan, nan, nan, nan], True),
        "all_max_missing": (0.6, [nan] * 6, [50.0] * 6, False),  # fmax->1e-10
        "all_min_missing_mid": (0.6, [1000.0] * 6, [nan] * 6, False),  # ratio nan
        "all_min_missing_hi": (0.8, [1000.0] * 6, [nan] * 6, True),  # first branch
        "nonpositive_max": (0.6, [-3.0] * 6, [5.0] * 6, False),  # fmax->1e-10
    }
    bands = ["u", "g", "r", "i", "z", "y"]
    pdf = pd.DataFrame(
        {
            "case": list(rows),
            "clf_earlySNIa_score": [v[0] for v in rows.values()],
        }
        | {f"{b}_psfFluxMax": [v[1][i] for v in rows.values()]
           for i, b in enumerate(bands)}
        | {f"{b}_psfFluxMin": [v[2][i] for v in rows.values()]
           for i, b in enumerate(bands)}
    )
    df = spark.createDataFrame(pdf)
    got = {r.case for r in df.filter(early_snia_candidate(df)).collect()}
    want = {k for k, v in rows.items() if v[3]}
    assert got == want
    # cross-check the replica against numpy (the reference's own ops)
    for k, (score, maxes, mins, expect) in rows.items():
        fmax = pd.DataFrame([maxes]).max(axis=1).iloc[0]
        fmin = pd.DataFrame([mins]).min(axis=1).iloc[0]
        fmin = np.max([10, fmin])
        fmax = fmax if fmax > 0 else 1e-10
        ratio = np.log10(fmax / fmin)
        ref = bool(score > 0.76 or (score > 0.5 and ratio > 0.5))
        assert ref == expect, k


def test_good_quality_zero_flux_error_matches_pandas(spark):
    """ANSI Spark raises on double /0; the reference's pandas ratio is
    ±inf — b_good_quality must neither crash nor flag a +inf ratio."""
    import pandas as pd

    from fink_filters_spark.filters.rubin import (
        QUALITY_MASK_FLAGS,
        b_good_quality,
    )

    pdf = pd.DataFrame(
        {
            "case": ["pos_inf_ok", "neg_inf_flagged", "neg_zero_err_flagged",
                     "zero_over_zero_ok"],
            "psfFlux": [8.0, -8.0, 8.0, 0.0],
            "psfFluxErr": [0.0, 0.0, -0.0, 0.0],
        }
    )
    for flag in QUALITY_MASK_FLAGS:
        pdf[flag] = False
    df = spark.createDataFrame(pdf)
    got = {r.case for r in df.filter(b_good_quality(df)).collect()}
    # pandas: 8/0=inf<6 False -> good; -8/0=-inf<6 True -> flagged;
    # 8/-0.0=-inf -> flagged; 0/0=nan<6 False BUT psfFlux<0 False -> good
    assert got == {"pos_inf_ok", "zero_over_zero_ok"}


# ---- enrich_mag_rate: the F9 producer (reference filter.py:155-185) ---------

def _ref_mag_rate(band, mjd, flux, prv):
    """Pandas/numpy replica of the reference's per-row loop:
    get_latest_source_same_band -> flux_to_apparent_mag delta / delta_t.
    numpy semantics: log10(<=0) is NaN, x/0 is +-inf, nan/anything NaN."""
    nan = float("nan")

    def npmag(f):
        if f is None or (isinstance(f, float) and math.isnan(f)) or f <= 0:
            return nan
        return -2.5 * math.log10(f) + 31.4

    if not prv:
        return nan
    same = [s for s in prv if s["band"] == band]
    if not same:
        return nan
    latest = max(same, key=lambda s: s["midpointMjdTai"])
    dm = npmag(flux) - npmag(latest["psfFlux"])
    dt = mjd - latest["midpointMjdTai"]
    if dt == 0:
        if math.isnan(dm) or dm == 0:
            return nan
        return math.copysign(float("inf"), dm) * math.copysign(1.0, dt)
    return dm / dt


_PRV_CASES = [
    # (id, band, mjd, flux, prv list) — every branch of the producer
    (1, "r", 60500.0, 10000.0, None),                              # no history
    (2, "r", 60500.0, 10000.0, []),                                # empty
    (3, "r", 60500.0, 10000.0,
     [{"band": "g", "midpointMjdTai": 60498.0, "psfFlux": 9000.0}]),  # other band
    (4, "r", 60500.0, 10000.0,                                     # fading 0.25 mag/d
     [{"band": "r", "midpointMjdTai": 60498.0, "psfFlux": 15848.93}]),
    (5, "g", 60500.0, 20000.0,                                     # rising (latest of 2 wins)
     [{"band": "g", "midpointMjdTai": 60490.0, "psfFlux": 100.0},
      {"band": "g", "midpointMjdTai": 60499.0, "psfFlux": 10000.0}]),
    (6, "i", 60500.0, 10000.0,                                     # prev flux <= 0 -> NULL
     [{"band": "i", "midpointMjdTai": 60499.0, "psfFlux": -5.0}]),
    (7, "z", 60500.0, -10.0,                                       # current flux <= 0 -> NULL
     [{"band": "z", "midpointMjdTai": 60499.0, "psfFlux": 5000.0}]),
    (8, "y", 60500.0, 20000.0,                                     # same-MJD prev -> -inf
     [{"band": "y", "midpointMjdTai": 60500.0, "psfFlux": 10000.0}]),
]


def test_enrich_mag_rate_matches_reference_loop(spark):
    from fink_filters_spark.filters.rubin import enrich_mag_rate

    df = spark.createDataFrame(
        _PRV_CASES,
        "diaSourceId long, band string, midpointMjdTai double, "
        "psfFlux double, prvDiaSources array<struct<band:string,"
        "midpointMjdTai:double,psfFlux:double>>",
    )
    got = {r.diaSourceId: r.mag_rate for r in enrich_mag_rate(df).collect()}
    assert len(got) == len(_PRV_CASES)
    for did, band, mjd, flux, prv in _PRV_CASES:
        want = _ref_mag_rate(band, mjd, flux, prv)
        g = got[did]
        if math.isnan(want):
            # reference NaN == engine NULL (or NaN): both read False in gates
            assert g is None or math.isnan(g), (did, g)
        elif math.isinf(want):
            assert g is not None and math.isinf(g) and (g > 0) == (want > 0), (did, g)
        else:
            assert g is not None and math.isclose(g, want, rel_tol=1e-12), (did, g, want)


def test_extragalactic_new_with_computed_mag_rate(spark, rubin_pdf):
    """End-to-end C37 closure: extragalactic_new selects >0 rows from
    mag_rate PRODUCED by enrich_mag_rate (not injected), and the selection
    matches the full reference pandas replica (near-galaxy + young +
    sampled + bright + the per-band rate gates over the replica-computed
    rate). The crafted histories make both the rising and the fading gate
    fire somewhere."""
    import pandas as pd

    from fink_filters_spark.filters.rubin import enrich_mag_rate

    pdf = rubin_pdf.drop(columns=["mag_rate"]).copy()
    # deterministic histories: row i gets a same-band previous source
    # whose flux ratio sweeps strong-rising..strong-fading; every 3rd row
    # keeps no history; every 5th row's history is in another band
    prv, bands = [], ["u", "g", "r", "i", "z", "y"]
    for i, row in pdf.iterrows():
        if i % 3 == 0:
            prv.append(None)
            continue
        b = row["band"] if i % 5 else bands[(bands.index(row["band"]) + 1) % 6]
        dt = 0.5 + (i % 4)  # 0.5..3.5 days
        ratio = [4.0, 1.5, 1.0, 0.6, 0.25][i % 5]  # prev = now/ratio
        prv.append([{
            "band": b,
            "midpointMjdTai": float(row["midpointMjdTai"] - dt),
            "psfFlux": float(row["psfFlux"] / ratio),
        }])
    pdf["prvDiaSources"] = prv
    df = enrich_mag_rate(spark.createDataFrame(pdf))
    got = _ids(apply_named_filter(df, "rubin.extragalactic_new"))

    def rate_gate(r, rate):
        if math.isnan(rate):
            return False
        age = r.midpointMjdTai - r.firstDiaSourceMjdTaiFink
        rising = rate < -0.2 and age < 3
        fading = (r.band in ("r", "i") and rate > 0.2) or (
            r.band in ("g", "u") and rate > 0.5
        )
        return rising or fading

    want = set()
    rates = []
    for r in pdf.itertuples():
        rate = _ref_mag_rate(r.band, r.midpointMjdTai, r.psfFlux, r.prvDiaSources)
        rates.append(rate)
        if (
            _egal_base(r, "near_galaxy")
            and (r.midpointMjdTai - r.firstDiaSourceMjdTaiFink) < 5
            and getattr(r, f"{r.band}_psfFluxNdata") >= 2
            and r.psfFlux > 0
            and _mag(r.psfFlux) < 24
            and rate_gate(r, rate)
        ):
            want.add(r.diaSourceId)
    # the fixture is non-degenerate: computed rates fire BOTH gate families
    assert any((not math.isnan(x)) and x < -0.2 for x in rates)
    assert any((not math.isnan(x)) and x > 0.2 for x in rates)
    assert len(want) > 0
    assert got == want


def test_enrich_mag_rate_requires_history_column(spark):
    import pytest as _pytest

    from fink_filters_spark.filters.rubin import enrich_mag_rate

    df = spark.createDataFrame([(1.0,)], "psfFlux double")
    with _pytest.raises(Exception):
        enrich_mag_rate(df).collect()


def test_every_rubin_topic_selects_nonzero_on_synthetic(rubin_df):
    """Non-degeneracy pin (parity on zeros is weak evidence: the real
    27-alert fixture yields 0 for 9 of 12 topics, so a topic that
    accidentally became `lit(False)` would still 'match'). On the seeded
    200-row synthetic frame every registered Rubin topic selects a known
    non-zero, non-universal row count — each gate provably fires AND
    discriminates. The dual-path tests above check id-for-id agreement
    with the pandas replicas; this pins the selection sizes."""
    import fink_filters_spark.filters.rubin  # noqa: F401 — registration
    from fink_filters_spark.filters.registry import _REGISTRY

    want = {
        "rubin.early_snia_candidate": 105,
        "rubin.extragalactic_loose": 32,
        "rubin.extragalactic_lt20mag": 5,
        "rubin.extragalactic_new": 2,
        "rubin.extragalactic_svom": 8,
        "rubin.hostless_candidate": 38,
        "rubin.in_tns": 96,
        "rubin.most_likely_sn": 1,
        "rubin.near_galaxy_candidate": 31,
        "rubin.remove_unlikely_transients": 50,
        "rubin.sn_near_galaxy_candidate": 1,
        "rubin.uniform_sample": 2,
    }
    registered = {n for n in _REGISTRY if n.startswith("rubin.")}
    assert registered == set(want), "new topic? add a non-zero pin for it"
    total = rubin_df.count()
    for name, n in want.items():
        got = apply_named_filter(rubin_df, name).count()
        assert got == n, f"{name}: {got} != pinned {n}"
        assert 0 < got < total


def test_vsx_star_excludes_nonstellar_classes(spark):
    """ADVICE round-6 medium: a nonstellar VSX match (AGN variability
    class) must not read as a star — only stellar classes veto the
    extragalactic topics; b_xmatched_vsx (any catalogued match) still
    includes both."""
    import pandas as pd

    from fink_filters_spark.filters.rubin import (
        b_xmatched_vsx,
        b_xmatched_vsx_star,
    )

    pdf = pd.DataFrame(
        {
            "case": ["rr", "agn", "agn_unc", "none", "fail"],
            "xm_vsx_Type": ["RR", "AGN", "AGN:", None, "Fail"],
        }
    )
    df = spark.createDataFrame(pdf)
    star = {r.case for r in df.filter(b_xmatched_vsx_star(df)).collect()}
    anym = {r.case for r in df.filter(b_xmatched_vsx(df)).collect()}
    assert star == {"rr"}
    assert anym == {"rr", "agn", "agn_unc"}


def test_distance_modulus_fit_domain(spark):
    """The packaged mu(z) polynomial holds its advertised <=0.005 mag
    error at the fit-domain edges (and midpoints), and out-of-domain z
    (legacydr8 photo-z > 2, or <1e-4) yields NULL instead of a degree-8
    extrapolation that could flip the sn_near_galaxy Mabs gate."""
    import numpy as np
    import pandas as pd

    from fink_filters_spark.filters.rubin import distance_modulus
    from pyspark.sql import functions as F

    C, H0, Om0 = 299792.458, 70.0, 0.3

    def mu_exact(z):
        zs = np.linspace(0, z, 4096)
        ez = np.sqrt(Om0 * (1 + zs) ** 3 + (1 - Om0))
        dc = C / H0 * np.trapz(1 / ez, zs)
        return 5 * math.log10((1 + z) * dc * 1e6 / 10)

    zin = [1e-4, 2e-4, 0.01, 0.3, 1.0, 1.9, 2.0]
    zout = [0.0, 5e-5, 2.0000001, 2.5, 10.0]
    df = spark.createDataFrame(
        pd.DataFrame({"z": zin + zout})
    ).withColumn("mu", distance_modulus(F.col("z")))
    got = {r.z: r.mu for r in df.collect()}
    for z in zin:
        assert got[z] is not None
        assert abs(got[z] - mu_exact(z)) < 0.006, (z, got[z], mu_exact(z))
    for z in zout:
        assert got[z] is None, (z, got[z])
