"""Rubin/LSST blocks and topics (SURVEY §2.C C36-C38) as composable Column
expressions — the Spark-native version of ``rubin/blocks.py``'s reusable
boolean blocks, replicated block-by-block against the reference
(``fink_filters/rubin/blocks.py``, ``rubin/utils.py``, and each
``rubin/livestream/filter_*/filter.py``) on its REAL alert layout
(``datatest/rubin_test_data_10_0.parquet``).

Column model (what ``schemas.flatten_rubin`` produces from a real alert):
``diaSource.*`` leaves unprefixed (psfFlux, psfFluxErr, snr, band,
midpointMjdTai, ra, dec, the 16 quality-mask flags, isNegative, …),
``diaObject.*`` per-band running statistics unprefixed
({band}_psfFluxMean/MeanErr/Max/Min/Ndata, nDiaSources — F6's
struct-carried state), ``misc.*`` Fink-added leaves unprefixed
(firstDiaSourceMjdTaiFink), ``pred.is_sso`` as is_sso, crossmatch leaves
as ``xm_<field>`` (xm_simbad_otype, xm_gaiadr3_Plx, xm_vsx_Type,
xm_mangrove_lum_dist, xm_legacydr8_zphot, …), classifier scores as
``clf_<field>`` (clf_snnSnVsOthers_score, clf_cats_class, clf_cats_score,
clf_earlySNIa_score, clf_elephant_kstest_template).

NULL semantics: the reference evaluates blocks in pandas, where a
comparison against NaN/None yields False; each block therefore wraps its
raw predicate in ``coalesce(expr, false)`` (``_f``) so a missing
crossmatch or per-band statistic behaves exactly like the reference —
never a three-valued NULL that silently drops through an outer negation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.astro import flux2mag, gal_b
from .registry import register
from .ztf import EG_HOST_CLASSES

# blocks.py:29 — values treated as "no match" in string crossmatch columns
# (None/NaN are handled via explicit isNull branches below).
BAD_VALUES = ["Unknown", "Fail", "Fail 504"]

# blocks.py:372-418 b_good_quality: the exact 16-flag mask (NOT the
# centered/suspect variants — those are deliberately absent from the
# reference's mask).
QUALITY_MASK_FLAGS = [
    "isDipole",
    "pixelFlags",
    "pixelFlags_bad",
    "pixelFlags_saturated",
    "pixelFlags_streakCenter",
    "pixelFlags_interpolated",
    "pixelFlags_cr",
    "pixelFlags_nodata",
    "pixelFlags_streak",
    "pixelFlags_edge",
    "psfFlux_flag",
    "apFlux_flag",
    "forced_PsfFlux_flag",
    "forced_PsfFlux_flag_edge",
    "shape_flag",
    "centroid_flag",
]

BANDS = ["u", "g", "r", "i", "z", "y"]


def _f(expr: Column) -> Column:
    """pandas NaN-comparison semantics: NULL -> False (see module doc)."""
    return F.coalesce(expr, F.lit(False))


def _d(col: str) -> Column:
    """Read a possibly-missing double column with pandas semantics: Spark
    orders NaN ABOVE every value (NaN > x is true), pandas yields False —
    nanvl folds NaN to NULL so downstream comparisons go NULL -> _f False."""
    return F.nanvl(F.col(col), F.lit(None))


def _pandas_ratio(num: Column, den: Column) -> Column:
    """num/den with the reference's pandas/IEEE semantics under ANSI Spark
    (which raises DIVIDE_BY_ZERO even for doubles, verified on this
    session): a ±0 denominator produces a signed infinity (the string
    cast distinguishes -0.0, which Spark's ``== 0`` does not), 0/0
    produces NULL (pandas NaN — compares False either way under ``_f``).
    Infinity comparisons then match pandas exactly (inf > x true,
    -inf < x true)."""
    inf = F.lit(float("inf"))
    neg_zero = den.cast("string").startswith("-")
    signed_inf = F.when(neg_zero, -F.signum(num) * inf).otherwise(
        F.signum(num) * inf
    )
    return F.when(
        den == 0,
        F.when(num == 0, F.lit(None).cast("double")).otherwise(signed_inf),
    ).otherwise(num / den)


# ---- blocks (C36, rubin/blocks.py:32-418) -----------------------------------

def b_is_solar_system(df: DataFrame) -> Column:
    """blocks.py:32-47: pred.is_sso passthrough."""
    return _f(F.col("is_sso"))


def b_outside_galactic_plane(df: DataFrame, deg: float) -> Column:
    """blocks.py:50-103 (_20_deg / _5_deg): |galactic b| > deg, computed
    natively (no astropy) from diaSource ra/dec."""
    return _f(F.abs(gal_b("ra", "dec")) > deg)


def b_xmatched_simbad_galaxy(df: DataFrame) -> Column:
    """blocks.py:106-127: simbad_otype in fink-utils' extragalactic-host
    allowlist (vendored as EG_HOST_CLASSES, filters/ztf.py:26)."""
    return _f(F.col("xm_simbad_otype").isin(EG_HOST_CLASSES))


def b_xmatched_simbad_unknown(df: DataFrame) -> Column:
    """blocks.py:130-151: simbad_otype in BAD_VALUES (None/NaN included)."""
    return F.col("xm_simbad_otype").isNull() | F.col("xm_simbad_otype").isin(
        BAD_VALUES
    )


def b_xmatched_mangrove(df: DataFrame) -> Column:
    """blocks.py:154-175: mangrove_lum_dist > 0 (NaN -> False)."""
    return _f(_d("xm_mangrove_lum_dist") > 0)


def b_xmatched_gaia_star(df: DataFrame) -> Column:
    """blocks.py:178-210: named in Gaia DR3 AND significant parallax
    (Plx/e_Plx > 5); a NaN parallax ratio is False, as in pandas. The
    division goes through ``_pandas_ratio``: this session runs ANSI mode
    where a raw /0 — even double/double — raises DIVIDE_BY_ZERO, while
    the pandas reference yields ±inf (sign of -0.0 included)."""
    named = F.col("xm_gaiadr3_DR3Name").isNotNull() & ~F.col(
        "xm_gaiadr3_DR3Name"
    ).isin(BAD_VALUES)
    ratio = _pandas_ratio(_d("xm_gaiadr3_Plx"), _d("xm_gaiadr3_e_Plx"))
    return named & _f(ratio > 5)


# The nonstellar side of fink-utils' VSX stellar/nonstellar split
# (fink_utils/xmatch/vsx.py return_list_of_nonstellar): the AAVSO VSX
# type vocabulary's extragalactic variability classes — AGN, BL Lac
# objects, quasars (":" marks VSX's uncertain-classification suffix).
# The two fink-utils lists partition the catalogued vocabulary (the
# reference's b_xmatched_vsx is their concatenation and means "any VSX
# match", blocks.py:238-259), so stellar == catalogued AND NOT nonstellar.
# VENDORED TRANSCRIPTION — provenance + pinned upstream copy in
# filters/provenance.py; tests/test_provenance.py guards drift.
VSX_NONSTELLAR_CLASSES = ["AGN", "AGN:", "BLLAC", "BLLAC:", "QSO", "QSO:"]


def b_xmatched_vsx_star(df: DataFrame) -> Column:
    """blocks.py:213-235: vsx_Type in fink-utils' stellar class list,
    expressed as catalogued-and-not-nonstellar (the lists partition, see
    VSX_NONSTELLAR_CLASSES). A nonstellar VSX match (AGN variability) is
    therefore NOT vetoed from the extragalactic topics — matching the
    reference, where only return_list_of_stellar() members veto."""
    return (
        F.col("xm_vsx_Type").isNotNull()
        & ~F.col("xm_vsx_Type").isin(BAD_VALUES)
        & ~F.col("xm_vsx_Type").isin(VSX_NONSTELLAR_CLASSES)
    )


def b_xmatched_vsx(df: DataFrame) -> Column:
    """blocks.py:238-259: stellar + nonstellar == any catalogued VSX type."""
    return F.col("xm_vsx_Type").isNotNull() & ~F.col("xm_vsx_Type").isin(
        BAD_VALUES
    )


def _band_stat(stat: str) -> Column:
    """F6: per-band struct-carried statistic lookup — chained CASE on the
    band column over the 6 {band}_{stat} columns. The Spark-native version
    of ``rubin/utils.py:48-86`` (safe_diaobject_extract + per-row format)."""
    expr = F.lit(None).cast("double")
    for b in BANDS:
        expr = F.when(F.col("band") == b, F.nanvl(F.col(f"{b}_{stat}"), F.lit(None))).otherwise(expr)
    return expr


def b_is_rising(df: DataFrame) -> Column:
    """blocks.py:262-299 via utils.py:88-112: diff = psfFlux − per-band
    running mean; significant iff |diff| > meanErr; rising = significant ∧
    diff > 0 (NaN mean for SSO/new objects -> False)."""
    diff = _d("psfFlux") - _band_stat("psfFluxMean")
    significant = F.abs(diff) > _band_stat("psfFluxMeanErr")
    return _f(significant & (diff > 0))


def b_is_fading(df: DataFrame) -> Column:
    """blocks.py:302-339: significant ∧ diff < 0."""
    diff = _d("psfFlux") - _band_stat("psfFluxMean")
    significant = F.abs(diff) > _band_stat("psfFluxMeanErr")
    return _f(significant & (diff < 0))


def b_is_new(df: DataFrame) -> Column:
    """blocks.py:342-369: this alert IS the first detection
    (midpointMjdTai == firstDiaSourceMjdTaiFink, the Fink-added misc leaf)."""
    return _f(F.col("midpointMjdTai") == _d("firstDiaSourceMjdTaiFink"))


def b_good_quality(df: DataFrame) -> Column:
    """blocks.py:372-418: NOT (any of the 16 mask flags ∨ psfFlux < 0 ∨
    psfFlux/psfFluxErr < 6). Uses the flux ratio, not the snr column.

    Planner hazard note: Catalyst's ``getAllValidConstraints`` re-
    canonicalizes a filter condition once per project alias; with this
    18-term mask under a ~70-alias flatten projection the streaming
    micro-batch re-optimization loops for seconds and OOMs the driver
    (jstack: UnaryNode.getAllValidConstraints -> semanticEquals ->
    buildCanonicalizedPlan, on a 27-row fixture). The engine session
    therefore disables constraint propagation (session.DYNAMIC_CONF
    ``spark.sql.constraintPropagation.enabled=false``) — plan-budget
    tests confirm no query loses pushdown or gains a shuffle from it."""
    flagged = F.lit(False)
    for flag in QUALITY_MASK_FLAGS:
        flagged = flagged | _f(F.col(flag))
    flagged = flagged | _f(_d("psfFlux") < 0)
    # _pandas_ratio: ANSI Spark raises on /0 even for doubles; pandas
    # yields ±inf (flagged iff -inf, i.e. ratio < 6 stays IEEE-correct)
    flagged = flagged | _f(_pandas_ratio(_d("psfFlux"), _d("psfFluxErr")) < 6)
    return ~flagged


def b_has_two_points_same_band(df: DataFrame) -> Column:
    """filter_extragalactic_new_candidate/filter.py:26-53: current band has
    >= 2 detections ({band}_psfFluxNdata >= 2)."""
    return _f(_band_stat("psfFluxNdata") >= 2)


# ---- extragalactic base (blocks.py:421-531) ----------------------------------

def extragalactic_base(df: DataFrame, flavor: str) -> Column:
    """blocks.py:421-531: good quality ∧ host evidence ∧ |b|>20° ∧ ¬SSO ∧
    not a catalogued star. ``loose`` also admits SIMBAD-unknown sources;
    ``near_galaxy`` requires positive host evidence."""
    galaxy = b_xmatched_simbad_galaxy(df)
    unknown = b_xmatched_simbad_unknown(df)
    mangrove = b_xmatched_mangrove(df)
    # photo-z counts only if SIMBAD did not catalogue the source as a star
    legacy_valid = _f(_d("xm_legacydr8_zphot") > 0) & (unknown | galaxy)
    not_star = ~b_xmatched_gaia_star(df) & ~b_xmatched_vsx_star(df)
    common = (
        b_good_quality(df)
        & b_outside_galactic_plane(df, 20)
        & ~b_is_solar_system(df)
        & not_star
    )
    if flavor == "near_galaxy":
        return common & (galaxy | mangrove | legacy_valid)
    if flavor == "loose":
        return common & (galaxy | mangrove | legacy_valid | unknown)
    raise ValueError(f"extragalactic_base: unknown flavor {flavor!r}")


# distance modulus mu(z) for flat LambdaCDM H0=70, Om0=0.3 (the reference's
# compute_peak_absolute_magnitude cosmology, rubin/utils.py:215-260) as a
# degree-8 polynomial in log10(z), max |error| 0.005 mag over z in
# [1e-4, 2] — a pure codegen expression, no astropy, no UDF, no join.
_MU_COEFFS = [
    -0.0002736360945069047,
    -0.005897708986764081,
    -0.05206066585946296,
    -0.24084165866071355,
    -0.6059821276196005,
    -0.7023590270499394,
    0.12228007321020372,
    6.198309239984632,
    44.100271201176994,
]


def distance_modulus(z: Column) -> Column:
    """mu(z) = 5 log10(D_L / 10pc) via the packaged polynomial (see above).

    The polynomial is fitted on z in [1e-4, 2]; OUTSIDE that range it
    extrapolates with unbounded error (a degree-8 poly in log10 z blows
    up fast), which could flip the sn_near_galaxy (-23, -13) Mabs gate
    for a legacydr8 photo-z above 2 — so out-of-range z yields NULL (the
    reference would compute a real astropy mu there; NULL reads as
    "no valid photo-z" downstream, the conservative parity choice, and
    test_distance_modulus_fit_domain pins the poly error at the edges)."""
    valid = (z >= 1e-4) & (z <= 2.0)
    x = F.log10(F.when(valid, z))
    mu = F.lit(_MU_COEFFS[0])
    for c in _MU_COEFFS[1:]:
        mu = mu * x + F.lit(c)
    return mu


def peak_absolute_magnitude(df: DataFrame) -> Column:
    """utils.py:215-260 compute_peak_absolute_magnitude: max psfFluxMax
    across bands -> apparent AB mag -> absolute mag via photo-z."""
    max_flux = F.greatest(*[F.nanvl(F.col(f"{b}_psfFluxMax"), F.lit(None)) for b in BANDS])
    apparent = flux2mag(F.when(max_flux > 0, max_flux))
    z = F.when(_d("xm_legacydr8_zphot") > 0, _d("xm_legacydr8_zphot"))
    return apparent - distance_modulus(z)


# ---- topics (C37/C38) -------------------------------------------------------

@register(
    "rubin.extragalactic_loose",
    reference="rubin/blocks.py:603-668 (b_extragalactic_loose_candidate)",
)
def extragalactic_loose(df: DataFrame) -> Column:
    """C37: extragalactic_base(flavor='loose')."""
    return extragalactic_base(df, "loose")


@register(
    "rubin.near_galaxy_candidate",
    reference="rubin/blocks.py:534-600 (b_extragalactic_near_galaxy_candidate)",
)
def near_galaxy_candidate(df: DataFrame) -> Column:
    """C37: extragalactic_base(flavor='near_galaxy')."""
    return extragalactic_base(df, "near_galaxy")


@register(
    "rubin.sn_near_galaxy_candidate",
    reference="rubin/livestream/filter_sn_near_galaxy_candidate/filter.py:88-118",
)
def sn_near_galaxy_candidate(df: DataFrame) -> Column:
    """C37: near-galaxy ∧ nDiaSources > 5 ∧ peak absolute magnitude in
    (−23, −13) — the SN luminosity range."""
    mabs = peak_absolute_magnitude(df)
    return (
        near_galaxy_candidate(df)
        & _f(F.col("nDiaSources") > 5)
        & _f((mabs > -23) & (mabs < -13))
    )


@register(
    "rubin.extragalactic_lt20mag",
    reference="rubin/livestream/filter_extragalactic_lt20mag_candidate/filter.py:85-110",
)
def extragalactic_lt20mag(df: DataFrame) -> Column:
    """C37: loose extragalactic ∧ mag<20 ∧ rising ∧ sampled (>4 sources,
    older than 1 day since first Fink detection)."""
    return (
        extragalactic_loose(df)
        & _f(flux2mag("psfFlux") < 20)
        & b_is_rising(df)
        & _f(F.col("nDiaSources") > 4)
        & _f(
            F.col("midpointMjdTai") - _d("firstDiaSourceMjdTaiFink") > 1
        )
    )


def enrich_mag_rate(df: DataFrame, prv_col: str = "prvDiaSources") -> DataFrame:
    """The ``mag_rate`` producer (mag/day vs the latest PREVIOUS source in
    the same band) — the upstream enrichment ``extragalactic_new``
    consumes. Reference
    ``rubin/livestream/filter_extragalactic_new_candidate/filter.py:155-185``:
    per row, scan prvDiaSources for the max-MJD source in the current
    band, then ``rate = (mag(psfFlux) - mag(prev.psfFlux)) / (mjd -
    prev.mjd)``. Here the scan is the native ``latest_same_band`` HOF
    (functions/arrays.py — filter + max_by fold, row-local, zero shuffle)
    and the division is ``_pandas_ratio`` so a same-MJD previous source
    yields an IEEE infinity (pandas semantics) instead of an ANSI
    DIVIDE_BY_ZERO abort.

    NULL propagation matches the reference's NaN flow exactly: no
    history / band never seen before / non-positive flux (log10 -> NaN
    in pandas, NULL here) all make mag_rate NULL, which every downstream
    rate gate reads as False via ``_f``."""
    from ..functions.arrays import latest_same_band

    prev = latest_same_band(prv_col, "band", "midpointMjdTai", F.col("band"))
    delta_mag = flux2mag("psfFlux") - flux2mag(
        F.nanvl(prev["psfFlux"], F.lit(None))
    )
    delta_t = F.col("midpointMjdTai") - F.nanvl(
        prev["midpointMjdTai"], F.lit(None)
    )
    return df.withColumn("mag_rate", _pandas_ratio(delta_mag, delta_t))


@register(
    "rubin.extragalactic_new",
    reference="rubin/livestream/filter_extragalactic_new_candidate/filter.py:139-195",
)
def extragalactic_new(df: DataFrame) -> Column:
    """C37: near-galaxy ∧ young (<5d) ∧ ≥2 points in band ∧ mag<24 ∧
    per-band rate gates. ``mag_rate`` (mag/day vs the latest same-band
    previous source) is the F9 latest-same-band enrichment produced by
    ``enrich_mag_rate`` upstream from prvDiaSources (functions/arrays.py
    HOFs) — the Spark split of the reference's per-row
    get_latest_source_same_band loop."""
    age = F.col("midpointMjdTai") - _d("firstDiaSourceMjdTaiFink")
    rising_gate = _f((_d("mag_rate") < -0.2) & (age < 3))
    fading_gate = _f(
        (F.col("band").isin("r", "i") & (_d("mag_rate") > 0.2))
        | (F.col("band").isin("g", "u") & (_d("mag_rate") > 0.5))
    )
    return (
        near_galaxy_candidate(df)
        & _f(age < 5)
        & b_has_two_points_same_band(df)
        & _f(flux2mag("psfFlux") < 24)
        & (rising_gate | fading_gate)
    )


@register(
    "rubin.extragalactic_svom",
    reference="rubin/livestream/filter_extragalactic_svom/filter.py:85-110",
)
def extragalactic_svom(df: DataFrame) -> Column:
    """C37: near-galaxy ∧ young (<5d) ∧ mag<24 — SVOM follow-up shortlist."""
    return (
        near_galaxy_candidate(df)
        & _f(
            F.col("midpointMjdTai") - _d("firstDiaSourceMjdTaiFink") < 5
        )
        & _f(flux2mag("psfFlux") < 24)
    )


@register(
    "rubin.hostless_candidate",
    reference="rubin/livestream/filter_hostless_candidate/filter.py:55-67",
)
def hostless_candidate(df: DataFrame) -> Column:
    """C37: hostless image statistic ∧ bright ∧ quality ∧ off-plane."""
    return (
        b_good_quality(df)
        & _f(_d("clf_elephant_kstest_template") < 0.95)
        & b_outside_galactic_plane(df, 20)
        & _f(flux2mag("psfFlux") <= 21.5)
    )


@register(
    "rubin.in_tns",
    reference="rubin/livestream/filter_in_tns/filter.py:23-49",
    hbase_support=True,
)
def in_tns(df: DataFrame) -> Column:
    """C37: already reported to TNS (tns_fullname injected upstream — the
    reference doctest itself does withColumn('tns_fullname', ...))."""
    return F.col("tns_fullname").isNotNull()


@register(
    "rubin.most_likely_sn",
    reference="rubin/livestream/filter_most_likely_sn/filter.py:66-85",
)
def most_likely_sn(df: DataFrame) -> Column:
    """C37: high-SNR multi-detection with concordant classifiers. NOTE the
    reference conjoins ``~(b_good_quality ∧ ~isNegative)`` (filter.py:75-83)
    — surprising but replicated as written (SURVEY §7)."""
    good = b_good_quality(df) & ~_f(F.col("isNegative"))
    return (
        _f(_d("snr") > 10)
        & _f(F.col("nDiaSources") >= 2)
        & _f(_d("clf_snnSnVsOthers_score") >= 0.7)
        & _f(F.col("clf_cats_class") == 11)
        & _f(_d("clf_cats_score") >= 0.9)
        & ~b_is_solar_system(df)
        & ~good
    )


@register(
    "rubin.remove_unlikely_transients",
    reference="rubin/livestream/filter_remove_unlikely_transients/filter.py:55-75",
)
def remove_unlikely_transients(df: DataFrame) -> Column:
    """C37: keep ¬SSO ∧ snr>10 ∧ ≥2 sources ∧ ¬(good ∧ ¬negative) — same
    inverted-quality composition as most_likely_sn, replicated as written."""
    good = b_good_quality(df) & ~_f(F.col("isNegative"))
    return (
        ~b_is_solar_system(df)
        & _f(_d("snr") > 10)
        & _f(F.col("nDiaSources") >= 2)
        & ~good
    )


@register(
    "rubin.early_snia_candidate",
    reference="rubin/attic/filter_early_snia_candidate/filter.py:50-59",
)
def early_snia_candidate(df: DataFrame) -> Column:
    """C37 (attic): score>0.76, or score>0.5 with a large flux rise.
    Reference clamps (filter.py:50-55): f_min = max(10, min-flux) but a
    missing min stays missing (pandas np.max([10, nan]) is nan -> ratio
    nan -> False); f_max falls back to 1e-10 when not > 0 — INCLUDING
    the missing case (nan > 0 is False in pandas)."""
    fmin_raw = _flux_min(df)
    fmax_raw = _flux_max(df)
    f_min = F.when(fmin_raw < 10, F.lit(10.0)).otherwise(fmin_raw)
    f_max = F.when(fmax_raw > 0, fmax_raw).otherwise(F.lit(1e-10))
    ratio = F.log10(f_max / f_min)
    return _f(_d("clf_earlySNIa_score") > 0.76) | (
        _f(_d("clf_earlySNIa_score") > 0.5) & _f(ratio > 0.5)
    )


def _flux_max(df: DataFrame) -> Column:
    """E6: cross-column max over the 6 per-band maxima (utils.py:137-190).
    nanvl folds NaN to NULL so greatest/least skip missing bands exactly
    like pandas max/min(skipna=True); all-missing stays NULL."""
    return F.greatest(*[F.nanvl(F.col(f"{b}_psfFluxMax"), F.lit(None)) for b in BANDS])


def _flux_min(df: DataFrame) -> Column:
    return F.least(*[F.nanvl(F.col(f"{b}_psfFluxMin"), F.lit(None)) for b in BANDS])


@register(
    "rubin.uniform_sample",
    reference="rubin/livestream/filter_uniform_sample/filter.py:50",
)
def uniform_sample(df: DataFrame) -> Column:
    """C38: deterministic-by-key ~1% sample: diaSourceId % 113 == 0."""
    return F.col("diaSourceId") % 113 == 0


def topic_columns() -> list[str]:
    """The flattened columns the Rubin topic surface consumes — callers
    streaming wide alert packets should project to these right after
    flatten_rubin so the per-topic plans (and their codegen classes) stay
    proportional to the filter logic, not to the ~190-leaf packet.
    Includes the two upstream-enrichment columns (tns_fullname for
    in_tns, mag_rate for extragalactic_new) — inject them BEFORE
    projecting, or drop those topics from the pass."""
    cols = [
        "tns_fullname",
        "mag_rate",
        "diaSourceId", "midpointMjdTai", "ra", "dec", "band",
        "psfFlux", "psfFluxErr", "snr", "isNegative",
        "nDiaSources", "firstDiaSourceMjdTaiFink", "is_sso",
        "xm_simbad_otype", "xm_mangrove_lum_dist", "xm_gaiadr3_DR3Name",
        "xm_gaiadr3_Plx", "xm_gaiadr3_e_Plx", "xm_vsx_Type",
        "xm_legacydr8_zphot",
        "clf_snnSnVsOthers_score", "clf_cats_class", "clf_cats_score",
        "clf_earlySNIa_score", "clf_elephant_kstest_template",
    ]
    cols += QUALITY_MASK_FLAGS
    cols += [
        f"{b}_{stat}"
        for b in BANDS
        for stat in (
            "psfFluxMean", "psfFluxMeanErr", "psfFluxMax", "psfFluxMin",
            "psfFluxNdata",
        )
    ]
    return cols
