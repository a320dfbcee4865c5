"""Per-row array time-series analytics as native higher-order functions.

The reference stores each alert's detection history as an embedded
``list<struct>`` and analyzes it with pandas kernels (fink-filters
``ztf/livestream/filter_kn_candidates/filter.py:186-265``,
``filter_yso_spicy_candidates/filter.py:28-76``). Here the same semantics are
Catalyst expressions over ArrayType columns: ``element_at``, ``aggregate``,
``transform``, ``filter`` — zero Python in the execution path, which is what
lets these run at 100 TB without an Arrow hop per batch.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hist_concat(prv_col: str, cur_col: str) -> Column:
    """history ⧺ [current] — parity with fink-utils ``concat_col``
    (call sites: reference ``ztf/filter_early_tde_candidates/prefilter.py:294-297``).

    Null-safe: an alert's FIRST detection carries a null/absent history
    (``prv_candidates`` empty), and ``concat(null, x)`` would null out the
    whole array — coalesce to empty first.
    """
    prv = F.col(prv_col)
    cur = F.array(F.col(cur_col))
    # slice(cur, 1, 0) = typed empty array matching the element type
    return F.concat(F.coalesce(prv, F.slice(cur, 1, 0)), cur)


def last_el(arr: Column | str, n: int = 1) -> Column:
    """n-th element from the end (reference F1: ``cjd[-1]``); null when the
    array is shorter (try_element_at: ANSI-safe even when subexpression
    elimination hoists the access out of a guarding conjunct)."""
    return F.try_element_at(arr if isinstance(arr, Column) else F.col(arr), F.lit(-n))


def pair_gap(arr: Column | str, i: int, j: int) -> Column:
    """arr[-i] - arr[-j] — gap predicates (reference F8, intra/inter-night)."""
    a = arr if isinstance(arr, Column) else F.col(arr)
    return F.try_element_at(a, F.lit(-i)) - F.try_element_at(a, F.lit(-j))


def rate_last2(val_arr: Column, t_arr: Column) -> Column:
    """Two-point rate (v[-1]-v[-2]) / (t[-1]-t[-2]) — reference F2
    (``filter_kn_candidates/filter.py:236-265``). Null-safe: null if <2 points
    or zero time gap.
    """
    dv = F.try_element_at(val_arr, F.lit(-1)) - F.try_element_at(val_arr, F.lit(-2))
    dt = F.try_element_at(t_arr, F.lit(-1)) - F.try_element_at(t_arr, F.lit(-2))
    return F.when((F.size(t_arr) >= 2) & (dt != 0), dv / dt)


def _sums(x: Column, y: Column):
    """Exact Σ-statistics for a closed-form weighted/plain linear fit.

    Inputs must be integer-valued arrays (parity convention, tables.py) so the
    folds are order-deterministic exact integer math.
    """
    n = F.size(x).cast("long")
    zero = F.lit(0).cast("long")
    # products widened to LONG before multiplying: an array<int> input
    # would otherwise square in int32 and overflow at |v| >= 46341
    # (ANSI abort / non-ANSI silent wrap) despite the long accumulator
    sx = F.aggregate(x, zero, lambda a, v: a + v.cast("long"))
    sy = F.aggregate(y, zero, lambda a, v: a + v.cast("long"))
    sxx = F.aggregate(x, zero, lambda a, v: a + v.cast("long") * v.cast("long"))
    sxy = F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("long") * b.cast("long")),
        zero,
        lambda a, v: a + v,
    )
    syy = F.aggregate(y, zero, lambda a, v: a + v.cast("long") * v.cast("long"))
    return n, sx, sy, sxx, sxy, syy


def linfit_slope(x: Column, y: Column) -> Column:
    """Closed-form least-squares slope over integer arrays — reference F3
    (``filter_rate_based_kn_candidates/filter.py:146-167``, there a scipy
    ``curve_fit`` inside a pandas UDF; here pure Σ-statistics, native).
    """
    n, sx, sy, sxx, sxy, _ = _sums(x, y)
    den = (n * sxx - sx * sx).cast("double")
    num = (n * sxy - sx * sy).cast("double")
    return F.when(den != 0, num / den)


def latest_same_band(
    prv: Column | str, band_field: str, time_field: str, band: Column
) -> Column:
    """Most recent history entry in the SAME band (reference F9:
    ``rubin/livestream/filter_extragalactic_new_candidate/filter.py:55-75``
    scans prvDiaSources for the max-MJD source matching the current band).

    Native max_by over a filtered struct array: returns the matching struct
    (null if the band never appeared before). Entries with a NULL or NaN
    time are EXCLUDED up front: Spark orders NaN above every real value
    (a NaN-MJD entry would always "win" the fold and null out the rate
    the reference computes from the real latest entry), and a NULL-time
    seed would stick in the fold's otherwise(acc) branch.
    """
    arr = F.col(prv) if isinstance(prv, str) else prv
    same = F.filter(
        arr,
        lambda s: (s[band_field] == band)
        & s[time_field].isNotNull()
        & ~F.isnan(s[time_field]),
    )
    # F.get returns null on an empty array (element_at would throw under ANSI)
    return F.aggregate(
        same,
        F.get(same, 0),
        lambda acc, s: F.when(
            acc.isNull() | (s[time_field] > acc[time_field]), s
        ).otherwise(acc),
    )


def linfit_r2(x: Column, y: Column) -> Column:
    """r² of the least-squares fit — reference F5
    (``filter_yso_spicy_candidates/filter.py:28-76``)."""
    n, sx, sy, sxx, sxy, syy = _sums(x, y)
    sxd = (n * sxx - sx * sx).cast("double")
    syd = (n * syy - sy * sy).cast("double")
    cov = (n * sxy - sx * sy).cast("double")
    return F.when((sxd != 0) & (syd != 0), cov * cov / (sxd * syd))


def linfit_r2_double(x: Column, y: Column) -> Column:
    """r² of the least-squares fit over DOUBLE arrays — the float twin of
    ``linfit_r2`` (which demands exact-integer inputs for oracle parity).
    Matches the reference's per-alert numpy ``r2_score``
    (``filter_yso_spicy_candidates/filter.py:28-76``) on raw (jd, magpsf)
    histories; NULL when the x or y spread is zero.

    Inputs are CENTERED on their first element before the Σ folds: r² is
    shift-invariant, and the uncentered ``n·Σx² − (Σx)²`` catastrophically
    cancels in doubles exactly on the advertised use (raw jd ~2.459e6 with
    intra-night spreads ~0.04 d: Σx² has ulp ~1e-2 while the true spread
    statistic is ~0.01 — the naive formula returns 0 or garbage)."""
    zero = F.lit(0.0)
    # try_element_at: ANSI mode (Spark 4 default) makes element_at THROW on
    # an empty array; empty histories must yield NULL like the docstring says
    x0 = F.try_element_at(x, F.lit(1))
    y0 = F.try_element_at(y, F.lit(1))
    xc = F.transform(x, lambda v: v - x0)
    yc = F.transform(y, lambda v: v - y0)
    n = F.size(x).cast("double")
    sx = F.aggregate(xc, zero, lambda a, v: a + v)
    sy = F.aggregate(yc, zero, lambda a, v: a + v)
    sxx = F.aggregate(F.transform(xc, lambda v: v * v), zero, lambda a, v: a + v)
    syy = F.aggregate(F.transform(yc, lambda v: v * v), zero, lambda a, v: a + v)
    sxy = F.aggregate(F.zip_with(xc, yc, lambda a, b: a * b), zero, lambda a, v: a + v)
    sxd = n * sxx - sx * sx
    syd = n * syy - sy * sy
    cov = n * sxy - sx * sy
    # nanvl: a NaN input element (ZTF non-detections carry NaN magpsf)
    # makes every sum NaN, and Spark evaluates NaN != 0 as TRUE — the
    # guard would pass and the result would be NaN, not the documented
    # NULL (which downstream e6 casts and gates rely on)
    return F.nanvl(
        F.when((sxd != 0) & (syd != 0), cov * cov / (sxd * syd)),
        F.lit(None),
    )


def weighted_linfit(x: Column, y: Column, sigma: Column) -> Column:
    """Inverse-variance weighted least squares over double arrays: returns
    struct(slope, slope_err) — the closed form of the reference's
    ``curve_fit(a*x+b, jd, mag, sigma=err)`` (F3,
    ``filter_rate_based_kn_candidates/filter.py:146-167``) and the
    significance test of the rising kernel (F4, ``prefilter.py:69-149``,
    there a weighted ``polyfit`` with a 3-sigma slope cut).

    w = 1/sigma^2;  slope = (Sw*Swxy - Swx*Swy) / (Sw*Swxx - Swx^2);
    slope_err = sqrt(Sw / (Sw*Swxx - Swx^2)).

    NULL result when any sigma is NULL/NaN/<= 0 (a zero photometric
    error is corrupt data — and under ANSI Spark the 1/sigma^2 weight
    would otherwise abort the whole query with DIVIDE_BY_ZERO; CASE
    evaluates the fit only on the valid branch). is_rising then reads
    the NULL as not-significant, the conservative gate outcome.
    """
    # (s*s == 0) additionally catches subnormal sigmas (~<1e-154) whose
    # SQUARE underflows to 0.0 — the division would abort even for s > 0
    bad = F.coalesce(
        F.exists(
            sigma, lambda s: s.isNull() | F.isnan(s) | (s <= 0) | (s * s == 0)
        ),
        F.lit(True),
    )
    w = F.transform(sigma, lambda s: F.lit(1.0) / (s * s))
    zero = F.lit(0.0)
    sw = F.aggregate(w, zero, lambda a, v: a + v)
    swx = F.aggregate(F.zip_with(w, x, lambda wi, xi: wi * xi), zero, lambda a, v: a + v)
    swy = F.aggregate(F.zip_with(w, y, lambda wi, yi: wi * yi), zero, lambda a, v: a + v)
    swxx = F.aggregate(
        F.zip_with(w, x, lambda wi, xi: wi * xi * xi), zero, lambda a, v: a + v
    )
    swxy = F.aggregate(
        F.zip_with(F.zip_with(w, x, lambda wi, xi: wi * xi), y, lambda wx, yi: wx * yi),
        zero,
        lambda a, v: a + v,
    )
    den = sw * swxx - swx * swx
    slope = (sw * swxy - swx * swy) / den
    err = F.sqrt(sw / den)
    return F.when(
        ~bad,
        F.when(den != 0, F.struct(slope.alias("slope"), err.alias("slope_err"))),
    )


def is_rising(
    mag: Column, sigma: Column, jd: Column, n_sigma: float = 3.0
) -> Column:
    """F4 robust rising test (reference ``prefilter.py:69-149``): the source
    brightens significantly — last magnitude below (brighter than) the
    faintest by more than the combined errors, AND the weighted slope is
    negative at ``n_sigma`` significance (mag decreases as it brightens)."""
    last_m = F.try_element_at(mag, F.lit(-1))
    last_s = F.try_element_at(sigma, F.lit(-1))
    max_m = F.array_max(mag)
    # index of the faintest point's sigma via max_by-style fold
    faint_s = F.aggregate(
        F.zip_with(mag, sigma, lambda m, s: F.struct(m.alias("m"), s.alias("s"))),
        F.lit(None).cast("struct<m:double,s:double>"),
        lambda acc, p: F.when(acc.isNull() | (p["m"] > acc["m"]), p).otherwise(acc),
    )["s"]
    significant_rise = (max_m - last_m) > F.lit(n_sigma) * F.sqrt(
        last_s * last_s + faint_s * faint_s
    )
    fit = weighted_linfit(jd, mag, sigma)
    sig_slope = fit.isNotNull() & (
        fit["slope"] < -F.lit(n_sigma) * fit["slope_err"]
    )
    return (F.size(mag) >= 2) & significant_rise & sig_slope
