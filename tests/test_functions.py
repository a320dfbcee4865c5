"""Unit tests for the native Column-expression library."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fink_filters_spark.functions import (
    dc_mag,
    ecl_lat,
    flux2mag,
    gal_b,
    hist_concat,
    linfit_r2,
    linfit_slope,
    mag2fluxcal,
    rate_last2,
    sky_sep,
)


def one(df, col):
    return df.select(col.alias("x")).first()["x"]


def test_sky_sep_known_values(spark):
    df = spark.range(1)
    # identical points
    assert one(df, sky_sep(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0))) == 0.0
    # 90 degrees along the equator
    assert abs(one(df, sky_sep(F.lit(0.0), F.lit(0.0), F.lit(90.0), F.lit(0.0))) - 90) < 1e-9
    # pole to equator
    assert abs(one(df, sky_sep(F.lit(0.0), F.lit(90.0), F.lit(123.0), F.lit(0.0))) - 90) < 1e-9
    # small separation precision (1 arcsec in ra at the equator)
    sep = one(df, sky_sep(F.lit(0.0), F.lit(0.0), F.lit(1 / 3600), F.lit(0.0)))
    assert abs(sep - 1 / 3600) < 1e-12


def test_gal_b_known_values(spark):
    df = spark.range(1)
    # north galactic pole
    assert abs(one(df, gal_b(F.lit(192.85948), F.lit(27.12825))) - 90) < 1e-6
    # galactic center (Sgr A*) is near b=0
    assert abs(one(df, gal_b(F.lit(266.405), F.lit(-28.936)))) < 0.1


def test_ecl_lat_known_values(spark):
    df = spark.range(1)
    # north ecliptic pole: ra=270, dec=90-23.439
    assert abs(one(df, ecl_lat(F.lit(270.0), F.lit(90 - 23.4392911))) - 90) < 1e-6
    # a point on the ecliptic: ra=0, dec=0
    assert abs(one(df, ecl_lat(F.lit(0.0), F.lit(0.0)))) < 1e-9


def test_flux_mag_roundtrip(spark):
    df = spark.range(1)
    # flux2mag: 1 nJy-ish with ZP 31.4
    m = one(df, flux2mag(F.lit(1000.0)))
    assert abs(m - (-2.5 * math.log10(1000.0) + 31.4)) < 1e-12
    f = one(df, mag2fluxcal(F.lit(20.0)))
    assert abs(f - 10 ** (-(20.0 - 25.0) / 2.5) * 1000) < 1e-9


def test_dc_mag_sign_convention(spark):
    df = spark.range(1)
    args = (F.lit(19.0), F.lit(0.1), F.lit(18.0), F.lit(0.1))
    pos = one(df, dc_mag(*args, F.lit("t")))
    neg = one(df, dc_mag(*args, F.lit("f")))
    # positive difference adds flux -> brighter (smaller mag) than reference
    assert pos < 18.0
    # negative difference subtracts flux -> fainter than reference
    assert neg > 18.0


def test_hist_concat_and_rate(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], 3.0, [20.0, 19.0], 18.0)],
        "prv_jd array<double>, jd double, prv_mag array<double>, mag double",
    )
    out = df.select(
        hist_concat("prv_jd", "jd").alias("cjd"),
        hist_concat("prv_mag", "mag").alias("cmag"),
    )
    row = out.first()
    assert row["cjd"] == [1.0, 2.0, 3.0]
    assert row["cmag"] == [20.0, 19.0, 18.0]
    rate = out.select(rate_last2(F.col("cmag"), F.col("cjd")).alias("r")).first()["r"]
    assert abs(rate - (18.0 - 19.0) / (3.0 - 2.0)) < 1e-12


def test_linfit_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1000, 40).tolist()
    y = rng.integers(-500, 500, 40).tolist()
    df = spark.createDataFrame([(x, y)], "x array<long>, y array<long>")
    slope = df.select(linfit_slope(F.col("x"), F.col("y")).alias("s")).first()["s"]
    r2 = df.select(linfit_r2(F.col("x"), F.col("y")).alias("r")).first()["r"]
    np_slope, _ = np.polyfit(np.array(x, dtype=float), np.array(y, dtype=float), 1)
    np_r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(slope - np_slope) < 1e-9
    assert abs(r2 - np_r2) < 1e-9


def test_text_functions(spark):
    from fink_filters_spark.functions import char_fingerprint, token_count, word_shingles
    from fink_filters_spark.functions.text import FP_BASE, FP_MOD

    df = spark.createDataFrame([("hello world foo bar",), ("",)], "text string")
    rows = df.select(
        token_count("text").alias("n"), word_shingles("text", 2).alias("sh")
    ).collect()
    assert rows[0]["n"] == 4
    assert rows[0]["sh"] == ["hello world", "world foo", "foo bar"]
    assert rows[1]["n"] == 0

    fp = df.select(char_fingerprint("text").alias("f")).first()["f"]
    acc = 0
    for ch in "hello world foo bar":
        acc = (acc * FP_BASE + ord(ch)) % FP_MOD
    assert fp == acc


def test_vector_functions(spark):
    from fink_filters_spark.functions.vectors import cosine_sim_q, quantize_vec

    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    out = df.select(
        cosine_sim_q(quantize_vec("a"), quantize_vec("b")).alias("c")
    ).collect()
    assert abs(out[0]["c"] - 1.0) < 1e-9
    assert abs(out[1]["c"]) < 1e-9
    assert abs(out[2]["c"] - 1.0) < 1e-9


def test_schemas_flatten(spark):
    from fink_filters_spark.schemas import (
        RUBIN_ALERT_SCHEMA,
        ZTF_ALERT_SCHEMA,
        flatten_rubin,
        flatten_ztf,
    )

    ztf = spark.createDataFrame([], ZTF_ALERT_SCHEMA)
    flat = flatten_ztf(ztf)
    for c in ("magpsf", "drb", "jd", "cdsxmatch", "roid"):
        assert c in flat.columns
    rubin = spark.createDataFrame([], RUBIN_ALERT_SCHEMA)
    rflat = flatten_rubin(rubin)
    for c in (
        "psfFlux", "snr", "g_psfFluxMean", "xm_simbad_otype",
        "clf_snnSnVsOthers_score", "is_sso", "firstDiaSourceMjdTaiFink",
        "xm_gaiadr3_Plx", "xm_legacydr8_zphot",
    ):
        assert c in rflat.columns


def test_weighted_linfit_matches_numpy(spark):
    from fink_filters_spark.functions.arrays import weighted_linfit

    rng = np.random.default_rng(29)
    x = rng.uniform(0, 10, 25).tolist()
    y = rng.uniform(15, 21, 25).tolist()
    s = rng.uniform(0.05, 0.3, 25).tolist()
    df = spark.createDataFrame(
        [(x, y, s)], "x array<double>, y array<double>, s array<double>"
    )
    fit = df.select(weighted_linfit(F.col("x"), F.col("y"), F.col("s")).alias("f")).first()["f"]
    w = 1.0 / np.array(s) ** 2
    (np_slope, _), cov = np.polyfit(x, y, 1, w=np.sqrt(w), cov="unscaled")
    assert fit["slope"] == pytest.approx(np_slope, rel=1e-9)
    assert fit["slope_err"] == pytest.approx(math.sqrt(cov[0, 0]), rel=1e-6)


def test_is_rising_detects_brightening(spark):
    from fink_filters_spark.functions.arrays import is_rising

    jd = [float(i) for i in range(10)]
    brightening = [20.0 - 0.3 * i for i in range(10)]  # mags decreasing
    fading = [18.0 + 0.3 * i for i in range(10)]
    flat = [19.0 + (0.001 if i % 2 else -0.001) for i in range(10)]
    sig = [0.05] * 10
    df = spark.createDataFrame(
        [(brightening, sig, jd), (fading, sig, jd), (flat, sig, jd)],
        "mag array<double>, sigma array<double>, jd array<double>",
    )
    got = [
        r["r"]
        for r in df.select(
            is_rising(F.col("mag"), F.col("sigma"), F.col("jd")).alias("r")
        ).collect()
    ]
    assert got == [True, False, False]


def test_dynamic_dotted_filter_resolution(spark):
    import sys
    import types

    from fink_filters_spark.filters import apply_named_filter

    # a user-supplied filter module (the reference's A1/A2 contract: resolve
    # a dotted path to a plain df -> Column builder)
    mod = types.ModuleType("user_filters_dyn")
    mod.high_drb = lambda df: F.col("drb") > 0.5
    sys.modules["user_filters_dyn"] = mod
    try:
        df = spark.createDataFrame([(1, 0.9), (2, 0.1)], "candid long, drb double")
        out = apply_named_filter(df, "user_filters_dyn.high_drb")
        assert {r.candid for r in out.collect()} == {1}
    finally:
        del sys.modules["user_filters_dyn"]


def test_sql_function_registration_matches_column_exprs(spark):
    """The SQL-UDF surface (CREATE FUNCTION ... RETURN expr) must agree
    bit-for-bit with the Column-expression library on real coordinates."""
    from pyspark.sql import functions as F

    from fink_filters_spark.functions.astro import (
        dc_mag,
        ecl_lat,
        flux2mag,
        gal_b,
        gal_l,
        mag2fluxcal,
        register_sql_functions,
        sky_sep,
    )

    names = register_sql_functions(spark)
    assert {"sky_sep", "gal_b", "gal_l", "ecl_lat", "mag2fluxcal", "flux2mag", "dc_mag"} <= set(names)

    df = spark.createDataFrame(
        [
            (10.68, 41.27, 10.70, 41.26, 18.5, 0.1, 17.0, 0.05, "t"),
            (266.40, -28.94, 266.41, -28.93, 20.1, 0.2, 19.5, 0.08, "f"),
            (0.0, 89.9, 359.9, 89.85, 21.0, 0.3, 22.0, 0.1, "1"),
        ],
        "ra1 double, dec1 double, ra2 double, dec2 double, magpsf double, "
        "sigmapsf double, magnr double, sigmagnr double, isdiffpos string",
    )
    df.createOrReplaceTempView("astro_probe")
    via_sql = spark.sql(
        """SELECT sky_sep(ra1, dec1, ra2, dec2) AS sep,
                  gal_l(ra1, dec1) AS l,
                  gal_b(ra1, dec1) AS b,
                  ecl_lat(ra1, dec1) AS beta,
                  mag2fluxcal(magpsf) AS flux,
                  flux2mag(mag2fluxcal(magpsf), 31.4) AS mag_rt,
                  dc_mag(magpsf, sigmapsf, magnr, sigmagnr, isdiffpos) AS dcm
           FROM astro_probe"""
    ).collect()
    via_col = df.select(
        sky_sep("ra1", "dec1", "ra2", "dec2").alias("sep"),
        gal_l("ra1", "dec1").alias("l"),
        gal_b("ra1", "dec1").alias("b"),
        ecl_lat("ra1", "dec1").alias("beta"),
        mag2fluxcal("magpsf").alias("flux"),
        flux2mag(mag2fluxcal("magpsf"), 31.4).alias("mag_rt"),
        dc_mag("magpsf", "sigmapsf", "magnr", "sigmagnr", "isdiffpos").alias("dcm"),
    ).collect()
    for rs, rc in zip(via_sql, via_col):
        for field in ("sep", "l", "b", "beta", "flux", "mag_rt", "dcm"):
            assert rs[field] == rc[field], (field, rs[field], rc[field])


def test_udtf_segment_history(spark):
    """Python UDTF (Spark 4): SQL-callable table function splits a history
    array into gap-separated segments with per-segment stats."""
    from fink_filters_spark.functions.udtf_demo import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, [0, 10, 20, 1000, 1010]), (2, [5])],
        "id long, ts array<bigint>",
    ).createOrReplaceTempView("alerts_udtf")
    rows = spark.sql(
        "SELECT a.id, s.* FROM alerts_udtf a, "
        "LATERAL segment_history(a.ts, 100) s ORDER BY a.id, s.seg"
    ).collect()
    got = [(r.id, r.seg, r.t_start, r.t_end, r.n_points) for r in rows]
    assert got == [
        (1, 0, 0, 20, 3),      # first night: 0,10,20
        (1, 1, 1000, 1010, 2), # gap > 100 -> new segment
        (2, 0, 5, 5, 1),
    ]


def test_linfit_r2_double_no_catastrophic_cancellation(spark):
    """Regression: raw ZTF jd values (~2.459e6) with intra-night spread
    (~0.04 d) catastrophically cancel the uncentered n*Sxx - Sx^2 in
    doubles (the naive formula returned NULL for a clean r^2=0.996
    trend); centering on the first element fixes it exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    from fink_filters_spark.functions.arrays import linfit_r2_double

    rng = np.random.default_rng(9)
    jd0 = 2459000.0
    x = jd0 + np.sort(rng.uniform(0, 0.04, 8))
    y = 18.0 + 25.0 * (x - jd0) + rng.normal(0, 0.002, 8)
    # local numpy reference (centered, exact)
    xc, yc = x - x.mean(), y - y.mean()
    want = float((xc @ yc) ** 2 / ((xc @ xc) * (yc @ yc)))
    assert want > 0.9

    df = spark.createDataFrame(
        [(1, [float(v) for v in x], [float(v) for v in y])],
        "id long, xs array<double>, ys array<double>",
    )
    got = df.select(linfit_r2_double("xs", "ys").alias("r2")).collect()[0].r2
    assert got is not None, "cancellation regression: r2 must not be NULL"
    assert abs(got - want) < 1e-9
    # shift-invariance: same answer on rebased inputs
    df2 = spark.createDataFrame(
        [(1, [float(v - jd0) for v in x], [float(v) for v in y])],
        "id long, xs array<double>, ys array<double>",
    )
    got2 = df2.select(linfit_r2_double("xs", "ys").alias("r2")).collect()[0].r2
    assert abs(got2 - got) < 1e-9


def test_quality_expr_empty_document_no_ansi_abort(spark):
    """ADVICE round-6 low: an empty document has length(text) == 0; under
    ANSI mode the punctuation term's division must not abort the query —
    empty text scores a zero punctuation penalty, identically in Spark
    and the DuckDB oracle expression."""
    import duckdb
    import pandas as pd

    from fink_filters_spark.queries.text import quality_expr, quality_sql_expr

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "hi there!", "   "]})
    got = {
        r.doc_id: r.q
        for r in spark.createDataFrame(pdf)
        .select("doc_id", quality_expr().alias("q"))
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = dict(
        con.sql(
            f"SELECT doc_id, {quality_sql_expr()} AS q FROM "
            "(SELECT doc_id, text, string_split_regex(lower(trim(text)), "
            "'\\s+') AS toks FROM documents)"
        ).fetchall()
    )
    assert got == want and len(got) == 3


def test_repetition_stats_known_values_and_oracle_parity(spark):
    """Gopher repetition signals: hand-computed values on crafted docs,
    and Spark == DuckDB on the exact ppm surface (incl. the single-token
    doc whose bigram list is empty)."""
    import duckdb
    import pandas as pd

    from fink_filters_spark.queries.text import (
        TEXT_REPETITION_SQL,
        q_text_repetition,
    )
    from unittest import mock
    import fink_filters_spark.queries.text as textq

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "a a a a b",            # top=4/5, bigrams: aa aa aa ab -> dup 2/4
                "w x y z",              # no repetition
                "solo",                 # single token, zero bigrams
                "go go go go go",       # fully repetitive
                "a b",                  # short: top 500000 ppm but UNDER the floor
                None,                   # NULL text: dropped on BOTH sides
            ],
        }
    )
    toy = spark.createDataFrame(pdf)
    # queries.text binds load_table at module import — patch that binding
    with mock.patch.object(textq, "load_table", lambda s, d, t: toy):
        rows = {r.doc_id: r for r in q_text_repetition(spark, "x").collect()}

    r1 = rows[1]
    assert (r1.n_tok, r1.top_tok_ppm, r1.n_bigrams, r1.dup_bigram_ppm) == (
        5, 800000, 4, 500000,
    )
    assert r1.is_repetitive
    r2 = rows[2]
    assert (r2.top_tok_ppm, r2.dup_bigram_ppm, r2.is_repetitive) == (
        250000, 0, False,
    )
    r3 = rows[3]
    assert (r3.n_tok, r3.top_tok_ppm, r3.n_bigrams, r3.dup_bigram_ppm) == (
        1, 1000000, 0, 0,
    )
    assert rows[4].dup_bigram_ppm == 750000 and rows[4].is_repetitive
    # min-token floor: a 2-token all-distinct doc is NOT repetitive
    assert rows[5].top_tok_ppm == 500000 and not rows[5].is_repetitive
    # NULL text dropped symmetrically (the oracle's unnest drops it too)
    assert set(rows) == {1, 2, 3, 4, 5}

    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        row[0]: row
        for row in con.sql(TEXT_REPETITION_SQL).fetchall()
    }
    for did, r in rows.items():
        assert want[did] == (
            r.doc_id, r.n_tok, r.top_tok_ppm, r.n_bigrams,
            r.dup_bigram_ppm, r.is_repetitive,
        ), did
