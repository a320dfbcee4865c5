"""Dual-path tests on the REFERENCE's real alert fixtures.

The synthetic-frame tests (test_filters_ztf/rubin) pin predicate semantics;
these pin schema compatibility: the registry filters must bind and select
correctly on the reference's actual nested alert parquet
(``/root/reference/datatest``, 55 top-level fields, 103-field candidate
struct, struct-of-list histories) after ``schemas.flatten_ztf`` /
``flatten_rubin``.

Expected counts come from an INDEPENDENT pandas path that reads the same
parquet with pyarrow and evaluates the reference's kernel semantics on the
raw structs (``pdf['candidate'].apply(lambda x: x['rb'])`` style, as in the
reference doctests, e.g. ``ztf/filter_quality_cuts/filter.py`` Examples).

The reference's absolute doctest goldens (13 SN candidates, 329 quality
cuts, ...) are NOT asserted here: this snapshot's ``datatest/regular``
holds 133 alerts (3 of the original 5 part-files; the ``.crc`` sidecars for
the two missing parts are still present), so full-dataset goldens are
unreachable regardless of filter logic.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

REF = "/root/reference/datatest"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def ztf_raw(spark):
    return spark.read.parquet(f"{REF}/regular")


@pytest.fixture(scope="module")
def ztf_flat(ztf_raw):
    from fink_filters_spark.schemas import flatten_ztf

    return flatten_ztf(ztf_raw)


@pytest.fixture(scope="module")
def ztf_pdf():
    return pd.read_parquet(f"{REF}/regular")


def _cand(pdf: pd.DataFrame, field: str) -> pd.Series:
    return pdf["candidate"].apply(lambda x: x[field])


def test_flatten_ztf_on_real_alerts(ztf_raw, ztf_flat):
    assert ztf_raw.count() == 133
    cols = set(ztf_flat.columns)
    # candidate leaves surfaced next to top-level science/xmatch columns
    for c in ("magpsf", "drb", "classtar", "jd", "jdstarthist", "ndethist",
              "rb", "nbad", "isdiffpos", "cdsxmatch", "DR3Name", "tns",
              "roid", "mulens", "snn_snia_vs_nonia"):
        assert c in cols, c
    assert ztf_flat.count() == 133


def test_ztf_filters_match_pandas_on_real_alerts(ztf_flat, ztf_pdf):
    """Spark registry filters == independent pandas evaluation of the same
    predicates over the raw nested structs, on real alert data."""
    import fink_filters_spark.filters.ztf as zf
    from fink_filters_spark.filters.registry import apply_named_filter

    pdf = ztf_pdf
    rb = _cand(pdf, "rb")
    nbad = _cand(pdf, "nbad")
    drb = _cand(pdf, "drb")
    magpsf = _cand(pdf, "magpsf")
    jd = _cand(pdf, "jd")
    jdstarthist = _cand(pdf, "jdstarthist")
    cds = pdf["cdsxmatch"]
    expected = {
        "ztf.quality_cuts": int(((rb >= 0.55) & (nbad == 0)).sum()),
        "ztf.blazar": int(cds.isin(zf.BLAZAR_CLASSES).sum()),
        "ztf.rrlyr": int(cds.isin(zf.RRLYR_CLASSES).sum()),
        "ztf.simbad_grav_candidates": int(cds.isin(zf.GRAV_CLASSES).sum()),
        "ztf.yso_candidates": int(cds.isin(zf.YSO_CLASSES).sum()),
        "ztf.sso_ztf_candidates": int((pdf["roid"] == 3).sum()),
        "ztf.sso_fink_candidates": int((pdf["roid"] == 2).sum()),
        "ztf.microlensing_candidates": int((pdf["mulens"] > 0).sum()),
        "ztf.gaia_dr3_candidates": int((pdf["DR3Name"].astype(str) != "nan").sum()),
        "ztf.tracklet_candidates": int(
            pdf["tracklet"].astype(str).str.startswith("TRCK_").sum()
        ),
        "ztf.vra": int(
            ((cds == "Unknown") & (pdf["roid"] != 3) & (magpsf > 19.5) & (drb > 0.5)).sum()
        ),
        "ztf.tns_match": int(
            (pdf["tns"].fillna("").ne("") & (jd - jdstarthist <= 30)).sum()
        ),
    }
    for name, want in expected.items():
        got = apply_named_filter(ztf_flat, name).count()
        assert got == want, f"{name}: spark={got} pandas={want}"


def test_ztf_sn_family_on_real_alerts(ztf_flat, ztf_pdf):
    """SN-candidate family (C2/C3) vs the pandas replica of the reference
    predicate (ztf/livestream/filter_sn_candidates/filter.py:86-104)."""
    import fink_filters_spark.filters.ztf as zf
    from fink_filters_spark.filters.registry import apply_named_filter

    pdf = ztf_pdf
    drb = _cand(pdf, "drb")
    classtar = _cand(pdf, "classtar")
    jd = _cand(pdf, "jd")
    jdstarthist = _cand(pdf, "jdstarthist")
    ndethist = _cand(pdf, "ndethist")
    base = (
        ((pdf["snn_snia_vs_nonia"] > 0.5) | (pdf["snn_sn_vs_all"] > 0.5))
        & pdf["cdsxmatch"].isin(zf.EG_HOST_CLASSES)
        & (jd - jdstarthist <= 90)
        & (drb > 0.5)
        & (classtar > 0.4)
        & (ndethist > 1)
        & (pdf["roid"] != 3)
    )
    early = base & (ndethist <= 20) & (pdf["rf_snia_vs_nonia"] > 0.5)
    assert apply_named_filter(ztf_flat, "ztf.sn_candidates").count() == int(base.sum())
    assert apply_named_filter(ztf_flat, "ztf.early_sn_candidates").count() == int(early.sum())


def test_ztf_history_filters_run_on_real_alerts(ztf_flat):
    """orphan_grb consumes prv_candidates histories -> hist_concat must
    produce well-formed cjd/cmagpsf/cfid arrays from the real
    list<struct> (A3, reference prefilter.py:294-297 call pattern)."""
    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.functions.arrays import hist_concat

    df = ztf_flat
    # the reference doctest expands exactly these four history columns
    # (filter.py: to_expand = ['jd', 'fid', 'ssnamenr', 'magpsf'])
    for leaf in ("jd", "magpsf", "fid", "ssnamenr"):
        df = df.withColumn(f"c{leaf}", hist_concat(f"prv_candidates.{leaf}", leaf))
    n = apply_named_filter(df, "ztf.orphan_grb").count()
    # the reference's own doctest golden on this snapshot family is 0
    assert 0 <= n <= 133


def test_ztf_classification_and_unknowns_on_real_alerts(ztf_flat, spark):
    """K1 classification runs on the real frame; unknowns == rows whose
    fink_class is 'Unknown' (reference filter_unknowns semantics)."""
    from fink_filters_spark.filters.classification import extract_fink_classification
    from fink_filters_spark.filters.registry import apply_named_filter

    df = extract_fink_classification(ztf_flat)
    tagged = {r["fink_class"]: r["n"] for r in
              df.groupBy("fink_class").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(tagged.values()) == 133
    n_unknown = tagged.get("Unknown", 0)
    assert apply_named_filter(df, "ztf.unknowns").count() == n_unknown


@pytest.fixture(scope="module")
def rubin_flat(spark):
    from fink_filters_spark.schemas import flatten_rubin

    return flatten_rubin(spark.read.parquet(f"{REF}/rubin_test_data_10_0.parquet"))


# The reference publishes doctest counts for every block and livestream
# topic ON THIS EXACT FIXTURE (each filter.py doctest runs apply_block over
# datatest/rubin_test_data_10_0.parquet via tester.py:81 and pins count()).
# These are the reference's own numbers, not ours.
RUBIN_BLOCK_DOCTEST_COUNTS = {
    # rubin/blocks.py doctests
    "b_is_solar_system": 3,
    "b_outside_galactic_plane_20_deg": 27,
    "b_outside_galactic_plane_5_deg": 27,
    "b_xmatched_simbad_galaxy": 0,
    "b_xmatched_simbad_unknown": 27,
    "b_xmatched_mangrove": 0,
    "b_xmatched_gaia_star": 0,
    "b_xmatched_vsx_star": 0,
    "b_xmatched_vsx": 0,
    "b_is_rising": 1,
    "b_is_fading": 0,
    "b_is_new": 26,
    "b_good_quality": 7,
    "b_extragalactic_loose_candidate": 4,
    "b_extragalactic_near_galaxy_candidate": 0,
}
RUBIN_TOPIC_DOCTEST_COUNTS = {
    # rubin/livestream/filter_*/filter.py + attic doctests
    "rubin.extragalactic_loose": 4,
    "rubin.near_galaxy_candidate": 0,
    "rubin.sn_near_galaxy_candidate": 0,
    "rubin.extragalactic_lt20mag": 0,
    "rubin.extragalactic_new": 0,
    "rubin.extragalactic_svom": 0,
    "rubin.hostless_candidate": 0,
    "rubin.in_tns": 0,
    "rubin.most_likely_sn": 0,
    "rubin.remove_unlikely_transients": 0,
    "rubin.early_snia_candidate": 0,
}


def _rubin_enriched(flat):
    """The upstream enrichments the reference's own doctests inject:
    tns_fullname (filter_in_tns doctest does withColumn) and the F9
    mag_rate lookup — COMPUTED from the fixture's real prvDiaSources via
    enrich_mag_rate (one alert carries 2 previous sources; the rest
    yield NULL exactly like the reference's NaN flow). Falls back to a
    NULL column only when the caller pruned prvDiaSources from the scan
    (a topic pass that doesn't consume mag_rate)."""
    from fink_filters_spark.filters.rubin import enrich_mag_rate

    flat = flat.withColumn("tns_fullname", F.lit(None).cast("string"))
    if "prvDiaSources" in flat.columns:
        return enrich_mag_rate(flat)
    return flat.withColumn("mag_rate", F.lit(None).cast("double"))


def test_rubin_blocks_match_reference_doctest_counts(rubin_flat):
    """C36 parity: every block in filters/rubin.py reproduces the
    reference's published doctest count on the REAL 27-alert fixture."""
    from fink_filters_spark.filters import rubin as R

    flat = _rubin_enriched(rubin_flat).cache()
    blocks = {
        "b_is_solar_system": R.b_is_solar_system(flat),
        "b_outside_galactic_plane_20_deg": R.b_outside_galactic_plane(flat, 20),
        "b_outside_galactic_plane_5_deg": R.b_outside_galactic_plane(flat, 5),
        "b_xmatched_simbad_galaxy": R.b_xmatched_simbad_galaxy(flat),
        "b_xmatched_simbad_unknown": R.b_xmatched_simbad_unknown(flat),
        "b_xmatched_mangrove": R.b_xmatched_mangrove(flat),
        "b_xmatched_gaia_star": R.b_xmatched_gaia_star(flat),
        "b_xmatched_vsx_star": R.b_xmatched_vsx_star(flat),
        "b_xmatched_vsx": R.b_xmatched_vsx(flat),
        "b_is_rising": R.b_is_rising(flat),
        "b_is_fading": R.b_is_fading(flat),
        "b_is_new": R.b_is_new(flat),
        "b_good_quality": R.b_good_quality(flat),
        "b_extragalactic_loose_candidate": R.extragalactic_base(flat, "loose"),
        "b_extragalactic_near_galaxy_candidate": R.extragalactic_base(
            flat, "near_galaxy"
        ),
    }
    assert blocks.keys() == RUBIN_BLOCK_DOCTEST_COUNTS.keys()
    for name, cond in blocks.items():
        got = flat.filter(cond).count()
        assert got == RUBIN_BLOCK_DOCTEST_COUNTS[name], (
            f"{name}: got {got}, reference doctest says "
            f"{RUBIN_BLOCK_DOCTEST_COUNTS[name]}"
        )


def test_rubin_topics_match_reference_doctest_counts(rubin_flat):
    """C37 parity: every registered Rubin topic reproduces the reference's
    published doctest count on the REAL fixture, plus the data-driven
    uniform_sample count."""
    from fink_filters_spark.filters.registry import apply_named_filter

    flat = _rubin_enriched(rubin_flat).cache()
    for topic, want in RUBIN_TOPIC_DOCTEST_COUNTS.items():
        got = apply_named_filter(flat, topic).count()
        assert got == want, (
            f"{topic}: got {got}, reference doctest says {want}"
        )
    rpdf = pd.read_parquet(f"{REF}/rubin_test_data_10_0.parquet")
    sample = int((rpdf["diaSourceId"] % 113 == 0).sum())
    assert apply_named_filter(flat, "rubin.uniform_sample").count() == sample


def test_fits_codec_on_real_ztf_cutouts(ztf_raw, spark):
    """The pure-numpy FITS codec decodes the reference's ACTUAL alert
    cutouts (gzipped 63x63 float32 FITS stamps), and the distributed
    stamp_kstest pipeline reproduces the local decode+clip+KS result on
    them — real-survey-data proof, not synthetic round-trips."""
    from fink_filters_spark.operators.fits import (
        normal_ks_statistic,
        parse_fits,
        sigma_clip,
    )
    from fink_filters_spark.operators.multimodal import stamp_kstest

    sel = ztf_raw.select(
        "candid",
        F.col("cutoutScience.stampData").alias("sci"),
        F.col("cutoutTemplate.stampData").alias("tmpl"),
    ).limit(20)
    local = {}
    for r in sel.collect():
        arr, hdr = parse_fits(bytes(r.sci))
        assert arr.shape == (63, 63) and hdr["BITPIX"] == -32
        local[r.candid] = normal_ks_statistic(sigma_clip(arr))
    got = {
        r.doc_id: r.kstest_science
        for r in stamp_kstest(sel, "candid", "sci", "tmpl").collect()
    }
    assert set(got) == set(local)
    for candid, expect in local.items():
        assert got[candid] == pytest.approx(expect, abs=1e-12)
    # statistics are in the meaningful range the hostless thresholds assume
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_tde_pipeline_on_real_tde_alerts(spark):
    """The early-TDE pipeline binds to the reference's REAL TDE fixture
    (datatest/tde: ZTF20abfcszi alerts): native prefilter + nested-history
    extraction stage real brightening candidates, and the Rainbow sigmoid
    fit runs on the actual light curve (mag -> flux), recovering a
    positive amplitude/rise time — the flow the reference executes in a
    per-candidate driver loop (filter_early_tde_candidates), here fully
    distributed."""
    from fink_filters_spark.operators.fit import sigmoid_fit_per_key
    from fink_filters_spark.programs.tde import prefilter_alerts, rising_rate
    from fink_filters_spark.schemas import flatten_ztf

    flat = flatten_ztf(spark.read.parquet(f"{REF}/tde"))
    staged = rising_rate(prefilter_alerts(flat))
    staged = staged.filter(F.col("rise_rate") < 0)  # pipeline's rising cut
    rows = staged.select("objectId", "nneg", "rise_rate").collect()
    assert len(rows) > 0  # real TDE alerts survive the reference cuts
    assert all(r.nneg <= 1 for r in rows)
    assert all(r.rise_rate < 0 for r in rows)  # brightening (mag decreasing)

    # Rainbow fit over the real embedded light curve: one row per (object,
    # epoch), mag -> linear flux (reference lcs.py works in flux space)
    lc = (
        staged.select(
            F.crc32(F.col("objectId")).cast("long").alias("user_id"),
            F.explode(F.arrays_zip("cjd", "cmagpsf")).alias("p"),
        )
        .select(
            "user_id",
            (F.col("p.cjd") * 24.0).alias("xh"),  # days -> hours
            F.pow(F.lit(10.0), 0.4 * (20.0 - F.col("p.cmagpsf"))).alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    fits = sigmoid_fit_per_key(lc, rebase_div=None).collect()
    assert len(fits) >= 1
    ok = [r for r in fits if r.amplitude is not None]
    assert ok, "real TDE light curve must admit a sigmoid fit"
    for r in ok:
        assert r.amplitude > 0 and r.rise_time > 0  # log-parameterized


REF_DATA = "/root/reference/fink_filters/data"


def _sexagesimal_deg(s: str, hourangle: bool) -> float:
    sign = -1.0 if s.strip().startswith("-") else 1.0
    parts = [float(p) for p in s.replace("+", " ").replace("-", " ").split()]
    parts += [0.0] * (3 - len(parts))  # catalog rows may omit seconds
    val = parts[0] + parts[1] / 60.0 + parts[2] / 3600.0
    return sign * val * (15.0 if hourangle else 1.0)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="packaged catalogs absent")
def test_known_tde_crossmatch_matches_reference_golden(spark):
    """D2 fixed-radius nearest against the reference's REAL packaged TDE
    catalog (data/tde.parquet, 148 sources) on the REAL datatest/tde
    alerts — the reference doctest golden is exactly 1 match at 5 arcsec
    (filter_known_tde/filter.py doctest)."""
    import pandas as pd

    from fink_filters_spark.operators.crossmatch import crossmatch

    cat = spark.createDataFrame(
        pd.read_parquet(f"{REF_DATA}/tde.parquet").rename(
            columns={"ra": "cat_ra", "dec": "cat_dec", "name": "tde_name"}
        )
    )
    alerts = spark.read.parquet(f"{REF}/tde").select(
        F.col("candid").alias("aid"),
        F.col("candidate.ra").alias("ra"),
        F.col("candidate.dec").alias("dec"),
        F.col("candidate.isdiffpos").alias("isdiffpos"),
    ).filter(F.col("isdiffpos").isin("t", "1"))
    # production semantics (nearest source per ALERT): every epoch of
    # ZTF20abfcszi sits within 5 arcsec of its catalog entry
    fwd = crossmatch(alerts, cat, df_id="aid", radius_deg=5.0 / 3600.0)
    rows = fwd.select("aid", "tde_name").collect()
    assert len(rows) == 21
    assert {r.tde_name for r in rows} == {"AT 2020mot"}
    # reference doctest semantics: fink-utils' cross_match_astropy labels
    # only the nearest alert per CATALOG SOURCE (a reprocessing artifact
    # the reference's own comments acknowledge) -> golden is exactly 1.
    # Same operator, roles swapped: reverse-nearest is just a crossmatch
    # with the alert side as the broadcast catalog.
    rev = crossmatch(
        cat.withColumnRenamed("cat_ra", "ra").withColumnRenamed("cat_dec", "dec")
        .withColumn("cid", F.monotonically_increasing_id()),
        alerts.select(F.col("ra").alias("cat_ra"), F.col("dec").alias("cat_dec"), "aid"),
        df_id="cid",
        radius_deg=5.0 / 3600.0,
    )
    labeled_alerts = rev.select("aid").distinct().count()
    assert labeled_alerts == 1  # the reference's doctest golden


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="packaged catalogs absent")
def test_dwarf_agn_variable_radius_matches_reference_golden(spark):
    """D3/D4 per-catalog-source radius against the REAL dwarf-AGN catalog
    (16 MaNGA sources, per-source Re_arc radii) on datatest/dwarf_agn —
    reference golden: exactly 1 alert matches (filter_dwarf_agn doctest)."""
    import pandas as pd

    from fink_filters_spark.operators.crossmatch import crossmatch

    pdf = pd.read_parquet(f"{REF_DATA}/list_dwarfs_AGN_RADEC.parquet").rename(
        columns={"RA": "cat_ra", "DEC": "cat_dec"}
    )
    cat = spark.createDataFrame(pdf)
    alerts = spark.read.parquet(f"{REF}/dwarf_agn").select(
        F.col("candid").alias("aid"),
        F.col("candidate.ra").alias("ra"),
        F.col("candidate.dec").alias("dec"),
    )
    out = crossmatch(
        alerts,
        cat,
        df_id="aid",
        radius_deg=F.col("Re_arc") / 3600.0,
        max_radius_deg=float(pdf.Re_arc.max()) / 3600.0,
    )
    rows = out.select("aid", "MaNGAID", "sep_deg").collect()
    assert len(rows) == 1  # the reference's doctest golden
    assert rows[0].MaNGAID.startswith("manga-")


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="packaged catalogs absent")
def test_symbiotic_crossmatch_matches_reference_golden(spark):
    """D2 enrichment against the REAL symbiotic/cataclysmic catalog (2857
    sources, sexagesimal hourangle coordinates, 0.5 arcsec radii) on
    datatest/symbiotic — reference golden: 19 of the 20 alerts match
    (filter_symbiotic_stars doctest)."""
    import pandas as pd

    from fink_filters_spark.operators.crossmatch import crossmatch

    pdf = pd.read_parquet(f"{REF_DATA}/symbiotic_and_cataclysmic.parquet")
    pdf["ra"] = [_sexagesimal_deg(s, hourangle=True) for s in pdf["RA(J2000)"]]
    pdf["dec"] = [_sexagesimal_deg(s, hourangle=False) for s in pdf["DEC(J2000)"]]
    pdf["cid"] = range(len(pdf))
    cat = spark.createDataFrame(pdf[["cid", "Name", "source", "ra", "dec", "Radius"]])
    alerts = spark.read.parquet(f"{REF}/symbiotic").select(
        F.col("candid").alias("aid"),
        F.col("candidate.ra").alias("cat_ra"),
        F.col("candidate.dec").alias("cat_dec"),
    )
    assert alerts.count() == 20
    # reference doctest semantics (see known_tde test): nearest alert per
    # CATALOG SOURCE within the source's own radius; 20 alerts, two of
    # them share a source, so exactly 19 get labeled
    rev = crossmatch(
        cat,
        alerts,
        df_id="cid",
        radius_deg=F.col("Radius") / 3600.0,
        max_radius_deg=0.5 / 3600.0,
    )
    labeled_alerts = rev.select("aid").distinct().count()
    assert labeled_alerts == 19  # the reference's doctest golden


def test_mm_module_grb_tiers_match_reference_goldens(spark):
    """C34 multi-messenger tiers on the REAL datatest/grb fixture (joined
    GCN x ZTF events): the reference doctest goldens are bronze=4,
    silver=2, gold=1 and gw_bronze=0 (filter_mm_module/filter.py)."""
    from fink_filters_spark.filters.registry import apply_named_filter

    df = spark.read.parquet(f"{REF}/grb/grb_test_data.parquet")
    got = {
        tier: apply_named_filter(df, f"ztf.{tier}").count()
        for tier in ("mm_grb_bronze", "mm_grb_silver", "mm_grb_gold", "mm_gw_bronze")
    }
    assert got == {
        "mm_grb_bronze": 4,
        "mm_grb_silver": 2,
        "mm_grb_gold": 1,
        "mm_gw_bronze": 0,
    }


def test_yso_spicy_matches_reference_golden(spark):
    """C20 on the REAL datatest/spicy_yso fixture: SPICY class known,
    |r-band feature slope| > 0.025, and r-band history r² > 0.6 — the r²
    computed NATIVELY from the embedded (jd, magpsf, fid) arrays with the
    engine's closed-form linfit_r2 (same math as the reference's
    per-alert numpy r2_score). Reference doctest golden: 6."""
    from fink_filters_spark.functions.arrays import hist_concat, linfit_r2_double

    df = spark.read.parquet(f"{REF}/spicy_yso").withColumn(
        "linear_fit_slope", F.col("lc_features_r.linear_fit_slope")
    )
    for leaf in ("jd", "magpsf", "fid"):
        df = df.withColumn(f"c{leaf}", hist_concat(f"prv_candidates.{leaf}", f"candidate.{leaf}"))
    pairs = F.filter(
        F.arrays_zip("cjd", "cmagpsf", "cfid"),
        lambda p: (p["cfid"] == 2) & ~F.isnan(p["cmagpsf"]) & p["cmagpsf"].isNotNull(),
    )
    xs = F.transform(pairs, lambda p: p["cjd"])
    ys = F.transform(pairs, lambda p: p["cmagpsf"])
    out = (
        df.withColumn("r2", F.when(F.size(pairs) >= 5, linfit_r2_double(xs, ys)))
        .filter(
            ~F.col("spicy_class").isin("Unknown")
            & F.col("spicy_class").isNotNull()
            & (F.abs(F.col("linear_fit_slope")) > 0.025)
            & (F.col("r2") > 0.6)
        )
    )
    assert out.count() == 6  # the reference's doctest golden


def test_night_gap_kernels_on_real_histories(ztf_flat, ztf_pdf):
    """F8 night-gap kernels on REAL embedded histories: the native Column
    expressions (try_element_at gaps + trailing-nulls check) reproduce the
    reference's numpy intra/inter_night_transients
    (filter_new_hostless/utils.py:145-237) computed independently in
    pandas on the same alerts (54 intra / 10 inter on this snapshot)."""
    from fink_filters_spark.functions.arrays import hist_concat, pair_gap

    pdf = ztf_pdf
    cjd = pd.Series([
        [d["jd"] for d in (p if p is not None else [])] + [c["jd"]]
        for p, c in zip(pdf["prv_candidates"], pdf["candidate"])
    ])
    cmag = pd.Series([
        [d["magpsf"] for d in (p if p is not None else [])] + [c["magpsf"]]
        for p, c in zip(pdf["prv_candidates"], pdf["candidate"])
    ])

    def n_present(arrs, nobs):
        return arrs.apply(lambda x: sum(i is not None for i in x[-nobs:]))

    want_intra = int((
        (n_present(cmag, 2) == 2)
        & (cjd.apply(lambda x: x[-1] - x[-2] if len(x) >= 2 else 99) < 0.5)
    ).sum())
    want_inter = int((
        (n_present(cmag, 3) == 3)
        & (cjd.apply(lambda x: x[-1] - x[-2] if len(x) >= 3 else -1) > 0.5)
        & (cjd.apply(lambda x: x[-2] - x[-3] if len(x) >= 3 else 99) < 0.5)
    ).sum())
    assert (want_intra, want_inter) == (54, 10)  # pinned for this snapshot

    df = ztf_flat
    for leaf in ("jd", "magpsf"):
        df = df.withColumn(f"c{leaf}", hist_concat(f"prv_candidates.{leaf}", leaf))
    last_ok = lambda n: (
        F.size(F.filter(F.slice("cmagpsf", -n, n), lambda v: v.isNotNull())) == n
    ) & (F.size("cmagpsf") >= n)
    got_intra = df.filter(last_ok(2) & (pair_gap("cjd", 1, 2) < 0.5)).count()
    got_inter = df.filter(
        last_ok(3)
        & (pair_gap("cjd", 1, 2) > 0.5)
        & (pair_gap("cjd", 2, 3) < 0.5)
    ).count()
    assert (got_intra, got_inter) == (want_intra, want_inter)


REF_TDE_MODELS = "/root/reference/fink_filters/ztf/filter_early_tde_candidates/data"

# Deterministic feature matrix in physically plausible ranges for the
# models' stored feature contract (e_reference_time [days], rise_time
# [days], temperature [K], distnr [arcsec]); broad uses the first three.
_TDE_PIN_X = [
    [0.5, 10.0, 15000.0, 0.1],
    [2.0, 30.0, 30000.0, 0.5],
    [10.0, 5.0, 8000.0, 1.5],
    [0.1, 50.0, 50000.0, 0.05],
    [5.0, 20.0, 20000.0, 3.0],
    [1.0, 15.0, 12000.0, 0.3],
    [0.2, 80.0, 6000.0, 0.8],
    [3.0, 3.0, 40000.0, 0.02],
]
# golden probabilities from the numpy UBJSON reader on the REAL packaged
# models (pinned: any reader or parser drift breaks this test)
_TDE_PIN_NUCLEAR = [0.8900553901, 0.6137845478, 0.1183909022, 0.7863164133,
                    0.3469229693, 0.7857057291, 0.2096200393, 0.7218432939]
_TDE_PIN_BROAD = [0.8824727737, 0.8497432395, 0.2081925614, 0.8534614026,
                  0.7578479195, 0.7962893516, 0.3230423393, 0.6817531204]


@pytest.mark.skipif(not os.path.isdir(REF_TDE_MODELS),
                    reason="packaged models absent")
def test_real_ubj_models_score_pinned_goldens():
    """I-ML golden parity: the reference's REAL packaged early-TDE
    classifiers (``model_nuclear.ubj``/``model_broad.ubj``, loaded by the
    reference at ``filter_early_tde_candidates/filter.py:79-85``) parse
    through the numpy UBJSON reader with the expected structure and score
    a pinned feature matrix to stored golden probabilities."""
    import numpy as np

    from fink_filters_spark.operators.ml import REFERENCE_TDE_FEATURES
    from fink_filters_spark.operators.xgb_ubj import XGBEnsemble, ubjson_loads

    X = np.array(_TDE_PIN_X)
    for which, nfeat, golden in (("nuclear", 4, _TDE_PIN_NUCLEAR),
                                 ("broad", 3, _TDE_PIN_BROAD)):
        payload = open(f"{REF_TDE_MODELS}/model_{which}.ubj", "rb").read()
        learner = ubjson_loads(payload)["learner"]
        assert learner["objective"]["name"] == "binary:logistic"
        assert int(learner["learner_model_param"]["num_feature"]) == nfeat
        assert len(learner["gradient_booster"]["model"]["trees"]) == 100
        assert tuple(learner["feature_names"]) == REFERENCE_TDE_FEATURES[which]
        model = XGBEnsemble.from_ubj(payload)
        probs = model.predict_proba_batch(X[:, :nfeat])
        np.testing.assert_allclose(probs, golden, rtol=1e-8, atol=1e-10)


@pytest.mark.skipif(not os.path.isdir(REF_TDE_MODELS) or not os.path.isdir(REF),
                    reason="reference fixtures absent")
def test_real_tde_curve_scored_by_real_models(spark):
    """F10 end-to-end fidelity: the REAL ZTF20abfcszi light curve
    (datatest/tde), deduplicated across its alert packets, fits the
    constant-temperature multiband Rainbow model in the distributed kernel
    and is scored by the reference's REAL ``model_broad.ubj`` on its exact
    stored feature contract (e_reference_time, rise_time, temperature) —
    the full chain of ``filter.py:158-218`` with zero stand-ins. Goldens
    pin the engine's own fit+score numerics (drift detection); they are
    not asserted against the ``light-curve`` package, which is absent
    offline."""
    from fink_filters_spark.operators.fit import rainbow_mc_score_per_key
    from fink_filters_spark.operators.ml import (
        REFERENCE_TDE_FEATURES, load_reference_tde_model,
    )
    from fink_filters_spark.schemas import flatten_ztf

    flat = flatten_ztf(spark.read.parquet(f"{REF}/tde"))
    lc = (
        flat.select(
            F.crc32(F.col("objectId")).cast("long").alias("user_id"),
            F.explode(
                F.arrays_zip(
                    F.col("prv_candidates.jd").alias("jd"),
                    F.col("prv_candidates.magpsf").alias("magpsf"),
                    F.col("prv_candidates.fid").alias("fid"),
                )
            ).alias("p"),
        )
        .select(
            "user_id",
            F.col("p.jd").alias("t"),  # days, the reference's fit unit
            F.pow(F.lit(10.0), 0.4 * (20.0 - F.col("p.magpsf"))).alias("v"),
            F.when(F.col("p.fid") == 1, "g").otherwise("r").alias("band"),
        )
        .filter(F.col("v").isNotNull())
        .dropDuplicates(["user_id", "t", "v", "band"])
    )
    model = load_reference_tde_model("broad")
    out = rainbow_mc_score_per_key(
        lc, model, key="user_id", t_col="t", y_col="v",
        band_col="band", band_wave_aa={"g": 4770.0, "r": 6231.0, "i": 7625.0},
        feature_names=REFERENCE_TDE_FEATURES["broad"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 55  # distinct (jd, mag, band) epochs in this snapshot
    # engine-pinned fit goldens for this curve (6-dp kernel rounding)
    assert r.amplitude == pytest.approx(4.432921, abs=1e-5)
    assert r.rise_time == pytest.approx(9.630325, abs=1e-5)
    assert r.r_chisq == pytest.approx(0.060496, abs=1e-5)
    # real-model score of the real best fit
    assert r.best_score == pytest.approx(0.323042, abs=1e-5)
    assert r.frac_scores is not None  # MC ran (seeded by crc32(objectId))

    # nuclear model: same fit features + the latest alert packet's REAL
    # host-nucleus offset (the reference's 4th feature, distnr)
    from fink_filters_spark.operators.fit import rainbow_fit_arrays

    pts = lc.orderBy("t").collect()
    t_arr = np.array([p.t for p in pts])
    v_arr = np.array([p.v for p in pts])
    b_arr = np.array([p.band for p in pts], dtype=object)
    fit = rainbow_fit_arrays(
        t_arr, v_arr,
        band_wave_aa={"g": 4770.0, "r": 6231.0, "i": 7625.0}, bands=b_arr,
    )
    assert fit["temperature"] == pytest.approx(5763.386779, abs=0.01)
    latest = flat.orderBy(F.desc("jd")).select("distnr").first()
    assert latest.distnr == pytest.approx(0.178270, abs=1e-5)
    nuclear = load_reference_tde_model("nuclear")
    feats = np.array([[fit["e_reference_time"], fit["rise_time"],
                       fit["temperature"], float(latest.distnr)]])
    assert nuclear.predict_proba_batch(feats)[0] == pytest.approx(
        0.496755, abs=1e-5
    )


def test_streaming_topics_match_batch_on_real_alerts(spark, tmp_path):
    """§2.J product parity on the REAL fixture: registered ZTF topics run
    under ``readStream`` over ``datatest/regular`` — the reference's
    livestream consumption shape (``ztf/livestream/filter_sn_candidates/
    filter.py:125-130`` doctests) — and each topic's streamed selection
    equals the batch selection, alert for alert, plus a pinned golden for
    this snapshot. (The reference's published doctest counts — 13 SN
    candidates on the FULL 5-part datatest — are unreachable here: this
    snapshot ships 3 of 5 part-files, 133 alerts; the pins below are the
    same predicates on the available subset, cross-checked against the
    independent pandas replicas in the tests above.)"""
    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.schemas import flatten_ztf
    from fink_filters_spark.streaming import StreamPipeline

    topics = {  # pinned goldens for this 133-alert snapshot
        "ztf.sn_candidates": 7,
        "ztf.blazar": 2,
        "ztf.sso_fink_candidates": 2,
        "ztf.vra": 2,
    }
    src = f"{REF}/regular"
    schema = spark.read.parquet(src).schema
    batch_flat = flatten_ztf(spark.read.parquet(src))
    for i, (topic, golden) in enumerate(topics.items()):
        stream = spark.readStream.schema(schema).parquet(src)
        got: list = []
        pipe = (
            StreamPipeline(stream)
            .enrich(flatten_ztf)
            .topic(topic)
            .sink(lambda bdf, bid: got.extend(
                r.objectId for r in bdf.select("objectId").collect()
            ))
        )
        q = pipe.start(checkpoint=str(tmp_path / f"ck{i}"), once=True)
        q.awaitTermination(120)
        want = {r.objectId for r in
                apply_named_filter(batch_flat, topic).select("objectId").collect()}
        assert len(got) == golden, f"{topic}: streamed {len(got)} != {golden}"
        assert set(got) == want, f"{topic}: streamed set != batch set"


def test_rubin_streaming_topics_match_batch_on_real_alerts(spark, tmp_path):
    """§2.J Rubin product parity: registered Rubin topics run under
    ``readStream`` over the REAL alert fixture
    (``datatest/rubin_test_data_10_0.parquet``) — the reference's Rubin
    livestream consumption shape — and each topic's streamed selection
    equals the batch selection, alert for alert, plus the reference's OWN
    doctest golden for this snapshot (filter_*/filter.py doctests pin
    count() on this fixture; extragalactic_loose's 4 comes from the
    blocks.py extragalactic_base spark doctest)."""
    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.schemas import flatten_rubin
    from fink_filters_spark.streaming import StreamPipeline

    topics = {  # goldens: reference doctests + data-driven uniform_sample
        "rubin.extragalactic_loose": 4,
        "rubin.uniform_sample": 1,
        "rubin.remove_unlikely_transients": 0,
        "rubin.hostless_candidate": 0,
        "rubin.extragalactic_new": 0,  # mag_rate COMPUTED in-stream
    }
    from pyspark.sql.types import StructType

    src = f"{REF}/rubin_test_data_10_0.parquet"
    full = spark.read.parquet(src).schema
    # read-schema pruned to the filter-relevant structs: the raw packet
    # carries cutout binaries and ssSource/mpc_orbits payloads whose
    # per-leaf vectorized reader batches dwarf the 27 rows — a production
    # topic pipeline would prune its scan the same way. prvDiaSources
    # stays: the in-stream enrich_mag_rate producer consumes it.
    keep = ("diaSource", "diaObject", "misc", "xm", "clf", "pred",
            "prvDiaSources")
    schema = StructType([f for f in full.fields if f.name in keep])

    from fink_filters_spark.filters.rubin import topic_columns

    def enrich(df):
        # project to the topic surface right after flatten so each
        # micro-batch plan (and its codegen class) stays ~70 columns,
        # not the ~190-leaf packet
        out = _rubin_enriched(flatten_rubin(df))
        return out.select([c for c in out.columns if c in set(topic_columns())])

    batch_flat = enrich(spark.read.parquet(src))
    for i, (topic, golden) in enumerate(topics.items()):
        stream = spark.readStream.schema(schema).parquet(src)
        got: list = []
        pipe = (
            StreamPipeline(stream)
            .enrich(enrich)
            .topic(topic)
            .sink(lambda bdf, bid: got.extend(
                r.diaSourceId for r in bdf.select("diaSourceId").collect()
            ))
        )
        q = pipe.start(checkpoint=str(tmp_path / f"rck{i}"), once=True)
        q.awaitTermination(120)
        want = {r.diaSourceId for r in
                apply_named_filter(batch_flat, topic)
                .select("diaSourceId").collect()}
        assert len(got) == golden, f"{topic}: streamed {len(got)} != {golden}"
        assert set(got) == want, f"{topic}: streamed set != batch set"


def test_extragalactic_new_full_packet_streaming_with_crafted_alerts(
    spark, tmp_path
):
    """C37 closure pinned on the FULL packet schema (round-8 de-risk):
    the real 27-alert fixture extended with three crafted full-schema
    alerts whose prvDiaSources drive the computed mag_rate through BOTH
    per-band gates — one rising (rate −0.5 in r), one fading (rate +0.5
    in r), and one control inside the dead zone (rate +0.1, selected by
    NEITHER gate). Asserts streamed == batch == the by-construction
    replica (>0), with mag_rate PRODUCED in-stream by enrich_mag_rate
    from nested prvDiaSources — not injected into a flattened frame."""
    from pyspark.sql.types import StructType

    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.filters.rubin import topic_columns
    from fink_filters_spark.schemas import flatten_rubin
    from fink_filters_spark.streaming import StreamPipeline

    src = f"{REF}/rubin_test_data_10_0.parquet"
    raw = spark.read.parquet(src)
    keep = ("diaSource", "diaObject", "misc", "xm", "clf", "pred",
            "prvDiaSources")
    schema = StructType([f for f in raw.schema.fields if f.name in keep])
    pruned = raw.select(*[f.name for f in schema.fields])

    # template: a real alert already passing the loose extragalactic gate
    # (good quality, off-plane, not SSO, not a catalogued star) — only the
    # host evidence and the rate machinery need crafting
    flat_all = _rubin_enriched(flatten_rubin(pruned))
    loose_ids = [r.diaSourceId for r in
                 apply_named_filter(flat_all, "rubin.extragalactic_loose")
                 .select("diaSourceId").collect()]
    assert loose_ids, "fixture lost its 4 loose-extragalactic alerts"
    tmpl = (
        pruned.filter(F.col("diaSource.diaSourceId") == loose_ids[0])
        .limit(1).collect()[0].asDict(recursive=True)
    )
    donor_prv = (
        pruned.filter(F.size("prvDiaSources") > 0)
        .select(F.col("prvDiaSources")[0].alias("e"))
        .collect()[0]["e"].asDict(recursive=True)
    )

    import copy
    import math

    zp = 31.4
    f_prev = 10 ** ((zp - 22.0) / 2.5)  # mag 22.0 nJy
    mjd = tmpl["diaSource"]["midpointMjdTai"]
    crafted_rates = {9000000001: -0.5, 9000000002: 0.5, 9000000003: 0.1}
    rows = []
    for did, rate in crafted_rates.items():
        r = copy.deepcopy(tmpl)
        mag_now = 22.0 + rate  # Δt = 1 day -> mag_rate == rate
        f_now = 10 ** ((zp - mag_now) / 2.5)
        r["diaSource"].update(
            diaSourceId=did, band="r", psfFlux=f_now,
            psfFluxErr=f_now / 100.0, midpointMjdTai=mjd,
        )
        r["misc"]["firstDiaSourceMjdTaiFink"] = mjd - 1.0  # age 1d (<3)
        r["diaObject"]["r_psfFluxNdata"] = 3  # >= 2 points in band
        r["xm"]["simbad_otype"] = "Galaxy"  # positive host evidence
        prv = copy.deepcopy(donor_prv)
        prv.update(band="r", midpointMjdTai=mjd - 1.0, psfFlux=f_prev)
        r["prvDiaSources"] = [prv]
        rows.append(r)

    crafted = spark.createDataFrame(rows, schema)
    combined = pruned.unionByName(crafted)
    data_dir = tmp_path / "crafted_alerts"
    combined.coalesce(1).write.parquet(str(data_dir))

    def enrich(df):
        out = _rubin_enriched(flatten_rubin(df))
        return out.select([c for c in out.columns if c in set(topic_columns())])

    # replica: the enrichment must reproduce the by-construction rates
    batch_flat = enrich(spark.read.parquet(str(data_dir)))
    got_rates = {r.diaSourceId: r.mag_rate for r in
                 batch_flat.filter(F.col("diaSourceId").isin(list(crafted_rates)))
                 .select("diaSourceId", "mag_rate").collect()}
    assert set(got_rates) == set(crafted_rates)
    for did, want in crafted_rates.items():
        # psfFlux is stored float32 in the packet -> ~1e-7 relative noise
        assert got_rates[did] is not None and math.isclose(
            got_rates[did], want, abs_tol=1e-5
        ), (did, got_rates[did], want)

    batch_sel = {r.diaSourceId for r in
                 apply_named_filter(batch_flat, "rubin.extragalactic_new")
                 .select("diaSourceId").collect()}
    assert batch_sel == {9000000001, 9000000002}, batch_sel  # control excluded

    stream = spark.readStream.schema(schema).parquet(str(data_dir))
    streamed: list = []
    pipe = (
        StreamPipeline(stream)
        .enrich(enrich)
        .topic("rubin.extragalactic_new")
        .sink(lambda bdf, bid: streamed.extend(
            r.diaSourceId for r in bdf.select("diaSourceId").collect()
        ))
    )
    q = pipe.start(checkpoint=str(tmp_path / "ck_egnew"), once=True)
    q.awaitTermination(120)
    assert set(streamed) == batch_sel and len(streamed) == 2
