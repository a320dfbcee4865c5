"""Spatial crossmatch queries (SURVEY §2.D) on synthetic coordinates.

The synthetic tables carry no sky positions, so both sides derive
deterministic pseudo-coordinates with integer arithmetic (identical formulas
in Spark and the oracle): events are the alert stream, suppliers are the
reference catalog. The Spark side runs the grid-bucketed broadcast cone join
(operators/crossmatch.py); the oracle is the naive cross join + haversine —
different physical plan, must produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.astro import _D2R, _R2D
from ..operators.crossmatch import crossmatch
from ..tables import load_table
from . import QuerySpec, e6

# Deterministic pseudo-coordinates (integer ops -> exact /100.0).
PTS_SQL = (
    "SELECT event_id, (event_id * 37 % 36000) / 100.0 AS ra, "
    "((event_id * 73 % 16000) / 100.0) - 80.0 AS dec FROM events"
)
CAT_SQL = (
    "SELECT s_suppkey, s_name, (s_suppkey * 359 % 36000) / 100.0 AS cra, "
    "((s_suppkey * 191 % 16000) / 100.0) - 80.0 AS cdec, "
    "(50 + (s_suppkey % 5) * 25) / 100.0 AS cradius FROM supplier"
)


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ((F.col("event_id") * 37 % 36000) / 100.0).alias("ra"),
        (((F.col("event_id") * 73 % 16000) / 100.0) - 80.0).alias("dec"),
    )


def _cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey",
        "s_name",
        ((F.col("s_suppkey") * 359 % 36000) / 100.0).alias("cra"),
        (((F.col("s_suppkey") * 191 % 16000) / 100.0) - 80.0).alias("cdec"),
        ((50 + (F.col("s_suppkey") % 5) * 25) / 100.0).alias("cradius"),
    )


def _sep_sql(ra1: str, dec1: str, ra2: str, dec2: str) -> str:
    """Haversine written EXACTLY as functions.astro.sky_sep evaluates it
    (same literals, same association) for bit parity."""
    d2r = repr(_D2R)
    r2d = repr(_R2D)
    r1, d1, r2, d2 = (f"({c}) * {d2r}" for c in (ra1, dec1, ra2, dec2))
    sd = f"sin((({d2}) - ({d1})) / 2)"
    sr = f"sin((({r2}) - ({r1})) / 2)"
    h = f"{sd} * {sd} + cos({d1}) * cos({d2}) * {sr} * {sr}"
    return f"2 * asin(least(1.0, sqrt({h}))) * {r2d}"


_SEP = _sep_sql("ra", "dec", "cra", "cdec")


def xmatch_cone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2: nearest catalog match within a fixed 2° cone
    (reference ``ztf/filter_known_tde/filter.py:65-90``)."""
    res = crossmatch(
        _pts(spark, sf_dir), _cat(spark, sf_dir), df_id="event_id",
        radius_deg=2.0, df_ra="ra", df_dec="dec", cat_ra="cra", cat_dec="cdec",
        tiebreak="s_suppkey",
    )
    # hash-stability: e6 integer micro-units (queries/__init__.e6)
    return res.select("event_id", "s_name", e6("sep_deg", "sep_e6"))


XMATCH_CONE_SQL = f"""
WITH pts AS ({PTS_SQL}), cat AS ({CAT_SQL}),
pairs AS (
  SELECT event_id, s_suppkey, s_name, {_SEP} AS sep_deg
  FROM pts CROSS JOIN cat
),
m AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY sep_deg, s_suppkey) AS rn
  FROM pairs WHERE sep_deg < 2.0
)
SELECT event_id, s_name, CAST(round(sep_deg * 1e6) AS BIGINT) AS sep_e6 FROM m WHERE rn = 1
"""


def xmatch_variable_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/D4: per-catalog-row match radius
    (reference ``ztf/livestream/filter_magnetic_cvs/filter.py:110-118``)."""
    res = crossmatch(
        _pts(spark, sf_dir), _cat(spark, sf_dir), df_id="event_id",
        radius_deg=F.col("cradius"), max_radius_deg=1.5,
        df_ra="ra", df_dec="dec", cat_ra="cra", cat_dec="cdec",
        tiebreak="s_suppkey",
    )
    return res.select("event_id", "s_suppkey", e6("sep_deg", "sep_e6"))


XMATCH_VAR_SQL = f"""
WITH pts AS ({PTS_SQL}), cat AS ({CAT_SQL}),
pairs AS (
  SELECT event_id, s_suppkey, cradius, {_SEP} AS sep_deg
  FROM pts CROSS JOIN cat
),
m AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY sep_deg, s_suppkey) AS rn
  FROM pairs WHERE sep_deg < cradius
)
SELECT event_id, s_suppkey, CAST(round(sep_deg * 1e6) AS BIGINT) AS sep_e6 FROM m WHERE rn = 1
"""


def xmatch_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D7 enrichment semantics: left join + coalesce to 'Unknown'
    (reference xmatch UDFs return matched name else 'Unknown',
    ``ztf/filter_known_tde/filter.py:31-129``)."""
    res = crossmatch(
        _pts(spark, sf_dir), _cat(spark, sf_dir), df_id="event_id",
        radius_deg=1.0, df_ra="ra", df_dec="dec", cat_ra="cra", cat_dec="cdec",
        how="left", tiebreak="s_suppkey",
    )
    return res.select(
        "event_id", F.coalesce("s_name", F.lit("Unknown")).alias("matched_name")
    )


XMATCH_ENRICH_SQL = f"""
WITH pts AS ({PTS_SQL}), cat AS ({CAT_SQL}),
pairs AS (
  SELECT event_id, s_suppkey, s_name, {_SEP} AS sep_deg
  FROM pts CROSS JOIN cat
),
m AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY sep_deg, s_suppkey) AS rn
  FROM pairs WHERE sep_deg < 1.0
)
SELECT p.event_id, coalesce(m.s_name, 'Unknown') AS matched_name
FROM pts p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
"""


def xmatch_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 'uncataloged' anti-join semantics
    (reference ``ztf/livestream/filter_new_hostless/utils.py:74-84``)."""
    res = crossmatch(
        _pts(spark, sf_dir), _cat(spark, sf_dir), df_id="event_id",
        radius_deg=1.0, df_ra="ra", df_dec="dec", cat_ra="cra", cat_dec="cdec",
        how="anti",
    )
    return res.select("event_id")


XMATCH_ANTI_SQL = f"""
WITH pts AS ({PTS_SQL}), cat AS ({CAT_SQL})
SELECT event_id FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM cat WHERE {_SEP} < 1.0
)
"""


def astro_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.I astronomy scalars as native trig: galactic latitude, ecliptic
    latitude, and separation from a fixed point — the reference computes
    these with astropy inside pandas UDFs (``prefilter.py:56-66``,
    ``filter_early_kn_candidates/filter.py:325-357``)."""
    from ..functions.astro import ecl_lat, gal_b, sky_sep

    pts = _pts(spark, sf_dir)
    return pts.select(
        "event_id",
        e6(gal_b("ra", "dec"), "gal_b_e6"),
        e6(ecl_lat("ra", "dec"), "ecl_lat_e6"),
        e6(
            sky_sep(F.col("ra"), F.col("dec"), F.lit(180.0), F.lit(0.0)),
            "sep_from_origin_e6",
        ),
    )


def _astro_sql() -> str:
    import math

    d2r = repr(math.pi / 180.0)
    r2d = repr(180.0 / math.pi)
    ra_g, dec_g = 192.85948, 27.12825
    eps = 23.4392911
    sin_dg = repr(math.sin(dec_g * math.pi / 180))
    cos_dg = repr(math.cos(dec_g * math.pi / 180))
    cos_e = repr(math.cos(eps * math.pi / 180))
    sin_e = repr(math.sin(eps * math.pi / 180))
    r, d = f"(ra) * {d2r}", f"(dec) * {d2r}"
    galb = (
        f"asin(greatest(-1.0, least(1.0, {sin_dg} * sin({d}) + {cos_dg} * cos({d})"
        f" * cos({r} - ({ra_g!r}) * {d2r})))) * {r2d}"
    )
    ecl = (
        f"asin(greatest(-1.0, least(1.0, sin({d}) * {cos_e} - cos({d}) * {sin_e}"
        f" * sin({r})))) * {r2d}"
    )
    sep = _sep_sql("ra", "dec", "180.0", "0.0")
    return f"""
WITH pts AS ({PTS_SQL})
SELECT event_id,
       CAST(round(({galb}) * 1e6) AS BIGINT) AS gal_b_e6,
       CAST(round(({ecl}) * 1e6) AS BIGINT) AS ecl_lat_e6,
       CAST(round(({sep}) * 1e6) AS BIGINT) AS sep_from_origin_e6
FROM pts
"""


def _pts_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-mixed pseudo-sky for the self-match: the lattice coordinates of
    ``_pts`` have a large minimum pair distance by construction (an LCG
    lattice — zero sub-degree pairs at any SF), so the self-match fixture
    hashes instead (``md5_bucket``, the engine's portable mixing hash —
    bit-identical in DuckDB), giving genuinely close pairs at Poisson
    density."""
    from ..operators.sample import md5_bucket

    ev = load_table(spark, sf_dir, "events")
    # Scale-adaptive parallelism floor: the testdata tables are single-file
    # single-row-group parquet, so the scan — and everything pipelined on
    # it, here the md5 hashing, the cache build, AND the downstream
    # neighbor-cell explode + haversine probe of the pair join — runs as
    # ONE task. Repartitioning the 8-byte id rows BEFORE the projection
    # costs a ~1 MB shuffle and parallelizes all of it (measured 3.23s ->
    # 2.44s at sf0.1, identical rows). Guarded: a production table that
    # already scans wider than the cluster's parallelism keeps its layout
    # and pays nothing.
    par = spark.sparkContext.defaultParallelism
    ids = ev.select("event_id")
    if ids.rdd.getNumPartitions() < par:
        ids = ids.repartition(par)
    pts = ids.select(
        "event_id",
        (md5_bucket("event_id", 36000) / 100.0).alias("ra"),
        (
            md5_bucket(F.concat(F.col("event_id").cast("string"), F.lit("d")), 16000)
            / 100.0
            - 80.0
        ).alias("dec"),
    )
    # cache = optimizer barrier: projection collapse would otherwise INLINE
    # the md5 chains into every downstream use — the haversine references
    # each coordinate several times per candidate pair, so the fixture hash
    # re-evaluated ~10x per pair (measured 57.6s -> ~2s at sf0.1). Fixture
    # cost only: real alert/catalog tables carry materialized ra/dec.
    return pts.cache()


def xmatch_large_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGE x LARGE crossmatch — the regime where neither side broadcasts
    (full-Gaia-scale catalog, archive-vs-archive match, or this
    self-match): every unordered pair of events within 0.2°, via the
    zones-style shuffled grid equi-join
    (``operators.crossmatch(broadcast_catalog=False)`` — both sides
    shuffle on the same cell key, sort-merge/shuffled-hash join, exact
    haversine refine; Gray/Nieto-Santisteban/Szalay 2006). The oracle is
    the naive quadratic form bounded by the exact ``|Δdec| <= r``
    prefilter (angular separation >= |Δdec|, so the bound drops no true
    pair) — different plan family entirely, identical rows required."""
    pts = _pts_hashed(spark, sf_dir)
    cat = pts.select(
        F.col("event_id").alias("event_id_b"),
        F.col("ra").alias("cra"),
        F.col("dec").alias("cdec"),
    )
    res = crossmatch(
        pts, cat, df_id="event_id", radius_deg=0.2,
        df_ra="ra", df_dec="dec", cat_ra="cra", cat_dec="cdec",
        how="all", broadcast_catalog=False,
    )
    return res.filter(F.col("event_id") < F.col("event_id_b")).select(
        F.col("event_id").alias("id_a"),
        F.col("event_id_b").alias("id_b"),
        e6("sep_deg", "sep_e6"),
    )


def _xmatch_large_sql() -> str:
    from .curation import md5_bucket_sql

    dec_key = "event_id || 'd'"
    ra = f"({md5_bucket_sql('event_id', 36000)} / 100.0)"
    dec = f"({md5_bucket_sql(dec_key, 16000)} / 100.0 - 80.0)"
    sep = _sep_sql("a.ra", "a.dec", "b.ra", "b.dec")
    return f"""
WITH pts AS (SELECT event_id, {ra} AS ra, {dec} AS dec FROM events)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       CAST(round(({sep}) * 1e6) AS BIGINT) AS sep_e6
FROM pts a JOIN pts b
  ON a.event_id < b.event_id
 AND b.dec BETWEEN a.dec - 0.2 AND a.dec + 0.2
WHERE ({sep}) < 0.2
"""


SPECS = [
    QuerySpec("astro_coords", astro_coords, _astro_sql(), "§2.I native trig coords"),
    QuerySpec("xmatch_cone", xmatch_cone, XMATCH_CONE_SQL, "D1/D2 fixed-radius nearest"),
    QuerySpec(
        "xmatch_large_pairs",
        xmatch_large_pairs,
        _xmatch_large_sql(),
        "D-scale: large x large zones-style crossmatch, no broadcast",
    ),
    QuerySpec("xmatch_variable_radius", xmatch_variable_radius, XMATCH_VAR_SQL, "D3/D4 per-row radius"),
    QuerySpec("xmatch_enrich", xmatch_enrich, XMATCH_ENRICH_SQL, "D2/D7 left+Unknown"),
    QuerySpec("xmatch_anti", xmatch_anti, XMATCH_ANTI_SQL, "D6 anti-join"),
]
