"""Constellation labeling as a broadcast boundary-table join (SURVEY §2.I).

The reference resolves a constellation name per candidate on the driver via
astropy (``ztf/livestream/filter_tns_match/filter.py:181-183``) for sink
messages. Two engine paths:

- ``constellation_label`` — packaged table of the 88 IAU constellations
  with approximate J2000 centroids, nearest-center (Voronoi) assignment
  through the same grid-bucketed broadcast cone join every other
  crossmatch uses. Approximate near borders; matches the reference's use
  of the label (message decoration, not science cuts).
- ``constellation_exact`` — the Roman 1987 (PASP 99, 695) interval
  algorithm astropy's get_constellation implements: precess J2000
  coordinates toward the B1875.0 frame and take the FIRST matching row
  of the precessed-boundary interval table (``Vizier VI/42``: dec_low +
  [ra_low, ra_high) in 1875 coordinates). Precession here is the pure
  IAU 1976 rotation (a fixed matrix, evaluated as native Column math,
  no UDF); astropy's FK4/B1875 conversion additionally applies the
  FK5->FK4 rotation, equinox correction and E-terms of aberration —
  arcsecond-level offsets, so sources within a few arcsec of a boundary
  can land on the other side relative to astropy. The 357-row data file
  itself is not redistributable from memory in this offline container,
  so the table is injectable; ``DEMO_BOUNDARY_TABLE`` (clearly
  synthetic) exercises the semantics, and dropping in the real VI/42
  rows requires no code change.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# (name, ra_deg, dec_deg) — approximate J2000 centroids of the 88 IAU
# constellations (public astronomical knowledge; ~degrees precision).
CONSTELLATION_CENTERS: list[tuple[str, float, float]] = [
    ("Andromeda", 8.0, 38.0), ("Antlia", 150.0, -33.0), ("Apus", 245.0, -76.0),
    ("Aquarius", 335.0, -10.0), ("Aquila", 295.0, 3.0), ("Ara", 255.0, -55.0),
    ("Aries", 40.0, 20.0), ("Auriga", 90.0, 42.0), ("Bootes", 218.0, 30.0),
    ("Caelum", 70.0, -38.0), ("Camelopardalis", 90.0, 70.0), ("Cancer", 130.0, 20.0),
    ("Canes Venatici", 195.0, 40.0), ("Canis Major", 105.0, -22.0),
    ("Canis Minor", 114.0, 6.0), ("Capricornus", 315.0, -18.0),
    ("Carina", 130.0, -60.0), ("Cassiopeia", 15.0, 62.0), ("Centaurus", 200.0, -47.0),
    ("Cepheus", 330.0, 70.0), ("Cetus", 25.0, -7.0), ("Chamaeleon", 160.0, -79.0),
    ("Circinus", 220.0, -63.0), ("Columba", 85.0, -35.0),
    ("Coma Berenices", 190.0, 23.0), ("Corona Australis", 280.0, -41.0),
    ("Corona Borealis", 235.0, 33.0), ("Corvus", 186.0, -18.0),
    ("Crater", 170.0, -16.0), ("Crux", 186.0, -60.0), ("Cygnus", 305.0, 43.0),
    ("Delphinus", 310.0, 12.0), ("Dorado", 80.0, -60.0), ("Draco", 260.0, 65.0),
    ("Equuleus", 318.0, 8.0), ("Eridanus", 55.0, -28.0), ("Fornax", 42.0, -30.0),
    ("Gemini", 105.0, 22.0), ("Grus", 335.0, -46.0), ("Hercules", 255.0, 30.0),
    ("Horologium", 48.0, -53.0), ("Hydra", 160.0, -20.0), ("Hydrus", 35.0, -70.0),
    ("Indus", 315.0, -58.0), ("Lacerta", 335.0, 46.0), ("Leo", 160.0, 15.0),
    ("Leo Minor", 155.0, 32.0), ("Lepus", 83.0, -19.0), ("Libra", 230.0, -15.0),
    ("Lupus", 230.0, -42.0), ("Lynx", 120.0, 45.0), ("Lyra", 283.0, 36.0),
    ("Mensa", 80.0, -77.0), ("Microscopium", 315.0, -36.0), ("Monoceros", 107.0, 0.0),
    ("Musca", 187.0, -70.0), ("Norma", 243.0, -51.0), ("Octans", 345.0, -82.0),
    ("Ophiuchus", 257.0, -7.0), ("Orion", 83.0, 2.0), ("Pavo", 295.0, -65.0),
    ("Pegasus", 340.0, 19.0), ("Perseus", 55.0, 45.0), ("Phoenix", 15.0, -48.0),
    ("Pictor", 87.0, -53.0), ("Pisces", 15.0, 13.0),
    ("Piscis Austrinus", 340.0, -30.0), ("Puppis", 118.0, -32.0),
    ("Pyxis", 135.0, -27.0), ("Reticulum", 59.0, -60.0), ("Sagitta", 295.0, 18.0),
    ("Sagittarius", 285.0, -28.0), ("Scorpius", 253.0, -27.0),
    ("Sculptor", 5.0, -32.0), ("Scutum", 280.0, -9.0), ("Serpens", 236.0, 6.0),
    ("Sextans", 155.0, -2.0), ("Taurus", 65.0, 15.0), ("Telescopium", 285.0, -51.0),
    ("Triangulum", 32.0, 32.0), ("Triangulum Australe", 240.0, -65.0),
    ("Tucana", 355.0, -64.0), ("Ursa Major", 165.0, 52.0),
    ("Ursa Minor", 230.0, 78.0), ("Vela", 140.0, -47.0), ("Virgo", 200.0, -3.0),
    ("Volans", 120.0, -69.0), ("Vulpecula", 300.0, 24.0),
]


def constellation_label(
    df: DataFrame,
    id_col: str,
    ra_col: str = "ra",
    dec_col: str = "dec",
    out_col: str = "constellation",
) -> DataFrame:
    """Append the nearest-constellation name. Broadcast nearest-center cone
    join (radius 40° covers every point: no sky location is farther than
    ~35° from all centroids)."""
    import pandas as pd

    from .crossmatch import crossmatch

    spark = df.sparkSession
    cat = spark.createDataFrame(
        pd.DataFrame(CONSTELLATION_CENTERS, columns=["cat_name", "cat_ra", "cat_dec"])
    )
    # how="left", not "nearest": nearest is an inner join, so a row with
    # NULL coordinates would silently VANISH from the output — this is a
    # decorator, every input row must come back (NULL label when
    # unlocatable), like constellation_exact. sep_deg (crossmatch's
    # internal ranking column) is dropped too: leaking it would trip the
    # reserved-name collision guard on any later crossmatch of the
    # labeled frame (round-7 review findings).
    out = crossmatch(
        df, cat, df_id=id_col, radius_deg=40.0,
        df_ra=ra_col, df_dec=dec_col, how="left",
    )
    return (
        out.withColumnRenamed("cat_name", out_col)
        .drop("cat_ra", "cat_dec", "sep_deg")
    )


# --------------------------- exact path: Roman 1987 boundary lookup --------


def precession_matrix_j2000_to_b1875() -> list[list[float]]:
    """IAU 1976 precession rotation from J2000.0 to B1875.0.

    Angles (Lieske et al. 1977): with t in Julian centuries TDB from
    J2000 to the target epoch,

        zeta  = 2306.2181 t + 0.30188 t^2 + 0.017998 t^3   [arcsec]
        z     = 2306.2181 t + 1.09468 t^2 + 0.018203 t^3
        theta = 2004.3109 t - 0.42665 t^2 - 0.041833 t^3

    and  P = Rz(-z) Ry(theta) Rz(-zeta).  B1875.0 = JD 2405889.25855
    (Besselian epoch), t = (JD - 2451545)/36525 ≈ -1.2500.
    """
    t = (2405889.25855 - 2451545.0) / 36525.0
    arcsec = math.pi / (180.0 * 3600.0)
    zeta = (2306.2181 * t + 0.30188 * t * t + 0.017998 * t**3) * arcsec
    z = (2306.2181 * t + 1.09468 * t * t + 0.018203 * t**3) * arcsec
    theta = (2004.3109 * t - 0.42665 * t * t - 0.041833 * t**3) * arcsec

    cz, sz = math.cos(z), math.sin(z)
    ct, st = math.cos(theta), math.sin(theta)
    cze, sze = math.cos(zeta), math.sin(zeta)
    # Rz(-z) @ Ry(theta) @ Rz(-zeta), row-major
    return [
        [cz * ct * cze - sz * sze, -cz * ct * sze - sz * cze, -cz * st],
        [sz * ct * cze + cz * sze, -sz * ct * sze + cz * cze, -sz * st],
        [st * cze, -st * sze, ct],
    ]


def _precessed_radec_1875(ra_col: str, dec_col: str) -> tuple[Column, Column]:
    """Native-Column J2000 -> B1875 (ra_hours_1875, dec_deg_1875).

    The precession is one constant 3x3 rotation, so the whole transform
    stays inside whole-stage codegen: unit vector, literal matrix multiply,
    back to spherical. No UDF, no shuffle."""
    m = precession_matrix_j2000_to_b1875()
    ra = F.radians(F.col(ra_col))
    dec = F.radians(F.col(dec_col))
    x = F.cos(dec) * F.cos(ra)
    y = F.cos(dec) * F.sin(ra)
    zc = F.sin(dec)
    x1 = F.lit(m[0][0]) * x + F.lit(m[0][1]) * y + F.lit(m[0][2]) * zc
    y1 = F.lit(m[1][0]) * x + F.lit(m[1][1]) * y + F.lit(m[1][2]) * zc
    z1 = F.lit(m[2][0]) * x + F.lit(m[2][1]) * y + F.lit(m[2][2]) * zc
    ra1875_h = (F.degrees(F.atan2(y1, x1)) + 360.0) % 360.0 / 15.0
    dec1875 = F.degrees(F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), z1))))
    return ra1875_h, dec1875


# DEMONSTRATION table ONLY — four synthetic zones proving the first-match
# interval semantics (real deployments load Vizier VI/42: 357 rows of
# (ra_low_h, ra_high_h, dec_low_deg, abbrev) in B1875.0 coordinates, scanned
# top-down, first match wins — exactly what constellation_exact implements).
DEMO_BOUNDARY_TABLE: list[tuple[float, float, float, str]] = [
    (0.0, 24.0, 66.0, "NPOLAR"),
    (0.0, 12.0, 0.0, "NEAST"),
    (12.0, 24.0, 0.0, "NWEST"),
    (0.0, 24.0, -90.0, "SOUTH"),
]


def constellation_exact(
    df: DataFrame,
    id_col: str,
    ra_col: str = "ra",
    dec_col: str = "dec",
    out_col: str = "constellation",
    table: list[tuple[float, float, float, str]] | None = None,
) -> DataFrame:
    """Roman-1987 constellation determination (astropy's algorithm; see
    the module docstring for the arcsec-level FK4-conversion caveat).

    Precesses J2000 positions to B1875.0 natively, broadcast-joins the
    boundary interval table (dec_low <= dec AND ra_low <= ra < ra_high)
    and keeps the FIRST matching row in table order via ``min_by`` on the
    row index — one broadcast nested-loop over a <=357-row literal table,
    i.e. a constant-size scan per row, no shuffle of the fact side beyond
    the final aggregate-free projection.

    ``table`` rows: (ra_low_hours, ra_high_hours, dec_low_deg, name) in
    B1875.0, in the catalog's scan order. Defaults to the clearly-marked
    synthetic ``DEMO_BOUNDARY_TABLE``.
    """
    import pandas as pd

    rows = table if table is not None else DEMO_BOUNDARY_TABLE
    spark = df.sparkSession
    bounds = spark.createDataFrame(
        pd.DataFrame(
            [(i, *r) for i, r in enumerate(rows)],
            columns=["__idx", "__ra_lo", "__ra_hi", "__dec_lo", "__cname"],
        )
    )
    ra1875, dec1875 = _precessed_radec_1875(ra_col, dec_col)
    fact = df.withColumn("__ra1875", ra1875).withColumn("__dec1875", dec1875)
    joined = fact.join(
        F.broadcast(bounds),
        (F.col("__dec1875") >= F.col("__dec_lo"))
        & (F.col("__ra1875") >= F.col("__ra_lo"))
        & (F.col("__ra1875") < F.col("__ra_hi")),
        "left",
    )
    picked = (
        joined.groupBy(id_col)
        .agg(F.min_by(F.col("__cname"), F.col("__idx")).alias(out_col))
    )
    return df.join(picked, on=id_col, how="left")
