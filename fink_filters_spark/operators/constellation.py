"""Constellation labeling as a broadcast boundary-table join (SURVEY §2.I).

The reference resolves a constellation name per candidate on the driver via
astropy (``ztf/livestream/filter_tns_match/filter.py:181-183``) for sink
messages. Engine version: a packaged table of the 88 IAU constellations with
approximate J2000 centroids, nearest-center (Voronoi) assignment through the
same grid-bucketed broadcast cone join every other crossmatch uses — no
per-row library call, fully distributed.

Approximation note: true IAU constellation boundaries are polygons; the
nearest-centroid rule matches them only approximately (good near centers,
fuzzy at borders). That matches the reference's use of the label (message
decoration, not science cuts). A user needing exact boundaries swaps the
packaged table for a polygon table + point-in-polygon predicate without
touching the join plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
    out = crossmatch(
        df, cat, df_id=id_col, radius_deg=40.0,
        df_ra=ra_col, df_dec=dec_col, how="nearest",
    )
    return out.withColumnRenamed("cat_name", out_col).drop("cat_ra", "cat_dec")
