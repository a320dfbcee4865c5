"""Alert schemas (SURVEY §1.2) as explicit StructTypes.

The reference's schemas are Avro-defined upstream by each survey and fixed —
never inferred (SURVEY §1.2: filters bind by exact column name, including
nested ``candidate.jd``). These StructTypes encode the same shape for the
engine's readers; ``flatten_ztf``/``flatten_rubin`` project the nested
structs to the leaf-name frame the filter registry addresses.

Field inventories follow the public ZTF alert schema (avro, ~103 candidate
fields — the load-bearing subset here) and the Rubin/LSST alert packet
layout observed in the reference's ``datatest`` parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ZTF candidate leaves used by the filter surface (subset of the 103).
_ZTF_CANDIDATE_FIELDS = [
    StructField("jd", DoubleType()),
    StructField("fid", IntegerType()),
    StructField("magpsf", DoubleType()),
    StructField("sigmapsf", DoubleType()),
    StructField("magnr", DoubleType()),
    StructField("sigmagnr", DoubleType()),
    StructField("diffmaglim", DoubleType()),
    StructField("isdiffpos", StringType()),
    StructField("ra", DoubleType()),
    StructField("dec", DoubleType()),
    StructField("classtar", DoubleType()),
    StructField("drb", DoubleType()),
    StructField("rb", DoubleType()),
    StructField("nbad", IntegerType()),
    StructField("ndethist", IntegerType()),
    StructField("ssdistnr", DoubleType()),
    StructField("ssnamenr", StringType()),
    StructField("distnr", DoubleType()),
    StructField("neargaia", DoubleType()),
    StructField("distpsnr1", DoubleType()),
    StructField("jdstarthist", DoubleType()),
]

CUTOUT_SCHEMA = StructType(
    [StructField("fileName", StringType()), StructField("stampData", BinaryType())]
)

ZTF_ALERT_SCHEMA = StructType(
    [
        StructField("objectId", StringType()),
        StructField("candid", LongType()),
        StructField("candidate", StructType(_ZTF_CANDIDATE_FIELDS)),
        StructField("prv_candidates", ArrayType(StructType(_ZTF_CANDIDATE_FIELDS))),
        StructField("cdsxmatch", StringType()),
        StructField("DR3Name", StringType()),
        StructField("tns", StringType()),
        StructField("tracklet", StringType()),
        StructField("roid", IntegerType()),
        StructField("mulens", DoubleType()),
        StructField("snn_snia_vs_nonia", DoubleType()),
        StructField("snn_sn_vs_all", DoubleType()),
        StructField("rf_snia_vs_nonia", DoubleType()),
        StructField("rf_kn_vs_nonkn", DoubleType()),
        StructField("anomaly_score", DoubleType()),
        StructField("nalerthist", IntegerType()),
        StructField("spicy_id", IntegerType()),
        StructField("spicy_class", StringType()),
        StructField("mangrove", MapType(StringType(), StringType())),
        StructField("blazar_stats", MapType(StringType(), DoubleType())),
        StructField("cutoutScience", CUTOUT_SCHEMA),
        StructField("cutoutTemplate", CUTOUT_SCHEMA),
        StructField("cutoutDifference", CUTOUT_SCHEMA),
        StructField("brokerIngestTimestamp", TimestampType()),
        StructField("timestamp", TimestampType()),
    ]
)

_RUBIN_DIA_SOURCE_FIELDS = [
    StructField("diaSourceId", LongType()),
    StructField("midpointMjdTai", DoubleType()),
    StructField("ra", DoubleType()),
    StructField("dec", DoubleType()),
    StructField("band", StringType()),
    StructField("psfFlux", DoubleType()),
    StructField("psfFluxErr", DoubleType()),
    StructField("snr", DoubleType()),
] + [
    StructField(flag, BooleanType())
    for flag in (
        "pixelFlags_bad", "pixelFlags_cr", "pixelFlags_crCenter", "pixelFlags_edge",
        "pixelFlags_interpolatedCenter", "pixelFlags_nodataCenter",
        "pixelFlags_saturated", "pixelFlags_saturatedCenter", "pixelFlags_suspect",
        "pixelFlags_suspectCenter", "centroid_flag", "apFlux_flag",
        "apFlux_flag_apertureTruncated", "isNegative", "psfFlux_flag",
        "psfFlux_flag_noGoodPixels",
    )
]

_RUBIN_DIA_OBJECT_FIELDS = [StructField("nDiaSources", IntegerType())] + [
    StructField(f"{b}_{stat}", DoubleType())
    for b in ("u", "g", "r", "i", "z", "y")
    for stat in ("psfFluxMean", "psfFluxMeanErr", "psfFluxMax", "psfFluxMin")
]

RUBIN_ALERT_SCHEMA = StructType(
    [
        StructField("alertId", LongType()),
        StructField("diaSource", StructType(_RUBIN_DIA_SOURCE_FIELDS)),
        StructField("prvDiaSources", ArrayType(StructType(_RUBIN_DIA_SOURCE_FIELDS))),
        StructField("prvDiaForcedSources", ArrayType(StructType(_RUBIN_DIA_SOURCE_FIELDS))),
        StructField("diaObject", StructType(_RUBIN_DIA_OBJECT_FIELDS)),
        StructField(
            "xm",
            StructType(
                [
                    StructField("simbad_otype", StringType()),
                    StructField("mangrove_name", StringType()),
                    StructField("gaia_plx", DoubleType()),
                    StructField("gaia_e_plx", DoubleType()),
                    StructField("vsx_type", StringType()),
                    StructField("tns_fullname", StringType()),
                ]
            ),
        ),
        StructField(
            "clf",
            StructType(
                [
                    StructField("snn_score", DoubleType()),
                    StructField("cats_class", IntegerType()),
                    StructField("cats_score", DoubleType()),
                    StructField("snia_score", DoubleType()),
                ]
            ),
        ),
        StructField("pred", StructType([StructField("is_sso", BooleanType(), False)])),
        StructField("cutoutScience", BinaryType()),
        StructField("cutoutTemplate", BinaryType()),
        StructField("cutoutDifference", BinaryType()),
    ]
)


def flatten_ztf(df: DataFrame) -> DataFrame:
    """Project candidate.* leaves to top level (the registry's column model).
    Equivalent of the reference's arg-name -> nested-column binding (A1)."""
    keep = [c for c in df.columns if c != "candidate"]
    return df.select(*keep, "candidate.*")


def flatten_rubin(df: DataFrame) -> DataFrame:
    """Project diaSource/diaObject/xm/clf leaves to top level with the
    registry's names (xm_* / clf_* prefixes)."""
    out = df
    cols = [c for c in df.columns if c not in ("diaSource", "diaObject", "xm", "clf", "pred")]
    # the real alert parquet duplicates some leaves at top level (e.g.
    # diaSourceId next to diaSource.diaSourceId) — struct leaves win, the
    # colliding top-level copies are dropped so references stay unambiguous
    struct_leaves: set[str] = set()
    for struct in ("diaSource", "diaObject"):
        if struct in df.columns:
            struct_leaves.update(df.schema[struct].dataType.fieldNames())
    sel = [F.col(c) for c in cols if c not in struct_leaves]
    sel += [F.col("diaSource.*")]
    if "diaObject" in df.columns:
        sel += [F.col("diaObject.*")]
    for struct, prefix in (("xm", "xm_"), ("clf", "clf_")):
        if struct in df.columns:
            for f in df.schema[struct].dataType.fieldNames():
                sel.append(F.col(f"{struct}.{f}").alias(f"{prefix}{f}"))
    if "pred" in df.columns:
        sel.append(F.col("pred.is_sso").alias("is_sso"))
    return out.select(*sel)
