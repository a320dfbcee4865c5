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

# diaSource leaves used by the filter surface (subset of the ~100 in the
# real packet; names match datatest/rubin_test_data_10_0.parquet exactly).
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
        # the b_good_quality mask (reference rubin/blocks.py:372-418) ...
        "isDipole", "pixelFlags", "pixelFlags_bad", "pixelFlags_saturated",
        "pixelFlags_streakCenter", "pixelFlags_interpolated", "pixelFlags_cr",
        "pixelFlags_nodata", "pixelFlags_streak", "pixelFlags_edge",
        "psfFlux_flag", "apFlux_flag", "forced_PsfFlux_flag",
        "forced_PsfFlux_flag_edge", "shape_flag", "centroid_flag",
        # ... plus isNegative (used separately by most_likely_sn et al.)
        "isNegative",
    )
]

_RUBIN_DIA_OBJECT_FIELDS = [StructField("nDiaSources", IntegerType())] + [
    StructField(f"{b}_{stat}", DoubleType())
    for b in ("u", "g", "r", "i", "z", "y")
    for stat in (
        "psfFluxMean", "psfFluxMeanErr", "psfFluxMax", "psfFluxMin",
        "psfFluxNdata",
    )
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
                    StructField("mangrove_lum_dist", DoubleType()),
                    StructField("gaiadr3_DR3Name", StringType()),
                    StructField("gaiadr3_Plx", DoubleType()),
                    StructField("gaiadr3_e_Plx", DoubleType()),
                    StructField("vsx_Type", StringType()),
                    StructField("legacydr8_zphot", DoubleType()),
                    StructField("tns_type", StringType()),
                ]
            ),
        ),
        StructField(
            "clf",
            StructType(
                [
                    StructField("snnSnVsOthers_score", DoubleType()),
                    StructField("cats_class", IntegerType()),
                    StructField("cats_score", DoubleType()),
                    StructField("earlySNIa_score", DoubleType()),
                    StructField("elephant_kstest_science", DoubleType()),
                    StructField("elephant_kstest_template", DoubleType()),
                ]
            ),
        ),
        StructField("pred", StructType([StructField("is_sso", BooleanType(), False)])),
        StructField(
            "misc",
            StructType([StructField("firstDiaSourceMjdTaiFink", DoubleType())]),
        ),
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
    """Project diaSource/diaObject/misc/xm/clf/pred leaves to top level with
    the registry's names (filters/rubin.py module doc): diaSource, diaObject
    and misc leaves unprefixed, xm_* / clf_* prefixes, pred.is_sso as
    is_sso. Mirrors the reference's arg-name binding (``rubin/utils.py``
    expand_function_from_string resolves e.g. ``simbad_otype`` to
    ``xm.simbad_otype``)."""
    structs = ("diaSource", "diaObject", "xm", "clf", "pred", "misc")
    cols = [c for c in df.columns if c not in structs]
    # the real alert parquet duplicates some leaves at top level (e.g.
    # diaSourceId next to diaSource.diaSourceId) — struct leaves win, the
    # colliding top-level copies are dropped so references stay unambiguous
    struct_leaves: set[str] = set()
    for struct in ("diaSource", "diaObject", "misc"):
        if struct in df.columns:
            struct_leaves.update(df.schema[struct].dataType.fieldNames())
    sel = [F.col(c) for c in cols if c not in struct_leaves]
    sel += [F.col("diaSource.*")]
    seen = set(df.schema["diaSource"].dataType.fieldNames())
    for struct in ("diaObject", "misc"):
        # positional leaves (ra/dec/raErr/...) repeat across structs —
        # diaSource's are the alert's, keep those and drop the duplicates
        if struct in df.columns:
            for f in df.schema[struct].dataType.fieldNames():
                if f not in seen:
                    sel.append(F.col(f"{struct}.{f}"))
                    seen.add(f)
    for struct, prefix in (("xm", "xm_"), ("clf", "clf_")):
        if struct in df.columns:
            for f in df.schema[struct].dataType.fieldNames():
                sel.append(F.col(f"{struct}.{f}").alias(f"{prefix}{f}"))
    if "pred" in df.columns:
        sel.append(F.col("pred.is_sso").alias("is_sso"))
    return df.select(*sel)
