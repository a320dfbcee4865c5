"""Multimodal (binary) column operators.

The reference's precedent is image-cutout processing: each ZTF alert carries
``cutout{Science,Template,Difference}.stampData: binary`` stamps analyzed by
KS-statistics inside a pandas UDF (``ztf/livestream/filter_new_hostless/
utils.py:87-142``). Generalized here: media ride as opaque ``binary`` columns
with typed metadata; byte-level ops (length, digest, magic sniffing, header
slicing) are native Catalyst; content decode / feature extraction runs as an
Arrow-batched ``mapInPandas`` kernel with an explicit output schema.

The actual decoders (PIL/ffmpeg-class libs) are NOT in this container, so
``decode_image_batch`` computes a deterministic fake feature vector from the
raw bytes (clearly marked); the Spark-side plumbing — schema, batch shape,
partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC_PREFIXES = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664c6143": "flac",
    "00000020667479706d7034": "mp4",
}


def binary_meta(df: DataFrame, bin_col: str) -> DataFrame:
    """Native byte-level metadata: size, md5 digest, sniffed format."""
    hexhead = F.lower(F.hex(F.expr(f"substring({bin_col}, 1, 12)")))
    fmt = F.lit(None).cast("string")
    for prefix, name in sorted(MAGIC_PREFIXES.items(), key=lambda kv: -len(kv[0])):
        fmt = F.when(hexhead.startswith(prefix), name).otherwise(fmt)
    return df.withColumns(
        {
            "media_bytes": F.length(F.col(bin_col)).cast("long"),
            "media_md5": F.md5(F.col(bin_col)),
            "media_format": fmt,
        }
    )


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("status", StringType()),
    ]
)


def decode_image_batch(df: DataFrame, id_col: str, bin_col: str, feature_dim: int = 8) -> DataFrame:
    """Decode/feature-extract stage over a binary column via mapInPandas.

    DETERMINISTIC FAKE decode: real image libs are unavailable in this
    environment, so the 'feature vector' is byte-histogram moments of the
    raw payload. The Arrow batch shape, output schema and partition-level
    parallelism are exactly what a real decoder kernel would use — swap the
    body for PIL/torchvision and keep the plumbing.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats, sizes, status = [], [], []
            for payload in pdf[bin_col]:
                if payload is None:
                    feats.append([0.0] * feature_dim)
                    sizes.append(0)
                    status.append("null")
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                sizes.append(len(arr))
                if len(arr) == 0:
                    feats.append([0.0] * feature_dim)
                    status.append("empty")
                    continue
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                feats.append((hist / len(arr)).tolist())
                status.append("ok")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_bytes": sizes,
                    "feature": feats,
                    "status": status,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, DECODE_SCHEMA)


KS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kstest", DoubleType()),
    ]
)


def image_kstest(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Kolmogorov-Smirnov statistic of the payload's byte distribution vs
    uniform — the engine-side analogue of the reference's ELEPHANT cutout
    statistics (``ztf/livestream/filter_new_hostless/utils.py:87-142``, there
    a KS test on sigma-clipped pixel values via fink-science).

    The KS math (max |ECDF - CDF|) is computed exactly in the kernel with
    numpy (scipy-free); on real image data the byte payload would first be
    decoded to pixels — this operator supplies the ``kstest_*`` columns the
    hostless topic filters consume.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_ids, stats = [], []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                out_ids.append(i)
                if payload is None or len(payload) == 0:
                    stats.append(None)
                    continue
                arr = np.sort(np.frombuffer(payload, dtype=np.uint8).astype(np.float64))
                n = len(arr)
                # uniform CDF on [0, 255]; ECDF step just after each point
                cdf = (arr + 1.0) / 256.0
                ecdf_hi = np.arange(1, n + 1) / n
                ecdf_lo = np.arange(0, n) / n
                ks = float(np.max(np.maximum(np.abs(ecdf_hi - cdf), np.abs(ecdf_lo - cdf))))
                stats.append(ks)
            yield pd.DataFrame({"doc_id": out_ids, "kstest": stats})

    return df.select(id_col, bin_col).mapInPandas(kernel, KS_SCHEMA)


def frame_sample_stub(df: DataFrame, bin_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling stage — decoder unavailable, STUB.

    Raises at plan time so misuse is loud; the signature documents the
    intended contract (binary video -> exploded rows of frame binaries).
    """
    raise NotImplementedError(
        "video decode requires ffmpeg-class libraries not present in this "
        "container; plumbing contract: mapInPandas(binary -> rows of "
        "(doc_id, frame_idx, frame_binary))"
    )
