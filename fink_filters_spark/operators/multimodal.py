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
    BinaryType,
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

    Raises at plan time so misuse is loud; ``frame_sample`` below carries
    the real Spark plumbing with an injectable decoder.
    """
    raise NotImplementedError(
        "video decode requires ffmpeg-class libraries not present in this "
        "container; use frame_sample(df, ..., decoder=...) with a real "
        "decoder, or fake_frames for plumbing tests"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def fake_frames(payload: bytes, frame_bytes: int = 64) -> list[bytes]:
    """DETERMINISTIC FAKE video decoder: treats the payload as fixed-size
    raw 'frames' (``frame_bytes`` each, tail dropped). Stands in for an
    ffmpeg-class decoder so the exploding plumbing is testable."""
    return [
        payload[i : i + frame_bytes]
        for i in range(0, len(payload) - frame_bytes + 1, frame_bytes)
    ]


def frame_sample(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    every_n: int = 30,
    decoder=fake_frames,
) -> DataFrame:
    """Video frame-sampling: one input row -> one output row per kept frame
    (every ``every_n``-th). The 1->N explosion happens INSIDE the Arrow
    kernel, so a 2-hour video never materializes as a single task row list;
    at scale, repartition upstream so one task holds few videos.

    ``decoder: bytes -> list[bytes]`` is injectable; the default is the
    clearly-marked deterministic fake (no media libs in this container).
    """

    def kernel(batches: Iterator) -> Iterator:
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf["__id"], pdf["__bin"]):
                if payload is None:
                    continue
                all_frames = decoder(bytes(payload))
                for j in range(0, len(all_frames), every_n):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(all_frames[j])
            yield _pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    src = df.select(F.col(id_col).alias("__id"), F.col(bin_col).alias("__bin"))
    return src.mapInPandas(kernel, FRAME_SCHEMA)


def fake_image(payload: bytes, width: int, height: int):
    """DETERMINISTIC FAKE image decoder: bytes -> uint8 grid, truncated or
    zero-padded to (height, width). Stands in for PIL-class decoding."""
    import numpy as np

    need = width * height
    buf = np.frombuffer(payload[:need], dtype=np.uint8)
    if len(buf) < need:
        buf = np.concatenate([buf, np.zeros(need - len(buf), dtype=np.uint8)])
    return buf.reshape(height, width)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def image_resize(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    out_w: int = 16,
    out_h: int = 16,
    src_w: int = 64,
    src_h: int = 64,
    decoder=fake_image,
) -> DataFrame:
    """Image resize stage: decode (injectable; fake here) then REAL
    nearest-neighbor resampling with vectorized NumPy indexing. Output is
    the resized raw grid as binary + dimensions (typed metadata)."""
    import numpy as np

    ys = (np.arange(out_h) * src_h) // out_h
    xs = (np.arange(out_w) * src_w) // out_w

    def kernel(batches: Iterator) -> Iterator:
        import pandas as _pd

        for pdf in batches:
            ids, pix = [], []
            for i, payload in zip(pdf["__id"], pdf["__bin"]):
                if payload is None:
                    continue
                img = decoder(bytes(payload), src_w, src_h)
                ids.append(i)
                pix.append(img[np.ix_(ys, xs)].tobytes())
            yield _pd.DataFrame(
                {"doc_id": ids, "width": out_w, "height": out_h, "pixels": pix}
            )

    src = df.select(F.col(id_col).alias("__id"), F.col(bin_col).alias("__bin"))
    return src.mapInPandas(kernel, RESIZE_SCHEMA)


def fake_pcm(payload: bytes):
    """DETERMINISTIC FAKE audio decoder: bytes -> int16 PCM samples
    (tail byte dropped). Stands in for a codec library."""
    import numpy as np

    n = (len(payload) // 2) * 2
    return np.frombuffer(payload[:n], dtype="<i2").astype(np.float64)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("centroid", DoubleType()),
    ]
)


def audio_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    decoder=fake_pcm,
) -> DataFrame:
    """Audio feature extraction: decode (injectable; fake PCM here) then
    REAL vectorized DSP — RMS energy, zero-crossing rate, FFT spectral
    centroid — per row inside one Arrow batch."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["__id"], pdf["__bin"]):
                if payload is None:
                    continue
                x = decoder(bytes(payload))
                n = len(x)
                if n == 0:
                    rows.append((i, 0, 0.0, 0.0, 0.0))
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
                spec = np.abs(np.fft.rfft(x))
                tot = float(spec.sum())
                freqs = np.fft.rfftfreq(n)
                centroid = float((freqs * spec).sum() / tot) if tot > 0 else 0.0
                rows.append((i, n, rms, zcr, centroid))
            yield _pd.DataFrame(rows, columns=["doc_id", "n_samples", "rms", "zcr", "centroid"])

    src = df.select(F.col(id_col).alias("__id"), F.col(bin_col).alias("__bin"))
    return src.mapInPandas(kernel, AUDIO_SCHEMA)
