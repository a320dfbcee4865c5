"""Pure-numpy FITS stamp codec + sigma-clipped KS statistic.

The reference's alert cutouts (``cutoutScience.stampData`` etc.) are
gzip-compressed FITS images; the hostless pipeline decompresses them,
sigma-clips the pixel values and computes Kolmogorov-Smirnov statistics
(``/root/reference/fink_filters/ztf/livestream/filter_new_hostless/
utils.py:87-142``, delegating to fink-science's ELEPHANT implementation,
arXiv:2404.18165).

No astropy/fink-science in this container, so the codec is implemented
from the public FITS 4.0 standard directly: 2880-byte header blocks of
80-char cards, big-endian primary-HDU data, BSCALE/BZERO linear scaling.
Everything here is driver/executor-agnostic numpy — the Spark operator
wrapping it lives in ``operators/multimodal.py`` (``stamp_kstest``).
"""

from __future__ import annotations

import gzip
import math

import numpy as np

BLOCK = 2880
CARD = 80

# BITPIX -> numpy big-endian dtype (FITS data is always big-endian)
_BITPIX_DTYPE = {
    8: ">u1",
    16: ">i2",
    32: ">i4",
    64: ">i8",
    -32: ">f4",
    -64: ">f8",
}


def _parse_card_value(raw: str):
    """Parse a fixed/free-format FITS card value string (no comment)."""
    v = raw.strip()
    if not v:
        return None
    if v.startswith("'"):  # string value, '' escapes a quote
        end = v.rfind("'")
        return v[1:end].replace("''", "'").rstrip()
    if v == "T":
        return True
    if v == "F":
        return False
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v.replace("D", "E").replace("d", "e"))
    except ValueError:
        return v


def parse_fits(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a (possibly gzipped) single-HDU FITS image to float64 pixels.

    Returns ``(array, header_dict)``; the array has shape
    ``(NAXISn, ..., NAXIS1)`` (NAXIS1 is the FITS fast axis) and has
    BSCALE/BZERO applied. Raises ValueError on malformed input.
    """
    if payload[:2] == b"\x1f\x8b":  # gzip magic
        payload = gzip.decompress(payload)
    if payload[:6] != b"SIMPLE":
        raise ValueError("not a FITS primary HDU (missing SIMPLE card)")

    header: dict = {}
    pos = 0
    ended = False
    while not ended:
        block = payload[pos : pos + BLOCK]
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        for i in range(0, BLOCK, CARD):
            card = block[i : i + CARD].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                ended = True
                break
            if not key or key in ("COMMENT", "HISTORY"):
                continue
            if card[8:10] == "= ":
                body = card[10:]
                # strip inline comment (but not inside a quoted string)
                if body.lstrip().startswith("'"):
                    q = body.find("'", body.find("'") + 1)
                    while q != -1 and body[q : q + 2] == "''":
                        q = body.find("'", q + 2)
                    slash = body.find("/", q if q != -1 else 0)
                else:
                    slash = body.find("/")
                if slash != -1:
                    body = body[:slash]
                header[key] = _parse_card_value(body)
        pos += BLOCK

    bitpix = header.get("BITPIX")
    naxis = header.get("NAXIS", 0)
    if bitpix not in _BITPIX_DTYPE:
        raise ValueError(f"unsupported BITPIX {bitpix}")
    try:
        shape = [int(header[f"NAXIS{i}"]) for i in range(naxis, 0, -1)]
    except (KeyError, TypeError) as e:  # NAXIS declared but NAXISn missing
        raise ValueError(f"malformed FITS axis cards: {e}") from e
    count = int(np.prod(shape)) if shape else 0
    nbytes = count * abs(bitpix) // 8
    data = payload[pos : pos + nbytes]
    if len(data) < nbytes:
        raise ValueError("truncated FITS data")
    arr = np.frombuffer(data, dtype=_BITPIX_DTYPE[bitpix], count=count)
    arr = arr.reshape(shape).astype(np.float64)
    bscale = float(header.get("BSCALE", 1.0))
    bzero = float(header.get("BZERO", 0.0))
    if bscale != 1.0 or bzero != 0.0:
        arr = arr * bscale + bzero
    return arr, header


def _card(key: str, value) -> bytes:
    if isinstance(value, bool):
        sval = "T" if value else "F"
    elif isinstance(value, int):
        sval = str(value)
    elif isinstance(value, float):
        sval = repr(value)
    else:
        sval = "'" + str(value).replace("'", "''") + "'"
    return f"{key:<8}= {sval:>20}".ljust(CARD).encode("ascii")


def write_fits(arr: np.ndarray, compress: bool = True) -> bytes:
    """Encode a numpy array as a single-HDU FITS image (optionally gzipped).

    Inverse of :func:`parse_fits` for test round-trips and for synthesizing
    reference-shaped stamp payloads. Float input is stored as BITPIX -32,
    integer input as BITPIX 16/32 (whichever fits).
    """
    arr = np.asarray(arr)
    if np.issubdtype(arr.dtype, np.floating):
        bitpix, dtype = -32, ">f4"
    elif arr.size and (arr.max() > 2**31 - 1 or arr.min() < -(2**31)):
        # BITPIX 64: without this branch astype('>i4') would two's-
        # complement WRAP values past int32 silently, breaking the
        # documented parse_fits round-trip inverse (round-7 review)
        bitpix, dtype = 64, ">i8"
    elif arr.size and (arr.max() > 2**15 - 1 or arr.min() < -(2**15)):
        bitpix, dtype = 32, ">i4"
    else:
        bitpix, dtype = 16, ">i2"
    cards = [
        _card("SIMPLE", True),
        _card("BITPIX", bitpix),
        _card("NAXIS", arr.ndim),
    ]
    # NAXIS1 is the fastest (last numpy) axis
    for i, n in enumerate(reversed(arr.shape), start=1):
        cards.append(_card(f"NAXIS{i}", int(n)))
    cards.append(b"END".ljust(CARD))
    header = b"".join(cards)
    header += b" " * (-len(header) % BLOCK)
    data = arr.astype(dtype).tobytes()
    data += b"\x00" * (-len(data) % BLOCK)
    out = header + data
    if compress:
        out = gzip.compress(out, mtime=0)  # mtime=0: deterministic bytes
    return out


def sigma_clip(x: np.ndarray, sigma: float = 3.0, maxiters: int = 5) -> np.ndarray:
    """Iterative median-centered sigma clipping (astropy ``sigma_clip``
    semantics: reject |x - median| > sigma * std, recompute, repeat)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    x = x[np.isfinite(x)]
    for _ in range(maxiters):
        if len(x) == 0:
            return x
        med = np.median(x)
        std = np.std(x)
        if std == 0:
            return x
        keep = np.abs(x - med) <= sigma * std
        if keep.all():
            return x
        x = x[keep]
    return x


_ERF = np.vectorize(math.erf, otypes=[np.float64])


def normal_ks_statistic(x: np.ndarray) -> float:
    """One-sample KS statistic of ``x`` against a normal distribution with
    the sample's own mean/std (the Lilliefors test statistic — the shape
    the ELEPHANT pipeline computes on clipped cutout pixels)."""
    x = np.sort(np.asarray(x, dtype=np.float64).ravel())
    n = len(x)
    if n == 0:
        return float("nan")
    mu, sd = float(np.mean(x)), float(np.std(x))
    if sd == 0:
        return 1.0 - 1.0 / n  # degenerate: point mass vs continuous CDF
    cdf = 0.5 * (1.0 + _ERF((x - mu) / (sd * math.sqrt(2.0))))
    hi = np.arange(1, n + 1) / n - cdf
    lo = cdf - np.arange(0, n) / n
    return float(max(hi.max(), lo.max()))


def stamp_ks(payload: bytes, sigma: float = 3.0) -> float:
    """Full per-stamp pipeline: gunzip -> FITS decode -> sigma-clip -> KS."""
    arr, _ = parse_fits(bytes(payload))
    return normal_ks_statistic(sigma_clip(arr, sigma=sigma))
