"""Vector (embedding) math over array<float|double> columns.

Quantized-integer convention (see tables.py): embedding elements are scaled
to integers (x1e6) before dot/norm folds, so the sequential ``aggregate``
fold is exact integer math and bit-identical to the DuckDB oracle. With
64-dim embeddings in [-1, 1], |e| <= 1e6, products <= 1e12, 64-element sums
<= 6.4e13 — far below 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

VEC_SCALE = 1_000_000


def quantize_vec(vec, scale: int = VEC_SCALE) -> Column:
    """array<float> -> array<long> of round(x * scale)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: F.round(x.cast("double") * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm_sq_q(a: Column) -> Column:
    """Exact integer squared norm of a quantized vector."""
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def sq_l2_q(a: Column | str, b: Column | str) -> Column:
    """Exact integer squared L2 distance of two quantized vectors — THE
    PQ distance convention (pq_encode's codeword argmin and
    pq_adc_search's distance table must agree bit-for-bit, so both call
    this one definition)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_sim_q(a: Column, b: Column) -> Column:
    """Cosine similarity of two quantized vectors: one deterministic double
    expression over exact integers (null if either norm is 0)."""
    d = dot_q(a, b).cast("double")
    na = norm_sq_q(a).cast("double")
    nb = norm_sq_q(b).cast("double")
    return F.when((na > 0) & (nb > 0), d / F.sqrt(na) / F.sqrt(nb))
