"""Deterministic sampling operators.

The reference's `uniform_sample` topic samples by key modulus
(``rubin/livestream/filter_uniform_sample/filter.py:50``), which — unlike
``df.sample`` — is reproducible across retries/restarts and stable per key.
That property matters in a streaming broker (a re-delivered alert gets the
same verdict) and at 100 TB (no RNG state, pure pushable predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def uniform_sample(df: DataFrame, key: str, modulus: int = 113, residue: int = 0) -> DataFrame:
    """Keep rows where key mod modulus == residue (≈ 1/modulus of the stream).

    pmod, not %: the reference's Python ``objectId % 113`` is always
    non-negative, while Spark's % is sign-preserving — a negative key could
    never satisfy a positive residue and would be silently unsampleable."""
    return df.filter(F.pmod(F.col(key), F.lit(modulus)) == residue)


def hash_sample(df: DataFrame, key: str, fraction: float, seed: int = 42) -> DataFrame:
    """Deterministic fraction sampling for non-integer keys: xxhash64-bucket
    the key and keep the lowest ``fraction`` of buckets. Same
    stable-per-key property, arbitrary key type."""
    n_buckets = 1_000_000
    threshold = int(fraction * n_buckets)
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(n_buckets))
    return df.filter(bucket < threshold)


def mixture_sample(
    df: DataFrame,
    rates: DataFrame,
    key: str,
    source_col: str,
    rate_col: str = "rate_permille",
    default_permille: int = 1000,
    mult: int = 2654435761,
) -> DataFrame:
    """Deterministic dataset-mixture sampling: down-weight each source to a
    target rate (per-mille) from a small rates dimension — the "mix N
    corpora at fixed proportions" step of a pretraining data pipeline.

    A row survives iff ``(key * knuth) pmod 1000 < rate(source)``; sources
    absent from the rates table keep ``default_permille``. Multiplicative
    hashing makes the verdict a pure per-row predicate — reproducible
    across retries/restarts (same property as ``uniform_sample``), no RNG
    state, and subset-invariant: a doc keeps the same fate when the corpus
    around it grows.

    Scale: the rates table is corpus-count-sized (tens of rows) and
    broadcast; the survival filter is per-row arithmetic after the
    broadcast join — one corpus scan, zero shuffles.
    """
    r = rates.select(
        F.col(source_col).alias("__src"), F.col(rate_col).alias("__rate")
    )
    bucket = F.pmod(F.col(key) * F.lit(mult), F.lit(1000))
    return (
        df.join(F.broadcast(r), df[source_col] == F.col("__src"), "left")
        .filter(bucket < F.coalesce(F.col("__rate"), F.lit(default_permille)))
        .drop("__src", "__rate")
    )


def stratified_mod_sample(df: DataFrame, key: str, strata: Column, moduli: dict) -> DataFrame:
    """Per-stratum modulus sampling (e.g. keep 1/10 of 'view' events but all
    'error' events) — the streaming-safe version of sampleBy."""
    cond = F.lit(False)
    for stratum, modulus in moduli.items():
        cond = cond | ((strata == stratum) & (F.pmod(F.col(key), F.lit(modulus)) == 0))
    return df.filter(cond)
