"""Declared query suite: every SURVEY §2 operator exercised on the synthetic
tables, each paired with an ANSI-SQL DuckDB oracle (driver contract).

Parity rules (tables.py): quantize floats to integers before aggregation,
single deterministic double expression at the end, identical expression trees
in the Spark code and the oracle SQL, every computed column aliased the same
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


def e6(col, name: str):
    """hash-stability: wrap a double output column as integer micro-units
    (``CAST(round(x * 1e6) AS BIGINT)``). Fractional ``round(x, 6)`` is NOT
    engine-proof — Spark rounds the exact decimal expansion via BigDecimal
    HALF_UP while a DuckDB build may scale-and-round in double arithmetic,
    so the two can split by one ulp at a decimal boundary. INTEGER rounding
    is half-away-from-zero in both engines (verified empirically), and for
    any rational x = a/b the distance of x*1e6 from a rounding boundary is
    either exactly 0 (both engines agree on the tie) or >= 1/(2b), orders
    of magnitude above double error. SQL mirror:
    ``CAST(round((expr) * 1e6) AS BIGINT) AS name``. See DESIGN.md
    "integer micro-units".

    CAVEAT — the exactness argument above covers RATIONAL x only. For a
    column derived through libm transcendentals (ln/exp/pow: pmi_e6,
    tfidf score_e6, dcmag_e6, gal_b_e6, rrf_e6, psi_term_e6), a ~1-ulp
    difference between the engines' math libraries can land x*1e6 on
    opposite sides of a .5 boundary, so cross-engine hash parity for
    those columns is PROBABILISTIC (P(split) ~ boundary-density * ulp,
    empirically zero hits across the suite's corpora but not guaranteed).
    Where a split ever materializes, the remedies are (a) reformulate the
    term so the transcendental is computed once in Python and embedded as
    an integer literal (the Fellegi-Sunter weights pattern,
    queries/linkage.py), or (b) compare with a +/-1 micro-unit tolerance
    in the oracle check."""
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    out = F.round(c * 1e6).cast("long")
    return out.alias(name) if name is not None else out


# The synthetic events table's 5 event types, standing in for survey bands
# in the F6/E6 per-band queries and the multiband fit demos.
BAND_TYPES = ["click", "view", "purchase", "signup", "error"]


def band_means_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, <band>...) — per-user per-band mean of the quantized value,
    pivoted to one double column per band (exact integer sum over count,
    one deterministic division). Shared source frame of the F6 band-stat
    lookup (``extras.q_ev_band_stats``) and the E6 extremes query
    (``filters.q_ev_band_extremes``) so the mean definition cannot
    silently diverge between their oracles."""
    from pyspark.sql import functions as F

    from ..tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.round(F.col("value") * 1000).cast("long").alias("v"),
        F.col("event_type").alias("band"),
    )
    return (
        ev.groupBy("user_id")
        .pivot("band", BAND_TYPES)
        .agg((F.sum("v") / F.count(F.lit(1))).alias("mean"))
    )


def all_specs() -> list[QuerySpec]:
    from . import (
        advanced,
        analytic,
        approx,
        curation,
        dedup,
        extras,
        filters,
        layout,
        linkage,
        mlprep,
        pipeline,
        relational,
        relational2,
        relational3,
        similarity,
        sql_surface,
        streamq,
        text,
        timeseries,
        xmatch,
    )

    specs: list[QuerySpec] = []
    for mod in (relational, relational2, relational3, filters, timeseries,
                xmatch, dedup, similarity, text, extras, pipeline, analytic,
                curation, sql_surface, mlprep, approx, advanced, streamq,
                layout, linkage):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_dict() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
