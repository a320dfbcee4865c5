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


def all_specs() -> list[QuerySpec]:
    from . import (
        advanced,
        analytic,
        approx,
        curation,
        dedup,
        extras,
        filters,
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
                curation, sql_surface, mlprep, approx, advanced, streamq):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_dict() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
