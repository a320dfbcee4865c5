"""Parquet-native upsert (MERGE INTO semantics without a table format).

The reference never mutates data (alerts are append-only), but a pipeline
that maintains derived tables — crossmatch snapshots (SURVEY D5's TNS
cache), per-object rollups, curated corpora — needs keyed upsert. Without
Delta/Iceberg the idiomatic Spark form is a keyed full-outer join that
prefers the update side, rewritten atomically per partition:

- ``merge_upsert``: DataFrame-level MERGE (update wins, else keep base,
  else insert) — one shuffle on the key.
- ``upsert_partitioned``: write-side companion — rewrites ONLY the
  partitions the updates touch (dynamic partition overwrite), which is the
  100 TB behavior: a night's update rewrites that night, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: rows present in ``updates`` replace base rows with
    the same key; unmatched update rows are inserted; unmatched base rows
    survive. Column set must match. One full-outer join on the key."""
    non_keys = [c for c in base.columns if c not in keys]
    if set(base.columns) != set(updates.columns):
        raise ValueError("merge_upsert: base/updates column sets differ")
    b = base.alias("b")
    # presence marker: the join is null-safe on keys, so "update row exists"
    # must not be inferred from a key column's null-ness — a NULL-keyed
    # update row matches (eqNullSafe) yet its key is NULL, which would
    # silently hand the win back to the base side
    u = updates.withColumn("__upd", F.lit(True)).alias("u")
    cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    joined = b.join(u, cond, "full_outer")
    out_cols = [
        F.when(F.col("u.__upd").isNotNull(), F.col(f"u.{k}"))
        .otherwise(F.col(f"b.{k}"))
        .alias(k)
        for k in keys
    ] + [
        F.when(F.col("u.__upd").isNotNull(), F.col(f"u.{c}"))
        .otherwise(F.col(f"b.{c}"))
        .alias(c)
        for c in non_keys
    ]
    return joined.select(*out_cols)


def upsert_partitioned(
    base_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str,
) -> None:
    """Rewrite only the partitions touched by ``updates``: read those base
    partitions, merge, and overwrite them in place (dynamic partition
    overwrite). Untouched partitions are never read or written.

    Overwrite mode is passed as a PER-WRITE option, not a session conf — a
    session-level ``partitionOverwriteMode=dynamic`` would silently switch
    every later ``mode('overwrite').partitionBy(...)`` write in the same
    session from truncate-table to partition-level semantics.

    Atomicity: the rewrite replaces each touched partition's files
    non-atomically (plain parquet has no commit log); a crash mid-write can
    leave a touched partition half-replaced. For crash safety use a table
    format with a transaction log, or write to a staging dir and swap.
    """
    spark = updates.sparkSession
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # NULL-safe partition membership: isin() is NULL for NULL partition
    # rows, which would silently DROP the base side of the default
    # partition while dynamic overwrite still rewrites it with
    # updates-only rows — permanent data loss. Treat None explicitly.
    non_null = [p for p in parts if p is not None]
    cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(p is None for p in parts):
        cond = cond | F.col(partition_col).isNull()
    base = spark.read.parquet(base_path).filter(cond)
    merged = merge_upsert(base, updates, keys)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(base_path)
    )
