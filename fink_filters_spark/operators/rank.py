"""Distributed global rank via value-domain order statistics.

Rewrite target for ``Window.orderBy(...)`` with NO ``partitionBy`` — Spark
plans that as a SINGLE-partition WindowExec (every row of the input moves
to one task), which at 100 TB is indistinguishable from a driver collect.
When the ordering column's value DOMAIN is bounded (a price grid, a
token-count range) even though the ROW count is not, the global rank over
``(value, tie)`` decomposes into

    rank(v, t) = (# rows whose value sorts strictly before v)   [domain-sized]
               + row_number() over (PARTITION BY value ORDER BY tie)

The first term is a cumulative-count window over the value-COUNT table —
one row per distinct value, bounded by the domain, not the corpus (the
same order-statistics shape as queries/mlprep.pipe_range_bounds). The
second term partitions by the value itself, so it distributes. The offset
table broadcasts back, so the corpus pays exactly ONE hash shuffle (the
within-value window), same as any keyed window.

Reference context: the reference never ranks globally (its per-object
windows are keyed by objectId); this primitive exists for the generic
analytic surface (SURVEY §2.E) where a user writes ``ntile(10) OVER
(ORDER BY ...)`` and the engine must not collapse to one partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def grid_rank(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    *,
    rank_col: str = "rank",
    descending: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Append a 1-based global dense row rank over the total order
    ``(value_col [DESC], *tie_cols ASC)`` without a single-partition
    window.

    ``value_col`` must have a bounded value domain (the offset table is
    domain-sized and is broadcast). ``tie_cols`` must make the order total
    (include a unique key) or the rank is nondeterministic within ties.
    With ``total_col`` set, every row also carries the total row count
    (needed by ntile-style bucketing) — computed from the same domain
    table, no extra corpus pass.
    """
    order = [F.col(value_col).desc()] if descending else [F.col(value_col).asc()]
    ww = Window.partitionBy(value_col).orderBy(*[F.col(c).asc() for c in tie_cols])
    wdf = df.withColumn("__rn", F.row_number().over(ww))
    # Per-value counts DERIVED FROM THE WINDOW OUTPUT (round 11, guide
    # §2.4): max row_number within a value partition IS that value's row
    # count, so the domain table is an aggregate over the same
    # scan->Exchange(value)->Sort->Window subtree the rank itself uses —
    # byte-identical, so runtime ReusedExchange materializes the corpus
    # shuffle ONCE. The previous shape aggregated counts straight off the
    # source (a second corpus scan + its own aggregate exchange), which
    # re-ran the caller's upstream projection — for pipe_shard_balance
    # that meant tokenizing every document twice. Referencing __rn (not
    # count(*)) in the aggregate is what keeps the Window node in this
    # branch, preserving subtree identity under column pruning.
    counts = wdf.groupBy(value_col).agg(F.max("__rn").alias("__c"))
    # Bounded-domain global windows: `counts` has one row per DISTINCT
    # value, so these unpartitioned frames never exceed the domain size.
    cw = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    offs_cols = [
        F.col(value_col).alias("__v"),
        F.coalesce(F.sum("__c").over(cw), F.lit(0)).alias("__lo"),
    ]
    if total_col is not None:
        tw = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offs_cols.append(F.sum("__c").over(tw).alias(total_col))
    offs = counts.select(*offs_cols)
    return (
        wdf
        # eqNullSafe: a NULL value group exists in the domain table (and
        # sorts where the Window.orderBy frame above placed it — Spark
        # puts NULLs first ASC / last DESC, consistently in both the
        # offset window and this join key), so NULL-valued rows must keep
        # their rank, not silently drop out of an inner equi-join
        .join(F.broadcast(offs), F.col(value_col).eqNullSafe(F.col("__v")))
        .withColumn(rank_col, (F.col("__lo") + F.col("__rn")).cast("long"))
        .drop("__v", "__lo", "__rn")
    )


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """Spark/ANSI ``ntile(k)`` bucket from a 1-based global rank and the
    total row count: the first ``total % k`` buckets hold ``total div k + 1``
    rows, the rest ``total div k``. Double division is exact here — the
    quotients are <= k+1, so a correctly-rounded IEEE quotient cannot cross
    an integer boundary (numerator offsets are >= 1 >> ulp(k))."""
    n = total.cast("long")
    r = rank.cast("long")
    base = F.floor(n / k).cast("long")
    rem = n % k
    head = rem * (base + 1)
    bucket = F.when(r <= head, F.ceil(r / (base + 1))).otherwise(
        rem + F.ceil((r - head) / base)
    )
    return bucket.cast("int")
