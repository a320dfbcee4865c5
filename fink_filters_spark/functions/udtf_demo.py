"""Python UDTF surface (Spark 4): table-valued functions callable from SQL.

The reference has no UDTF (SURVEY §2.L); this engine exposes the API for
the row-to-rows shapes a pipeline occasionally needs from SQL — here, a
light-curve segmenter that splits one alert's history arrays into
per-night rows with gap labels (the SQL-callable dual of the
``hist_concat`` + higher-order-function path).

Scale note: UDTFs execute row-at-a-time in Python — keep them OFF hot
paths (the plan lint bans BatchEvalPython in the query suite for exactly
this reason). They're for low-volume, SQL-ergonomic expansion; bulk
expansion belongs to explode()/inline() or mapInPandas.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="seg int, t_start bigint, t_end bigint, n_points int")
class SegmentHistory:
    """Split an ordered epoch-array into segments at gaps > gap_us.

    SQL: ``SELECT s.* FROM alerts, LATERAL SegmentHistory(ts_arr, 43200000000) s``
    """

    def eval(self, ts: list, gap_us: int):  # noqa: A002
        if not ts:
            return
        seg, start, prev, n = 0, ts[0], ts[0], 0
        for t in ts:
            if t - prev > gap_us:
                yield (seg, int(start), int(prev), n)
                seg, start, n = seg + 1, t, 0
            prev = t
            n += 1
        yield (seg, int(start), int(prev), n)


def register_udtfs(spark) -> None:
    spark.udtf.register("segment_history", SegmentHistory)
