"""Per-batch duration breakdown for the streaming gate queries.

VERDICT r8 'What's wrong #1': stream_event_pairs measured 13.7s on the
driver's bench (min-of-2) vs ~2.5s quiet — x5.4 beyond the suite's ~1.15x
uniform load drift. This tool attaches a StreamingQueryListener and prints
each micro-batch's durationMs map (addBatch / getBatch / latestOffset /
queryPlanning / triggerExecution / walCommit / commitOffsets /
stateOperators memory+commit) so the dominant term is a measured number,
not a guess.

Usage: python tools/stream_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener


class _ProgressTap(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.progress.append({"event": "started", "t": time.perf_counter()})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.progress.append(
            {
                "event": "progress",
                "t": time.perf_counter(),
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "numRowsTotal",
                            "commitTimeMs",
                            "stateMemory",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.progress.append({"event": "terminated", "t": time.perf_counter()})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    wanted = sys.argv[2:] or ["stream_event_pairs"]

    from fink_filters_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("stream_profile")
    tap = _ProgressTap()
    spark.streams.addListener(tap)

    qs = entrymod.queries()
    for name in wanted:
        for rep in range(2):
            tap.progress.clear()
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            print(f"== {name} rep{rep}: wall={wall:.2f}s rows={n}")
            t_prev = t0
            for ev in tap.progress:
                dt = ev["t"] - t_prev
                t_prev = ev["t"]
                if ev["event"] != "progress":
                    print(f"   +{dt:6.2f}s {ev['event']}")
                    continue
                dur = ev["durationMs"] or {}
                so = "; ".join(
                    f"{s['operatorName']} rows={s['numRowsTotal']} commit={s['commitTimeMs']}ms"
                    for s in ev["stateOperators"]
                )
                print(
                    f"   +{dt:6.2f}s batch={ev['batchId']} in={ev['numInputRows']} "
                    f"trigger={dur.get('triggerExecution')}ms addBatch={dur.get('addBatch')}ms "
                    f"getBatch={dur.get('getBatch')}ms plan={dur.get('queryPlanning')}ms "
                    f"wal={dur.get('walCommit')}ms commitOff={dur.get('commitOffsets')}ms"
                    + (f" | {so}" if so else "")
                )
    spark.streams.removeListener(tap)
    spark.stop()


if __name__ == "__main__":
    main()
