"""Observability: per-epoch apply metrics and table health.

The reference averages per-candidate response times into its function
store (AlignmentProcessor.java:1138-1146 → OutputManager.java:81-82);
the engine's equivalents are (a) ``Observation`` counters already wired
into every commit (rows_written in the manifest), (b) this module's
manifest summarization, and (c) a ``StreamingQueryListener`` for the
streaming tail (micro-batch rates straight from Spark's progress
events — no extra actions on the data path).
"""

from __future__ import annotations

import json
from typing import Any

from filipo_spark.table.icelet import IceletTable


def replay_metrics(table: IceletTable) -> dict[str, Any]:
    """Summarize commit lineage: epochs, rows, buckets, evolution events."""
    m = table.manifest()
    appends = [x for x in m if x.get("kind", "append") == "append"]
    compacts = [x for x in m if x.get("kind") == "compact"]
    snap = table.current_snapshot()
    bloom = {}
    if "bloom" in snap:
        # driver-side sketch-file read; past ~0.5 the FP rate degrades
        # and the probe under-counts key misses — resize/rebuild then
        # (table/sketch.py)
        bloom = {"bloom_saturation": round(table.key_bloom().saturation, 4)}
    return {
        **bloom,
        "epochs_committed_total": len(appends),
        "compactions": len(compacts),
        "rows_written": sum(x["n_rows"] for x in m),
        "buckets_touched": sorted({b for x in m for b in x["buckets"]}),
        "data_files": sum(len(v) for v in snap["files"].values()),
        "evolution_events": sorted({e for x in m for e in x["evolution_events"]}),
        "offset_hi": max((x["offset_hi"] for x in appends if x["offset_hi"] is not None), default=None),
        "current_snapshot": snap["snapshot_id"],
    }


class TailMetricsListener:
    """StreamingQueryListener capturing per-micro-batch rates.

    Import-guarded: constructed lazily so batch-only runs never touch the
    streaming classes."""

    def __new__(cls):
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self):
                self.progress: list[dict[str, Any]] = []

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = json.loads(event.progress.json)
                self.progress.append(
                    {
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
                        "durationMs": p.get("durationMs", {}),
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _L()
