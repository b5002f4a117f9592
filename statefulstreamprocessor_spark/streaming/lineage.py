"""Streaming lineage + metrics via StreamingQueryListener.

Per micro-batch, records what the reference carries per record as
``topic/partition/offset`` metadata (reference
``ts_join_with_kafka_eos.py:151-156``) at the granularity Spark makes
authoritative: per-source start/end offsets, watermark, input row counts
and throughput — appended as JSON lines for replay/audit.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["LineageListener"]


class LineageListener(StreamingQueryListener):
    def __init__(self, out_path: str):
        self.out_path = out_path

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "event": "progress",
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "watermark": p.eventTime.get("watermark") if p.eventTime else None,
            "sources": [
                {
                    "description": s.description,
                    "start_offset": s.startOffset,
                    "end_offset": s.endOffset,
                    "num_rows": s.numInputRows,
                }
                for s in p.sources
            ],
            "state": [
                {
                    "rows": s.numRowsTotal,
                    "updated": s.numRowsUpdated,
                    "mem_bytes": s.memoryUsedBytes,
                }
                for s in (p.stateOperators or [])
            ],
        }
        self._write(rec)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def _write(self, rec: dict) -> None:
        with open(self.out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
