"""Byte-level job accounting from Spark's status REST API.

Closes the bytes/event ledger BENCH.md needs: per replay (or per batch)
the shuffle bytes written/read, parquet input/output bytes, and spill —
summed over completed stages.  Uses the UI REST endpoint (the public,
version-stable surface over AppStatusStore); callers must create the
session with ``spark.ui.enabled=true`` (bench scripts do; the engine
default keeps it off).

No listener plumbing: a snapshot is one HTTP GET on the driver, so the
probe itself moves no executor-side work.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

_COUNTERS = (
    "shuffleWriteBytes",
    "shuffleReadBytes",
    "inputBytes",
    "outputBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "inputRecords",
    "outputRecords",
    "shuffleWriteRecords",
)


def stage_byte_totals(spark: SparkSession) -> dict[str, int] | None:
    """Cumulative per-counter totals over all completed stages, or None
    when the UI (and thus the REST API) is disabled."""
    url = spark.sparkContext.uiWebUrl
    if not url:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        ) as fh:
            stages = json.load(fh)
    except Exception:
        return None
    return {k: sum(int(s.get(k, 0)) for s in stages) for k in _COUNTERS}


def byte_delta(
    before: dict[str, int] | None, after: dict[str, int] | None
) -> dict[str, int] | None:
    """Counter delta between two snapshots (None if either probe failed).

    Returns None on a NEGATIVE inputRecords delta too: the REST totals
    sum over *retained* stages, so once the app store evicts old stages
    (spark.ui.retainedStages, default 1000) the totals can go backwards
    and the delta is garbage — callers must either raise the retention
    for long runs or treat None as "ledger unavailable", never publish
    a wrapped number.
    """
    if before is None or after is None:
        return None
    d = {k: after.get(k, 0) - before.get(k, 0) for k in _COUNTERS}
    if d["inputRecords"] < 0 or d["inputBytes"] < 0:
        return None
    return d


def per_event(delta: dict[str, int] | None, n_events: int) -> dict[str, float] | None:
    """bytes/event view of a delta — the ledger row BENCH.md publishes."""
    if delta is None or n_events <= 0:
        return None
    return {k: round(v / n_events, 2) for k, v in delta.items()}
