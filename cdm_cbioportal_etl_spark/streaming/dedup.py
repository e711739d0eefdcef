"""Source-side streaming deduplication for at-least-once feeds.

A WAL tail, Kafka topic, or file drop redelivers events (producer
retries, consumer restarts).  The lake sink is already exactly-once (the
LSN ledger), but aggregation paths that DON'T go through the ledger —
the windowed rollups, sessionizers — would double-count redeliveries.
``dedup_stream`` drops them at the source with
``dropDuplicatesWithinWatermark``: state holds each id only until the
watermark passes it, so memory is bounded by the redelivery horizon
instead of the stream's lifetime (the unbounded ``dropDuplicates``
alternative leaks state forever).

Contract (asserted in tests/test_streaming_dedup.py): a duplicate id
arriving WITHIN the watermark of its first occurrence is dropped —
whatever micro-batch it lands in; a duplicate arriving after the
watermark expired its state re-emits (that is the documented bound, not
a bug — size the watermark to the feed's redelivery horizon).

Scale shape: one grouping shuffle on the id, per-id state is O(1),
eviction rides the same watermark machinery as the windowed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drop redelivered events (same ``id_cols``) within the watermark
    horizon.  Composes upstream of any stateful operator: e.g.
    ``windowed_agg_stream(dedup_stream(src))`` gives redelivery-proof
    rollup counts without a ledger."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
