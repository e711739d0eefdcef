"""WAL log compaction — Kafka compacted-topic semantics for the change log.

A long-lived WAL grows O(total events ever); replaying it from offset 0
(bootstrap of a new downstream table, disaster recovery, adding a replica)
costs O(history) even though only O(live keys) of it still matters.  Log
compaction rewrites a CLOSED PREFIX of the WAL — every segment whose LSNs
are at or below a compaction horizon — keeping only each key's LAST event
in the prefix (update or delete tombstone).  Replaying

    compacted-prefix  ∪  untouched-tail-segments

through the exactly-once MERGE path yields byte-identical final table
state to replaying the full log, because the engine's winner reduction
(``LakeTable.prepare_batch``) already resolves every key to its
max-LSN event: dropping the superseded prefix events removes only rows
that could never win.  That equivalence is this module's contract and is
oracle-checked end-to-end (plans/catalog.py::wal_log_compaction) and
property-tested (tests/test_wal_compaction.py).

Semantics notes (honest contract):

- **Full-image events only.**  Partial images (null = unchanged, the
  Debezium TOAST shape) inherit columns from EARLIER events of the same
  key, so dropping those earlier events changes the result.  Compacting a
  partial-image WAL is unsound and the caller must not do it; see
  ``LakeTable.merge(partial_update=True)`` for where partial images are
  resolved instead.
- **Tombstones are retained by default.**  A delete's last event must
  survive compaction or a replay into a table that already holds the key
  (resume from a mid-prefix checkpoint) would resurrect it.
  ``drop_tombstones=True`` additionally removes keys whose final prefix
  event is a delete — sound ONLY for bootstrap replays into an empty
  table with no earlier checkpoint (Kafka's post-``delete.retention.ms``
  behavior), which is exactly the bootstrap scenario compaction exists
  to accelerate.
- The horizon must sit on a SEGMENT boundary (a segment wholly at or
  below ``upto_lsn``): compaction replaces whole immutable segments, so
  a reader composing prefix + tail never sees an LSN range twice.

Scale shape: one map-side-combinable ``max_by`` reduction per key — the
same single shuffle the merge itself pays — then a range-partitioned
write producing LSN-ordered segments of ``segment_rows`` each.  No
driver-side data, no collect; at 10^10 events the reduction is the
standard bucketed aggregate and the output is O(live keys).

Reference analog: none — the reference re-extracts full tables per run
(reference pipeline/lib/summary/summary_config_processor.py:110-152);
a compacted change log is the incremental-engine replacement for that
full re-extract.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class CompactionReport:
    """What a compaction run did (lineage record for the log's manifest)."""

    upto_lsn: int
    events_in: int
    events_out: int
    tombstones_out: int
    segments_in: list[str]
    segments_out: list[str]

    @property
    def reduction(self) -> float:
        return 0.0 if not self.events_in else 1 - self.events_out / self.events_in


def _list_segments(wal_dir: str) -> list[str]:
    # absolute paths: the footer-stats map is keyed by the path Spark's
    # input_file_name() reports (absolute), and a relative wal_dir must
    # not make every segment silently miss the map (a missed segment
    # would default to neither-prefix-nor-tail — data loss, not an error)
    return sorted(
        os.path.join(os.path.abspath(wal_dir), fn)
        for fn in os.listdir(wal_dir)
        if fn.endswith(".parquet") and not fn.startswith(".")
    )


def _norm_path(p: str) -> str:
    """``input_file_name()`` URI (``file:///root/x``) → local path."""
    return "/" + p[5:].lstrip("/") if p.startswith("file:") else p


def _segment_max_lsns(
    spark: SparkSession, segments: list[str], lsn_col: str
) -> dict[str, int]:
    """Per-segment max LSN — one column-pruned job over the lsn column.
    Every listed segment must resolve (a segment missing from this map
    would silently land in neither prefix nor tail — fail instead);
    zero-row segments are legitimately absent and map to -inf."""
    out = {
        _norm_path(r["_f"]): int(r["_m"])
        for r in spark.read.parquet(*segments)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(F.max(lsn_col).alias("_m"))
        .collect()
    }
    for s in segments:
        if s not in out:
            out[s] = -(2 ** 62)  # empty segment: compacts away harmlessly
    return out


def compact_log(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    drop_tombstones: bool = False,
) -> DataFrame:
    """Pure logical compaction: latest event per key of a bounded event
    DataFrame.  One ``max_by`` hash aggregate — map-side combinable, so a
    hot key's events collapse inside each input partition before the
    shuffle (the same skew-absorbing shape as the merge's winner
    reduction)."""
    payload = F.struct(*[c for c in events.columns if c not in key_cols])
    out = (
        events.groupBy(*key_cols)
        .agg(F.max_by(payload, F.col(lsn_col)).alias("_last"))
        .select(*key_cols, "_last.*")
    )
    if drop_tombstones:
        out = out.filter(F.col(op_col) != "delete")
    return out


def compact_wal_prefix(
    spark: SparkSession,
    wal_dir: str,
    out_dir: str,
    key_cols: list[str],
    upto_lsn: int | None = None,
    lsn_col: str = "lsn",
    op_col: str = "op",
    drop_tombstones: bool = False,
    segment_rows: int = 4_000_000,
) -> CompactionReport:
    """Compact every WAL segment wholly at or below ``upto_lsn`` into
    LSN-ordered segments under ``out_dir``; tail segments (any row above
    the horizon) are untouched and stay where they are.

    Segment admission is decided from parquet FOOTER stats (one cheap
    metadata job over segment max-LSNs), never by reading data of
    segments that won't compact.  ``upto_lsn=None`` compacts the whole
    log (max LSN horizon).  Returns a :class:`CompactionReport`; the
    caller (or :func:`compose_compacted_wal`) composes
    ``out_dir ∪ tail-segments`` for readers.
    """
    segments = _list_segments(wal_dir)
    if not segments:
        raise ValueError(f"no WAL segments under {wal_dir}")
    # per-segment max LSN from footers: one small job, column-pruned scan
    # of the lsn column only (row-group stats make this metadata-cheap)
    seg_max = _segment_max_lsns(spark, segments, lsn_col)
    horizon = max(seg_max.values()) if upto_lsn is None else int(upto_lsn)
    prefix = [s for s in segments if seg_max.get(s, horizon + 1) <= horizon]
    if not prefix:
        raise ValueError(
            f"no segment lies wholly at or below LSN {horizon} "
            f"(segment max-LSNs: {sorted(seg_max.values())[:8]}...)"
        )
    ev = spark.read.parquet(*prefix)
    compacted = compact_log(
        ev, key_cols, lsn_col=lsn_col, op_col=op_col,
        drop_tombstones=drop_tombstones,
    )
    # LSN-ordered output segments: range partition on LSN so segment i's
    # LSNs all precede segment i+1's — readers that reason per segment
    # (the tail reader's stale-segment guard, future compactions' footer
    # admission) keep working on compacted output
    n_in, n_out, n_tomb = (
        ev.count(),
        compacted.count(),
        compacted.filter(F.col(op_col) == "delete").count()
        if not drop_tombstones
        else 0,
    )
    n_parts = max(1, -(-n_out // int(segment_rows)))
    (
        compacted.repartitionByRange(n_parts, F.col(lsn_col))
        .sortWithinPartitions(lsn_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    out_segments = _list_segments(out_dir)
    return CompactionReport(
        upto_lsn=horizon,
        events_in=int(n_in),
        events_out=int(n_out),
        tombstones_out=int(n_tomb),
        segments_in=prefix,
        segments_out=out_segments,
    )


def compose_compacted_wal(
    spark: SparkSession,
    wal_dir: str,
    compacted_dir: str,
    upto_lsn: int,
    lsn_col: str = "lsn",
) -> DataFrame:
    """The reader-side composition: compacted prefix ∪ tail segments.
    Tail admission reuses the same footer-stats rule as the writer
    (a segment is tail iff its max LSN exceeds the horizon), so writer
    and reader can never disagree about which side owns a segment."""
    segments = _list_segments(wal_dir)
    seg_max = _segment_max_lsns(spark, segments, lsn_col)
    tail = [s for s in segments if seg_max.get(s, 0) > upto_lsn]
    parts = [spark.read.parquet(compacted_dir)]
    if tail:
        parts.append(spark.read.parquet(*tail))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df
