"""Grouped-map (applyInPandas) operators — the sanctioned Arrow surface.

BASELINE.json's input_hint allows exactly two Python surfaces: scalar
``pandas_udf`` and ``groupBy().applyInPandas`` (vectorized Arrow batches,
zero per-row Python).  Everything in this engine that CAN be a JVM column
expression IS one; this module holds the cases where a whole group must
be reshaped at once — the reference's per-patient wide-row assembly
pattern (reference pipeline/lib/summary/summary_merger.py:196-250 builds
one wide row per patient by reshaping all of that patient's attribute
rows together).

Scale shape: applyInPandas shuffles by the group key once; each group
arrives as ONE pandas frame, so the group's size must fit an executor
(true for per-patient / per-repo groups; never call this with a global
key).  Arrow does the transfer in columnar batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compact_group_timeline(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One wide row per key from that key's full event history: first/last
    event timestamps and types, event count, span days, and the modal
    event type — per-group reshaping that needs the whole group at once
    (grouped-map), vectorized inside each group via pandas ops.

    Equivalent SQL exists for THIS summary (see catalog oracle) — the
    operator exists to exercise/verify the applyInPandas path the wide-
    table assembly uses when the reshape is not SQL-expressible.
    """
    schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("first_ts", T.TimestampType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("first_type", T.StringType()),
            T.StructField("last_type", T.StringType()),
            T.StructField("span_days", T.LongType()),
            T.StructField("modal_type", T.StringType()),
        ]
    )

    def _compact(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, type_col], kind="mergesort")
        counts = pdf[type_col].value_counts()
        top = counts[counts == counts.max()].index.min()  # deterministic tie
        first, last = pdf.iloc[0], pdf.iloc[-1]
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "first_ts": [first[ts_col]],
                "last_ts": [last[ts_col]],
                "first_type": [first[type_col]],
                "last_type": [last[type_col]],
                "span_days": [
                    (last[ts_col].normalize() - first[ts_col].normalize()).days
                ],
                "modal_type": [top],
            }
        )

    return (
        events.select(key_col, ts_col, type_col)
        .groupBy(key_col)
        .applyInPandas(_compact, schema)
    )


def compact_group_timeline_sql(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """JVM-plan twin of :func:`compact_group_timeline` — the PRODUCTION
    path for this reshape: identical output, but expressed as two
    map-side-combinable hash aggregates + one key join (whole-stage
    codegen, no Python, no per-group pandas materialization).

    first/last: ``min/max(struct(ts, type))`` reproduces the pandas
    sort's tie-breaks (earliest ts → smallest type; latest ts → largest
    type).  modal: per-(key,type) counts, then ``min(struct(-cnt,
    type))`` = highest count, smallest type on ties.  ~10× cheaper than
    the grouped-map form at sf0.1; keep the applyInPandas twin only as
    the grouped-map plumbing harness.
    """
    k, ts, ty = F.col(key_col), F.col(ts_col), F.col(type_col)
    base = (
        events.select(key_col, ts_col, type_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.struct(ts.alias("ts"), ty.alias("t"))).alias("_f"),
            F.max(F.struct(ts.alias("ts"), ty.alias("t"))).alias("_l"),
        )
    )
    modal = (
        events.groupBy(key_col, type_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(key_col)
        .agg(
            F.min(
                F.struct((-F.col("_cnt")).alias("neg"), ty.alias("t"))
            ).alias("_m")
        )
        .select(k, F.col("_m.t").alias("modal_type"))
    )
    return base.join(modal, key_col).select(
        k,
        F.col("n_events"),
        F.col("_f.ts").alias("first_ts"),
        F.col("_l.ts").alias("last_ts"),
        F.col("_f.t").alias("first_type"),
        F.col("_l.t").alias("last_type"),
        F.datediff(F.to_date("_l.ts"), F.to_date("_f.ts"))
        .cast("long")
        .alias("span_days"),
        F.col("modal_type"),
    )
