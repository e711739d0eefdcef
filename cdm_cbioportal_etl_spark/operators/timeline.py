"""Timeline-pipeline operators: multi-way deid join, melt, future-nulling.

Re-expresses reference pipeline/timeline/cbioportal_timeline_deidentify.py
(:252-558 main flow) and cbioportal_timeline_follow_up.py:84-103 (melt) as
one lazy plan: sample/anchor/OS dims are broadcast, the event fact table
streams through a single stage of column expressions, and the only wide
shuffle is the final sink sort.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from cdm_cbioportal_etl_spark.functions import (
    interval_days,
    null_future_dates,
    tolerant_to_date,
    truncate_to_limit,
    zero_pad_id,
)


def deidentify_timeline(
    timeline: DataFrame,
    samples: DataFrame,
    anchor: DataFrame,
    os_dates: DataFrame,
    today: dt.date | str,
    date_cols: tuple[str, ...] = ("START_DATE", "STOP_DATE"),
    truncate_at_os: bool = True,
    sample_level: bool = False,
) -> DataFrame:
    """Timeline deid (reference cbioportal_timeline_deidentify.py):

      :426-439  3/4-way left join of samples ⟕ anchor ⟕ os ⟕ timeline
      :443-463  future-date nulling vs injected 'today' (determinism: the
                reference uses pd.Timestamp.today(); here a job parameter)
      :468-484  optional truncation of event dates at the OS date
      :487-498  date→integer day offsets from the anchor date
      :545-549  drop rows lacking key/date, sort, nullable-int cast

    ``samples``: PATIENT_ID [, SAMPLE_ID]; ``anchor``: DMP_ID, MRN,
    DATE_TUMOR_SEQUENCING; ``os_dates``: MRN, OS_DATE; ``timeline``: MRN
    [, SAMPLE_ID], *date_cols, EVENT_TYPE, SUBTYPE + metadata columns.
    """
    anchor_n = anchor.select(
        zero_pad_id("MRN").alias("MRN"),
        F.col("DMP_ID"),
        F.col("DATE_TUMOR_SEQUENCING").alias("_ANCHOR"),
    )
    os_n = os_dates.select(zero_pad_id("MRN").alias("MRN"), F.col("OS_DATE").alias("_OS"))
    tl = timeline.withColumn("MRN", zero_pad_id("MRN"))
    for c in date_cols:
        tl = tl.withColumn(c, tolerant_to_date(c))

    if sample_level:
        # samples[SAMPLE_ID, PATIENT_ID] ⟕ anchor ⟕ os ⟕ timeline on
        # (SAMPLE_ID, MRN) — reference :434-439
        spine = (
            samples.select("SAMPLE_ID", "PATIENT_ID")
            .join(F.broadcast(anchor_n), samples.PATIENT_ID == anchor_n.DMP_ID, "left")
            .drop("DMP_ID")
            .join(F.broadcast(os_n), "MRN", "left")
        )
        joined = spine.join(tl, ["SAMPLE_ID", "MRN"], "left")
    else:
        spine = (
            samples.select("PATIENT_ID")
            .distinct()
            .join(F.broadcast(anchor_n), samples.PATIENT_ID == anchor_n.DMP_ID, "left")
            .drop("DMP_ID")
            .join(F.broadcast(os_n), "MRN", "left")
        )
        joined = spine.join(tl, "MRN", "left")

    for c in date_cols:
        joined = joined.withColumn(c, null_future_dates(c, today))
        if truncate_at_os:
            joined = joined.withColumn(c, truncate_to_limit(c, "_OS"))
        joined = joined.withColumn(c, interval_days(c, "_ANCHOR").cast("int"))

    meta_cols = [
        c
        for c in joined.columns
        if c not in ("MRN", "_ANCHOR", "_OS", "PATIENT_ID", *date_cols)
    ]
    return (
        joined.na.drop(subset=["PATIENT_ID", date_cols[0]])
        .select("PATIENT_ID", *date_cols, *meta_cols)
        .orderBy("PATIENT_ID", date_cols[0])
    )


def melt_date_columns(
    df: DataFrame,
    id_col: str,
    date_cols: list[str],
    source_labels: dict[str, str],
    event_type: str = "STATUS",
) -> DataFrame:
    """Wide→long: one event row per (patient, date column) — reference
    cbioportal_timeline_follow_up.py:84-103 (pd.melt + SOURCE label map).
    Uses the built-in unpivot (no shuffle; row expansion only)."""
    out = (
        df.select(id_col, *date_cols)
        .unpivot(id_col, date_cols, "VARIABLE", "START_DATE")
        .withColumn("EVENT_TYPE", F.lit(event_type))
    )
    mapping = F.create_map(*[F.lit(x) for kv in source_labels.items() for x in kv])
    return out.withColumn("SOURCE", mapping[F.col("VARIABLE")]).drop("VARIABLE")
