"""Config → plan: generate the summary DataFrame pipeline from YAML specs.

Plan generator for the declarative surface in pipeline/config.py,
re-expressing the reference's per-config processor flow
(reference pipeline/lib/summary/summary_config_processor.py:110-370):

    project columns → anchor join (deid) → date→interval →
    template join (row universe) → backfill → widen-merge

as ONE lazy DataFrame plan per config.  Scale shape: anchor and template
are key-level dimensions (small vs the fact sources) → ``broadcast``
hints; the widen-merge fold reuses a single exchange on the id key
(operators/summary.py::merge_intermediates); nothing collects.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdm_cbioportal_etl_spark.functions import interval_days, zero_pad_id
from cdm_cbioportal_etl_spark.functions.scalar import normalize_colname
from cdm_cbioportal_etl_spark.operators.header import ColumnMeta
from cdm_cbioportal_etl_spark.operators.summary import backfill, merge_intermediates
from cdm_cbioportal_etl_spark.operators.timeline import deidentify_timeline
from cdm_cbioportal_etl_spark.pipeline.config import SummaryConfig, TimelineConfig

ANCHOR_DATE_COL = "DATE_TUMOR_SEQUENCING"

# table-name → DataFrame; how the driver resolves `source_table` (the
# reference resolves via SQL against a warehouse, summary_config_
# processor.py:157-167 — here the caller decides the storage binding)
SourceResolver = Callable[[str], DataFrame]


def _template_id_column(template: DataFrame, patient_or_sample: str) -> str:
    """Reference _merge_with_template's id-column detection
    (summary_config_processor.py:276-300): PATIENT_ID/SAMPLE_ID preferred,
    DMP_ID accepted."""
    cols = template.columns
    preferred = "PATIENT_ID" if patient_or_sample == "patient" else "SAMPLE_ID"
    if preferred in cols:
        return preferred
    if "DMP_ID" in cols:
        return "DMP_ID"
    raise ValueError(
        f"template lacks {preferred} or DMP_ID column; has {cols}"
    )


def build_intermediate_summary(
    cfg: SummaryConfig,
    source: DataFrame,
    anchor: DataFrame,
    template: DataFrame,
) -> DataFrame:
    """One config's intermediate summary as a lazy plan (reference
    summary_config_processor.py::process_summary steps 1-5).

    ``anchor``: (MRN, DMP_ID, DATE_TUMOR_SEQUENCING) deid dimension.
    ``template``: the row universe (one row per patient/sample id).
    """
    # 1) project to the configured column subset
    df = source.select(*[F.col(c) for c in cfg.columns])

    # 2) anchor join (deidentification): MRN-keyed sources zero-pad and
    #    inner-join the anchor dim (broadcast — key-level table), then
    #    drop the PHI key; id-keyed sources skip the join (reference
    #    :178-207)
    if cfg.key_column == "MRN":
        df = df.withColumn("MRN", zero_pad_id("MRN"))
        a = anchor.select(
            zero_pad_id("MRN").alias("MRN"), "DMP_ID", ANCHOR_DATE_COL
        )
        df = F.broadcast(a).join(df, "MRN", "inner").drop("MRN")
    elif "MRN" in df.columns:
        df = df.drop("MRN")

    # 3) date → interval-days from the anchor date (reference :209-254);
    #    anchor date column always dropped afterwards.  Dates are
    #    converted IN PLACE (no suffix), exactly like the reference —
    #    operators/summary.py::process_summary is the LEGACY flow with
    #    the '_INTERVAL'-suffixed variant; the two are kept separate on
    #    purpose (different output contracts), not by accident.
    if cfg.date_columns:
        if ANCHOR_DATE_COL not in df.columns:
            # HARD error, not a silent skip: emitting a configured date
            # column un-converted would ship raw PHI dates — the one
            # failure a deidentification pipeline must never allow
            raise ValueError(
                f"{cfg.summary_id}: date_columns configured but no "
                f"{ANCHOR_DATE_COL} available (key_column="
                f"{cfg.key_column!r} skips the anchor join; include the "
                "anchor date in the source or key by MRN)"
            )
        for c in cfg.date_columns:
            df = df.withColumn(
                c, interval_days(F.col(c).cast("date"), F.col(ANCHOR_DATE_COL).cast("date"))
            )
    if ANCHOR_DATE_COL in df.columns:
        df = df.drop(ANCHOR_DATE_COL)

    # 4) template join: rename the data's id to the template's id column,
    #    normalize names, LEFT join from the template so every universe
    #    row survives (reference :256-335)
    id_col = _template_id_column(template, cfg.patient_or_sample)
    if "DMP_ID" in df.columns and id_col != "DMP_ID":
        df = df.withColumnRenamed("DMP_ID", id_col)
    df = df.select(*[F.col(c).alias(normalize_colname(c)) for c in df.columns])
    universe = template.select(id_col).distinct()
    out = universe.join(df, id_col, "left")

    # standard cBioPortal id name (reference :327-333)
    standard = "PATIENT_ID" if cfg.patient_or_sample == "patient" else "SAMPLE_ID"
    if id_col != standard:
        out = out.withColumnRenamed(id_col, standard)

    # 5) backfill from column_metadata fill_values (reference :337-366)
    return backfill(out, cfg.fill_values())


def run_summary_pipeline(
    spark: SparkSession,
    configs: list[SummaryConfig],
    resolve: SourceResolver,
    anchor: DataFrame,
    template: DataFrame,
    patient_or_sample: str = "patient",
) -> tuple[DataFrame, dict[str, ColumnMeta]]:
    """The create_intermediate_summaries + merge flow (reference
    create_intermediate_summaries.py:160-230 then
    merge_intermediate_summaries.py:85-179): build every matching
    config's intermediate, widen-merge them on the standard id, and
    return (wide frame, merged header metas) — ready for
    operators/header.py::combine_header_and_data or the sidecar writer.
    """
    level_cfgs = [c for c in configs if c.patient_or_sample == patient_or_sample]
    if not level_cfgs:
        raise ValueError(f"no configs at level {patient_or_sample!r}")
    standard = "PATIENT_ID" if patient_or_sample == "patient" else "SAMPLE_ID"
    intermediates = [
        build_intermediate_summary(cfg, resolve(cfg.source_table), anchor, template)
        for cfg in level_cfgs
    ]
    tid = _template_id_column(template, patient_or_sample)
    universe = template.select(F.col(tid).alias(standard))
    wide = merge_intermediates(universe, intermediates, standard)
    metas: dict[str, ColumnMeta] = {}
    for cfg in level_cfgs:
        metas.update(cfg.column_metas())  # later configs win, like the
        # reference's manifest-ordered header concat
    return wide, metas


# --------------------------------------------------------------------- #
# Timeline YAML surface: config → deid plan (the reference's second
# declarative product line; batch driver analog of
# cbioportal_timeline_batch_deidentify.py::run_timeline_deidentification,
# which fans one deid job out per config/timelines/*.yaml)
# --------------------------------------------------------------------- #
def build_timeline_deid(
    cfg: TimelineConfig,
    source: DataFrame,
    samples: DataFrame,
    anchor: DataFrame,
    os_dates: DataFrame,
    today: "_dt.date | str",
    truncate_at_os: bool = True,
) -> DataFrame:
    """One timeline config's deid plan: project the configured columns
    from the (PHI, MRN-keyed) source, then run the 4-way deid join /
    future-nulling / OS-truncation / day-interval flow
    (operators/timeline.py::deidentify_timeline — reference
    cbioportal_timeline_deidentify.py:252-558) with the config's
    patient-vs-sample level and date columns.

    ``PATIENT_ID`` in cfg.columns is produced by the deid spine (it does
    not exist in the PHI source, which is MRN-keyed); every other
    configured column must exist in the source.
    """
    want = [c for c in cfg.columns if c != "PATIENT_ID"]
    missing = [c for c in want if c not in source.columns]
    if missing:
        raise ValueError(
            f"{cfg.timeline_id}: source {cfg.source_table!r} lacks "
            f"configured columns {missing} (has {source.columns})"
        )
    sample_level = cfg.patient_or_sample == "sample"
    key_cols = ["MRN"] + (["SAMPLE_ID"] if sample_level else [])
    proj = source.select(
        *dict.fromkeys(key_cols + want)  # ordered, de-duplicated
    )
    out = deidentify_timeline(
        proj,
        samples,
        anchor,
        os_dates,
        today=today,
        date_cols=tuple(cfg.date_columns),
        truncate_at_os=truncate_at_os,
        sample_level=sample_level,
    )
    # the config's declared column order IS the output contract
    # (cBioPortal column order matters); deid may drop nothing else
    return out.select(*[c for c in cfg.columns if c in out.columns])


def run_timeline_pipeline(
    spark: SparkSession,
    configs: list[TimelineConfig],
    resolve: SourceResolver,
    samples: DataFrame,
    anchor: DataFrame,
    os_dates: DataFrame,
    today: "_dt.date | str",
) -> dict[str, DataFrame]:
    """Batch fan-out: one lazy deid plan per config, keyed by
    timeline_id (reference batch wrapper runs these as separate
    processes; here they are independent lazy plans sharing the
    broadcast anchor/OS dims, so Spark schedules them concurrently when
    the caller materializes them)."""
    return {
        cfg.timeline_id: build_timeline_deid(
            cfg, resolve(cfg.source_table), samples, anchor, os_dates, today
        )
        for cfg in configs
    }
