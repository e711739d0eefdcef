"""Declarative YAML job specs driving generated DataFrame plans.

The reference's entire user surface is a directory of YAML configs, each
describing ONE summary file (source table, column subset, date columns,
per-column metadata, fill values), consumed by a processor class
(reference pipeline/lib/summary/summary_config_processor.py:74-108 loads
the YAML; pipeline/summary/create_intermediate_summaries.py:160-230 globs
a config dir and drives one processor per file; an example spec is
reference config/summaries/demographics.yaml:1-49).

This module is the spec side: a validated ``SummaryConfig`` dataclass
parsed from the same YAML shape.  The plan side (config → lazy DataFrame
pipeline) lives in pipeline/driver.py.  Nothing here touches data — a
config is pure metadata, loaded driver-side (KB-scale).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import yaml

from cdm_cbioportal_etl_spark.operators.header import ColumnMeta

_REQUIRED = ("summary_id", "patient_or_sample", "source_table", "key_column", "columns")
_VALID_LEVELS = ("patient", "sample")
_VALID_KEYS = ("MRN", "PATIENT_ID", "SAMPLE_ID", "DMP_ID")


@dataclass
class SummaryConfig:
    """One summary job spec (mirrors reference
    config/summaries/*.yaml; field names kept recognizable)."""

    summary_id: str
    patient_or_sample: str  # 'patient' | 'sample'
    source_table: str  # logical table name, resolved by the driver
    key_column: str  # MRN (deid via anchor join) or direct id key
    columns: list[str]
    date_columns: list[str] = field(default_factory=list)
    column_metadata: dict[str, dict] = field(default_factory=dict)
    filename: str = ""

    def __post_init__(self) -> None:
        if self.patient_or_sample not in _VALID_LEVELS:
            raise ValueError(
                f"{self.summary_id}: patient_or_sample must be one of "
                f"{_VALID_LEVELS}, got {self.patient_or_sample!r}"
            )
        if self.key_column not in _VALID_KEYS:
            # reference summary_config_processor.py:205-207 raises the same
            raise ValueError(
                f"{self.summary_id}: invalid key column {self.key_column!r}"
            )
        missing = [c for c in self.date_columns if c not in self.columns]
        if missing:
            raise ValueError(
                f"{self.summary_id}: date_columns not in columns: {missing}"
            )

    def fill_values(self) -> dict[str, str]:
        """column → fill_value map (reference
        summary_config_processor.py:337-366 case-insensitive lookup)."""
        out = {}
        for name, meta in self.column_metadata.items():
            if meta and "fill_value" in meta:
                out[name.upper()] = str(meta["fill_value"])
        return out

    def column_metas(self) -> dict[str, ColumnMeta]:
        """column → cBioPortal header metadata (label/comment/datatype/
        priority), feeding operators/header.py::build_header_rows."""
        out = {}
        for name, meta in self.column_metadata.items():
            meta = meta or {}
            out[name.upper()] = ColumnMeta(
                name=name.upper(),
                label=str(meta.get("label", name)),
                description=str(meta.get("comment", meta.get("label", name))),
                datatype=str(meta.get("datatype", "STRING")),
                priority=str(meta.get("priority", "1")),
                fill_value=(
                    str(meta["fill_value"]) if "fill_value" in meta else None
                ),
            )
        return out


def load_summary_config(path: str) -> SummaryConfig:
    """Parse + validate one YAML spec file."""
    with open(path) as fh:
        raw = yaml.safe_load(fh)
    if not isinstance(raw, dict):
        raise ValueError(f"{path}: config must be a mapping")
    missing = [k for k in _REQUIRED if k not in raw]
    if missing:
        raise ValueError(f"{path}: missing required fields {missing}")
    dest = raw.get("dest", {}) or {}
    return SummaryConfig(
        summary_id=str(raw["summary_id"]),
        patient_or_sample=str(raw["patient_or_sample"]),
        source_table=str(raw["source_table"]),
        key_column=str(raw["key_column"]),
        columns=[str(c) for c in raw["columns"]],
        date_columns=[str(c) for c in raw.get("date_columns", []) or []],
        column_metadata=raw.get("column_metadata", {}) or {},
        filename=str(dest.get("filename", f"{raw['summary_id']}.tsv")),
    )


def load_summary_configs(
    config_dir: str, patient_or_sample: str | None = None
) -> list[SummaryConfig]:
    """Glob a config directory, optionally filtered by level (reference
    create_intermediate_summaries.py:163-201: glob + level skip)."""
    cfgs = [
        load_summary_config(p)
        for p in sorted(glob.glob(os.path.join(config_dir, "*.yaml")))
    ]
    if patient_or_sample is not None:
        cfgs = [c for c in cfgs if c.patient_or_sample == patient_or_sample]
    return cfgs


# --------------------------------------------------------------------- #
# Timeline configs — the reference's SECOND declarative product line
# (reference config/timelines/*.yaml, 26 files, e.g.
# config/timelines/treatment.yaml:1-65; loaded by
# pipeline/timeline/cbioportal_timeline_batch_deidentify.py:15-74)
# --------------------------------------------------------------------- #
_TL_REQUIRED = ("timeline_id", "output_filename", "patient_or_sample", "columns")
# cBioPortal timeline format invariants: every timeline file carries these
_TL_MANDATORY_COLS = ("PATIENT_ID", "START_DATE", "EVENT_TYPE")
_TL_DATE_COLS = ("START_DATE", "STOP_DATE")


@dataclass
class TimelineConfig:
    """One timeline deid job spec (mirrors reference
    config/timelines/*.yaml; the loader mirrors
    cbioportal_timeline_batch_deidentify.py::load_timeline_configs —
    prod/test source selection, column-name extraction from the
    per-column metadata mapping)."""

    timeline_id: str
    source_table: str  # resolved from source_table_prod / source_table_dev
    output_filename: str
    patient_or_sample: str  # 'patient' | 'sample'
    columns: list[str]  # ordered output columns (YAML mapping order)
    column_metadata: dict[str, dict] = field(default_factory=dict)
    table_metadata: dict = field(default_factory=dict)
    date_columns: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.patient_or_sample not in _VALID_LEVELS:
            raise ValueError(
                f"{self.timeline_id}: patient_or_sample must be one of "
                f"{_VALID_LEVELS}, got {self.patient_or_sample!r}"
            )
        missing = [c for c in _TL_MANDATORY_COLS if c not in self.columns]
        if missing:
            raise ValueError(
                f"{self.timeline_id}: timeline configs must declare the "
                f"cBioPortal mandatory columns; missing {missing}"
            )
        if self.patient_or_sample == "sample" and "SAMPLE_ID" not in self.columns:
            raise ValueError(
                f"{self.timeline_id}: sample-level timeline needs SAMPLE_ID"
            )
        if not self.date_columns:
            # default: the cBioPortal event-date columns present in the spec
            self.date_columns = [c for c in _TL_DATE_COLS if c in self.columns]
        bad = [c for c in self.date_columns if c not in self.columns]
        if bad:
            raise ValueError(
                f"{self.timeline_id}: date_columns not in columns: {bad}"
            )


def load_timeline_config(
    path: str, production_or_test: str = "test"
) -> TimelineConfig:
    """Parse + validate one timeline YAML spec (reference loader selects
    source_table_prod vs source_table_dev by the production_or_test flag,
    cbioportal_timeline_batch_deidentify.py:49-53)."""
    with open(path) as fh:
        raw = yaml.safe_load(fh)
    if not isinstance(raw, dict):
        raise ValueError(f"{path}: config must be a mapping")
    missing = [k for k in _TL_REQUIRED if k not in raw]
    if missing:
        raise ValueError(f"{path}: missing required fields {missing}")
    key = "source_table_prod" if production_or_test == "production" else "source_table_dev"
    source_table = raw.get(key, raw.get("source_table"))
    if not source_table:
        raise ValueError(f"{path}: no {key} (or source_table) declared")
    cols_raw = raw["columns"]
    if not isinstance(cols_raw, dict):
        raise ValueError(f"{path}: columns must be a mapping of name -> metadata")
    return TimelineConfig(
        timeline_id=str(raw["timeline_id"]),
        source_table=str(source_table),
        output_filename=str(raw["output_filename"]),
        patient_or_sample=str(raw["patient_or_sample"]),
        columns=[str(c) for c in cols_raw],  # mapping order = output order
        column_metadata={str(k): (v or {}) for k, v in cols_raw.items()},
        table_metadata=raw.get("table_metadata", {}) or {},
        date_columns=[str(c) for c in raw.get("date_columns", []) or []],
    )


def load_timeline_configs(
    config_dir: str,
    production_or_test: str = "test",
    patient_or_sample: str | None = None,
) -> list[TimelineConfig]:
    """Glob a timeline config directory (reference
    cbioportal_timeline_batch_deidentify.py:36-74)."""
    cfgs = [
        load_timeline_config(p, production_or_test)
        for p in sorted(glob.glob(os.path.join(config_dir, "*.yaml")))
    ]
    if not cfgs:
        raise ValueError(f"no timeline YAML configs under {config_dir}")
    if patient_or_sample is not None:
        cfgs = [c for c in cfgs if c.patient_or_sample == patient_or_sample]
    return cfgs
