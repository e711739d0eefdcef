"""YAML pipeline driver + age/audit operators (round-2 feature set).

Tiny-frame semantics tests; the end-to-end shapes are oracle-checked by
the catalog queries (yaml_summary_pipeline, timeline_audit_events,
age_at_sequencing_samples, patient_age_redact).
"""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.pipeline import (
    build_intermediate_summary,
    load_summary_config,
    run_summary_pipeline,
)


def _write_cfg(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_config_validation(tmp_path):
    ok = _write_cfg(
        tmp_path,
        "a.yaml",
        """
        summary_id: a
        patient_or_sample: patient
        source_table: src
        key_column: MRN
        columns: [MRN, X]
        column_metadata:
          X: {label: Ex, datatype: STRING, fill_value: Unknown}
        """,
    )
    cfg = load_summary_config(ok)
    assert cfg.fill_values() == {"X": "Unknown"}
    assert cfg.column_metas()["X"].label == "Ex"

    bad_level = _write_cfg(
        tmp_path, "b.yaml",
        "summary_id: b\npatient_or_sample: cohort\nsource_table: s\n"
        "key_column: MRN\ncolumns: [MRN]\n",
    )
    with pytest.raises(ValueError, match="patient_or_sample"):
        load_summary_config(bad_level)

    bad_key = _write_cfg(
        tmp_path, "c.yaml",
        "summary_id: c\npatient_or_sample: patient\nsource_table: s\n"
        "key_column: SSN\ncolumns: [SSN]\n",
    )
    with pytest.raises(ValueError, match="invalid key column"):
        load_summary_config(bad_key)

    bad_date = _write_cfg(
        tmp_path, "d.yaml",
        "summary_id: d\npatient_or_sample: patient\nsource_table: s\n"
        "key_column: MRN\ncolumns: [MRN]\ndate_columns: [DOB]\n",
    )
    with pytest.raises(ValueError, match="date_columns"):
        load_summary_config(bad_date)


def test_build_intermediate_semantics(spark, tmp_path):
    """anchor inner join drops un-anchored rows; dates become interval
    days; template left join restores the universe; fill applies."""
    cfg = load_summary_config(
        _write_cfg(
            tmp_path,
            "e.yaml",
            """
            summary_id: e
            patient_or_sample: patient
            source_table: src
            key_column: MRN
            columns: [MRN, COLOR, SEEN_DATE]
            date_columns: [SEEN_DATE]
            column_metadata:
              COLOR: {label: Color, fill_value: Unknown}
            """,
        )
    )
    source = spark.createDataFrame(
        [("1", "red", "2020-01-11"), ("2", "blue", "2020-02-01"), ("9", "green", "2020-01-01")],
        "MRN string, COLOR string, SEEN_DATE string",
    )
    anchor = spark.createDataFrame(
        [("1", "P-1", "2020-01-01"), ("2", "P-2", "2020-01-01")],
        "MRN string, DMP_ID string, DATE_TUMOR_SEQUENCING string",
    )
    template = spark.createDataFrame(
        [("P-1",), ("P-2",), ("P-3",)], "PATIENT_ID string"
    )
    out = {
        r.PATIENT_ID: (r.COLOR, r.SEEN_DATE)
        for r in build_intermediate_summary(cfg, source, anchor, template).collect()
    }
    assert out == {
        "P-1": ("red", 10),
        "P-2": ("blue", 31),
        "P-3": ("Unknown", None),  # MRN 9 not anchored -> dropped; fill
    }


def test_run_pipeline_widen_and_metas(spark, tmp_path):
    cfg_a = _write_cfg(
        tmp_path, "a.yaml",
        "summary_id: a\npatient_or_sample: patient\nsource_table: ta\n"
        "key_column: MRN\ncolumns: [MRN, X]\n"
        "column_metadata:\n  X: {label: Ex}\n",
    )
    cfg_b = _write_cfg(
        tmp_path, "b.yaml",
        "summary_id: b\npatient_or_sample: patient\nsource_table: tb\n"
        "key_column: MRN\ncolumns: [MRN, Y]\n"
        "column_metadata:\n  Y: {label: Why, datatype: NUMBER}\n",
    )
    from cdm_cbioportal_etl_spark.pipeline import load_summary_configs

    cfgs = load_summary_configs(str(tmp_path), "patient")
    assert [c.summary_id for c in cfgs] == ["a", "b"]
    frames = {
        "ta": spark.createDataFrame([("1", "x1")], "MRN string, X string"),
        "tb": spark.createDataFrame([("1", 7)], "MRN string, Y long"),
    }
    anchor = spark.createDataFrame(
        [("1", "P-1", "2020-01-01")],
        "MRN string, DMP_ID string, DATE_TUMOR_SEQUENCING string",
    )
    template = spark.createDataFrame([("P-1",)], "PATIENT_ID string")
    wide, metas = run_summary_pipeline(
        spark, cfgs, lambda n: frames[n], anchor, template
    )
    row = wide.collect()[0]
    assert (row.PATIENT_ID, row.X, row.Y) == ("P-1", "x1", 7)
    assert metas["X"].label == "Ex" and metas["Y"].datatype == "NUMBER"


def test_patient_age_deid_89_redaction(spark):
    from cdm_cbioportal_etl_spark.operators.age import patient_age_deid

    df = spark.createDataFrame(
        [
            ("P-1", 90, "1930-01-01", "1995-01-01", "1990-01-01"),  # redacted
            ("P-2", 50, "1950-01-01", "2000-01-01", "1950-01-01"),  # dx age 0 -> ''
            ("P-3", 0, "1900-01-01", "2000-06-01", "1995-01-01"),   # age 0 -> ''
        ],
        "PATIENT_ID string, CURRENT_AGE_DEID int, PT_BIRTH_DTE string, "
        "DATE_FIRST_SEQUENCING string, DATE_AT_FIRST_ICDO_DX string",
    )
    out = {
        r.PATIENT_ID: (r.AGE_LAST_FOLLOWUP, r.AGE_FIRST_SEQUENCING, r.AGE_FIRST_CANCER_DIAGNOSIS)
        for r in patient_age_deid(df).collect()
    }
    # >=89: dates nulled -> ages fall back to 0 -> ''
    assert out["P-1"] == ("90", "", "")
    # 1950->2000 is 18262 days = trunc(49.99y) = 49 (trunc, not round)
    assert out["P-2"] == ("50", "49", "")
    # age 0 blanks; both derived ages (100y, 94y) clamp to 89
    assert out["P-3"] == ("", "89", "89")


def test_age_at_sequencing_sentinel_and_masks(spark):
    from cdm_cbioportal_etl_spark.operators.age import age_at_sequencing

    samples = spark.createDataFrame(
        [
            (1, "P-0000001", "P-0000001-T1", "2000-01-01"),  # normal
            (2, "P-0000002", "P-0000002-T1", "2000-01-01"),  # no demo -> -1 -> '<18'
            (3, "P-0000003", "P-0000003-T1", "2000-01-01"),  # >89
            (1, "P-0000001", "P-0000001-N1", "2000-01-01"),  # not -T
            (1, "P-0000001", "P-0000009-T1", "2000-01-01"),  # prefix mismatch
            (4, "P-0000004", "P-0000004-T1", "2000-01-01"),  # not in used set
        ],
        "MRN long, DMP_ID string, SAMPLE_ID string, DATE_TUMOR_SEQUENCING string",
    )
    demo = spark.createDataFrame(
        [(1, "1960-01-01", "2001-01-01"), (3, "1905-01-01", "2001-01-01")],
        "MRN long, PT_BIRTH_DTE string, OS_DTE string",
    )
    used = spark.createDataFrame(
        [("P-0000001",), ("P-0000002",), ("P-0000003",)], "DMP_ID string"
    )
    out = {
        r.SAMPLE_ID: r.AGE_AT_SEQUENCING_YEARS
        for r in age_at_sequencing(samples, demo, used).collect()
    }
    assert out == {
        "P-0000001-T1": "40",
        "P-0000002-T1": "<18",  # fillna(-1) sentinel path, faithful
        "P-0000003-T1": ">89",
    }


def test_timeline_audit_with_samples(spark):
    from cdm_cbioportal_etl_spark.operators.audit import timeline_file_audit

    df = spark.createDataFrame(
        [("p1", "s1", "2020-01-05"), ("p1", "s2", "2020-02-01"), ("p2", None, "2019-12-31")],
        "PATIENT_ID string, SAMPLE_ID string, d string",
    )
    ref = spark.createDataFrame(
        [("p1", "s1"), ("p3", "s3")], "PATIENT_ID string, SAMPLE_ID string"
    )
    r = timeline_file_audit(
        df, ref, sample_col="SAMPLE_ID", date_col="d", today="2020-03-01"
    ).collect()[0]
    assert (r.total_rows, r.unique_patients, r.ref_patients) == (3, 2, 2)
    assert (r.patient_overlap_count, r.patients_not_in_ref, r.patients_not_in_file) == (1, 1, 1)
    assert r.patient_overlap_pct == 50.0
    assert (r.unique_samples, r.sample_overlap_count, r.sample_overlap_pct) == (2, 1, 50.0)
    assert str(r.last_date) == "2020-02-01" and r.days_since_last_date == 29


def test_sample_level_config_no_anchor_join(spark, tmp_path):
    """SAMPLE_ID-keyed configs skip the anchor deid join entirely and any
    stray MRN column is dropped (reference summary_config_processor.py:
    196-203); the template's SAMPLE_ID is the row universe."""
    cfg = load_summary_config(
        _write_cfg(
            tmp_path,
            "s.yaml",
            """
            summary_id: s
            patient_or_sample: sample
            source_table: src
            key_column: SAMPLE_ID
            columns: [SAMPLE_ID, MRN, GRADE]
            column_metadata:
              GRADE: {label: Grade, fill_value: NA}
            """,
        )
    )
    source = spark.createDataFrame(
        [("S-1", "123", "high"), ("S-9", "456", "low")],
        "SAMPLE_ID string, MRN string, GRADE string",
    )
    template = spark.createDataFrame([("S-1",), ("S-2",)], "SAMPLE_ID string")
    anchor = spark.createDataFrame(
        [], "MRN string, DMP_ID string, DATE_TUMOR_SEQUENCING string"
    )
    out = {
        r.SAMPLE_ID: r.GRADE
        for r in build_intermediate_summary(cfg, source, anchor, template).collect()
    }
    # S-9 outside the template universe; S-2 backfilled; MRN gone
    assert out == {"S-1": "high", "S-2": "NA"}
    cols = build_intermediate_summary(cfg, source, anchor, template).columns
    assert "MRN" not in cols


def test_run_pipeline_rejects_empty_level(spark, tmp_path):
    import pytest as _pytest
    from cdm_cbioportal_etl_spark.pipeline import run_summary_pipeline

    with _pytest.raises(ValueError, match="no configs"):
        run_summary_pipeline(
            spark, [], lambda n: None,
            spark.createDataFrame([], "MRN string, DMP_ID string, DATE_TUMOR_SEQUENCING string"),
            spark.createDataFrame([("P-1",)], "PATIENT_ID string"),
        )
