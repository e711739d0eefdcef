"""Golden tests for the reference transform parity operators — each
compared against a small pandas oracle implementing the reference
semantics verbatim (SURVEY.md §5 strategy)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.functions import (
    clamp_age,
    coalesce_min,
    days_to_readable,
    tolerant_to_date,
    zero_pad_id,
)
from cdm_cbioportal_etl_spark.operators import (
    build_header_rows,
    combine_header_and_data,
    derive_anchor_dates,
    first_and_max,
    melt_date_columns,
    merge_intermediates,
    presence_pivot,
    process_summary,
    deidentify_timeline,
)
from cdm_cbioportal_etl_spark.operators.header import ColumnMeta


def test_zero_pad_and_tolerant_date(spark):
    df = spark.createDataFrame(
        [("123", "2020-01-02"), ("45", "01/15/2021"), ("6", "garbage"),
         ("7", "2020-03-04T05:06:07"), ("8", "2021-07-08 09:10:11+00:00")],
        "mrn string, d string",
    )
    out = df.select(
        zero_pad_id("mrn").alias("m"), tolerant_to_date("d").alias("d")
    ).collect()
    assert [r.m for r in out] == ["00000123", "00000045", "00000006", "00000007", "00000008"]
    assert [str(r.d) for r in out] == [
        "2020-01-02", "2021-01-15", "None", "2020-03-04", "2021-07-08"
    ]


def test_clamp_age_hipaa(spark):
    df = spark.createDataFrame([(5.0,), (17.9,), (18.0,), (89.0,), (90.5,), (None,)], "a double")
    got = [r.c for r in df.select(clamp_age("a").alias("c")).collect()]
    assert got == ["<18", "<18", "18", "89", ">89", None]


def test_days_to_readable_matches_reference_semantics(spark):
    # reference days_to_readable_compact (cbioportal_timeline_deidentify.py
    # :189-223): y=365-day years, m=30-day months, residual days
    def oracle(days):
        if days is None:
            return None
        sign = "-" if days < 0 else ""
        d = abs(days)
        y, m, dd = d // 365, (d % 365) // 30, d % 365 % 30
        parts = []
        if y: parts.append(f"{y}y")
        if m: parts.append(f"{m}m")
        if dd or (not y and not m): parts.append(f"{dd}d")
        return sign + " ".join(parts)

    vals = [0, 5, 30, 365, 400, 830, -45, None]
    df = spark.createDataFrame([(v,) for v in vals], "d int")
    got = [r.s for r in df.select(days_to_readable("d").alias("s")).collect()]
    assert got == [oracle(v) for v in vals]


def test_coalesce_min(spark):
    df = spark.createDataFrame(
        [("2020-05-01", "2020-01-01"), (None, "2020-02-02"), ("2020-03-03", None), (None, None)],
        "death string, last string",
    ).select(
        F.col("death").cast("date").alias("death"), F.col("last").cast("date").alias("last")
    )
    got = [str(r.c) for r in df.select(coalesce_min("death", "last").alias("c")).collect()]
    assert got == ["2020-01-01", "2020-02-02", "2020-03-03", "None"]


def test_derive_anchor_dates_integrity_gate(spark):
    rows = [
        # valid patient, two samples → min date wins
        ("1", "P-0000001", "P-0000001-T01-IM3", "2020-06-01"),
        ("1", "P-0000001", "P-0000001-T02-IM3", "2020-01-15"),
        # MRN with two DMP_IDs → excluded
        ("2", "P-0000002", "P-0000002-T01-IM3", "2020-01-01"),
        ("2", "P-0000099", "P-0000099-T01-IM3", "2020-01-01"),
        # DMP_ID shared by two MRNs → both excluded
        ("3", "P-0000003", "P-0000003-T01-IM3", "2020-01-01"),
        ("4", "P-0000003", "P-0000003-T02-IM3", "2020-01-01"),
        # derived prefix mismatch → excluded
        ("5", "P-0000005", "P-9999999-T01-IM3", "2020-01-01"),
        # no 'T' in sample id → row filtered pre-gate
        ("6", "P-0000006", "P-0000006-X01", "2020-01-01"),
        # unparseable date → filtered
        ("7", "P-0000007", "P-0000007-T01-IM3", "not-a-date"),
    ]
    df = spark.createDataFrame(rows, "MRN string, DMP_ID string, SAMPLE_ID string, DATE_TUMOR_SEQUENCING string")
    out = {r.DMP_ID: str(r.DATE_TUMOR_SEQUENCING) for r in derive_anchor_dates(df).collect()}
    assert out == {"P-0000001": "2020-01-15"}


def test_process_summary_and_backfill(spark):
    source = spark.createDataFrame(
        [("1", "WHITE", "2020-02-10"), ("2", None, None), ("9", "ASIAN", "2020-03-03")],
        "MRN string, RACE string, DX_DATE string",
    ).withColumn("DX_DATE", F.col("DX_DATE").cast("date"))
    anchor = spark.createDataFrame(
        [("1", "P-0000001", dt.date(2020, 1, 1)), ("2", "P-0000002", dt.date(2020, 1, 11))],
        "MRN string, PATIENT_ID string, DATE_TUMOR_SEQUENCING date",
    )
    template = spark.createDataFrame(
        [("P-0000001",), ("P-0000002",), ("P-0000003",)], "PATIENT_ID string"
    )
    out = process_summary(
        source, anchor, template, "PATIENT_ID", ["RACE"], ["DX_DATE"],
        fill_values={"RACE": "Unknown"},
    )
    got = {r.PATIENT_ID: (r.RACE, r.DX_DATE_INTERVAL) for r in out.collect()}
    # MRN 9 not in anchor → inner join drops; P-0000003 in template → null row
    assert got == {
        "P-0000001": ("WHITE", 40),
        "P-0000002": ("Unknown", None),
        "P-0000003": ("Unknown", None),
    }
    assert "MRN" not in out.columns  # PHI dropped


def test_merge_intermediates_replace_semantics(spark):
    template = spark.createDataFrame([("a",), ("b",)], "id string")
    i1 = spark.createDataFrame([("a", "x1", "old")], "id string, c1 string, shared string")
    i2 = spark.createDataFrame([("a", "new"), ("b", "n2")], "id string, shared string")
    out = merge_intermediates(template, [i1, i2], "id")
    got = {r.id: (r.c1, r.shared) for r in out.collect()}
    # later intermediate replaces the duplicate 'shared' column (reference
    # summary_merger.py:229-234)
    assert got == {"a": ("x1", "new"), "b": (None, "n2")}


def test_presence_pivot_fixed_domain(spark):
    df = spark.createDataFrame(
        [("1", "Liver"), ("1", "Liver"), ("1", "Lung"), ("2", "No Tumor Sites"), ("3", None)],
        "MRN string, TUMOR_SITE string",
    )
    out = presence_pivot(df, "MRN", "TUMOR_SITE", ["Liver", "Lung", "Bone"])
    got = {r.MRN: (r.Liver, r.Lung, r.Bone) for r in out.collect()}
    assert got == {"1": ("Yes", "Yes", "No")}
    assert out.columns == ["MRN", "Liver", "Lung", "Bone"]  # deterministic schema


def test_first_and_max_single_aggregate(spark):
    df = spark.createDataFrame(
        [("1", 7, "2020-02-01"), ("1", 9, "2020-01-01"), ("1", 8, "2020-03-01")],
        "MRN string, GLEASON int, START_DATE string",
    )
    r = first_and_max(df, "MRN", "GLEASON", "START_DATE").collect()[0]
    assert (r.GLEASON_FIRST, r.GLEASON_MAX) == (9, 9)


def test_melt_date_columns(spark):
    df = spark.createDataFrame(
        [("1", "2020-01-01", "2020-02-02", None)],
        "MRN string, MRN_CREATE_DTE string, PT_DEATH_DTE string, PLA_LAST_CONTACT_DTE string",
    )
    out = melt_date_columns(
        df, "MRN", ["MRN_CREATE_DTE", "PT_DEATH_DTE", "PLA_LAST_CONTACT_DTE"],
        {"MRN_CREATE_DTE": "Created", "PT_DEATH_DTE": "Death", "PLA_LAST_CONTACT_DTE": "Contact"},
    )
    got = {(r.SOURCE): r.START_DATE for r in out.collect()}
    assert got == {"Created": "2020-01-01", "Death": "2020-02-02", "Contact": None}
    assert set(out.columns) == {"MRN", "START_DATE", "EVENT_TYPE", "SOURCE"}


def test_deidentify_timeline_end_to_end(spark):
    today = dt.date(2021, 1, 1)
    samples = spark.createDataFrame([("P-0000001",), ("P-0000002",)], "PATIENT_ID string")
    anchor = spark.createDataFrame(
        [("1", "P-0000001", dt.date(2020, 1, 1)), ("2", "P-0000002", dt.date(2020, 2, 1))],
        "MRN string, DMP_ID string, DATE_TUMOR_SEQUENCING date",
    )
    os_dates = spark.createDataFrame(
        [("1", dt.date(2020, 6, 1)), ("2", None)], "MRN string, OS_DATE date"
    )
    timeline = spark.createDataFrame(
        [
            ("1", "2020-01-31", "2020-02-10", "TREATMENT", "chemo"),   # normal
            ("1", "2020-08-01", None, "TREATMENT", "late"),            # past OS → truncated
            ("1", "2022-05-01", None, "TREATMENT", "future"),          # future → nulled+dropped
            ("2", "2020-03-01", "bad-date", "LAB_TEST", "lab"),        # bad stop → null
        ],
        "MRN string, START_DATE string, STOP_DATE string, EVENT_TYPE string, SUBTYPE string",
    )
    out = deidentify_timeline(timeline, samples, anchor, os_dates, today).collect()
    rows = {(r.PATIENT_ID, r.SUBTYPE): (r.START_DATE, r.STOP_DATE) for r in out}
    assert rows[("P-0000001", "chemo")] == (30, 40)
    assert rows[("P-0000001", "late")] == (152, None)   # truncated to OS 2020-06-01
    assert rows[("P-0000002", "lab")] == (29, None)
    assert ("P-0000001", "future") not in rows          # nulled then dropna
    # pandas oracle for the chemo row (reference verbatim)
    pdf = pd.DataFrame({"d": [pd.Timestamp("2020-01-31")], "a": [pd.Timestamp("2020-01-01")]})
    assert int((pdf.d - pdf.a).dt.days[0]) == 30


def test_header_build_and_combine(spark):
    metas = {
        "RACE": ColumnMeta("RACE", "Race", "Patient race", "STRING", "1"),
        "AGE": ColumnMeta("AGE", "Age", "Age at seq", "NUMBER", "2"),
    }
    data = spark.createDataFrame(
        [("P1", "WHITE", 34), ("P2", None, 99)], "PATIENT_ID string, RACE string, AGE int"
    )
    rows = build_header_rows(data.columns, metas)
    assert rows[0] == ["#Patient Identifier", "Race", "Age"]
    assert rows[2] == ["#STRING", "STRING", "NUMBER"]
    assert rows[4] == ["PATIENT_ID", "RACE", "AGE"]
    out = combine_header_and_data(data, metas).collect()
    assert len(out) == 7  # 5 header + 2 data
    assert out[0][0] == "#Patient Identifier"
    assert out[4][0] == "PATIENT_ID"
    assert out[5][1] == "WHITE" and out[6][1] == ""  # null → '' canonicalization


def test_cbioportal_tsv_roundtrip(spark, tmp_path):
    """S5/S7 edge I/O: combined header+data -> headerless TSV -> header-
    offset read reproduces both header rows and data."""
    from pyspark.sql import functions as F
    from cdm_cbioportal_etl_spark.operators.header import (
        ColumnMeta,
        combine_header_and_data,
    )
    from cdm_cbioportal_etl_spark.operators.io import (
        read_cbioportal_tsv,
        write_cbioportal_tsv,
    )

    data = spark.createDataFrame(
        [("P1", "45"), ("P2", "<18")], "PATIENT_ID string, AGE string"
    )
    metas = {"AGE": ColumnMeta("AGE", "Age", "Age at dx", "NUMBER")}
    combined = combine_header_and_data(data, metas)
    out = str(tmp_path / "summary_tsv")
    write_cbioportal_tsv(combined, out)

    header_rows, got = read_cbioportal_tsv(spark, out)
    assert header_rows[0] == ["#Patient Identifier", "Age"]
    assert header_rows[4] == ["PATIENT_ID", "AGE"]
    assert {tuple(r) for r in got.collect()} == {("P1", "45"), ("P2", "<18")}


def test_asof_join_semantics(spark):
    """As-of: latest right row at-or-before; <= tie counts; no-match -> null."""
    from cdm_cbioportal_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 100, "L1"), ("u1", 200, "L2"), ("u2", 50, "L3")],
        "k string, ts long, lid string",
    )
    right = spark.createDataFrame(
        [("u1", 90, "R1"), ("u1", 100, "R2"), ("u1", 150, "R3"), ("u2", 60, "R4")],
        "k string, ts long, rid string",
    )
    out = {
        r.lid: r.asof_rid
        for r in asof_join(left, right, on=["k"], ts_col="ts", right_cols=["rid"]).collect()
    }
    assert out == {
        "L1": "R2",   # equal ts counts (<=), and beats the earlier R1
        "L2": "R3",   # latest at-or-before 200
        "L3": None,   # u2 has no right row at-or-before 50
    }
