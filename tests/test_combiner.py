"""Legacy summary-file combiner: TSV roundtrip -> horizontal fold ->
header metadata recovery (reference legacy/cbioportal_summary_file_
combiner.py parity)."""

from __future__ import annotations

from cdm_cbioportal_etl_spark.operators.combiner import (
    combine_summary_files,
    metas_from_header_rows,
)
from cdm_cbioportal_etl_spark.operators.header import (
    ColumnMeta,
    build_header_rows,
    combine_header_and_data,
)
from cdm_cbioportal_etl_spark.operators.io import write_cbioportal_tsv


def _export(spark, tmp_path, name, rows, schema, metas):
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / name)
    write_cbioportal_tsv(combine_header_and_data(df, metas), out)
    return out


def test_metas_roundtrip():
    metas = {
        "PATIENT_ID": ColumnMeta("PATIENT_ID", "Patient Identifier", "Patient Identifier"),
        "AGE": ColumnMeta("AGE", "Age", "Age at dx", "NUMBER", "2"),
    }
    rows = build_header_rows(["PATIENT_ID", "AGE"], metas)
    back = metas_from_header_rows(rows)
    assert back["AGE"].label == "Age"
    assert back["AGE"].datatype == "NUMBER" and back["AGE"].priority == "2"
    assert back["PATIENT_ID"].label == "Patient Identifier"  # '#' stripped


def test_combine_summary_files(spark, tmp_path):
    p1 = _export(
        spark, tmp_path, "a",
        [("P1", "45", "x"), ("P2", "50", "y")],
        "PATIENT_ID string, AGE string, OLD string",
        {"AGE": ColumnMeta("AGE", "Age v1", "Age v1", "NUMBER")},
    )
    p2 = _export(
        spark, tmp_path, "b",
        [("P2", "51", "M"), ("P3", "60", "F")],
        "PATIENT_ID string, AGE string, SEX string",
        {
            "AGE": ColumnMeta("AGE", "Age v2", "Age v2", "NUMBER"),
            "SEX": ColumnMeta("SEX", "Sex", "Sex", "STRING"),
        },
    )
    metas, df = combine_summary_files(spark, [p1, p2])
    rows = {r.PATIENT_ID: (r.OLD, r.AGE, r.SEX) for r in df.collect()}
    # later file REPLACES the duplicate AGE column; outer key universe
    assert rows == {
        "P1": ("x", None, None),
        "P2": ("y", "51", "M"),
        "P3": (None, "60", "F"),
    }
    assert metas["AGE"].label == "Age v2"  # later file's header wins
    assert df.columns[0] == "PATIENT_ID"
