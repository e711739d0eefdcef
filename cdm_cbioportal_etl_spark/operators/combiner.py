"""Legacy summary-file combiner parity.

Re-expresses reference pipeline/lib/summary/legacy/
cbioportal_summary_file_combiner.py:48-112 (manifest of header+data file
pairs folded into one portal summary via cBioPortalSummaryMergeTool) and
cbioportal_summary_merger.py:196-250 (horizontal merge on the id key,
later files replacing duplicate columns, header rows concatenated in
the same order).

The modern path builds summaries straight from configs
(pipeline/driver.py); this operator exists for the reference's legacy
entry point: combining ALREADY-EXPORTED cBioPortal TSVs (5 header rows +
data) back into one wide file.  Inputs are human-scale edge files by
construction (they were written by the single-file TSV sink), so the
per-file header reads are bounded; the data merge itself is a lazy
DataFrame fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdm_cbioportal_etl_spark.operators.header import ColumnMeta
from cdm_cbioportal_etl_spark.operators.io import read_cbioportal_tsv


def metas_from_header_rows(header_rows: list[list[str]]) -> dict[str, ColumnMeta]:
    """Invert build_header_rows: recover per-column metadata from the 5
    exported header rows ('#' prefixes stripped, row 5 = names)."""
    labels, descs, dtypes, prios, names = header_rows
    strip = lambda row: [  # noqa: E731
        (c[1:] if i == 0 and c and c.startswith("#") else c)
        for i, c in enumerate(row)
    ]
    labels, descs, dtypes, prios = map(strip, (labels, descs, dtypes, prios))
    return {
        n: ColumnMeta(n, labels[i], descs[i], dtypes[i] or "STRING", prios[i] or "1")
        for i, n in enumerate(names)
    }


def combine_summary_files(
    spark: SparkSession,
    paths: list[str],
    key_col: str = "PATIENT_ID",
) -> tuple[dict[str, ColumnMeta], DataFrame]:
    """Fold exported summary TSVs into one wide summary (reference
    _combine_reports loop): outer-universe on the key, later files
    REPLACE duplicate non-key columns (merger.py:229-234 drop-then-join),
    header metadata follows the surviving column's file."""
    if not paths:
        raise ValueError("no summary files to combine")
    metas: dict[str, ColumnMeta] = {}
    merged: DataFrame | None = None
    for p in paths:
        header_rows, data = read_cbioportal_tsv(spark, p)
        if key_col not in data.columns:
            raise ValueError(f"{p}: missing key column {key_col}")
        metas.update(metas_from_header_rows(header_rows))
        if merged is None:
            merged = data
            continue
        dup = [c for c in data.columns if c != key_col and c in merged.columns]
        if dup:
            merged = merged.drop(*dup)
        # full outer on the key: legacy combiner keeps the union of
        # patients across reports
        merged = merged.join(data, key_col, "full_outer")
    assert merged is not None
    # key column first, then insertion order (reference output shape)
    cols = [key_col] + [c for c in merged.columns if c != key_col]
    return metas, merged.select(*cols)
