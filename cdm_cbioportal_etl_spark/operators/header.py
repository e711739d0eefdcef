"""cBioPortal metadata-header construction and header+data combine.

Re-expresses reference pipeline/summary/create_summary_header.py:42-199
(tall header build + reorder to data column order) and
pipeline/summary/combine_header_and_data.py:37-154 (transpose to 5 wide
rows, '#'-prefix, vertical concat).  The header is metadata-scale (bounded
by column count) so it is built driver-side and unioned onto the
distributed data as literal rows — the one place where driver-side work is
the *correct* scale decision, not a shortcut.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class ColumnMeta:
    """Per-attribute metadata from a YAML config's column_metadata block
    (reference config/summaries/demographics.yaml:23-49)."""

    name: str
    label: str = ""
    description: str = ""
    datatype: str = "STRING"  # STRING | NUMBER (reference
    # pipeline/utils/codebook_to_yaml_converter.py:144-148)
    priority: str = "1"
    fill_value: str | None = None


# fixed-id columns that get default metadata when absent from configs
# (reference create_summary_header.py:173-196 drift handling)
_DEFAULT_META = {
    "PATIENT_ID": ColumnMeta("PATIENT_ID", "Patient Identifier", "Patient Identifier"),
    "SAMPLE_ID": ColumnMeta("SAMPLE_ID", "Sample Identifier", "Sample Identifier"),
}


def build_header_rows(data_columns: list[str], metas: dict[str, ColumnMeta]) -> list[list[str]]:
    """The 5 cBioPortal header rows, ordered to match the data columns
    (reference transpose at combine_header_and_data.py:37-112; '#'-prefix
    of the first cell of rows 1-4 at :84-96; row 5 is the column names)."""
    ordered: list[ColumnMeta] = []
    for c in data_columns:
        m = metas.get(c) or _DEFAULT_META.get(c) or ColumnMeta(c, c, c)
        ordered.append(m)
    labels = [m.label or m.name for m in ordered]
    descs = [m.description or m.label or m.name for m in ordered]
    dtypes = [m.datatype for m in ordered]
    prios = [m.priority for m in ordered]
    names = list(data_columns)
    rows = [labels, descs, dtypes, prios]
    for r in rows:
        r[0] = "#" + r[0]
    return rows + [names]


def combine_header_and_data(data: DataFrame, metas: dict[str, ColumnMeta]) -> DataFrame:
    """5 header rows atop the (all-string-cast) data — reference
    combine_header_and_data.py:115-154 vertical concat with column-order
    realignment.  Result is written headerless (the header IS rows 1-5)."""
    cols = data.columns
    header_rows = build_header_rows(cols, metas)
    spark = data.sparkSession
    header_df = spark.createDataFrame(
        [tuple(r) for r in header_rows], schema=", ".join(f"`{c}` string" for c in cols)
    )
    str_data = data.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in cols]
    )
    # header first: union preserves the header block's position only with
    # an explicit order tag — never rely on partition order.  The combined
    # frame targets a SINGLE-FILE export (io.py::write_cbioportal_tsv), so
    # ordering is done as repartition(1) + LOCAL sort: one hash exchange
    # (the same bytes the single-file sink moves anyway) instead of a
    # global range sort (sampling pass + range exchange).  This operator
    # is for human-scale exports by construction; at data scale keep the
    # header out-of-band (io.py::write_tsv_with_sidecar_header).
    tagged_h = header_df.withColumn("_ord", F.lit(0)).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    tagged_d = str_data.withColumn("_ord", F.lit(1)).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    return (
        tagged_h.unionByName(tagged_d)
        .repartition(1)
        .sortWithinPartitions("_ord", "_seq")
        .drop("_ord", "_seq")
    )
