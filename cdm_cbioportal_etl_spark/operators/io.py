"""Edge-format I/O: headerless cBioPortal TSV export / header-offset read.

The lake/parquet path is the engine's native storage; TSV exists only at
the edge, exactly like the reference (reference
pipeline/summary/combine_header_and_data.py:216-223 writes headerless TSV
with 5 metadata rows on top; pipeline/monitoring/monitoring_completeness.py
:60-64 reads them back by skipping 4 rows and taking row 5 as names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_HEADER_ROWS = 5  # 4 '#'-prefixed metadata rows + 1 column-name row


def write_cbioportal_tsv(df: DataFrame, path: str) -> None:
    """Write a combined header+data frame (see
    operators/header.py::combine_header_and_data) as ONE headerless TSV.

    ``coalesce(1)`` is correct here: cBioPortal staging files are
    human-scale exports (the reference writes them with pandas.to_csv);
    the distributed plan still computes everything before the final
    single-file sink."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", False)
        .option("emptyValue", "")
        .csv(path)
    )


def read_cbioportal_tsv(
    spark: SparkSession, path: str
) -> tuple[list[list[str]], DataFrame]:
    """Header-offset read (reference S5): returns the 5 header rows and a
    DataFrame of the data rows with row-5's names as columns.

    Uses a per-file row index (not partition order) so the split between
    header and data is deterministic under any parallelism."""
    raw = spark.read.option("sep", "\t").option("header", False).csv(path)
    cols = raw.columns
    idx = (
        raw.withColumn("_idx", F.monotonically_increasing_id())
    )
    header_rows = [
        [row[c] for c in cols]
        for row in idx.orderBy("_idx").limit(N_HEADER_ROWS).collect()
    ]
    names = header_rows[N_HEADER_ROWS - 1]
    data = (
        idx.orderBy("_idx")
        .offset(N_HEADER_ROWS)
        .drop("_idx")
        .toDF(*names)
    )
    return header_rows, data
