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


def write_tsv_with_sidecar_header(
    data: DataFrame, header_rows: list[list[str]], path: str
) -> None:
    """Scale-path TSV export: DATA is written distributed (many part
    files, no coalesce, no ordering shuffle) and the 5 metadata rows go to
    a tiny sidecar ``_header.tsv`` — concatenation happens at delivery
    time (``cat _header.tsv part-*``), not inside the engine.  Use this
    instead of combine_header_and_data + write_cbioportal_tsv when the
    export is NOT human-scale."""
    import os

    (
        data.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", False)
        .option("emptyValue", "")
        .csv(path)
    )
    with open(os.path.join(path, "_header.tsv"), "w") as fh:
        for row in header_rows:
            fh.write("\t".join("" if v is None else str(v) for v in row) + "\n")


def _single_tsv_file(path: str) -> str:
    """Resolve the ONE data file of a cBioPortal TSV export and assert
    uniqueness — the writer contract is a single file (``coalesce(1)``),
    and the header-offset semantics ("rows 1-5 of the file") are only
    well-defined for one file."""
    import glob
    import os

    if os.path.isfile(path):
        return path
    parts = sorted(
        p
        for p in glob.glob(os.path.join(path, "*"))
        if os.path.isfile(p) and not os.path.basename(p).startswith((".", "_"))
    )
    if len(parts) != 1:
        raise ValueError(
            f"cBioPortal TSV read requires exactly one data file, found "
            f"{len(parts)} under {path}: header-offset semantics are "
            "per-file (write with write_cbioportal_tsv / coalesce(1))"
        )
    return parts[0]


def read_cbioportal_tsv(
    spark: SparkSession, path: str
) -> tuple[list[list[str]], DataFrame]:
    """Header-offset read (reference S5): returns the 5 header rows and a
    DataFrame of the data rows with row-5's names as columns.

    Determinism: the row index comes from ``sc.textFile(...).zipWithIndex``
    over the (asserted-single) file — Hadoop splits of one file are in
    byte-offset order, so the index is the file's true line number at any
    parallelism.  (The DataFrame file source orders splits by SIZE, so
    ``monotonically_increasing_id`` is NOT deterministic here.)  This is
    one of the rare justified RDD escapes: Spark exposes no per-file row
    offset through the DataFrame API."""
    fpath = _single_tsv_file(path)

    def _parse(line: str) -> list[str]:
        # MUST match the writer's dialect exactly (Spark csv sink /
        # univocity: fields quoted with '"' only when needed, '\' escapes
        # apply ONLY inside quotes).  python csv can't express
        # "escape-only-inside-quotes", so tokenize by hand: a field
        # starting with '"' is quoted (ends at its unescaped close
        # quote); any other field is raw text up to the next tab.
        fields: list[str] = []
        i, n = 0, len(line)
        while True:
            if i < n and line[i] == '"':
                i += 1
                buf: list[str] = []
                while i < n:
                    c = line[i]
                    # univocity escapes ONLY the quote/escape chars; a
                    # backslash before anything else is literal data
                    if c == "\\" and i + 1 < n and line[i + 1] in ('"', "\\"):
                        buf.append(line[i + 1])
                        i += 2
                        continue
                    if c == '"':
                        i += 1
                        break
                    buf.append(c)
                    i += 1
                fields.append("".join(buf))
                j = line.find("\t", i)
                if j == -1:
                    break
                i = j + 1
            else:
                j = line.find("\t", i)
                if j == -1:
                    fields.append(line[i:])
                    break
                fields.append(line[i:j])
                i = j + 1
        return fields

    parsed = (
        spark.sparkContext.textFile(fpath)
        .zipWithIndex()
        # blank lines (trailing newline, manual edits) are not rows —
        # the csv-sink writer never emits them
        .filter(lambda t: t[0] != "")
        .map(lambda t: (t[1], _parse(t[0])))
    )
    header_rows_raw = dict(parsed.filter(lambda t: t[0] < N_HEADER_ROWS).collect())
    if len(header_rows_raw) < N_HEADER_ROWS:
        raise ValueError(
            f"{fpath}: not a cBioPortal TSV — expected {N_HEADER_ROWS} "
            f"header rows, file has {len(header_rows_raw)} line(s)"
        )
    header_rows = [header_rows_raw[i] for i in range(N_HEADER_ROWS)]
    names = header_rows[N_HEADER_ROWS - 1]
    ncol = len(names)
    data_rdd = parsed.filter(lambda t: t[0] >= N_HEADER_ROWS).map(
        # pad/trim to the header width; '' -> null matches the csv reader's
        # default emptyValue handling on the write side
        lambda t: tuple((v if v != "" else None) for v in (t[1] + [None] * ncol)[:ncol])
    )
    schema = ", ".join(f"`{c}` string" for c in names)
    data = spark.createDataFrame(data_rdd, schema=schema)
    return header_rows, data
