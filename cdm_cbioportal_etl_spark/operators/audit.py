"""Monitoring/audit operators — reference parity for the operational
checks (reference pipeline/monitoring/monitoring_completeness.py:20-132,
pipeline/monitoring/cbioportal_timeline_audit.py:47-231).

The reference walks pandas frames column by column; here one aggregate
row computes every column's stats in a single pass (map-side combinable)
and is unpivoted to the long audit shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def completeness_report(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_total, n_null, n_empty, pct_null) per column — the
    reference's completeness monitor (monitoring_completeness.py:62-66:
    `isnull().all()` per column, here generalized to counts) as ONE scan."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(
            F.count(F.when(F.trim(col.cast("string")) == "", 1)).alias(f"_empty_{c}")
        )
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("_n").cast("long").alias("n_total"),
            F.col(f"_null_{c}").cast("long").alias("n_null"),
            F.col(f"_empty_{c}").cast("long").alias("n_empty"),
            F.round(F.col(f"_null_{c}") / F.col("_n"), 4).alias("pct_null"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def timeline_file_audit(
    df: DataFrame,
    reference: DataFrame,
    patient_col: str = "PATIENT_ID",
    sample_col: str | None = None,
    date_col: str | None = None,
    today: str | None = None,
) -> DataFrame:
    """One-row availability/recency audit of a timeline file against the
    clinical reference file (reference
    pipeline/monitoring/cbioportal_timeline_audit.py:47-231: python-set
    intersections of PATIENT_ID/SAMPLE_ID plus a max-date recency check —
    here the sets never leave the executors: distinct + semi/anti joins).

    Columns: total_rows, unique_patients, ref_patients,
    patient_overlap_count, patient_overlap_pct, patients_not_in_ref,
    patients_not_in_file [+ sample_* when sample_col] [+ last_date,
    days_since_last_date when date_col; ``today`` is an injected
    parameter, never current_date() — determinism].
    """
    def _overlap_stats(col: str, label: str) -> DataFrame:
        """All five set-overlap counts from ONE distinct-pair full-outer
        join + ONE aggregate — instead of separate semi/anti/count scans
        (5 passes -> 1 join pass; the shape that survives a 100x file)."""
        d = (
            df.select(F.col(col).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .distinct()
            .withColumn("_in_d", F.lit(1))
        )
        r = (
            reference.select(F.col(col).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .distinct()
            .withColumn("_in_r", F.lit(1))
        )
        both = d.join(r, "_k", "full_outer")
        in_d, in_r = F.col("_in_d").isNotNull(), F.col("_in_r").isNotNull()
        return both.agg(
            F.count(F.when(in_d, 1)).cast("long").alias(f"unique_{label}s"),
            F.count(F.when(in_r, 1)).cast("long").alias(f"ref_{label}s"),
            F.count(F.when(in_d & in_r, 1)).cast("long").alias(f"{label}_overlap_count"),
            F.count(F.when(in_d & ~in_r, 1)).cast("long").alias(f"{label}s_not_in_ref"),
            F.count(F.when(in_r & ~in_d, 1)).cast("long").alias(f"{label}s_not_in_file"),
        )

    base_aggs = [F.count(F.lit(1)).cast("long").alias("total_rows")]
    if date_col is not None:
        base_aggs.append(F.max(F.col(date_col).cast("date")).alias("last_date"))
    parts = [df.agg(*base_aggs), _overlap_stats(patient_col, "patient")]
    if sample_col is not None:
        parts.append(_overlap_stats(sample_col, "sample"))
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(p)  # 1x1 frames — metadata-scale join
    out = out.withColumn(
        "patient_overlap_pct",
        F.round(F.col("patient_overlap_count") * 100.0 / F.col("ref_patients"), 2),
    )
    if sample_col is not None:
        out = out.withColumn(
            "sample_overlap_pct",
            F.round(F.col("sample_overlap_count") * 100.0 / F.col("ref_samples"), 2),
        )
    if date_col is not None and today is not None:
        out = out.withColumn(
            "days_since_last_date",
            F.datediff(F.lit(today).cast("date"), F.col("last_date")).cast("long"),
        )
    return out


def assert_no_empty_columns(df: DataFrame, ignore: set[str] = frozenset()) -> None:
    """Raise if any non-ignored column is entirely null/empty — the
    reference's hard gate (monitoring_completeness.py raises ValueError)."""
    rep = completeness_report(df).collect()
    bad = [
        r.column_name
        for r in rep
        if r.column_name not in ignore and r.n_total > 0
        and r.n_null + r.n_empty >= r.n_total
    ]
    if bad:
        raise ValueError(f"fully-empty columns: {bad}")
