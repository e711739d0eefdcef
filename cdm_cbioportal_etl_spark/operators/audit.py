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
