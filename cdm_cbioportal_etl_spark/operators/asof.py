"""As-of join — an operator Spark's DataFrame API lacks natively.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row of the same key with ``right.ts <= left.ts`` (LEFT semantics:
left rows with no prior right row keep nulls) — the canonical
point-in-time lookup (trade⟶latest-quote, event⟶latest-state).

Implementation is the scalable union+window pattern, NOT a range join:

- tag both sides, union (right rows sort before left at equal ts so
  ties count as "already happened" — DuckDB ASOF `<=` semantics),
- one window per key ordered by (ts, tag) carrying
  ``last(right_value, ignorenulls=True)`` forward,
- filter back to left rows.

Cost: ONE shuffle on the key (the window), linear scan within
partitions — no O(|L|·|R|) candidate blowup, no range-condition
nested-loop join, skew bounded by per-key row counts.  This is the
plan a 100 TB point-in-time enrichment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """LEFT as-of join: left columns + ``prefix``-named right columns
    holding the latest right row at-or-before each left row's ts."""
    l_tag = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left.columns if c not in (*on, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*on, ts_col)
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    both = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    keep = [c for c in left.columns] + [f"{prefix}{c}" for c in right_cols]
    return carried.filter(F.col("_tag") == 1).select(*keep)
