"""As-of join — an operator Spark's DataFrame API lacks natively.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row of the same key with ``right.ts <= left.ts`` (LEFT semantics:
left rows with no prior right row keep nulls) — the canonical
point-in-time lookup (trade⟶latest-quote, event⟶latest-state).

Implementation is the scalable union+window pattern, NOT a range join:

- tag both sides, union (right rows sort before left at equal ts so
  ties count as "already happened" — DuckDB ASOF `<=` semantics),
- one window per key ordered by (ts, tag) carrying a SINGLE struct of
  all right columns forward with ``last(ignorenulls=True)`` — the
  struct is null exactly on left rows, so every prefixed output column
  comes from the SAME matched right row (no cross-row tearing) and a
  matched row's NULL field stays NULL (never backfilled from an older
  right row) — DuckDB ASOF semantics,
- filter back to left rows and unpack the struct.

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
    r_struct_type = ", ".join(
        f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in right_cols
    )
    l_tag = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left.columns if c not in (*on, ts_col)],
        # null struct on left rows — last(ignorenulls) skips them
        F.lit(None).cast(f"struct<{r_struct_type}>").alias("_r"),
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
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    both = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    keep = [F.col(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.filter(F.col("_tag") == 1).select(*keep)
