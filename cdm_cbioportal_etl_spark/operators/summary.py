"""Summary-pipeline operators: per-config staging, widen-merge, pivots.

Re-expresses the reference summary pipeline's transform semantics
(pipeline/lib/summary/summary_config_processor.py:110-370,
pipeline/summary/merge_intermediate_summaries.py:85-179,
pipeline/summary/cbioportal_summary_tumor_sites.py:154-185,
pipeline/summary/cbioportal_summary_pathology_gleason.py:38-61) as lazy
DataFrame plans.  Shape of the computation at scale:

- anchor/template are small dimensions → ``broadcast()`` hints, so the
  fact-side scan never shuffles for the deid join;
- the horizontal widen is a fold of left joins on the id key — all
  intermediates share the key, so pre-repartitioning the accumulator by
  the key lets AQE reuse one exchange;
- the presence pivot uses a FIXED category domain (reference
  cbioportal_summary_tumor_sites.py:37-48) → deterministic schema, single
  shuffle, no data-dependent pivot scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdm_cbioportal_etl_spark.functions import interval_days, yes_no, zero_pad_id


def deidentify_dates(
    df: DataFrame, date_cols: list[str], anchor_col: str, suffix: str = "_INTERVAL"
) -> DataFrame:
    """date→day-offset conversion for each configured date column
    (reference summary_config_processor.py:209-254); original date and
    anchor columns are dropped from the output."""
    for c in date_cols:
        df = df.withColumn(c + suffix, interval_days(c, anchor_col).cast("int"))
    return df.drop(*date_cols, anchor_col)


def process_summary(
    source: DataFrame,
    anchor: DataFrame,
    template: DataFrame,
    key_col: str,
    attr_cols: list[str],
    date_cols: list[str] | None = None,
    mrn_col: str = "MRN",
    fill_values: dict[str, str] | None = None,
) -> DataFrame:
    """One YAML-config staging step (reference
    summary_config_processor.py:110-152): project → inner-join anchor
    (broadcast dim) → date→interval → left-join template (row universe)
    → backfill."""
    date_cols = date_cols or []
    proj = source.select(
        zero_pad_id(mrn_col).alias(mrn_col), *[F.col(c) for c in attr_cols + date_cols]
    )
    anchored = proj.join(
        F.broadcast(anchor.select(zero_pad_id(mrn_col).alias(mrn_col),
                                  F.col(key_col), "DATE_TUMOR_SEQUENCING")),
        mrn_col,
        "inner",
    )
    if date_cols:
        anchored = deidentify_dates(anchored, date_cols, "DATE_TUMOR_SEQUENCING")
    else:
        anchored = anchored.drop("DATE_TUMOR_SEQUENCING")
    anchored = anchored.drop(mrn_col)  # PHI column dropped (reference :196)
    universe = template.select(key_col).distinct()
    out = universe.join(anchored, key_col, "left")
    if fill_values:
        out = backfill(out, fill_values)
    return out


def backfill(df: DataFrame, fill_values: dict[str, str]) -> DataFrame:
    """Per-column fill_value semantics incl. literal 'NA'/'N/A' remap
    (reference summary_config_processor.py:337-370 and legacy
    cbioportal_summary_merger.py:215-238)."""
    for c, v in fill_values.items():
        if c in df.columns:
            col = F.col(c).cast("string")
            df = df.withColumn(
                c,
                F.when(col.isNull() | F.trim(col).isin("", "NA", "N/A"), F.lit(v)).otherwise(col),
            )
    return df


def merge_intermediates(
    template: DataFrame, intermediates: list[DataFrame], key_col: str
) -> DataFrame:
    """Horizontal widen: template ⟕ fold of intermediates on the id key
    (reference merge_intermediate_summaries.py:85-179).  Duplicate
    non-key columns are replaced by the later intermediate (reference
    summary_merger.py:229-234: drop-then-join)."""
    merged = template.select(key_col).distinct()
    # one explicit repartition on the join key; every subsequent left join
    # reuses the exchange instead of re-shuffling the accumulator
    merged = merged.repartition(key_col)
    for inter in intermediates:
        dup = [c for c in inter.columns if c != key_col and c in merged.columns]
        if dup:
            merged = merged.drop(*dup)
        merged = merged.join(inter, key_col, "left")
    return merged


def presence_pivot(
    df: DataFrame,
    key_col: str,
    category_col: str,
    categories: list[str],
    exclude_value: str | None = "No Tumor Sites",
) -> DataFrame:
    """Category presence matrix → Yes/No columns with a FIXED domain
    (reference cbioportal_summary_tumor_sites.py:154-185: groupby.size
    .unstack → binarize → {1:'Yes',0:'No'})."""
    base = df.filter(F.col(category_col).isNotNull())
    if exclude_value is not None:
        base = base.filter(F.col(category_col) != exclude_value)
    counts = base.groupBy(key_col).pivot(category_col, categories).count()
    for c in categories:
        counts = counts.withColumn(c, yes_no(F.col(c).isNotNull() & (F.col(c) > 0)))
    return counts


def first_and_max(
    df: DataFrame, key_col: str, value_col: str, order_col: str
) -> DataFrame:
    """Chronologically-first and maximum value per key in ONE aggregate
    (reference cbioportal_summary_pathology_gleason.py:38-61 does a sort +
    groupby.first, a separate groupby.max, then an inner self-join; here a
    single hash aggregate with min_by/max — one shuffle, no join)."""
    return df.groupBy(key_col).agg(
        F.min_by(F.col(value_col), F.col(order_col)).alias(f"{value_col}_FIRST"),
        F.max(F.col(value_col)).alias(f"{value_col}_MAX"),
    )
