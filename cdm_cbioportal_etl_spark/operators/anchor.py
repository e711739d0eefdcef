"""Anchor-date dimension derivation with the ID-integrity gate.

Re-expresses reference pipeline/lib/utils/get_anchor_dates.py:17-71 — the
most engine-like query in the reference (multi-aggregate integrity gate +
anti-join): derive each patient's anchor date as the min sequencing date,
excluding ids that violate the 1:1 MRN↔DMP_ID mapping or whose DMP_ID is
not the SAMPLE_ID prefix.

Spark-first notes: the violation sets are tiny relative to the fact table →
computed as aggregates and removed with a (broadcastable) left_anti join;
no collects of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdm_cbioportal_etl_spark.functions import tolerant_to_date, zero_pad_id


def derive_anchor_dates(
    id_mapping: DataFrame,
    mrn_col: str = "MRN",
    dmp_col: str = "DMP_ID",
    sample_col: str = "SAMPLE_ID",
    date_col: str = "DATE_TUMOR_SEQUENCING",
) -> DataFrame:
    """(MRN, DMP_ID, anchor date) — one row per valid patient.

    Steps mirror get_anchor_dates.py:
      :27      dropna
      :33-38   keep rows whose SAMPLE_ID contains 'T' and date parses
      :39      DMP_ID_DERIVED = SAMPLE_ID[:9]   (expression, not apply)
      :41-52   integrity: MRN↔DMP 1:1 both directions, derived == declared
      :55      group-min anchor date
      :60-64   anti-join violators out
    """
    base = (
        id_mapping.select(
            zero_pad_id(mrn_col).alias("MRN"),
            F.col(dmp_col).alias("DMP_ID"),
            F.col(sample_col).alias("SAMPLE_ID"),
            tolerant_to_date(date_col).alias("ANCHOR_DATE_RAW"),
        )
        .na.drop(subset=["MRN", "DMP_ID", "SAMPLE_ID"])
        .filter(F.col("SAMPLE_ID").contains("T") & F.col("ANCHOR_DATE_RAW").isNotNull())
        .withColumn("DMP_ID_DERIVED", F.substring("SAMPLE_ID", 1, 9))
    )
    # 1:N violations in either direction (reference :42-46)
    mrn_multi = (
        base.groupBy("MRN")
        .agg(F.countDistinct("DMP_ID").alias("n"))
        .filter(F.col("n") > 1)
        .select("MRN")
    )
    dmp_multi = (
        base.groupBy("DMP_ID")
        .agg(F.countDistinct("MRN").alias("n"))
        .filter(F.col("n") > 1)
        .select("DMP_ID")
    )
    # derived-prefix mismatch (reference :52)
    prefix_bad = (
        base.filter(F.col("DMP_ID_DERIVED") != F.col("DMP_ID")).select("MRN").distinct()
    )
    anchored = (
        base.groupBy("MRN", "DMP_ID")
        .agg(F.min("ANCHOR_DATE_RAW").alias("DATE_TUMOR_SEQUENCING"))
    )
    return (
        anchored.join(mrn_multi, "MRN", "left_anti")
        .join(dmp_multi, "DMP_ID", "left_anti")
        .join(prefix_bad, "MRN", "left_anti")
        .select("MRN", "DMP_ID", "DATE_TUMOR_SEQUENCING")
    )
