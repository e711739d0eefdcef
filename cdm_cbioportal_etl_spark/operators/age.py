"""HIPAA age de-identification — the two composed transforms the
round-1 review flagged as missing:

- ``age_at_sequencing``: the full sample-level pipeline of reference
  pipeline/lib/utils/age_at_sequencing.py:80-137 (sample-usage semi
  filter, '-T' sample gate, DMP-prefix integrity check, age/OS interval
  arithmetic, the exact under-18 / over-89 masking order including the
  fillna(-1) sentinel).
- ``patient_age_deid``: reference pipeline/summary/patient_age_info.py:
  82-99 (``deidentify_dates``): ≥89 patients get their DATE columns
  nulled too, ages are 0-filled/89-clamped ints, and the final frame
  remaps 0 → '' (stringly output, faithfully).

Everything is JVM column expressions — the reference's pandas row ops
(`.apply(lambda x: x[:9])`, boolean-mask `.loc` writes) become
substring/when expressions; int conversions use cast (truncation toward
zero, matching numpy ``astype(int)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

YEAR_DAYS = 365.25  # reference AGE_CONVERSION_FACTOR


def age_at_sequencing(
    samples: DataFrame,
    demographics: DataFrame,
    used_ids: DataFrame,
    mrn_col: str = "MRN",
) -> DataFrame:
    """(DMP_ID, SAMPLE_ID, AGE_AT_SEQUENCING_YEARS) per kept sample.

    ``samples``: (MRN, SAMPLE_ID, DMP_ID, DATE_TUMOR_SEQUENCING).
    ``demographics``: (MRN, PT_BIRTH_DTE, OS_DTE).
    ``used_ids``: one-column frame of DMP_IDs in use (the anchor-dates
    id set, reference :80-81) — applied as a broadcast semi join, the
    distributed form of ``isin(list_sample_ids_used)``.
    """
    s = (
        samples
        # reference :84-88 — the four row gates, in order
        .filter(F.col("SAMPLE_ID").isNotNull())
        .join(
            F.broadcast(used_ids.select(F.col(used_ids.columns[0]).alias("DMP_ID")).distinct()),
            "DMP_ID",
            "left_semi",
        )
        .filter(F.col("SAMPLE_ID").contains("-T"))
        .filter(F.substring("SAMPLE_ID", 1, 9) == F.col("DMP_ID"))
    )
    d = demographics.select(
        mrn_col,
        F.col("PT_BIRTH_DTE").cast("date").alias("_birth"),
        F.col("OS_DTE").cast("date").alias("_os"),
    )
    j = s.join(d, mrn_col, "left")
    seq = F.col("DATE_TUMOR_SEQUENCING").cast("date")
    age_days = F.datediff(seq, F.col("_birth"))
    os_int = F.datediff(F.col("_os"), seq)
    # fillna(-1).astype(int) (reference :107-111): trunc toward zero,
    # missing → -1 sentinel (which the <18 mask then catches — faithful)
    years = F.coalesce((age_days / F.lit(YEAR_DAYS)).cast("int"), F.lit(-1))
    with_os = F.coalesce(
        ((age_days + os_int) / F.lit(YEAR_DAYS)).cast("int"), F.lit(-1)
    )
    under18 = years < 18
    over89_fix = years > 89
    over89 = (with_os > 89) | over89_fix
    # masking order exactly as reference :124-133: clamp >89 to 89,
    # stringify, then '<18', then the '>' prefix for any over-89 logic
    base = F.when(over89_fix, F.lit(89)).otherwise(years).cast("string")
    base = F.when(under18, F.lit("<18")).otherwise(base)
    deid = F.when(over89, F.concat(F.lit(">"), base)).otherwise(base)
    return j.select(
        "DMP_ID", "SAMPLE_ID", deid.alias("AGE_AT_SEQUENCING_YEARS")
    )


def patient_age_deid(
    df: DataFrame,
    id_col: str = "PATIENT_ID",
    age_col: str = "CURRENT_AGE_DEID",
    birth_col: str = "PT_BIRTH_DTE",
    anchor_col: str = "DATE_FIRST_SEQUENCING",
    dx_col: str = "DATE_AT_FIRST_ICDO_DX",
) -> DataFrame:
    """Reference patient_age_info.py::deidentify_dates (:82-99):

    1. age ≥ 89 ⇒ NULL the diagnosis and anchor DATE columns too (the
       rule that protects date-of-birth inference for the 89+ cohort);
    2. AGE_FIRST_SEQUENCING / AGE_FIRST_CANCER_DIAGNOSIS =
       trunc(datediff/365.25), missing → 0, clamped to ≤ 89;
    3. rename age col → AGE_LAST_FOLLOWUP, keep the deid columns,
       remap literal 0 → '' (the reference's ``replace({0: ''})``).
    """
    over = F.col(age_col).cast("double") >= 89
    redact = lambda c: F.when(over, F.lit(None).cast("date")).otherwise(  # noqa: E731
        F.col(c).cast("date")
    )
    df = df.withColumn(dx_col, redact(dx_col)).withColumn(anchor_col, redact(anchor_col))

    def _age(date_col: str):
        a = F.coalesce(
            (F.datediff(F.col(date_col), F.col(birth_col).cast("date")) / F.lit(YEAR_DAYS))
            .cast("int"),
            F.lit(0),
        )
        return F.when(a > 89, F.lit(89)).otherwise(a)

    zero_blank = lambda c: F.when(  # noqa: E731
        c.cast("string") == "0", F.lit("")
    ).otherwise(c.cast("string"))
    return df.select(
        F.col(id_col),
        zero_blank(F.col(age_col)).alias("AGE_LAST_FOLLOWUP"),
        zero_blank(_age(anchor_col)).alias("AGE_FIRST_SEQUENCING"),
        zero_blank(_age(dx_col)).alias("AGE_FIRST_CANCER_DIAGNOSIS"),
    )
