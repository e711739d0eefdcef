from cdm_cbioportal_etl_spark.functions.scalar import (
    clamp_age,
    coalesce_min,
    days_to_months,
    days_to_readable,
    days_to_years,
    interval_days,
    normalize_colname,
    null_future_dates,
    tolerant_to_date,
    truncate_to_limit,
    yes_no,
    zero_pad_id,
)

__all__ = [
    "clamp_age",
    "coalesce_min",
    "days_to_months",
    "days_to_readable",
    "days_to_years",
    "interval_days",
    "normalize_colname",
    "null_future_dates",
    "tolerant_to_date",
    "truncate_to_limit",
    "yes_no",
    "zero_pad_id",
]
