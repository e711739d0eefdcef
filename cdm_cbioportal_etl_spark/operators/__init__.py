from cdm_cbioportal_etl_spark.operators.anchor import derive_anchor_dates
from cdm_cbioportal_etl_spark.operators.summary import (
    backfill,
    deidentify_dates,
    merge_intermediates,
    presence_pivot,
    first_and_max,
    process_summary,
)
from cdm_cbioportal_etl_spark.operators.timeline import (
    deidentify_timeline,
    melt_date_columns,
)
from cdm_cbioportal_etl_spark.operators.header import (
    build_header_rows,
    combine_header_and_data,
)

__all__ = [
    "derive_anchor_dates",
    "backfill",
    "deidentify_dates",
    "merge_intermediates",
    "presence_pivot",
    "first_and_max",
    "process_summary",
    "deidentify_timeline",
    "melt_date_columns",
    "build_header_rows",
    "combine_header_and_data",
]
