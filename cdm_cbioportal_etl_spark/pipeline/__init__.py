from cdm_cbioportal_etl_spark.pipeline.config import (
    SummaryConfig,
    load_summary_config,
    load_summary_configs,
)
from cdm_cbioportal_etl_spark.pipeline.driver import (
    build_intermediate_summary,
    run_summary_pipeline,
)

__all__ = [
    "SummaryConfig",
    "load_summary_config",
    "load_summary_configs",
    "build_intermediate_summary",
    "run_summary_pipeline",
]
