from cdm_cbioportal_etl_spark.pipeline.config import (
    SummaryConfig,
    TimelineConfig,
    load_summary_config,
    load_summary_configs,
    load_timeline_config,
    load_timeline_configs,
)
from cdm_cbioportal_etl_spark.pipeline.driver import (
    build_intermediate_summary,
    build_timeline_deid,
    run_summary_pipeline,
    run_timeline_pipeline,
)

__all__ = [
    "SummaryConfig",
    "TimelineConfig",
    "load_summary_config",
    "load_summary_configs",
    "load_timeline_config",
    "load_timeline_configs",
    "build_intermediate_summary",
    "build_timeline_deid",
    "run_summary_pipeline",
    "run_timeline_pipeline",
]
