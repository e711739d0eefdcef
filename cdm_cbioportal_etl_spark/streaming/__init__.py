from cdm_cbioportal_etl_spark.streaming.dedup import dedup_stream
from cdm_cbioportal_etl_spark.streaming.stateful import sessionize_stream
from cdm_cbioportal_etl_spark.streaming.replica import CdfReplicaMaintainer
from cdm_cbioportal_etl_spark.streaming.views import CdfViewMaintainer
from cdm_cbioportal_etl_spark.streaming.wal import WalTailReader
from cdm_cbioportal_etl_spark.streaming.windows import (
    stream_windowed_agg_to_lake,
    windowed_agg_stream,
)

__all__ = [
    "CdfReplicaMaintainer",
    "CdfViewMaintainer",
    "WalTailReader",
    "dedup_stream",
    "sessionize_stream",
    "stream_windowed_agg_to_lake",
    "windowed_agg_stream",
]
