from cdm_cbioportal_etl_spark.streaming.stateful import sessionize_stream
from cdm_cbioportal_etl_spark.streaming.wal import WalTailReader

__all__ = ["WalTailReader", "sessionize_stream"]
