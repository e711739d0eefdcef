from cdm_cbioportal_etl_spark.streaming.wal import WalTailReader

__all__ = ["WalTailReader"]
