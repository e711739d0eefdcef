from cdm_cbioportal_etl_spark.plans.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
