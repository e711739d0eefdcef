from cdm_cbioportal_etl_spark.lake.table import LakeTable, SchemaEvolutionError

__all__ = ["LakeTable", "SchemaEvolutionError"]
