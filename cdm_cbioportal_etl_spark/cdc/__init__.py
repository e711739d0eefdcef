from cdm_cbioportal_etl_spark.cdc.envelope import (
    decode_debezium,
    decode_debezium_with_rejects,
    encode_debezium,
    envelope_schema,
    connect_schema_json,
    parse_connect_schema,
)
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA, gen_change_events
from cdm_cbioportal_etl_spark.cdc.router import EnvelopeTailReader, WalRouter
from cdm_cbioportal_etl_spark.cdc.replayer import CdcReplayer, expected_final_state
from cdm_cbioportal_etl_spark.cdc.registry import SchemaRegistry

__all__ = [
    "REPOS_SCHEMA",
    "gen_change_events",
    "CdcReplayer",
    "expected_final_state",
    "SchemaRegistry",
    "decode_debezium",
    "decode_debezium_with_rejects",
    "EnvelopeTailReader",
    "WalRouter",
    "encode_debezium",
    "envelope_schema",
    "connect_schema_json",
    "parse_connect_schema",
]
