"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay end-to-end at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline suite, each with a DuckDB
oracle (see cdm_cbioportal_etl_spark/plans/catalog.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdm_cbioportal_etl_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay a (repo, path, commit, lang, content) change
    stream — the BASELINE.json input shape — through the exactly-once
    MERGE engine (LakeTable + CdcReplayer, 4 LSN-range batches) and
    return the final table state with per-row content sha256."""
    return QUERIES["cdc_repos_replay"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (same column names/types)."""
    return dict(ORACLES)
