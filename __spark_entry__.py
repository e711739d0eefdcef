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


# Round-5 window. The driver's correctness file caps at 50 entries taken
# in queries()-dict order. After round 4, 103 of the 116 catalog queries
# carry a green driver hash row in some round's CORRECTNESS file; the 13
# below are the only ones that were never driver-checked (they were
# registered after round 4's rotation froze, or missed every earlier
# window). They lead this round's window so every catalog query ends the
# build with a green driver row. The flagship + §2 anchors stay inside
# the window as regression sentinels; the tail re-checks rows whose green
# evidence is oldest (round 1).
_NEVER_CHECKED = (
    "cdc_multitable_txn",
    "cdc_wire_evolution",
    "cdc_clone_backfill",
    "cdc_stream_view",
    "cdc_datasource_write_replay",
    "cdc_stream_replica",
    "cdc_metadata_count",
    "approx_distinct_terms_gate",
    "embedding_mean_pool",
    "multimodal_resample_features",
    "repetition_ratio_docs",
    "semantic_dedup_prune",
    "semantic_dedup_kmeans",
)

# §2 anchors kept inside every round's window: the flagship replay plus
# the relational/timeline/dedup core.
_ANCHORS = (
    "cdc_repos_replay",
    "cdc_replay_final_state",
    "q1_pricing_summary",
    "timeline_deid_events",
    "grouped_timeline_compact_sql",
    "summary_wide_customer",
    "minhash_docs",
)

# Oldest-evidence rows (green in round 1, never re-checked since) — fill
# the remainder of the 50-row window with these, freshest-evidence last.
_R1_VINTAGE = (
    "q3_shipping_priority", "q5_region_revenue", "q6_filter_agg",
    "anchor_min_dates", "integrity_gate_anchor", "deid_day_intervals",
    "readable_intervals", "presence_pivot_events", "first_and_max_orders",
    "anti_join_inactive_customers", "semi_join_active_suppliers",
    "melt_part_attrs", "union_dedup_nations", "backfill_remap_orders",
    "window_top3_orders", "dedup_exact_docs", "token_count_docs",
    "lang_id_docs", "fingerprint_docs", "lsh_candidate_pairs",
    "ngram_jaccard_docs", "neardup_clusters_docs", "quality_score_docs",
    "q2_min_balance_supplier", "cdc_changes_since", "cdc_table_changes",
    "cdc_point_lookup", "cdc_rebucket_replay", "cdc_incremental_view",
    "neardup_dedup_survivors",
)


def _window_order(names):
    head = [n for n in _NEVER_CHECKED if n in names]
    head += [n for n in _ANCHORS if n in names and n not in head]
    head += [n for n in _R1_VINTAGE if n in names and n not in head]
    return head + [n for n in names if n not in head]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _window_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (same column names/types)."""
    return {n: ORACLES[n] for n in _window_order(list(QUERIES)) if n in ORACLES}
