#!/usr/bin/env python
"""Physical-plan audit: dump .explain('formatted') for key catalog queries
and check the properties that matter at 100 TB:

- parquet scans carry PushedFilters (predicate pushdown reached the scan)
- ReadSchema is pruned to referenced columns (column pruning)
- broadcast joins used where a small dim feeds a fact join
- WholeStageCodegen spans cover the hot expressions

Writes EXPLAIN.md.  Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402
from cdm_cbioportal_etl_spark.plans import QUERIES  # noqa: E402

AUDIT = {
    "q6_filter_agg": dict(pushed=True, broadcast=False),
    "q3_shipping_priority": dict(pushed=True, broadcast=True),
    "q5_region_revenue": dict(pushed=True, broadcast=True),
    "deid_day_intervals": dict(pushed=False, broadcast=True),
    "window_top3_orders": dict(pushed=False, broadcast=False),
    "minhash_docs": dict(pushed=False, broadcast=False),
    "summary_wide_customer": dict(pushed=False, broadcast=True),
    # round-2 additions: the YAML-driven pipeline must broadcast its
    # anchor/template dims; the as-of join must be the union+window plan
    # (exactly one exchange on the key — no range/nested-loop join)
    "yaml_summary_pipeline": dict(pushed=False, broadcast=True),
    "asof_purchase_last_click": dict(
        pushed=True, broadcast=False, max_exchanges=1, forbid=["NestedLoop"]
    ),
    "timeline_audit_events": dict(pushed=False, broadcast=True),
    # round-3 additions: the timeline YAML pipeline must broadcast its
    # anchor/OS dims; the grouped-compact JVM twin must stay pure JVM
    # (no Arrow/Python eval in the plan)
    "yaml_timeline_pipeline": dict(pushed=False, broadcast=True),
    "grouped_timeline_compact_sql": dict(
        pushed=False, broadcast=False, forbid=["ArrowEvalPython", "FlatMapGroupsInPandas"]
    ),
    # late round-3: incremental LSH probes the corpus band index with a
    # plain shuffle join on uniform band keys — never a nested loop
    "incremental_lsh_pairs": dict(pushed=False, broadcast=False, forbid=["NestedLoop"]),
    # final round-3: the z-order catalog read must stay a plain pruned
    # scan + filter (file skipping is manifest-side, invisible to the
    # plan — no exchange beyond the write, no python); the PQ ADC scan
    # must keep the codebook/query attach as BROADCAST joins and never
    # fall into a python eval
    "lake_zorder_clustered_read": dict(
        pushed=True, broadcast=False, forbid=["ArrowEvalPython", "BatchEvalPython"]
    ),
    "ann_pq_topk": dict(
        pushed=False,
        broadcast=True,
        forbid=["ArrowEvalPython", "BatchEvalPython"],
    ),
    # round-4: the write-time CDF feed must be served from stored change
    # files — a pure scan+union, never the snapshot-diff full-outer join
    # (SortMergeJoin/ShuffledHashJoin would mean the fallback engaged)
    "cdc_cdf_writetime": dict(
        pushed=False,
        broadcast=False,
        forbid=["SortMergeJoin", "ShuffledHashJoin", "NestedLoop"],
    ),
    # late round-4: the deletion-vector final read must be FOLD-FREE —
    # no latest-per-key HashAggregate (that would mean the MOR fold
    # engaged) and no python; the positional anti-join may be broadcast
    # or shuffled-hash depending on dead-set size
    "cdc_repos_replay_dv": dict(
        pushed=False,
        broadcast=False,
        forbid=["HashAggregate", "SortAggregate", "ArrowEvalPython"],
    ),
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------------- #
# Cartesian guard: no catalog query may plan a CartesianProduct /
# BroadcastNestedLoopJoin unless whitelisted (the documented exact
# baselines and scalar-aggregate cross joins).  Wired into pytest
# (tests/test_plan_guard.py) so a regression fails CI, and runnable
# standalone via `python scripts/explain_audit.py --cartesian`.
# ------------------------------------------------------------------- #
QUADRATIC_OPS = ("CartesianProduct", "BroadcastNestedLoopJoin")

# queries ALLOWED to contain a quadratic operator, and why
CARTESIAN_WHITELIST = {
    # exact all-pairs scorers: the documented brute-force baselines the
    # bucketed LSH/IVF paths are recall-gated against
    "cosine_topk_embeddings",
    "embedding_neardup_pairs",
    # recall audits join approximate vs exact top-k per query point and
    # embed the exact baseline above
    "ann_lsh_recall",
    "ann_ivf_recall",
    # scalar-aggregate cross join: one row (global counts) joined
    # against per-source stats — O(n), not O(n^2)
    "timeline_audit_events",
    # one-row LM denominator (N, V) broadcast onto the token stream —
    # O(tokens) map-side attach
    "lm_perplexity_docs",
    # one-row broadcast of packed centroid/hyperplane constants
    # (nested double arrays) cross-joined onto items/queries —
    # O(n) map-side attach, not O(n^2)
    "ann_ivf_topk",
    "ann_lsh_topk",
    # same one-row centroid-pack broadcast attach (semdedup assignment)
    "semantic_dedup_prune",
    "semantic_dedup_kmeans",
    # PQ: one-row codebook broadcast attach (encode) + the ADC scan —
    # which scores every (item, query) pair like the exact baseline but
    # at O(m) byte-code lookups per pair instead of O(dim); the scan IS
    # the documented shortlist generator, with exact work bounded to
    # shortlist_mult·k per query afterwards
    "ann_pq_topk",
    "ann_pq_recall",
    # IVF-PQ: same one-row broadcast attaches (centroids + books) plus a
    # broadcast list-id join for the probed-list ADC scan
    "ann_ivfpq_topk",
    "ann_ivfpq_recall",
    # three one-row invariant aggregates cross-joined into the single
    # contract row — O(1) each, not O(n^2)
    "pack_sequences_valid",
}

# queries whose CONSTRUCTION executes jobs (CDC replays write tables;
# the guard wants plan shapes, not replays) — audited separately via
# their merge plans in BENCH/EXPLAIN
SKIP_EXEC = {
    "cdc_repos_replay",
    "cdc_repos_replay_mor",
    "cdc_replay_final_state",
    # full partial-image replay at construction (3 merge commits)
    "cdc_partial_image_replay",
    "cdc_partial_image_replay_mor",
    # full replay at construction, like the rows above; its read-side
    # plan is the plain pruned scan the guard sees via
    # lake_pruned_range_read
    "cdc_changes_since",
    # iterative CC loop localCheckpoints eagerly during construction;
    # its per-round plan is the audited join+agg shape
    "neardup_clusters_docs",
    # late round-4 replay-at-construction rows: dv replay's read plan is
    # AUDIT-checked above; log compaction / equality delete replay the
    # same merge plans the rows above cover
    "cdc_repos_replay_dv",
    "wal_log_compaction",
    "cdc_equality_delete",
    # runs TWO Structured Streaming drains at construction; its read-side
    # plan is the view table's plain read, audited via
    # cdc_incremental_view (same view/merge machinery)
    "cdc_stream_view",
    # executes the DataSource write + compact at construction; read-side
    # plan is the plain folded read the rows above already audit
    "cdc_datasource_write_replay",
    # two streaming drains at construction, like cdc_stream_view
    "cdc_stream_replica",
}


def scan_quadratic_joins(spark, sf_dir: str) -> dict[str, list[str]]:
    """name -> quadratic operators found in its initial physical plan."""
    from cdm_cbioportal_etl_spark.plans import QUERIES as _Q

    bad: dict[str, list[str]] = {}
    for name, fn in _Q.items():
        if name in SKIP_EXEC:
            continue
        txt = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [op for op in QUADRATIC_OPS if op in txt]
        if hits:
            bad[name] = hits
    return bad


def main() -> None:
    if "--cartesian" in sys.argv:
        spark = get_spark("cartesian-guard")
        spark.sparkContext.setLogLevel("ERROR")
        bad = scan_quadratic_joins(spark, "/root/testdata/sf0.001")
        rogue = {n: ops for n, ops in bad.items() if n not in CARTESIAN_WHITELIST}
        print(f"quadratic plans: {sorted(bad)}; rogue: {sorted(rogue)}")
        spark.stop()
        sys.exit(1 if rogue else 0)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # AQE hides codegen annotations in pre-execution plans; the audit
    # wants the static plan shape, so disable it here only
    spark = get_spark(
        "explain-audit", extra_conf={"spark.sql.adaptive.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sections, failures = [], []
    for name, want in AUDIT.items():
        txt = plan_text(QUERIES[name](spark, sf_dir))
        checks = []
        pushed = bool(re.search(r"PushedFilters: \[(?!\])", txt))
        pruned = "ReadSchema" in txt
        codegen = "codegen id" in txt or "WholeStageCodegen" in txt
        bcast = "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" in txt
        checks.append(("WholeStageCodegen present", codegen, True))
        checks.append(("ReadSchema (column pruning) present", pruned, True))
        if want["pushed"]:
            checks.append(("PushedFilters non-empty", pushed, True))
        if want["broadcast"]:
            checks.append(("broadcast join chosen", bcast, True))
        if "max_exchanges" in want:
            n_ex = len(re.findall(r"\bExchange hashpartitioning", txt))
            checks.append(
                (f"<= {want['max_exchanges']} key exchange(s), found {n_ex}",
                 n_ex <= want["max_exchanges"], True)
            )
        for pat in want.get("forbid", []):
            checks.append((f"no {pat} operator", pat not in txt, True))
        ok = all(got == exp for _, got, exp in checks)
        if not ok:
            failures.append(name)
        status = "OK" if ok else "FAIL"
        lines = "\n".join(
            f"- {'PASS' if got == exp else 'FAIL'}: {label}" for label, got, exp in checks
        )
        sections.append(f"## {name} — {status}\n\n{lines}\n\n```\n{txt.strip()}\n```\n")
        print(f"{status:4s}  {name}")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md"), "w") as fh:
        fh.write(
            "# EXPLAIN — physical-plan audit (generated by "
            "scripts/explain_audit.py)\n\nChecks: predicate pushdown reaches "
            "the parquet scan, column pruning (ReadSchema), broadcast joins "
            "for small dims, WholeStageCodegen coverage.\n\n"
            + "\n".join(sections)
        )
    print(f"{len(AUDIT) - len(failures)}/{len(AUDIT)} plans pass")
    spark.stop()


if __name__ == "__main__":
    main()
