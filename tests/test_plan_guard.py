"""Plan-regression guard: no catalog query may acquire a quadratic join
(CartesianProduct / BroadcastNestedLoopJoin) outside the whitelisted
exact baselines and scalar cross joins.  Runs over the full catalog at
sf0.001 — plan construction only, no execution (replay queries, which
execute during construction, are audited separately)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from explain_audit import (  # noqa: E402
    CARTESIAN_WHITELIST,
    scan_quadratic_joins,
)

SF_DIR = "/root/testdata/sf0.001"


def test_no_rogue_quadratic_joins(spark):
    bad = scan_quadratic_joins(spark, SF_DIR)
    rogue = {n: ops for n, ops in bad.items() if n not in CARTESIAN_WHITELIST}
    assert not rogue, (
        f"quadratic join operators appeared in non-whitelisted plans: {rogue} "
        "— either fix the plan (broadcast a key join, bucket the self-join) "
        "or, if this is a new documented exact baseline, whitelist it in "
        "scripts/explain_audit.py with a reason"
    )
    # keep the whitelist honest: an entry that no longer plans a
    # quadratic operator should be removed
    stale = CARTESIAN_WHITELIST - set(bad)
    assert not stale, f"whitelist entries no longer quadratic: {sorted(stale)}"
