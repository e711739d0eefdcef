"""Property test: asof_join vs a direct pandas as-of reference.

Random keyed left/right event sets (small domains force key collisions,
ts ties, NULL right values) — the Spark union+window plan must match the
per-row definition: for each left row, the right row of the same key
with the greatest ts <= left.ts (ties: the right row still counts),
taken WHOLESALE (NULL fields stay NULL, no cross-row mixing).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

keys = st.sampled_from(["a", "b", "c"])
ts_vals = st.integers(min_value=0, max_value=20)

left_rows = st.lists(
    st.tuples(keys, ts_vals), min_size=1, max_size=12, unique=True
)
right_rows = st.lists(
    st.tuples(keys, ts_vals, st.one_of(st.none(), st.integers(0, 99)), st.integers(0, 99)),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),  # one right row per (key, ts): the
    # winner at equal (key, ts) would otherwise be arbitrary on both sides
)


def _reference(lrows, rrows):
    out = {}
    for k, lts in lrows:
        best = None
        for rk, rts, a, b in rrows:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, a, b)
        out[(k, lts)] = (best[1], best[2]) if best else (None, None)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_pointwise_definition(spark, lrows, rrows):
    from cdm_cbioportal_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(lrows, "k string, ts long")
    right = spark.createDataFrame(rrows, "k string, ts long, a long, b long")
    got = {
        (r.k, r.ts): (r.asof_a, r.asof_b)
        for r in asof_join(left, right, on=["k"], ts_col="ts", right_cols=["a", "b"]).collect()
    }
    assert got == _reference(lrows, rrows)
