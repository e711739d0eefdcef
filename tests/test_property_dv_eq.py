"""Property-based invariant over the FULL delete taxonomy: ANY
interleaving of merge batches (each in an arbitrary physical mode —
cow / mor / dv) and equality-delete commits converges to the same state
a brute-force Python fold computes.

This is the cross-mode composition surface round 4 added (positional
kills + lazy equality kills + delta folds all coexisting in one table's
history); the per-mode behaviors are unit-tested in test_dv_merge.py /
test_eq_delete.py — here hypothesis drives the interleaving space.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
    ]
)

# a step is either a merge batch of (op, key, value) events in a chosen
# physical mode, or an equality-delete of a key subset
step_strategy = st.one_of(
    st.tuples(
        st.just("merge"),
        st.sampled_from(["cow", "mor", "dv"]),
        st.lists(
            st.tuples(
                st.sampled_from(["update", "delete"]),
                st.sampled_from(["a", "b", "c", "d"]),
                st.text(alphabet="xy", min_size=0, max_size=2),
            ),
            min_size=1,
            max_size=5,
        ),
    ),
    st.tuples(
        st.just("eqdel"),
        st.just(None),
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=3),
    ),
)


def python_oracle(steps):
    state: dict = {}
    lsn = -1
    for kind, _mode, payload in steps:
        if kind == "merge":
            for op, k, v in payload:
                lsn += 1
                if op == "delete":
                    state.pop(k, None)
                else:
                    state[k] = v
        else:
            # equality delete at the next LSN: kills current versions
            lsn += 1
            for k in set(payload):
                state.pop(k, None)
    return {(k, v) for k, v in state.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=st.lists(step_strategy, min_size=1, max_size=5))
def test_mixed_mode_history_converges(spark, tmp_path_factory, steps):
    root = str(tmp_path_factory.mktemp("propdveq")) + "/t"
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], n_buckets=2)
    lsn = -1
    pending_mor = False
    for kind, mode, payload in steps:
        if kind == "merge":
            rows = []
            for op, k, v in payload:
                lsn += 1
                rows.append((lsn, op, k, v))
            df = spark.createDataFrame(
                rows, "lsn long, op string, k string, v string"
            )
            if mode == "dv" and pending_mor:
                # documented composition rule: dv merges refuse buckets
                # holding MOR delta files — fold first
                table.compact(max_files_per_bucket=0)
                pending_mor = False
            table.merge(df, mode=mode)
            if mode == "mor":
                pending_mor = True
        else:
            lsn += 1  # delete_keys takes the next LSN — mirror it
            keys_df = spark.createDataFrame(
                [(k,) for k in set(payload)], "k string"
            )
            got_lsn = table.delete_keys(keys_df)
            assert got_lsn == lsn
    got = {
        (r["k"], r["v"]) for r in table.read().select("k", "v").collect()
    }
    assert got == python_oracle(steps)
    # and the state survives a full materialization (compact folds MOR
    # deltas, dv kills, and eq entries together)
    table.compact(max_files_per_bucket=0)
    got2 = {
        (r["k"], r["v"]) for r in table.read().select("k", "v").collect()
    }
    assert got2 == python_oracle(steps)
