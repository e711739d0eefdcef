"""Property: ANY interleaving of merges, renames, drops, and re-adds
converges to the same state a plain Python fold computes over the
LOGICAL field identities — i.e. column mapping never leaks dropped data,
never loses renamed data, and never disturbs exactly-once replay.

The oracle tracks fields by identity (slot index), mirroring the field-id
semantics: a rename moves the label, a drop erases the slot's visibility,
a re-add opens a FRESH slot under the recycled label.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

# actions: ("merge", [(k, v)]) / ("rename",) / ("drop",) / ("readd",)
# one mutable non-key column keeps the oracle tractable while still
# exercising every projection path (the column's label cycles v -> w).
action_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("merge"),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=3),
                    st.text(alphabet="pq", min_size=0, max_size=2),
                ),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(st.just("rename")),
        st.tuples(st.just("drop")),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(actions=action_strategy, mode=st.sampled_from(["cow", "mor"]))
def test_mapping_interleavings_match_identity_fold(
    spark, tmp_path_factory, actions, mode
):
    root = str(tmp_path_factory.mktemp("propcm")) + "/t"
    props = {"merge_mode": "mor"} if mode == "mor" else None
    table = LakeTable.create(
        spark,
        root,
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
        key_cols=["k"],
        n_buckets=2,
        properties=props,
    )
    # oracle state: key -> (value, lsn); label = current logical name of
    # the live value column (None = dropped, nothing visible)
    state: dict[int, tuple[str, int]] = {}
    label: str | None = "v"
    labels = ["v", "w"]
    lsn = 0
    for act in actions:
        if act[0] == "merge":
            if label is None:
                # column dropped: re-add under the next label first (a
                # producer must ship SOME payload column)
                label = labels[(labels.index(last_label) + 1) % 2]
                table.evolve_schema(
                    T.StructType(
                        list(table.schema.fields)
                        + [T.StructField(label, T.StringType())]
                    )
                )
                state = {k: (None, l) for k, (v, l) in state.items()}
            rows = []
            for k, v in act[1]:
                lsn += 1
                rows.append((k, v, lsn, "upsert"))
                state[k] = (v, lsn)
            table.merge(
                spark.createDataFrame(
                    rows, f"k long, {label} string, lsn long, op string"
                )
            )
        elif act[0] == "rename":
            if label is None:
                continue
            new = labels[(labels.index(label) + 1) % 2]
            table.rename_column(label, new)
            label = new
        else:  # drop
            if label is None:
                continue
            last_label = label
            table.drop_column(label)
            label = None
    got = {
        tuple(r[c] for c in table.read().columns): None
        for r in table.read().collect()
    }
    if label is None:
        expect = {(k,): None for k in state}
        assert set(got) == set(expect)
    else:
        expect = {(k, v): None for k, (v, _) in state.items()}
        assert set(got) == set(expect), (
            f"mode={mode} label={label} got={sorted(got)} "
            f"expect={sorted(expect)}"
        )
