"""Property-based CDC invariant (SURVEY §5.4): ANY interleaving of
update/delete events, with duplicate deliveries and arbitrary batch
splits, converges to the max-LSN state per key."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
    ]
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["update", "delete"]),
        st.sampled_from(["a", "b", "c"]),
        st.text(alphabet="xyz", min_size=0, max_size=3),
    ),
    min_size=1,
    max_size=12,
)


def python_oracle(evs):
    state = {}
    for lsn, (op, k, v) in enumerate(evs):
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = (v, lsn)
    return {(k, v) for k, (v, _) in state.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=events_strategy, cut=st.integers(min_value=1, max_value=12))
def test_replay_converges_to_max_lsn_state(spark, tmp_path_factory, evs, cut):
    rows = [(i, op, k, v) for i, (op, k, v) in enumerate(evs)]
    df = spark.createDataFrame(rows, SCHEMA)
    root = str(tmp_path_factory.mktemp("prop")) + "/t"
    table = LakeTable.create(
        spark, root,
        T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]),
        key_cols=["k"], n_buckets=4,
    )
    # arbitrary batch split point; second batch redelivers one event (dup)
    cut = min(cut, len(rows))
    b1 = df.filter(F.col("lsn") < cut)
    b2 = df.filter(F.col("lsn") >= max(cut - 1, 0))  # overlap = redelivery
    if cut > 0:
        table.merge(b1, count_batch=False)
    table.merge(b2, count_batch=False)
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == python_oracle(evs)
    table.drop()
