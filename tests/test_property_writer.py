"""Property: ANY event history appended through the DataSource writer
(arbitrary batch splits, duplicate deliveries across batches) reaches
the same final state as merge(mode="mor") of the full history — i.e.
the distributed blind append and the reduced merge are observationally
equivalent under the latest-LSN fold."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.lake.datasource import register

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
    ]
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["update", "delete"]),
        st.sampled_from(["a", "b", "c", "d"]),
        st.text(alphabet="xyz", min_size=0, max_size=3),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=events_strategy, cut=st.integers(min_value=1, max_value=10))
def test_writer_append_equals_mor_merge(spark, tmp_path_factory, evs, cut):
    register(spark)
    rows = [(i, op, k, v) for i, (op, k, v) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "lsn long, op string, k string, v string"
    )
    base = str(tmp_path_factory.mktemp("propw"))
    t = LakeTable.create(
        spark, base + "/w", SCHEMA, key_cols=["k"], n_buckets=4
    )
    ref = LakeTable.create(
        spark, base + "/ref", SCHEMA, key_cols=["k"], n_buckets=4
    )
    cut = min(cut, len(rows))
    b1 = df.filter(F.col("lsn") < cut)
    # second batch redelivers the last event of b1 (ledger pre-filter
    # must drop it) plus the remainder
    b2 = df.filter(F.col("lsn") >= max(0, cut - 1))
    for b in (b1, b2):
        if b.count():
            b.write.format("laketable").option("path", t.root).mode(
                "append"
            ).save()
            t.refresh()
    ref.merge(df, mode="mor", batch_id="oracle")
    assert sorted(tuple(r) for r in t.read().collect()) == sorted(
        tuple(r) for r in ref.read().collect()
    )
