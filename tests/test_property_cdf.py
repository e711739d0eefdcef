"""Property-based invariants for the change data feed and the
incremental view (SURVEY §5.4 style): for ANY event interleaving and ANY
snapshot pair, ``table_changes`` equals the brute-force diff of the two
resolved states, and a view refreshed from the feed equals the full
recompute.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import IncrementalAggView, LakeTable

BATCH = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("k", T.StringType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

# events: (op, key, group, value); small alphabets force collisions
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["update", "update", "delete"]),
        st.sampled_from(["a", "b", "c", "d"]),
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=2,
    max_size=14,
)


def _python_state(evs, upto):
    state = {}
    for lsn, (op, k, g, v) in enumerate(evs):
        if lsn >= upto:
            break
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = (g, v, lsn)
    return state


def _python_diff(sa, sb):
    out = {}
    for k in set(sa) | set(sb):
        if k not in sa:
            g, v, lsn = sb[k]
            out[k] = ("insert", g, v, lsn)
        elif k not in sb:
            g, v, lsn = sa[k]
            out[k] = ("delete", g, v, lsn)
        elif sa[k][2] != sb[k][2]:
            g, v, lsn = sb[k]
            out[k] = ("update", g, v, lsn)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=events_strategy,
    cut1=st.integers(min_value=0, max_value=14),
    cut2=st.integers(min_value=1, max_value=14),
    mode=st.sampled_from(["cow", "mor"]),
)
def test_table_changes_equals_bruteforce_diff(
    spark, tmp_path_factory, evs, cut1, cut2, mode
):
    n = len(evs)
    cut1, cut2 = min(cut1, n), min(cut2, n)
    if cut1 > cut2:
        cut1, cut2 = cut2, cut1
    rows = [(i, op, k, g, v) for i, (op, k, g, v) in enumerate(evs)]
    root = str(tmp_path_factory.mktemp("cdfp")) + "/t"
    table = LakeTable.create(
        spark, root,
        T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("g", T.StringType()),
                T.StructField("v", T.LongType()),
            ]
        ),
        key_cols=["k"], n_buckets=2, properties={"merge_mode": mode},
    )

    def _apply(lo, hi):
        if hi > lo:
            table.merge(spark.createDataFrame(rows[lo:hi], BATCH))

    _apply(0, cut1)
    v_a = table.snapshot["version"]
    _apply(cut1, cut2)
    v_b = table.snapshot["version"]
    _apply(cut2, n)

    got = {
        r.k: (r._change_type, r.g, r.v, r._lsn)
        for r in table.table_changes(v_a, v_b).collect()
    }
    want = _python_diff(_python_state(evs, cut1), _python_state(evs, cut2))
    assert got == want, (mode, cut1, cut2)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=events_strategy,
    cuts=st.lists(st.integers(min_value=1, max_value=14), max_size=3),
)
def test_view_refresh_equals_recompute_at_every_cut(
    spark, tmp_path_factory, evs, cuts
):
    n = len(evs)
    rows = [(i, op, k, g, v) for i, (op, k, g, v) in enumerate(evs)]
    base = str(tmp_path_factory.mktemp("ivp"))
    src = LakeTable.create(
        spark, base + "/s",
        T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("g", T.StringType()),
                T.StructField("v", T.LongType()),
            ]
        ),
        key_cols=["k"], n_buckets=2,
    )
    view = IncrementalAggView.create(spark, base + "/v", src, ["g"], ["v"])
    lo = 0
    for cut in sorted({min(c, n) for c in cuts} | {n}):
        if cut > lo:
            src.merge(spark.createDataFrame(rows[lo:cut], BATCH))
            lo = cut
        view.refresh(src)
        want = {
            (r.g, r.cnt, r.sum_v)
            for r in src.read()
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
            .collect()
        }
        got = {(r.g, r.cnt, r.sum_v) for r in view.read().collect()}
        assert got == want, cut
