"""Property-based SQL front-end invariant: for ANY short sequence of
DML statements (INSERT / UPDATE / DELETE / CDC MERGE), the lake state
visible through SELECT equals a plain Python dict model executing the
same statements — the front-end adds no semantics of its own on top of
the exactly-once merge."""

from __future__ import annotations

import shutil

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeSession, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)

KEYS = [0, 1, 2, 3]

# ops: ('insert', [(k, v), ...]) | ('update', delta, key_threshold)
#    | ('delete', key_threshold) | ('merge', [(k, v|None=delete), ...])
op_strategy = st.one_of(
    st.tuples(
        st.just("insert"),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 9)),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("update"), st.integers(1, 5), st.sampled_from(KEYS)),
    st.tuples(st.just("delete"), st.sampled_from(KEYS)),
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(
                st.sampled_from(KEYS),
                st.one_of(st.none(), st.integers(0, 9)),
            ),
            min_size=1,
            max_size=3,
        ),
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=5))
def test_sql_dml_matches_dict_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("sqlprop") / "t")
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=2)
    ls = LakeSession(spark)
    ls.register("t", t)
    model: dict[int, int] = {}
    lsn = 100
    for op in ops:
        if op[0] == "insert":
            # INSERT dedups within-statement per key (latest unspecified
            # for dup keys in one statement) — keep keys unique per stmt
            rows = {k: v for k, v in op[1]}
            vals = ", ".join(f"({k}, {v})" for k, v in rows.items())
            ls.sql(f"INSERT INTO t VALUES {vals}")
            model.update(rows)
        elif op[0] == "update":
            _, delta, kt = op
            ls.sql(f"UPDATE t SET v = v + {delta} WHERE k <= {kt}")
            for k in list(model):
                if k <= kt:
                    model[k] += delta
        elif op[0] == "delete":
            _, kt = op
            ls.sql(f"DELETE FROM t WHERE k >= {kt}")
            model = {k: v for k, v in model.items() if k < kt}
        else:  # CDC merge with explicit LSNs
            rows = {k: v for k, v in op[1]}
            # DML statements (INSERT/UPDATE/DELETE above) take
            # applied_lsn + 1, so an interleaved WAL merge must keep its
            # LSNs above the table's watermark — the single-LSN-space
            # rule documented at LakeTable._dml_lsn.  A merge at or
            # below the watermark is (correctly) deduped.
            lsn = max(lsn, int(t.snapshot["ledger"]["applied_lsn"]) + 1)
            src = spark.createDataFrame(
                [
                    (k, v if v is not None else None,
                     lsn + i, "delete" if v is None else "update")
                    for i, (k, v) in enumerate(rows.items())
                ],
                "k long, v long, lsn long, op string",
            )
            lsn += len(rows)
            src.createOrReplaceTempView("wire")
            ls.sql(
                """
                MERGE INTO t USING wire AS s ON t.k = s.k
                WHEN MATCHED AND s.op = 'delete' THEN DELETE
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *
                """
            )
            for k, v in rows.items():
                if v is None:
                    model.pop(k, None)
                else:
                    model[k] = v
        got = {
            r.k: r.v for r in ls.sql("SELECT k, v FROM t").collect()
        }
        assert got == model, f"after {op}: {got} != {model}"
