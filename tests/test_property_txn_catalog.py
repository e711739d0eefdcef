"""Model-based property test for the multi-table catalog (lake/txn.py):
random interleavings of transactional merges, tags, and coordinated
expire, checked after EVERY operation against a pure-Python model of
pins and table states.  The invariants the deterministic suite asserts
pointwise — cross-table snapshot isolation, watermark folding, tag
immortality through expire — must hold on arbitrary histories too."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeCatalog, LakeTable

NAMES = ("a", "b")

# each op: ("txn", subset-mask, key) | ("tag",) | ("expire", keep_last)
op_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("txn"),
            st.integers(min_value=1, max_value=3),  # bitmask over (a, b)
            st.integers(min_value=0, max_value=2),
        ),
        st.tuples(st.just("tag")),
        st.tuples(st.just("expire"), st.integers(min_value=1, max_value=2)),
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=op_strategy)
def test_catalog_histories_match_model(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("propcat")
    cat = LakeCatalog.create(spark, str(root / "cat"))
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    for n in NAMES:
        cat.attach(
            n,
            LakeTable.create(
                spark, str(root / n), schema, ["k"], n_buckets=2
            ),
        )

    # model: per-table published state + per-catalog-version cuts
    heads = {n: {} for n in NAMES}          # table head (post-merge)
    published = {n: {} for n in NAMES}      # what the catalog head shows
    cuts = {cat.version: {n: {} for n in NAMES}}  # catalog_version -> states
    tags: dict[str, int] = {}
    lsn = 0
    tag_i = 0

    def read(n, v=None):
        df = cat.read(n) if v is None else cat.read(n, catalog_version=v)
        return {r["k"]: r["v"] for r in df.collect()}

    for op in ops:
        if op[0] == "txn":
            _, mask, key = op
            lsn += 1
            t = cat.transaction()
            touched = [n for i, n in enumerate(NAMES) if mask & (1 << i)]
            for n in touched:
                t.merge(
                    n,
                    spark.createDataFrame(
                        [(key, f"{n}-{lsn}", lsn, "upsert")],
                        "k long, v string, lsn long, op string",
                    ),
                )
                heads[n] = {**heads[n], key: f"{n}-{lsn}"}
            v = t.commit()
            for n in touched:
                published[n] = dict(heads[n])
            cuts[v] = {n: dict(published[n]) for n in NAMES}
        elif op[0] == "tag":
            tags[f"t{tag_i}"] = cat.version
            cat.tag(f"t{tag_i}")
            # the tag publish itself is a new catalog version, same pins
            cuts[cat.version] = {n: dict(published[n]) for n in NAMES}
            tag_i += 1
        else:  # expire
            keep = op[1]
            cat.expire(keep_last=keep, table_keep_last=1)
            retained = set()
            v = cat.version
            chain = []
            while v is not None and len(chain) < keep:
                try:
                    s = cat.snapshot_at(v)
                except ValueError:
                    break  # older ancestry reclaimed by an earlier expire
                chain.append(v)
                v = s.get("parent")
            retained.update(chain)
            retained.update(tags.values())
            cuts.update({k: cuts[k] for k in list(cuts)})
            for k in list(cuts):
                if k not in retained:
                    del cuts[k]
        # invariants after EVERY op:
        # 1) catalog head reads = last published state per table
        for n in NAMES:
            assert read(n) == published[n], f"head divergence on {n}"
        # 2) every retained cut reads as its recorded consistent pair
        for v, states in cuts.items():
            for n in NAMES:
                assert read(n, v) == states[n], (
                    f"cut {v} table {n} diverged"
                )
        # 3) every tag resolves to its recorded cut
        for name, v in tags.items():
            if v in cuts:
                for n in NAMES:
                    got = {
                        r["k"]: r["v"]
                        for r in cat.read(n, tag=name).collect()
                    }
                    assert got == cuts[v][n]
