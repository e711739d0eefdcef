"""Multi-table atomic transactions (lake/txn.py): a LakeCatalog pins
every table at one catalog version; a transaction's N per-table merges
publish as ONE atomic catalog commit — cross-table snapshot isolation,
cross-table time travel, crash-converge exactly-once, CAS concurrency.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import (
    CatalogConflictError,
    LakeCatalog,
    LakeTable,
)


def _mk(spark, tmp_path, name, cols):
    schema = T.StructType(
        [T.StructField("k", T.LongType())]
        + [T.StructField(c, T.StringType()) for c in cols]
    )
    return LakeTable.create(
        spark, str(tmp_path / name), schema, ["k"], n_buckets=4
    )


def _b(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, lsn long, op string")


def _state(df):
    return {r["k"]: r["v"] for r in df.collect()}


@pytest.fixture()
def cat(spark, tmp_path):
    a = _mk(spark, tmp_path, "a", ["v"])
    b = _mk(spark, tmp_path, "b", ["v"])
    c = LakeCatalog.create(spark, str(tmp_path / "cat"))
    c.attach("a", a)
    c.attach("b", b)
    return c


def test_txn_publishes_all_pins_atomically(spark, cat):
    txn = cat.transaction()
    txn.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    # mid-transaction: table head moved, catalog reader still sees empty
    assert _state(cat.read("a")) == {}
    txn.merge("b", _b(spark, [(1, "b1", 1, "upsert")]))
    v = txn.commit()
    assert _state(cat.read("a")) == {1: "a1"}
    assert _state(cat.read("b")) == {1: "b1"}
    assert cat.version == v
    # a second publish from the same txn object is refused
    with pytest.raises(RuntimeError, match="already published"):
        txn.commit()


def test_cross_table_time_travel(spark, cat):
    t1 = cat.transaction()
    t1.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    t1.merge("b", _b(spark, [(1, "b1", 1, "upsert")]))
    v1 = t1.commit()
    t2 = cat.transaction()
    t2.merge("a", _b(spark, [(1, "a2", 2, "upsert")]))
    t2.merge("b", _b(spark, [(2, "b2", 2, "upsert")]))
    t2.commit()
    # catalog_version pins BOTH tables to the same consistent cut
    assert _state(cat.read("a", catalog_version=v1)) == {1: "a1"}
    assert _state(cat.read("b", catalog_version=v1)) == {1: "b1"}
    assert _state(cat.read("a")) == {1: "a2"}
    assert _state(cat.read("b")) == {1: "b1", 2: "b2"}
    ops = [r["operation"] for r in cat.history().collect()]
    assert ops.count("txn") == 2 and ops[-1] == "create"


def test_crash_before_publish_then_retry_converges(spark, cat):
    batch_a = _b(spark, [(1, "a1", 1, "upsert")])
    batch_b = _b(spark, [(1, "b1", 1, "upsert")])
    # attempt 1 "crashes" after merging a, before publishing
    t1 = cat.transaction()
    t1.merge("a", batch_a)
    del t1  # no commit — the crash
    # catalog readers see NO torn state: both tables still empty
    assert _state(cat.read("a")) == {} and _state(cat.read("b")) == {}
    # retry re-runs the SAME logical transaction: a's merge no-ops via
    # the LSN ledger, b's applies, one publish pins both
    t2 = cat.transaction()
    s = t2.merge("a", batch_a)
    assert s.batch_keys == 0  # ledger filtered the redelivery
    t2.merge("b", batch_b)
    t2.commit()
    assert _state(cat.read("a")) == {1: "a1"}
    assert _state(cat.read("b")) == {1: "b1"}


def test_concurrent_disjoint_txns_both_survive(spark, cat):
    # two transactions from the SAME base, touching disjoint tables
    t1 = cat.transaction()
    t2 = cat.transaction()
    t1.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    t2.merge("b", _b(spark, [(1, "b1", 1, "upsert")]))
    t1.commit()
    t2.commit()  # CAS-loses once, retries on the new base internally
    assert _state(cat.read("a")) == {1: "a1"}
    assert _state(cat.read("b")) == {1: "b1"}
    pins = cat.pins()
    assert set(pins) == {"a", "b"}


def test_conflict_raises_when_pointer_never_moves(spark, cat):
    import os

    # simulate a crashed publisher's remnant token at the current base
    token = os.path.join(
        cat._meta, "txn", f"main-{cat.version}"
    )
    os.makedirs(os.path.dirname(token), exist_ok=True)
    open(token, "w").close()
    t = cat.transaction()
    t.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    with pytest.raises(CatalogConflictError, match="remnant"):
        t.commit()


def test_run_covers_non_merge_mutations(spark, cat):
    t0 = cat.transaction()
    t0.merge("a", _b(spark, [(1, "a1", 1, "upsert"), (2, "a2", 2, "upsert")]))
    t0.commit()
    t = cat.transaction()
    t.run("a", lambda tbl: tbl.delete_where("k = 2"))
    assert _state(cat.read("a")) == {1: "a1", 2: "a2"}  # not yet published
    t.commit()
    assert _state(cat.read("a")) == {1: "a1"}


def test_attach_detach_and_unknown_names(spark, cat, tmp_path):
    with pytest.raises(ValueError, match="not in catalog"):
        cat.read("zzz")
    with pytest.raises(ValueError, match="not in catalog"):
        cat.detach("zzz")
    c2 = _mk(spark, tmp_path, "c2", ["v"])
    cat.attach("c2", c2)
    assert "c2" in cat.pins()
    cat.detach("c2")
    assert "c2" not in cat.pins()
    # a txn that touched a table detached mid-flight fails loudly
    cat.attach("c3", c2)
    t = cat.transaction()
    t.merge("c3", _b(spark, [(1, "x", 1, "upsert")]))
    cat.detach("c3")
    with pytest.raises(ValueError, match="detached"):
        t.commit()


def test_router_fanout_publishes_atomically(spark, tmp_path):
    from tests.test_router import ORDERS, USERS, WIRE
    from cdm_cbioportal_etl_spark.cdc import WalRouter

    users = LakeTable.create(
        spark, str(tmp_path / "users"), USERS, ["uid"], n_buckets=4
    )
    orders = LakeTable.create(
        spark, str(tmp_path / "orders"), ORDERS, ["oid"], n_buckets=4
    )
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.attach("users", users)
    cat.attach("orders", orders)
    raw = spark.createDataFrame([(v,) for v in WIRE], ["value"])
    router = WalRouter(
        spark, {"users": users, "orders": orders}, catalog=cat
    )
    v0 = cat.version
    stats, dlq = router.apply_wire_batch(raw, batch_id="wire-1")
    assert cat.version == v0 + 1  # ONE catalog commit for the whole fan-out
    assert {tuple(r) for r in cat.read("users").collect()} == {(1, "anne")}
    assert {tuple(r) for r in cat.read("orders").collect()} == {(11, 1, 7.5)}
    # redelivery: ledgers no-op, but the publish still lands (pins equal)
    pins = cat.pins()
    router.apply_wire_batch(raw, batch_id="wire-1")
    assert cat.pins() == pins  # heads unchanged => same pins republished
    # unattached table fails construction
    with pytest.raises(ValueError, match="not attached"):
        WalRouter(spark, {"users": users, "ghost": orders}, catalog=cat)


def test_catalog_create_exists_and_reopen(spark, tmp_path, cat):
    with pytest.raises(ValueError, match="already exists"):
        LakeCatalog.create(spark, cat.root)
    assert LakeCatalog.exists(cat.root)
    t = cat.transaction()
    t.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    t.commit()
    # a fresh handle on the same root resolves tables + pins from disk
    reopened = LakeCatalog(spark, cat.root)
    assert reopened.pins() == cat.pins()
    assert _state(reopened.read("a")) == {1: "a1"}
    pins_json = json.loads(
        reopened.history().collect()[0]["pins"]
    )
    assert set(pins_json) == {"a", "b"}


def test_catalog_expire_protects_pinned_cuts(spark, cat):
    # five published cuts, each changing both tables
    cuts = []
    for i in range(5):
        t = cat.transaction()
        t.merge("a", _b(spark, [(1, f"a{i}", i + 1, "upsert")]))
        t.merge("b", _b(spark, [(1, f"b{i}", i + 1, "upsert")]))
        cuts.append(t.commit())
    stats = cat.expire(keep_last=2, table_keep_last=1)
    assert stats["catalog_commits_removed"] > 0
    # the two retained cuts stay readable as CONSISTENT cross-table pairs
    for v, i in [(cuts[-1], 4), (cuts[-2], 3)]:
        assert _state(cat.read("a", catalog_version=v)) == {1: f"a{i}"}
        assert _state(cat.read("b", catalog_version=v)) == {1: f"b{i}"}
    # expired cuts are gone from both the catalog and table history
    with pytest.raises(ValueError, match="no catalog version"):
        cat.read("a", catalog_version=cuts[0])
    # table-level time travel to an unpinned old version is expired too
    import os
    snaps = [
        f for f in os.listdir(os.path.join(cat.table("a").root, "_meta"))
        if f.startswith("snap-")
    ]
    # 1 genesis-era + pinned(2) + head lookback — strictly fewer than the
    # 6 manifests the un-expired history held
    assert len(snaps) < 6
    # history() walks only the retained chain without raising
    assert cat.history().count() == 2
    # vacuum after expire keeps every retained cut's files alive
    cat.table("a").vacuum()
    cat.table("b").vacuum()
    assert _state(cat.read("a", catalog_version=cuts[-2])) == {1: "a3"}
    assert _state(cat.read("b", catalog_version=cuts[-2])) == {1: "b3"}


def test_catalog_tags_and_timestamp_resolution(spark, cat):
    import time

    cuts = []
    for i in range(4):
        t = cat.transaction()
        t.merge("a", _b(spark, [(1, f"a{i}", i + 1, "upsert")]))
        t.merge("b", _b(spark, [(1, f"b{i}", i + 1, "upsert")]))
        cuts.append(t.commit())
    cat.tag("release", cuts[1])
    # tagged reads resolve both tables to the SAME named cut
    assert _state(cat.read("a", tag="release")) == {1: "a1"}
    assert _state(cat.read("b", tag="release")) == {1: "b1"}
    # tags are immutable; duplicates refused
    with pytest.raises(ValueError, match="immutable"):
        cat.tag("release", cuts[2])
    # TIMESTAMP AS OF across the whole catalog
    ts = cat.snapshot_at(cuts[2])["committed_at"]
    assert cat.version_at(ts) == cuts[2]
    assert cat.version_at(time.time() + 60) == cat.version
    with pytest.raises(ValueError, match="no retained"):
        cat.version_at(0.0)
    # expire keeps the tagged cut readable even though it is old
    cat.expire(keep_last=1, table_keep_last=1)
    assert _state(cat.read("a", tag="release")) == {1: "a1"}
    assert _state(cat.read("b", tag="release")) == {1: "b1"}
    with pytest.raises(ValueError, match="no catalog version"):
        cat.read("a", catalog_version=cuts[0])  # untagged old cut is gone
    # untag then expire reclaims it
    cat.untag("release")
    assert cat.tags() == {}
    cat.expire(keep_last=1)
    with pytest.raises(ValueError, match="no catalog version"):
        cat.read("a", catalog_version=cuts[1])
    with pytest.raises(ValueError, match="no tag"):
        cat.read("a", tag="release")
    with pytest.raises(ValueError, match="not both"):
        cat.read("a", catalog_version=1, tag="x")


def test_threaded_publishers_serialize(spark, cat):
    """4 threads x 4 transactions each, all over the same two tables:
    every publish must survive (CAS auto-retry), catalog versions must
    be strictly serialized (one per committed txn), and the final table
    state must be LINEARIZABLE — equal to replaying the batches in the
    order the commit log actually recorded, under the engine's global
    LSN-watermark rule (a later-committed lower-LSN batch is filtered
    as already-covered: one WAL, one total order per table).  Before
    the same-handle mutate lock, this test caught a real lost-update: a
    merge prepared against a snapshot another thread replaced mid-
    flight committed WITHOUT a CAS conflict, silently dropping the
    racer's files."""
    import threading

    n_threads, n_txns = 4, 4
    errs: list[BaseException] = []
    v0 = cat.version
    rows = {
        (tid, j): (tid, f"a-{tid}-{j}", tid * 100 + j + 1)
        for tid in range(n_threads)
        for j in range(n_txns)
    }

    def work(tid: int) -> None:
        try:
            for j in range(n_txns):
                k, v, lsn = rows[(tid, j)]
                t = cat.transaction()
                t.merge("a", _b(spark, [(k, v, lsn, "upsert")]),
                        batch_id=f"stress-{tid}-{j}")
                t.commit(max_retries=64)
        except BaseException as e:  # surfaced after join
            errs.append(e)

    threads = [
        threading.Thread(target=work, args=(i,)) for i in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    cat.refresh()
    # one catalog version per committed transaction, no lost publishes
    assert cat.version == v0 + n_threads * n_txns
    # linearizability: fold the batches in RECORDED commit order under
    # the watermark rule; the table must equal that fold exactly
    # a merge whose every row the watermark filtered commits NOTHING
    # (no snapshot, no lineage) — so the recorded log is exactly the
    # batches that applied, and their LSNs must be strictly increasing
    # (each commit raised the watermark past the previous one)
    log = [
        r["batch_id"]
        for r in cat.table("a").history().collect()
        if r["batch_id"].startswith("stress-")
    ]
    assert log, "no stress batch ever committed"
    applied, expect = -1, {}
    for bid in log:
        _, tid, j = bid.split("-")
        k, v, lsn = rows[(int(tid), int(j))]
        assert lsn > applied, f"non-monotone commit log: {log}"
        expect[k] = v
        applied = lsn
    assert _state(cat.read("a")) == expect


def test_catalog_clone_forks_whole_pipeline(spark, cat, tmp_path):
    import shutil as _sh

    t1 = cat.transaction()
    t1.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    t1.merge("b", _b(spark, [(1, "b1", 1, "upsert")]))
    v1 = t1.commit()
    t2 = cat.transaction()
    t2.merge("a", _b(spark, [(1, "a2", 2, "upsert")]))
    t2.commit()
    # shallow fork at the OLDER cut: both members pinned consistently
    fork = cat.clone(str(tmp_path / "fork"), catalog_version=v1)
    assert _state(fork.read("a")) == {1: "a1"}
    assert _state(fork.read("b")) == {1: "b1"}
    # fork diverges; source untouched — and vice versa
    ft = fork.transaction()
    ft.merge("a", _b(spark, [(9, "fork-only", 3, "upsert")]))
    ft.commit()
    assert _state(fork.read("a")) == {1: "a1", 9: "fork-only"}
    assert _state(cat.read("a")) == {1: "a2"}
    # ledger carried: redelivering lsn<=1 into the fork is a no-op
    s = fork.transaction().merge("b", _b(spark, [(1, "b1", 1, "upsert")]))
    assert s.batch_keys == 0
    # deep fork survives source retirement wholesale
    deep = cat.clone(str(tmp_path / "deep"), mode="deep")
    for n in ("a", "b"):
        _sh.rmtree(cat.table(n).root)
    assert _state(deep.read("a")) == {1: "a2"}
    assert _state(deep.read("b")) == {1: "b1"}
    # dest collision + bad args fail loudly
    with pytest.raises(ValueError, match="already exists"):
        cat.clone(str(tmp_path / "deep"))
    with pytest.raises(ValueError, match="no tag"):
        cat.clone(str(tmp_path / "x"), tag="ghost")


def test_datasource_reads_through_catalog_pins(spark, cat):
    from cdm_cbioportal_etl_spark.lake import register_lake_datasource

    register_lake_datasource(spark)
    t1 = cat.transaction()
    t1.merge("a", _b(spark, [(1, "a1", 1, "upsert")]))
    v1 = t1.commit()
    cat.tag("rel", v1)
    t2 = cat.transaction()
    t2.merge("a", _b(spark, [(1, "a2", 2, "upsert")]))
    t2.commit()
    # head handle has moved PAST the publish? no — but mid-txn state
    # must be invisible: advance the table head WITHOUT publishing
    t3 = cat.transaction()
    t3.merge("a", _b(spark, [(1, "a3", 3, "upsert")]))  # unpublished

    def rd(**opts):
        r = spark.read.format("laketable").option("catalog", cat.root) \
            .option("table", "a")
        for k, v in opts.items():
            r = r.option(k, v)
        return {x["k"]: x["v"] for x in r.load().collect()}

    assert rd() == {1: "a2"}  # catalog head, NOT the unpublished head
    assert rd(catalog_version=v1) == {1: "a1"}
    assert rd(catalog_tag="rel") == {1: "a1"}
    t3.commit()
    assert rd() == {1: "a3"}
    import pytest as _pt

    with _pt.raises(Exception, match="no catalog tag"):
        rd(catalog_tag="ghost")
    with _pt.raises(Exception, match="not in catalog"):
        spark.read.format("laketable").option("catalog", cat.root) \
            .option("table", "zzz").load().collect()
