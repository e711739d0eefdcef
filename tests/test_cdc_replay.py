"""North-rule invariants: replay(events) == directly-computed final state,
per-row sha256(content) equality; idempotent re-replay; crash/resume;
out-of-order + duplicate delivery; schema evolution mid-stream."""

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.cdc import (
    REPOS_SCHEMA,
    CdcReplayer,
    SchemaRegistry,
    expected_final_state,
    gen_change_events,
)
from cdm_cbioportal_etl_spark.lake import LakeTable

N_EVENTS = 5000


@pytest.fixture(scope="module")
def events(spark):
    return gen_change_events(spark, N_EVENTS, n_repos=40, paths_per_repo=20).cache()


def _state_fingerprint(df):
    """Order-insensitive table fingerprint incl. per-row sha256(content)."""
    row_hash = F.sha2(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in
              ["repo", "path", "commit", "lang"]],
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256),
        ),
        256,
    )
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.conv(F.substring(row_hash, 1, 15), 16, 10).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (r["n"], str(r["h"]))


def test_generator_deterministic(spark):
    a = gen_change_events(spark, 500).orderBy("lsn").collect()
    b = gen_change_events(spark, 500).orderBy("lsn").collect()
    assert a == b
    ops = {r.op for r in a}
    assert ops == {"insert", "update", "delete"}
    # deletes carry null payloads
    assert all(r.content is None for r in a if r.op == "delete")


def test_generator_skew(spark):
    ev = gen_change_events(spark, 5000, n_repos=40)
    top = (
        ev.groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()[0]["count"]
    )
    assert top > 5000 / 40 * 3  # hot repo well above uniform share


def test_replay_matches_batch_state(spark, tmp_path, events):
    t = LakeTable.create(spark, str(tmp_path / "t"), REPOS_SCHEMA, ["repo", "path"], 16)
    CdcReplayer(t).replay_range_batches(events, 0, N_EVENTS, batch_size=1000)
    got = _state_fingerprint(t.read())
    want = _state_fingerprint(expected_final_state(events, ["repo", "path"]))
    assert got == want and got[0] > 0


def test_replay_twice_is_noop(spark, tmp_path, events):
    t = LakeTable.create(spark, str(tmp_path / "t"), REPOS_SCHEMA, ["repo", "path"], 16)
    r1 = CdcReplayer(t).replay_range_batches(events, 0, N_EVENTS, 1000)
    fp1 = _state_fingerprint(t.read())
    v1 = t.snapshot["version"]
    r2 = CdcReplayer(t).replay_range_batches(events, 0, N_EVENTS, 1000)
    assert r2.batches_skipped > 0 or all(s.batch_keys == 0 for s in r2.stats)
    assert _state_fingerprint(t.read()) == fp1
    assert t.snapshot["version"] == v1


def test_crash_resume_equivalence(spark, tmp_path, events):
    # full run
    t_full = LakeTable.create(spark, str(tmp_path / "full"), REPOS_SCHEMA, ["repo", "path"], 16)
    CdcReplayer(t_full).replay_range_batches(events, 0, N_EVENTS, 1000)
    # crashed run: stops after 2 batches, then resume() from the ledger
    t_cr = LakeTable.create(spark, str(tmp_path / "cr"), REPOS_SCHEMA, ["repo", "path"], 16)
    CdcReplayer(t_cr).replay_range_batches(events, 0, 2000, 1000)
    reopened = LakeTable(spark, t_cr.root)  # fresh handle, reads ledger from disk
    rep = CdcReplayer(reopened).resume(events, N_EVENTS, 1000)
    assert rep.batches_applied == 3
    assert _state_fingerprint(reopened.read()) == _state_fingerprint(t_full.read())
    # lineage carries per-batch LSN ranges + counts
    lin = reopened.snapshot["lineage"]
    assert all("lsn_range" in rec and "batch_rows" in rec for rec in lin)


def test_duplicate_lsn_delivery(spark, tmp_path, events):
    # at-least-once: duplicate a slice of the WAL; state must be unchanged
    t = LakeTable.create(spark, str(tmp_path / "t"), REPOS_SCHEMA, ["repo", "path"], 16)
    dup = events.union(events.filter(F.col("lsn") < 1500))
    CdcReplayer(t).replay_range_batches(dup, 0, N_EVENTS, 1000)
    want = _state_fingerprint(expected_final_state(events, ["repo", "path"]))
    assert _state_fingerprint(t.read()) == want


def test_schema_evolution_mid_stream(spark, tmp_path, events):
    t = LakeTable.create(spark, str(tmp_path / "t"), REPOS_SCHEMA, ["repo", "path"], 16)
    reg = SchemaRegistry()
    rep = CdcReplayer(t)
    first = events.filter(F.col("lsn") < 2500)
    reg.ensure_table_schema(t, first)
    rep.replay_range_batches(first, 0, 2500, 1000)
    # v2 events add a `license` column
    second = events.filter(F.col("lsn") >= 2500).withColumn(
        "license", F.when(F.col("op") != "delete", F.lit("MIT"))
    )
    assert reg.ensure_table_schema(t, second) is True
    rep.replay_range_batches(second, 2500, N_EVENTS, 1000)
    out = t.read()
    assert "license" in out.columns
    # keys last touched before the evolution have null license, after → MIT
    ev_state = expected_final_state(
        events.withColumn("license", F.lit(None).cast("string")), ["repo", "path"]
    )
    assert out.count() == ev_state.count()
    assert out.filter(F.col("license") == "MIT").count() > 0
    assert out.filter(F.col("license").isNull()).count() > 0


def test_registry_monotone(spark):
    reg = SchemaRegistry()
    v0 = reg.register(REPOS_SCHEMA)
    v_same = reg.register(REPOS_SCHEMA)
    assert v0 == v_same == 0
    wider = T.StructType(list(REPOS_SCHEMA.fields) + [T.StructField("stars", T.LongType())])
    assert reg.register(wider) == 1


def test_shuffle_strategy_equivalence(spark, tmp_path):
    """The shuffle reduction/resolution path (for winner sets too large to
    broadcast) must produce the same state as the broadcast path."""
    from pyspark.sql import types as T
    from cdm_cbioportal_etl_spark.cdc import gen_change_events, CdcReplayer
    from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
    from cdm_cbioportal_etl_spark.cdc.replayer import expected_final_state
    from cdm_cbioportal_etl_spark.lake import LakeTable

    events = gen_change_events(spark, 4000, n_repos=15, paths_per_repo=20, seed=3)
    states = {}
    for strat in ("broadcast", "shuffle", "auto"):
        table = LakeTable.create(
            spark, str(tmp_path / f"t_{strat}"),
            T.StructType(list(REPOS_SCHEMA.fields)),
            key_cols=["repo", "path"], n_buckets=8,
        )
        CdcReplayer(table).replay_range_batches(
            events, 0, 4000, batch_size=1500, strategy=strat
        )
        states[strat] = {
            tuple(r) for r in table.read().select("repo", "path", "commit").collect()
        }
    exp = {
        tuple(r)
        for r in expected_final_state(events, ["repo", "path"])
        .select("repo", "path", "commit")
        .collect()
    }
    assert states["broadcast"] == exp
    assert states["shuffle"] == exp
    assert states["auto"] == exp


def test_salted_shuffle_strategy_equivalence(spark, tmp_path):
    """Two-phase salted reduction (hot-key spreading) must be value-
    identical to the unsalted paths on Zipf-skewed input."""
    from pyspark.sql import types as T
    from cdm_cbioportal_etl_spark.cdc import gen_change_events, CdcReplayer
    from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
    from cdm_cbioportal_etl_spark.cdc.replayer import expected_final_state
    from cdm_cbioportal_etl_spark.lake import LakeTable

    # zipf_exp=6 concentrates most events on very few keys (hot keys)
    events = gen_change_events(
        spark, 5000, n_repos=10, paths_per_repo=10, seed=9, zipf_exp=6.0
    )
    table = LakeTable.create(
        spark, str(tmp_path / "salted"),
        T.StructType(list(REPOS_SCHEMA.fields)),
        key_cols=["repo", "path"], n_buckets=8,
    )
    CdcReplayer(table).replay_range_batches(
        events, 0, 5000, batch_size=2000, strategy="shuffle", salt_partitions=8
    )
    got = {tuple(r) for r in table.read().select("repo", "path", "commit").collect()}
    exp = {
        tuple(r)
        for r in expected_final_state(events, ["repo", "path"])
        .select("repo", "path", "commit")
        .collect()
    }
    assert got == exp
