"""Round-3 items: timeline YAML surface, dedup hash modes, ngram verify
pruning, sessionizer out-of-order handling, TSV backslash dialect, JVM
twin of the grouped-map compact."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.pipeline import (
    TimelineConfig,
    build_timeline_deid,
    load_timeline_config,
    load_timeline_configs,
)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "timelines")


# ------------------------------------------------------------------ #
# Timeline YAML config surface
# ------------------------------------------------------------------ #
def test_timeline_config_loads_examples():
    cfgs = load_timeline_configs(CFG_DIR, "test")
    by_id = {c.timeline_id: c for c in cfgs}
    assert set(by_id) == {"status", "treatment"}
    tr = by_id["treatment"]
    assert tr.source_table == "timeline_treatment"
    assert tr.output_filename == "data_timeline_treatment"
    # mapping order is the output column contract
    assert tr.columns[:3] == ["PATIENT_ID", "START_DATE", "STOP_DATE"]
    # date columns default to the cBioPortal pair present in the spec
    assert tr.date_columns == ["START_DATE", "STOP_DATE"]
    assert by_id["status"].date_columns == ["START_DATE"]
    # per-column metadata preserved (reference field_label/field_note)
    assert tr.column_metadata["AGENT"]["field_label"] == "Agent"
    assert tr.table_metadata["form_name"] == "Treatment Events"


def test_timeline_config_prod_vs_dev(tmp_path):
    p = tmp_path / "t.yaml"
    p.write_text(
        "timeline_id: t\nsource_table_prod: tbl_prod\n"
        "source_table_dev: tbl_dev\noutput_filename: f\n"
        "patient_or_sample: patient\n"
        "columns:\n  PATIENT_ID:\n  START_DATE:\n  EVENT_TYPE:\n"
    )
    assert load_timeline_config(str(p), "production").source_table == "tbl_prod"
    assert load_timeline_config(str(p), "test").source_table == "tbl_dev"


def test_timeline_config_validation():
    with pytest.raises(ValueError, match="mandatory"):
        TimelineConfig(
            timeline_id="x", source_table="s", output_filename="f",
            patient_or_sample="patient", columns=["PATIENT_ID", "START_DATE"],
        )
    with pytest.raises(ValueError, match="SAMPLE_ID"):
        TimelineConfig(
            timeline_id="x", source_table="s", output_filename="f",
            patient_or_sample="sample",
            columns=["PATIENT_ID", "START_DATE", "EVENT_TYPE"],
        )
    with pytest.raises(ValueError, match="patient_or_sample"):
        TimelineConfig(
            timeline_id="x", source_table="s", output_filename="f",
            patient_or_sample="cohort",
            columns=["PATIENT_ID", "START_DATE", "EVENT_TYPE"],
        )


def test_build_timeline_deid_missing_source_column(spark):
    cfg = TimelineConfig(
        timeline_id="x", source_table="s", output_filename="f",
        patient_or_sample="patient",
        columns=["PATIENT_ID", "START_DATE", "EVENT_TYPE", "NOPE"],
    )
    src = spark.createDataFrame(
        [("1", "2024-01-01", "A")], "MRN string, START_DATE string, EVENT_TYPE string"
    )
    dim = spark.createDataFrame([("P1",)], "PATIENT_ID string")
    with pytest.raises(ValueError, match="NOPE"):
        build_timeline_deid(cfg, src, dim, dim, dim, today="2024-06-01")


def test_timeline_pipeline_deid_semantics(spark):
    """Config-driven deid on a tiny hand-checked frame: future-nulling,
    OS truncation, anchor intervals, declared column order."""
    cfg = TimelineConfig(
        timeline_id="status", source_table="s", output_filename="f",
        patient_or_sample="patient",
        columns=["PATIENT_ID", "START_DATE", "EVENT_TYPE", "SUBTYPE"],
    )
    src = spark.createDataFrame(
        [
            ("7", "2024-01-11", "STATUS", "ok"),      # day 10
            ("7", "2024-03-01", "STATUS", "late"),    # past OS -> truncated to 30
            ("7", "2025-01-01", "STATUS", "future"),  # future -> nulled -> dropped
        ],
        "MRN string, START_DATE string, EVENT_TYPE string, SUBTYPE string",
    )
    samples = spark.createDataFrame([("P7",)], "PATIENT_ID string")
    anchor = spark.createDataFrame(
        [("7", "P7", "2024-01-01")],
        "MRN string, DMP_ID string, DATE_TUMOR_SEQUENCING string",
    ).withColumn(
        "DATE_TUMOR_SEQUENCING", F.col("DATE_TUMOR_SEQUENCING").cast("date")
    )
    os_dates = spark.createDataFrame(
        [("7", "2024-01-31")], "MRN string, OS_DATE string"
    ).withColumn("OS_DATE", F.col("OS_DATE").cast("date"))
    out = build_timeline_deid(cfg, src, samples, anchor, os_dates, today="2024-06-01")
    assert out.columns == ["PATIENT_ID", "START_DATE", "EVENT_TYPE", "SUBTYPE"]
    rows = {(r.SUBTYPE): r.START_DATE for r in out.collect()}
    assert rows == {"ok": 10, "late": 30}


# ------------------------------------------------------------------ #
# Dedup production hash mode: identical candidate PAIR sets
# ------------------------------------------------------------------ #
def _seeded_docs(spark):
    """Deterministic corpus where the LSH decision is family-invariant:
    per-template DISJOINT vocabularies (no cross-doc shingle overlap →
    unrelated docs can't band-collide short of a ~2^-60 hash accident)
    and one-token-in-100 near-dups (shingle Jaccard ≈ 0.94 → miss
    probability ~3e-8 at 8 bands × r=2 for any family).  Both hash
    modes must therefore flag exactly the same pairs."""
    rows = []
    did = 0
    for t in range(10):
        toks = [f"t{t}w{i}" for i in range(100)]
        base = " ".join(toks)
        near = " ".join(["edited" if i == 50 else w for i, w in enumerate(toks)])
        rows += [(did, base), (did + 1, base), (did + 2, near)]
        did += 3
    for f in range(20):
        rows.append((did, " ".join(f"f{f}x{i}" for i in range(12))))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_mode_equivalent_pair_sets(spark):
    from cdm_cbioportal_etl_spark.text import minhash_lsh_candidates

    docs = _seeded_docs(spark)
    md5_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()
    }
    xx_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            docs, num_hashes=16, bands=8, hash_fn="xxhash64"
        ).collect()
    }
    # exact dup pairs collide under ANY hash family; the seeded corpus is
    # built so near-dups band-collide in both families too
    for t in range(10):
        assert (3 * t, 3 * t + 1) in md5_pairs
        assert (3 * t, 3 * t + 1) in xx_pairs
    assert md5_pairs == xx_pairs


def test_exact_dedup_hash_modes_agree(spark):
    from cdm_cbioportal_etl_spark.text import exact_dedup

    docs = _seeded_docs(spark)
    md5 = {(r.keep_id, r.n_docs) for r in exact_dedup(docs).collect()}
    xx = {
        (r.keep_id, r.n_docs)
        for r in exact_dedup(docs, hash_fn="xxhash64").collect()
    }
    assert md5 == xx


def test_hash_fn_rejects_unknown(spark):
    from cdm_cbioportal_etl_spark.text import exact_dedup

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_fn"):
        exact_dedup(docs, hash_fn="sha1")


# ------------------------------------------------------------------ #
# ngram verify prunes BEFORE the shingle self-join
# ------------------------------------------------------------------ #
def test_ngram_verify_prunes_early(spark):
    from cdm_cbioportal_etl_spark.text import ngram_jaccard_pairs

    docs = _seeded_docs(spark)
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    out = ngram_jaccard_pairs(docs, pairs=pairs)
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert set(got) == {(0, 1), (0, 2)}
    assert got[(0, 1)] == 1.0
    # plan shape: the candidate-id restriction (LeftSemi) must sit
    # UPSTREAM of the shingle self-join — verify-on-candidates must not
    # pay the all-docs join.  Two semi joins: per-doc id prune + final
    # pair restriction.
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 2


# ------------------------------------------------------------------ #
# Sessionizer: late (out-of-order) events across micro-batches
# ------------------------------------------------------------------ #
def test_sessionizer_late_event_does_not_regress_session(spark, tmp_path):
    from tests.test_stateful_streaming import _run_available_now, _write_seg

    t = lambda m: f"2024-01-01 10:{m:02d}:00"  # noqa: E731
    # batch 0: 10:00, 10:08 (one session, gap 600s)
    _write_seg(spark, [(1, t(0)), (1, t(8))], str(tmp_path / "src" / "seg-0"))
    # batch 1: LATE event 10:04 — within the session; must NOT move
    # end back (the old bug: end_s regressed to 10:04, so 10:16 would
    # spuriously close the session)
    _write_seg(spark, [(1, t(4))], str(tmp_path / "src" / "seg-1"))
    # batch 2: 10:16 extends (8 min after 10:08); 10:30 closes (14 min)
    _write_seg(spark, [(1, t(16)), (1, t(30))], str(tmp_path / "src" / "seg-2"))
    out = _run_available_now(
        spark,
        str(tmp_path / "src" / "seg-*"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    closed = [
        (str(r.session_start), str(r.session_end), r.n_events)
        for r in out.collect()
    ]
    assert closed == [("2024-01-01 10:00:00", "2024-01-01 10:16:00", 4)]


# ------------------------------------------------------------------ #
# TSV dialect: literal backslashes round-trip
# ------------------------------------------------------------------ #
def test_tsv_backslash_roundtrip(spark, tmp_path):
    from cdm_cbioportal_etl_spark.operators.header import (
        ColumnMeta,
        combine_header_and_data,
    )
    from cdm_cbioportal_etl_spark.operators.io import (
        read_cbioportal_tsv,
        write_cbioportal_tsv,
    )

    # value with BOTH a tab (forces quoting) and a literal backslash —
    # univocity only escapes the quote char, so the backslash must
    # survive verbatim; also a quoted quote and a plain backslash field
    tricky = [
        ("P1", "a\tb\\c"),
        ("P2", 'say "hi"\tnow'),
        ("P3", "plain\\backslash"),
    ]
    data = spark.createDataFrame(tricky, "PATIENT_ID string, NOTE string")
    metas = {"NOTE": ColumnMeta("NOTE", "Note", "free text", "STRING")}
    out = str(tmp_path / "tsv")
    write_cbioportal_tsv(combine_header_and_data(data, metas), out)
    _, got = read_cbioportal_tsv(spark, out)
    assert {tuple(r) for r in got.collect()} == set(tricky)


# ------------------------------------------------------------------ #
# Near-dup clustering: connected components over candidate pairs
# ------------------------------------------------------------------ #
def test_connected_components_chain_and_islands(spark):
    from cdm_cbioportal_etl_spark.text import connected_components

    # component {1,2,3,4} as a CHAIN (needs propagation, not one hop),
    # component {10,11}, and 20-21-22 as a triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    out = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


# ------------------------------------------------------------------ #
# Multimodal REAL decode: PPM / WAV numpy kernels
# ------------------------------------------------------------------ #
def test_ppm_wav_roundtrip():
    import numpy as np

    from cdm_cbioportal_etl_spark.text.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav_pcm16,
    )

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # header with a comment line still parses
    with_comment = b"P6\n# a comment\n16 16\n255\n" + img.tobytes()
    assert (decode_ppm(with_comment) == img).all()

    s = (np.arange(1000) % 4096 - 2048).astype("<i2")
    assert (decode_wav_pcm16(encode_wav_pcm16(s)) == s).all()


def test_decode_features_real_media(spark):
    from cdm_cbioportal_etl_spark.text.multimodal import (
        decode_features,
        synth_real_media,
    )

    ids = spark.range(6).select(F.col("id").alias("media_id"))
    out = {r.media_id: r for r in decode_features(synth_real_media(ids)).collect()}
    assert len(out) == 6
    # media 0 (image): channel-c mean = sum((0*31 + 3x + 5y + 17c) % 256)/256
    exp = [
        sum((3 * x + 5 * y + 17 * c) % 256 for x in range(16) for y in range(16)) / 256.0
        for c in range(3)
    ]
    assert out[0].kind == "image" and (out[0].dim_x, out[0].dim_y) == (16, 16)
    assert [out[0].f1, out[0].f2, out[0].f3] == exp
    # media 1 (audio): mean/max/min of (13 + 7i) % 4096 - 2048
    samples = [(13 + 7 * i) % 4096 - 2048 for i in range(1000)]
    assert out[1].kind == "audio" and out[1].dim_x == 1000
    assert out[1].f1 == sum(samples) / 1000.0
    assert (out[1].f2, out[1].f3) == (max(samples), min(samples))


def test_decode_unknown_codec_raises(spark):
    from cdm_cbioportal_etl_spark.text.multimodal import (
        decode_features,
        synth_media,
    )

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_features(synth_media(spark, n=4)).collect()


def test_extract_features_real_branch(spark):
    from cdm_cbioportal_etl_spark.text.multimodal import (
        extract_features,
        synth_real_media,
    )

    ids = spark.range(4).select(F.col("id").alias("media_id"))
    rows = extract_features(
        synth_real_media(ids), feature_dim=8, decode_stub=False
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r.feature) == 8
        assert all(v == v for v in r.feature)  # finite, no NaN


# ------------------------------------------------------------------ #
# JVM twin of the grouped-map compact: identical output
# ------------------------------------------------------------------ #
def test_compact_twins_agree(spark):
    from cdm_cbioportal_etl_spark.operators.grouped import (
        compact_group_timeline,
        compact_group_timeline_sql,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "b"),
        (1, "2024-01-01 10:00:00", "a"),   # tie at first ts -> min type
        (1, "2024-01-05 09:00:00", "c"),
        (1, "2024-01-05 09:00:00", "d"),   # tie at last ts -> max type
        (1, "2024-01-02 00:00:00", "c"),   # modal: c (2x), tie-break n/a
        (2, "2024-02-01 00:00:00", "x"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_type string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    a = {tuple(map(str, r)) for r in compact_group_timeline(ev).collect()}
    b = {tuple(map(str, r)) for r in compact_group_timeline_sql(ev).collect()}
    assert a == b
    one = {r.user_id: r for r in compact_group_timeline_sql(ev).collect()}
    assert one[1].first_type == "a" and one[1].last_type == "d"
    assert one[1].modal_type == "c" and one[1].span_days == 4
