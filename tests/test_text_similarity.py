"""Tests for dedup / text-analysis / similarity / multimodal operators."""

import pytest
from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.similarity import cosine_topk_bruteforce, lsh_bucketed_ann
from cdm_cbioportal_etl_spark.text import (
    exact_dedup,
    language_id,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash_fingerprint,
    token_count,
)
from cdm_cbioportal_etl_spark.text.multimodal import extract_features, synth_media

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat and runs away fast"),  # near dup of 1
    (4, "completely different content about spark distributed computing engines"),
    (5, "le chat est sur la table et le chien est dans le jardin"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    groups = {r.keep_id: r.n_docs for r in out}
    assert groups[1] == 2  # docs 1+2 collapse
    assert groups[3] == 1 and groups[4] == 1
    assert len(out) == 5  # 6 docs, one pair merged


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()}
    assert (1, 2) in pairs          # exact dups always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup shares bands
    assert (1, 4) not in pairs      # unrelated docs don't


def test_minhash_signature_properties(spark, docs):
    sig = minhash_signatures(docs, num_hashes=8).collect()
    by_id = {r.doc_id: [r[f"mh_{i}"] for i in range(8)] for r in sig}
    assert by_id[1] == by_id[2]  # identical text → identical signature
    overlap_near = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    overlap_far = sum(a == b for a, b in zip(by_id[1], by_id[4]))
    assert overlap_near > overlap_far


def test_ngram_jaccard(spark, docs):
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.3 < out[(1, 3)] < 1.0
    assert (1, 4) not in out  # no shared shingles → never a candidate


def test_jaccard_verify_on_lsh_candidates(spark, docs):
    cands = minhash_lsh_candidates(docs, num_hashes=16, bands=8)
    out = ngram_jaccard_pairs(docs, pairs=cands, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in got


def test_simhash(spark, docs):
    out = {r.doc_id: r.simhash for r in simhash_fingerprint(docs).collect()}
    assert out[1] == out[2]
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert hamming(out[1], out[3]) < hamming(out[1], out[4])


def test_language_id(spark, docs):
    out = {r.doc_id: r.lang for r in docs.select("doc_id", language_id("text").alias("lang")).collect()}
    assert out[1] == "en" and out[5] == "fr" and out[6] == "und"


def test_token_count_and_quality(spark, docs):
    out = {
        r.doc_id: (r.n, r.q)
        for r in docs.select(
            "doc_id", token_count("text").alias("n"), quality_score("text").alias("q")
        ).collect()
    }
    assert out[1][0] == 13 and out[6][0] == 0
    assert out[1][1] > out[6][1]  # real text scores above empty
    assert all(0.0 <= v[1] <= 1.0 for v in out.values())


def test_cosine_topk_exact(spark):
    items = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame([(100, [1.0, 0.0])], "query_id long, embedding array<float>")
    out = cosine_topk_bruteforce(items, queries, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].cosine == 1.0


def test_lsh_ann_recall_vs_bruteforce(spark):
    import random

    random.seed(7)
    dim = 16
    items = spark.createDataFrame(
        [(i, [random.gauss(0, 1) for _ in range(dim)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [random.gauss(0, 1) for _ in range(dim)]) for i in range(5)],
        "query_id long, embedding array<float>",
    )
    exact = cosine_topk_bruteforce(items, queries, k=5).collect()
    approx = lsh_bucketed_ann(items, queries, k=5, n_planes=6, n_tables=6).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # approximate, but must beat random by far


def test_multimodal_feature_extraction(spark):
    media = synth_media(spark, n=32)
    feats = extract_features(media, feature_dim=8).collect()
    assert len(feats) == 32
    assert all(len(r.feature) == 8 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r.feature)
    # determinism
    feats2 = extract_features(synth_media(spark, n=32), feature_dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_multimodal_stub_gate(spark):
    media = synth_media(spark, n=4)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_features(media, decode_stub=False).collect()


def test_quantize_int8_roundtrip_cosine(spark):
    """pandas_udf int8 quantization: 4x smaller, cosine preserved ~1%."""
    import math
    from cdm_cbioportal_etl_spark.similarity.quantize import (
        dequantize_expr,
        quantized_embeddings,
    )
    from cdm_cbioportal_etl_spark.similarity.ann import _dot, _norm
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    q = quantized_embeddings(emb)
    joined = emb.join(q, "vec_id").select(
        "vec_id",
        (
            _dot(F.col("embedding"), dequantize_expr("q", "scale"))
            / (_norm(F.col("embedding")) * _norm(dequantize_expr("q", "scale")))
        ).alias("cos"),
        F.size("q").alias("dim"),
    )
    rows = joined.collect()
    assert all(r.dim == 64 for r in rows)
    assert all(r.cos > 0.995 for r in rows), min(r.cos for r in rows)


def test_ivf_ann_full_probe_equals_exact(spark):
    """Probing ALL lists makes IVF exhaustive -> must equal brute force."""
    from cdm_cbioportal_etl_spark.similarity.ann import (
        cosine_topk_bruteforce,
        ivf_ann,
    )

    items = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    qs = items.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_bruteforce(items, qs, k=4).collect()
    }
    approx = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_ann(items, qs, k=4, n_lists=4, n_probe=4).collect()
    }
    assert exact == approx


def test_payload_stats_exact_bytes(spark):
    """mapInPandas binary plumbing: byte-exact stats incl. empty payload."""
    from cdm_cbioportal_etl_spark.text.multimodal import payload_stats

    media = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"")), (3, bytearray(bytes([0, 255, 7])))],
        "media_id long, payload binary",
    )
    out = {r.media_id: (r.n_bytes, r.byte_sum, r.payload_sha) for r in payload_stats(media).collect()}
    import hashlib
    assert out[1] == (3, ord("a") + ord("b") + ord("c"), hashlib.sha256(b"abc").hexdigest())
    assert out[2] == (0, 0, hashlib.sha256(b"").hexdigest())
    assert out[3] == (3, 262, hashlib.sha256(bytes([0, 255, 7])).hexdigest())


def test_resize_and_sample_roundtrip(spark):
    import numpy as np

    from cdm_cbioportal_etl_spark.text.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        resize_image_nn,
        sample_frames,
        synth_real_media,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("media_id"))
    media = sample_frames(resize_image_nn(synth_real_media(ids), 4, 4), 10)
    rows = {r["media_id"]: r for r in media.collect()}
    # images resized to 4x4 with nearest-neighbor src = out_idx * 4
    img = decode_ppm(bytes(rows[2]["payload"]))
    assert img.shape == (4, 4, 3)
    y, x, c = np.ogrid[0:16, 0:16, 0:3]
    full = (2 * 31 + x * 3 + y * 5 + c * 17) % 256
    assert (img == full[::4, ::4]).all()
    assert rows[2]["meta"]["width"] == 4 and rows[2]["meta"]["height"] == 4
    # audio decimated 10x: sample j = closed_form(j*10)
    s = decode_wav_pcm16(bytes(rows[3]["payload"]))
    assert len(s) == 100
    j = np.arange(100, dtype=np.int64)
    assert (s == ((3 * 13 + j * 10 * 7) % 4096 - 2048)).all()
    # cross-modality pass-through: audio unchanged by resize, image by sample
    assert rows[3]["meta"]["codec"] == "wav"
    assert rows[2]["meta"]["codec"] == "ppm"


def test_ivf_ann_refined_full_probe_equals_exact(spark):
    """Lloyd refinement moves the coarse centroids but cannot change the
    answer when every list is probed -- the exhaustive-probe invariant
    must hold for ANY quantizer.  Also pins determinism: two runs with
    the same seed+iters give identical rankings."""
    from cdm_cbioportal_etl_spark.similarity.ann import (
        cosine_topk_bruteforce,
        ivf_ann,
    )

    items = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    qs = items.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_bruteforce(items, qs, k=4).collect()
    }
    run = lambda: {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_ann(
            items, qs, k=4, n_lists=4, n_probe=4, refine_iters=2
        ).collect()
    }
    first = run()
    assert first == exact
    assert first == run()


def test_incremental_exact_dedup_semantics(spark, docs):
    from cdm_cbioportal_etl_spark.text import (
        fingerprint_ledger,
        incremental_exact_dedup,
    )

    corpus = docs.filter("doc_id <= 2")           # 1 & 2 are exact dups
    ledger = fingerprint_ledger(corpus)
    batch = spark.createDataFrame(
        [
            (10, DOCS[0][1]),   # dup of corpus doc 1 (owner = min id = 1)
            (11, "brand new content never seen before in any corpus"),
            (12, "brand new content never seen before in any corpus"),  # batch dup of 11
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_exact_dedup(batch, ledger).collect()}
    assert out[10].status == "dup_corpus" and out[10].dup_of == 1
    assert out[11].status == "accepted" and out[11].dup_of is None
    assert out[12].status == "dup_batch" and out[12].dup_of == 11

    # replay idempotence: accept batch -> extend ledger -> redeliver the
    # same batch: every row must now be dup_corpus (nothing re-accepted)
    accepted = (
        incremental_exact_dedup(batch, ledger)
        .filter("status = 'accepted'")
        .select("fingerprint", F.col("doc_id").alias("owner_id"))
    )
    redelivered = incremental_exact_dedup(
        batch, ledger.unionByName(accepted)
    ).collect()
    assert all(r.status == "dup_corpus" for r in redelivered)


def test_incremental_exact_dedup_hash_modes_agree(spark, docs):
    """md5 and xxhash64 modes must classify identically (fingerprints
    differ, the accept/dup decisions may not)."""
    from cdm_cbioportal_etl_spark.text import (
        fingerprint_ledger,
        incremental_exact_dedup,
    )

    corpus = docs.filter("doc_id % 3 = 0")
    batch = docs.filter("doc_id % 3 != 0")
    by_mode = {}
    for mode in ("md5", "xxhash64"):
        led = fingerprint_ledger(corpus, hash_fn=mode)
        by_mode[mode] = {
            (r.doc_id, r.status, r.dup_of)
            for r in incremental_exact_dedup(batch, led, hash_fn=mode).collect()
        }
    assert by_mode["md5"] == by_mode["xxhash64"]


def test_incremental_lsh_matches_full_restriction(spark, docs):
    """Incremental candidates == full-corpus LSH pairs restricted to
    pairs touching >=1 batch doc (orientation normalized)."""
    from cdm_cbioportal_etl_spark.text import (
        incremental_lsh_candidates,
        lsh_band_keys,
    )

    new_ids = {r.doc_id for r in docs.filter("doc_id % 2 = 1").collect()}
    full = {
        frozenset((r.id_a, r.id_b))
        for r in minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()
    }
    expected = {p for p in full if p & new_ids}
    corpus_bands = lsh_band_keys(
        docs.filter("doc_id % 2 = 0"), num_hashes=16, bands=8
    )
    inc = incremental_lsh_candidates(
        docs.filter("doc_id % 2 = 1"), corpus_bands, num_hashes=16, bands=8
    ).collect()
    got = {frozenset((r.id_new, r.id_other)) for r in inc}
    assert got == expected
    # origin tags are consistent with membership
    for r in inc:
        if r.origin == "corpus":
            assert r.id_new in new_ids and r.id_other not in new_ids
        else:
            assert r.id_new in new_ids and r.id_other in new_ids


def test_dup_shingle_fraction_cross_doc(spark):
    from cdm_cbioportal_etl_spark.text.dedup import dup_shingle_fraction

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),        # shares all with 2
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma zeta eta theta iota"),  # shares 1 shingle
            (4, "completely unrelated words here now"),   # shares none
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_shingle_fraction(docs).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[4].dup_frac == 0.0 and out[4].n_dup == 0
    # doc 3: shingles = 5 windows, exactly 'alpha beta gamma' shared
    assert out[3].n_shingles == 5 and out[3].n_dup == 1
    assert abs(out[3].dup_frac - 0.2) < 1e-9


def test_dedup_survivors_keep_canonical(spark):
    from cdm_cbioportal_etl_spark.text.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # components: {1,2,3} (chain), {5,6}; 4 and 7 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {r.doc_id for r in dedup_survivors(docs, pairs).collect()}
    assert got == {1, 4, 5, 7}
