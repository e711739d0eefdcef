"""Product-quantization ANN: exhaustive-shortlist equivalence with the
exact baseline, bounded byte codes, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.similarity import (
    cosine_topk_bruteforce,
    pq_ann,
    pq_codebooks,
    pq_encode,
)

DIM = 16


def _vecs(spark, n=120, seed=3):
    # deterministic pseudo-random embeddings, no two identical
    rows = [
        (
            i,
            [((i * 37 + d * 101 + seed) % 97) / 97.0 - 0.5 for d in range(DIM)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_exhaustive_shortlist_equals_exact(spark):
    """With a shortlist covering the whole corpus the exact re-rank stage
    sees every item — PQ must return exactly the brute-force answer for
    ANY codebook quality."""
    emb = _vecs(spark)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    pq = pq_ann(
        emb, queries, k=5, dim=DIM, m=4, ksub=8, shortlist_mult=1000
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, pq.collect()))


def test_pq_codes_bounded_and_deterministic(spark):
    emb = _vecs(spark, n=60)
    books = pq_codebooks(emb, dim=DIM, m=4, ksub=8)
    enc = pq_encode(emb, books, dim=DIM, m=4)
    rows = enc.select("neighbor_id", "_codes").collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["_codes"]) == 4
        assert all(0 <= c < 8 for c in r["_codes"])
    again = {
        r["neighbor_id"]: list(r["_codes"])
        for r in pq_encode(emb, books, dim=DIM, m=4)
        .select("neighbor_id", "_codes")
        .collect()
    }
    assert {r["neighbor_id"]: list(r["_codes"]) for r in rows} == again


def test_pq_validates_dim_divisibility(spark):
    emb = _vecs(spark, n=10)
    import pytest

    with pytest.raises(ValueError):
        pq_codebooks(emb, dim=DIM, m=5)


def test_pq_recall_reasonable_with_small_shortlist(spark):
    """The ADC shortlist at modest mult recovers most exact neighbors —
    the production operating point (catalog gates this at sf0.01 too)."""
    emb = _vecs(spark, n=200)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_ann(
            emb, queries, k=5, dim=DIM, m=4, ksub=16, shortlist_mult=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall}"


def test_ivfpq_exhaustive_probe_and_shortlist_equals_exact(spark):
    """Probing every list with an all-covering shortlist makes IVF-PQ
    return exactly the brute-force answer for ANY quantizer quality —
    the same exhaustive-equivalence contract the IVF and PQ paths have."""
    from cdm_cbioportal_etl_spark.similarity import cosine_topk_bruteforce, ivfpq_ann

    emb = _vecs(spark, n=100)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    approx = ivfpq_ann(
        emb, queries, k=5, dim=DIM,
        n_lists=4, n_probe=4, m=4, ksub=8, shortlist_mult=1000,
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, approx.collect()))


def test_ivfpq_deterministic(spark):
    from cdm_cbioportal_etl_spark.similarity import ivfpq_ann

    emb = _vecs(spark, n=80)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=5, dim=DIM, n_lists=4, n_probe=2, m=4, ksub=8, shortlist_mult=4)
    a = sorted(map(tuple, ivfpq_ann(emb, queries, **kw).collect()))
    b = sorted(map(tuple, ivfpq_ann(emb, queries, **kw).collect()))
    assert a == b and a


# ------------------------------------------------------------------ #
# distributional recall gates: the catalog's per-seed recall checks
# promoted to a property — recall@5 holds across re-seeded datasets
# and dimensions, not just the one seeded draw the catalog pins
# ------------------------------------------------------------------ #
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _seeded_vecs(spark, n, dim, seed):
    rows = [
        (
            i,
            [
                ((i * 37 + d * 101 + seed * 13 + (i * d) % 29) % 97) / 97.0 - 0.5
                for d in range(dim)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall_at5(spark, dim, seed, approx_fn):
    emb = _seeded_vecs(spark, 150, dim, seed)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in approx_fn(emb, queries, dim).collect()
    }
    return len(exact & approx) / len(exact)


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 9999), dim=st.sampled_from([8, 16, 32]))
def test_pq_recall_distributional(spark, seed, dim):
    rec = _recall_at5(
        spark, dim, seed,
        lambda e, q, d: pq_ann(e, q, k=5, dim=d, m=4, ksub=16, shortlist_mult=8),
    )
    assert rec >= 0.6, f"pq recall {rec} at seed={seed} dim={dim}"


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 9999))
def test_ivfpq_recall_distributional(spark, seed):
    from cdm_cbioportal_etl_spark.similarity import ivfpq_ann

    rec = _recall_at5(
        spark, 16, seed,
        # ksub=16 (4-bit codes): ksub=8 is below the resolution real
        # IVF-PQ deployments use (8-bit) and bottoms out at 0.52 recall
        # on adversarial seeds (e.g. 9033) even with exhaustive probing
        # fixed — the quantizer, not the coarse index, was binding.
        lambda e, q, d: ivfpq_ann(
            e, q, k=5, dim=d, n_lists=4, n_probe=3, m=4, ksub=16,
            shortlist_mult=8,
        ),
    )
    assert rec >= 0.6, f"ivfpq recall {rec} at seed={seed}"
