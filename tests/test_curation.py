"""Unit tests for text/curation.py — the dataset-assembly operators.

The catalog queries cover engine-vs-oracle parity at sf0.01; these pin
the semantic edge cases: split stability, mixture rate monotonicity,
contamination bounds, packing invariants with oversized docs, and PII
masking on adversarial strings.
"""

import pytest
from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.text.curation import (
    contamination_check,
    mixture_sample,
    pack_sequences,
    pii_mask,
    quality_percent_rank_filter,
    split_assign,
    vocab_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i % 7} the and of to is common text body number {i}", "en",
         f"s{i % 4}", 50)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_split_deterministic_and_disjoint(docs):
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert a == b  # pure function of (id, seed)
    assert set(a.values()) == {"train", "val", "test"}
    # roughly the requested proportions (hash-uniform, n=200)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 130 <= n_train <= 190


def test_split_seed_changes_assignment(docs):
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, seed=42).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs, seed=43).collect()}
    assert a != b


def test_mixture_rates_monotone_and_subset(docs):
    lo = mixture_sample(docs, {"s0": 0.2}, default_rate=0.0)
    hi = mixture_sample(docs, {"s0": 0.8}, default_rate=0.0)
    lo_ids = {r["doc_id"] for r in lo.collect()}
    hi_ids = {r["doc_id"] for r in hi.collect()}
    assert lo_ids <= hi_ids  # raising a rate only ADDS rows (nested samples)
    assert len(hi_ids) > len(lo_ids)
    # rate 0 drops everything; rate 1 keeps everything in the group
    assert mixture_sample(docs, {"s1": 0.0}, default_rate=0.0).count() == 0
    n_s1 = docs.filter(F.col("source") == "s1").count()
    assert (
        mixture_sample(docs, {"s1": 1.0}, default_rate=0.0).count() == n_s1
    )


def test_vocab_rank_deterministic_ties(spark):
    d = spark.createDataFrame(
        [(1, "b a"), (2, "a b")], "doc_id long, text string"
    )
    out = vocab_top_terms(d, top_n=10).collect()
    # equal tf/df -> tie broken alphabetically
    assert [(r["term"], r["rank"]) for r in out] == [("a", 1), ("b", 2)]
    assert all(r["tf"] == 2 and r["df"] == 2 for r in out)


def test_contamination_bounds_and_zero(spark):
    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),          # fully contained
            (11, "zeta eta theta iota kappa"),       # disjoint
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_check(tr, ev).collect()}
    assert out[10]["contamination"] == 1.0 and out[10]["flagged"]
    assert out[11]["contamination"] == 0.0 and not out[11]["flagged"]
    assert out[11]["n_hits"] == 0  # left-join fill, not a dropped row


def test_pack_respects_budget_and_oversized(spark):
    d = spark.createDataFrame(
        [
            (1, "a b c", "g"),           # 3 tokens
            (2, "d e f g", "g"),         # 4 tokens
            (3, " ".join(f"t{i}" for i in range(30)), "g"),  # oversized
            (4, "h i", "g"),             # 2 tokens
        ],
        "doc_id long, text string, source string",
    )
    out = sorted(
        pack_sequences(d, budget=8).collect(), key=lambda r: r["doc_id"]
    )
    bins = {r["doc_id"]: r["bin_id"] for r in out}
    # 1 (3) + 2 (4) fit in bin 0 (7 <= 8); 3 oversized gets its own bin;
    # 4 starts the next
    assert bins[1] == bins[2] == 0
    assert bins[3] == 1 and bins[4] == 2
    # no bin over budget unless it's a single oversized doc
    from collections import defaultdict

    fills = defaultdict(list)
    for r in out:
        fills[r["bin_id"]].append(r["n_tokens"])
    for toks in fills.values():
        assert sum(toks) <= 8 or len(toks) == 1


def test_pack_deterministic_across_runs(docs):
    a = sorted(map(tuple, pack_sequences(docs, budget=64).collect()))
    b = sorted(map(tuple, pack_sequences(docs, budget=64).collect()))
    assert a == b


def test_pii_mask_patterns(spark):
    d = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.co.uk now"),
            (2, "call +1 (555) 010-1234 today"),
            (3, "digits 12 are too short to be a phone"),
            (4, "both a@b.io and 555-0100-9999 here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["m"] for r in d.select("doc_id", pii_mask("text").alias("m")).collect()}
    assert out[1] == "mail [EMAIL] now"
    assert out[2] == "call [PHONE] today"
    assert out[3] == "digits 12 are too short to be a phone"
    assert out[4] == "both [EMAIL] and [PHONE] here"


def test_quality_prank_drops_bottom_decile(spark, docs):
    out = quality_percent_rank_filter(
        docs, F.col("n_chars").cast("double") + F.col("doc_id"), drop_bottom=0.1
    )
    rows = out.collect()
    # distinct quality values, n=200: exactly the bottom 10% cut
    assert len(rows) == 180
    assert min(r["pr"] for r in rows) >= 0.1


def test_repetition_signals_known_values(spark):
    from cdm_cbioportal_etl_spark.text.curation import repetition_signals

    rows = [
        (1, "a a a a"),              # tokens: 4x'a' -> dup 0.75; grams: 3x'a a' -> 1.0
        (2, "a b c d"),              # all distinct -> dup 0.0; grams all distinct -> 1/3
        (3, "x"),                    # single token: gram = the token itself -> 1.0
        (4, "  "),                   # blank: zero tokens -> both 0.0
        (5, "a b a b a"),            # dup 3/5; grams: 'a b','b a','a b','b a' -> 2/4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["s"]["dup_token_frac"], r["s"]["top_gram_frac"])
        for r in df.select(
            "doc_id", repetition_signals(F.col("text")).alias("s")
        ).collect()
    }
    assert out[1] == (0.75, 1.0)
    assert out[2] == (0.0, round(1 / 3, 4))
    assert out[3] == (0.0, 1.0)
    assert out[4] == (0.0, 0.0)
    assert out[5] == (round(1 - 2 / 5, 4), 0.5)


def test_semantic_dedup_prunes_near_duplicates(spark):
    from cdm_cbioportal_etl_spark.similarity.semdedup import semantic_dedup

    # 20 well-separated base vectors + exact copies of two of them with
    # higher ids: the copies MUST be pruned (cosine 1.0 to a lower id in
    # the same cluster); everything else must survive at a high threshold.
    base = [(i, [1.0 if j == i % 8 else 0.1 * ((i * 7 + j) % 3) for j in range(8)])
            for i in range(20)]
    dups = [(100, base[3][1]), (101, base[7][1])]
    df = spark.createDataFrame(base + dups, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, n_clusters=4, threshold=0.999)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 22
    assert rows[100]["kept"] is False
    assert rows[101]["kept"] is False
    assert all(r["kept"] for vid, r in rows.items() if vid < 100)
    # copies land in the same cluster as their originals
    assert rows[100]["cluster_id"] == rows[3]["cluster_id"]
    assert rows[101]["cluster_id"] == rows[7]["cluster_id"]


def test_semantic_dedup_deterministic(spark):
    from cdm_cbioportal_etl_spark.similarity.semdedup import semantic_dedup

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.hash(F.col("id"), F.lit(j)) % 1000 / 1000.0).cast("float")
                  for j in range(8)]).alias("embedding"),
    )
    a = sorted(map(tuple, semantic_dedup(df, n_clusters=4, threshold=0.9).collect()))
    b = sorted(map(tuple, semantic_dedup(df, n_clusters=4, threshold=0.9).collect()))
    assert a == b


def test_semantic_dedup_kmeans_refine(spark):
    from cdm_cbioportal_etl_spark.similarity.semdedup import semantic_dedup

    # two tight clusters around orthogonal axes + exact copies: one Lloyd
    # step moves the hash-seeded centroids toward the true cluster means;
    # copies must still be pruned and membership must be deterministic
    base = []
    for i in range(12):
        axis = i % 2
        v = [0.05 * ((i * 3 + j) % 5) for j in range(8)]
        v[axis] = 10.0
        base.append((i, v))
    dups = [(100, base[0][1]), (101, base[1][1])]
    df = spark.createDataFrame(base + dups, "vec_id long, embedding array<float>")
    out1 = sorted(map(tuple, semantic_dedup(
        df, n_clusters=2, threshold=0.999, refine_iters=2).collect()))
    out2 = sorted(map(tuple, semantic_dedup(
        df, n_clusters=2, threshold=0.999, refine_iters=2).collect()))
    assert out1 == out2
    rows = {r[0]: r for r in out1}
    assert rows[100][2] is False and rows[101][2] is False
    # axis-dominated members are near-dups of each other at 0.999, so
    # exactly the lowest id per cluster survives
    assert rows[0][2] is True and rows[1][2] is True
    assert all(not r[2] for vid, r in rows.items() if 2 <= vid < 100)
    # after refinement the two axis-clusters separate: members sharing an
    # axis land together
    even_clusters = {rows[i][1] for i in range(0, 12, 2)}
    odd_clusters = {rows[i][1] for i in range(1, 12, 2)}
    assert len(even_clusters) == 1 and len(odd_clusters) == 1
    assert even_clusters != odd_clusters


def test_lm_perplexity_known_values(spark):
    from math import log2

    from cdm_cbioportal_etl_spark.text.curation import lm_perplexity_score

    ref = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b z"), (2, "a a a")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["avg_bits"])
        for r in lm_perplexity_score(docs, ref_docs=ref).collect()
    }
    # C(a)=2, C(b)=1, N=3, V=2 -> denom = 3 + 0.5*(2+1) = 4.5
    pa, pb, poov = 2.5 / 4.5, 1.5 / 4.5, 0.5 / 4.5
    want1 = round(-(log2(pa) + log2(pb) + log2(poov)) / 3, 4)
    want2 = round(-log2(pa), 4)
    assert out == {1: (3, 1, want1), 2: (3, 0, want2)}
    # self-trained corpus has zero OOV by construction
    self_scored = lm_perplexity_score(docs).collect()
    assert all(r["n_oov"] == 0 for r in self_scored)
