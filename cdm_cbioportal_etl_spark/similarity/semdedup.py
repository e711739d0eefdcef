"""Semantic deduplication over an embedding column (SemDeDup-style).

The SemDeDup recipe (Abbas et al. 2023): cluster the corpus embeddings,
then inside each cluster drop documents whose cosine similarity to a
kept representative exceeds a threshold — near-duplicate SEMANTICS, not
near-duplicate text, so it catches paraphrases MinHash misses.

Spark-first shape:

- **Cluster seeding is engine-portable**: the n_clusters "centroids" are
  the vectors of the top-n ids by an md5-fold hash (the same portable
  idiom as text.curation._hash_bucket), packed into ONE broadcast row —
  no k-means iterations, no driver loop, and DuckDB reproduces the exact
  centroid set, so the whole operator is value-oracle-checkable (unlike
  the xxhash64-seeded IVF variant, which is recall-gated instead).
- **Assignment is a broadcast map stage**: every vector scores the
  packed centroid array with a higher-order cosine (argmax via a struct
  sort on (-score, idx) — score desc, index asc, deterministic).
- **The quadratic is bounded per cluster**: the prune self-join runs on
  cluster-equality, so cost is sum(|cluster|^2), never corpus^2.  At
  100 TB you raise n_clusters so clusters stay bounded (SemDeDup used
  ~11k clusters for LAION-scale); the join shuffles once on cluster id.
- **Keep-rule is deterministic**: a vector is pruned iff a LOWER-id
  vector in the same cluster has round(cosine, 4) >= threshold (round
  on BOTH engines so the decision boundary is portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import _dot, unit_vector


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.7,
    seed: str = "c",
) -> DataFrame:
    """(vec_id, cluster_id, kept): hash-seeded clustering + within-cluster
    cosine prune.  ``kept`` is false iff a lower-id same-cluster vector is
    within ``threshold`` cosine (4-dp rounded) of this one."""
    hk = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")

    # one-row broadcast centroid pack: top-n_clusters ids by portable
    # hash; struct sort on (hash, id) keeps centroid order (= cluster
    # ids) stable and DuckDB-reproducible.  collect_list sees <=
    # n_clusters rows (post-limit) — trivially bounded.
    # centroids are unit-normalized ONCE in the pack (8 rows); corpus
    # vectors are unit-normalized ONCE per row below — so assignment and
    # the pairwise prune each cost a single dot product, never a
    # per-pair norm (nonzero vectors assumed, as in the whole ANN family)
    cent_row = (
        emb.select(hk.alias("_hk"), F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"))
        .orderBy("_hk", "_cid")
        .limit(n_clusters)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_hk", "_cid", "_cv"))),
                lambda s: unit_vector(s["_cv"]),
            ).alias("_cents")
        )
    )

    vn = F.col("_vn")
    scored = F.transform(
        F.col("_cents"),
        lambda c, i: F.struct((-_dot(vn, c)).alias("ns"), i.alias("idx")),
    )
    assigned = (
        emb.select(
            F.col(id_col).alias("vec_id"), unit_vector(F.col(vec_col)).alias("_vn")
        )
        .crossJoin(F.broadcast(cent_row))
        .select(
            "vec_id",
            vn.alias("_v"),
            F.array_sort(scored)[0]["idx"].alias("cluster_id"),
        )
    )

    a = assigned.select(
        F.col("cluster_id"), F.col("vec_id").alias("_aid"), F.col("_v").alias("_av")
    )
    b = assigned.select(
        F.col("cluster_id"), F.col("vec_id").alias("_bid"), F.col("_v").alias("_bv")
    )
    pruned = (
        a.join(b, "cluster_id")
        .where(F.col("_aid") < F.col("_bid"))
        .where(F.round(_dot(F.col("_av"), F.col("_bv")), 4) >= F.lit(threshold))
        .select(F.col("_bid").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(pruned.withColumn("_pruned", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce(~F.col("_pruned"), F.lit(True)).alias("kept"),
        )
    )
