"""Semantic deduplication over an embedding column (SemDeDup-style).

The SemDeDup recipe (Abbas et al. 2023): cluster the corpus embeddings
with (spherical) k-means, then inside each cluster drop documents whose
cosine similarity to a kept representative exceeds a threshold —
near-duplicate SEMANTICS, not near-duplicate text, so it catches
paraphrases MinHash misses.

Spark-first shape:

- **Cluster seeding is engine-portable**: the n_clusters seed centroids
  are the vectors of the top-n ids by an md5-fold hash (the same
  portable idiom as text.curation._hash_bucket), packed into ONE
  broadcast row — DuckDB reproduces the exact centroid set, so the whole
  operator is value-oracle-checkable (unlike the xxhash64-seeded IVF
  variant, which is recall-gated instead).
- **Optional Lloyd refinement** (``refine_iters``): spherical k-means
  steps expressed entirely as bounded DataFrame aggregations — assign
  (broadcast map stage), per-cluster per-dimension mean (posexplode +
  map-side-combinable avg over k·dim keys), renormalize, repack.  No
  driver-side math, no collect of data rows; the only small state is the
  k×dim centroid row carried between iterations.  Empty clusters keep
  their previous centroid (deterministic, mirrored by the oracle).
- **Assignment is a broadcast map stage**: every unit-normalized vector
  scores the packed centroid array with a single dot per centroid
  (argmax via a struct sort on (-score, idx) — score desc, index asc,
  deterministic).
- **The quadratic is bounded per cluster**: the prune self-join runs on
  cluster-equality, so cost is sum(|cluster|^2), never corpus^2.  At
  100 TB you raise n_clusters so clusters stay bounded (SemDeDup used
  ~11k clusters for LAION-scale); the join shuffles once on cluster id.
- **Keep-rule is deterministic**: a vector is pruned iff a LOWER-id
  vector in the same cluster has round(cosine, 4) >= threshold (round
  on BOTH engines so the decision boundary is portable).  Nonzero
  vectors assumed, as in the whole ANN family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import _dot, unit_vector


def _assign(vn_df: DataFrame, cent_row: DataFrame) -> DataFrame:
    """(vec_id, _v unit vector, cluster_id): argmax-dot assignment against
    the one-row packed unit centroids (score desc, index asc)."""
    vn = F.col("_vn")
    scored = F.transform(
        F.col("_cents"),
        lambda c, i: F.struct((-_dot(vn, c)).alias("ns"), i.alias("idx")),
    )
    return vn_df.crossJoin(F.broadcast(cent_row)).select(
        "vec_id",
        vn.alias("_v"),
        F.array_sort(scored)[0]["idx"].alias("cluster_id"),
    )


def lloyd_refine(vn_df: DataFrame, cent_row: DataFrame, iters: int) -> DataFrame:
    """``iters`` spherical k-means steps over unit vectors: new centroid =
    renormalized elementwise mean of the cluster's members.  Each step is
    one assignment map stage + one two-level combinable aggregation whose
    key space is k·dim scalars — the shuffle never carries vectors."""
    for _ in range(max(0, iters)):
        assigned = _assign(vn_df, cent_row)
        # the mean is rounded to 6 dp BEFORE renormalizing: double
        # addition is order-dependent and Spark's partition order varies
        # run to run — rounding makes the refined centroids (and thus
        # assignments) deterministic and engine-portable at ~1e-16 noise
        means = (
            assigned.select("cluster_id", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("cluster_id", "_pos")
            .agg(F.round(F.avg("_x"), 6).alias("_m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                    lambda s: s["_m"],
                ).alias("_c")
            )
        )
        cent_row = (
            cent_row.select(F.posexplode("_cents").alias("cluster_id", "_prev"))
            .join(means, "cluster_id", "left")
            .select(
                "cluster_id",
                F.when(F.col("_c").isNull(), F.col("_prev"))
                .otherwise(unit_vector(F.col("_c")))
                .alias("_c2"),
            )
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cluster_id", "_c2"))),
                    lambda s: s["_c2"],
                ).alias("_cents")
            )
        )
    return cent_row


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.7,
    seed: str = "c",
    refine_iters: int = 0,
) -> DataFrame:
    """(vec_id, cluster_id, kept): hash-seeded (optionally Lloyd-refined)
    clustering + within-cluster cosine prune.  ``kept`` is false iff a
    lower-id same-cluster vector is within ``threshold`` cosine (4-dp
    rounded) of this one."""
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
    # n_clusters rows (post-limit) — trivially bounded.  Centroids are
    # unit-normalized ONCE in the pack; corpus vectors are
    # unit-normalized ONCE per row — so assignment and the pairwise
    # prune each cost a single dot product, never a per-pair norm.
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

    vn_df = emb.select(
        F.col(id_col).alias("vec_id"), unit_vector(F.col(vec_col)).alias("_vn")
    )
    if refine_iters:
        # the refined k×dim centroid row is tiny; localCheckpoint cuts
        # the per-iteration lineage so the final plan doesn't re-run
        # every Lloyd step per downstream use of `assigned`
        cent_row = lloyd_refine(vn_df, cent_row, refine_iters).localCheckpoint()
    assigned = _assign(vn_df, cent_row)

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
