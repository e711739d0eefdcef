"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: the exact baseline — join + higher-order
  dot product (``zip_with``/``aggregate``, JVM-side) + per-query top-k.
  O(Q·N); correct answer, oracle-checkable.
- ``lsh_bucketed_ann``: the scale path — random-hyperplane LSH buckets
  shrink the candidate set from N to the bucket population, then the
  exact scorer runs on candidates only.  Hyperplanes are generated
  deterministically from a seed with a hash-PRNG (stable under retries);
  at 100 TB the bucket join replaces the full cross product, and bucket
  keys are uniform by construction (sign bits), so no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def unit_vector(vec):
    """vec / ||vec|| as array<double>, with the norm bound ONCE per row
    as a lambda variable — referencing ``_norm(vec)`` inside the divide
    lambda would re-evaluate the O(dim) aggregate per ELEMENT
    (interpreted HOFs don't CSE outer references; see
    text.dedup.shingles).  Pre-normalizing turns every downstream
    pairwise cosine into a single dot product — at N^2/bucketed-pair
    scale that's a 3x HOF reduction per pair."""
    return F.transform(
        F.array(_norm(vec)),
        lambda n: F.transform(vec, lambda x: x.cast("double") / n),
    )[0]


def cosine_topk_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    ``queries`` (query_id, embedding) is broadcast — Q small by
    assumption; the N-side scan streams.  Ties broken by neighbor id for
    determinism.  Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qv"),
    )
    it = items.select(
        F.col(id_col).alias("neighbor_id"), unit_vector(F.col(vec_col)).alias("_iv")
    )
    # both sides pre-normalized once per row -> one dot per scored pair
    scored = it.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        _dot(F.col("_qv"), F.col("_iv")).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (sum of 4 hash-uniforms
    per coordinate — CLT approximation; plenty for sign-bucket LSH)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            acc = 0.0
            for r in range(4):
                h = hashlib.md5(f"{seed}:{p}:{d}:{r}".encode()).hexdigest()
                acc += int(h[:8], 16) / 0xFFFFFFFF - 0.5
            row.append(acc)
        planes.append(row)
    return planes


def lsh_bucketed_ann(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = items sharing an LSH sign-bucket
    with the query in ANY of ``n_tables`` hash tables, then exact cosine
    re-rank on candidates only.

    Pass ``dim`` (embedding dimensionality) explicitly in production —
    the ``None`` fallback probes it with a driver-side ``first()`` action
    during plan construction, which is a convenience for ad-hoc use only.
    """
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    # Hyperplanes are driver-computed constants, but inlining them as
    # literals builds an ~n_tables·n_planes·dim-node Catalyst tree (twice:
    # items + queries) whose codegen dominates wall time and ships MB-scale
    # task binaries.  Pack them instead into a ONE-ROW broadcast DataFrame
    # (table × plane × dim nested array) and compute each table's sign
    # bucket with a single transform lambda — few-KB plan at any dim.
    planes_nested = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    plane_row = F.broadcast(
        items.sparkSession.createDataFrame(
            [(planes_nested,)], "_planes: array<array<array<double>>>"
        )
    )
    buckets = [
        F.concat(
            F.lit(f"t{t}:"),
            F.array_join(
                F.transform(
                    F.col("_planes")[t],
                    lambda p: F.when(_dot(F.col(vec_col), p) >= 0, "1").otherwise(
                        "0"
                    ),
                ),
                "",
            ),
        ).alias(f"_bkt_{t}")
        for t in range(n_tables)
    ]
    bucket_names = [f"_bkt_{t}" for t in range(n_tables)]

    # bucket bits come from the RAW vector (sign is scale-invariant);
    # the carried payload is unit-normalized once per row so the verify
    # stage below is a single dot per candidate pair
    it = items.crossJoin(plane_row).select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_iv"),
        *buckets,
    )
    q = queries.crossJoin(plane_row).select(
        F.col(query_id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qv"),
        *buckets,
    )
    it_long = it.unpivot(
        ["neighbor_id", "_iv"], bucket_names, "_tbl", "_bucket"
    )
    q_long = q.unpivot(["query_id", "_qv"], bucket_names, "_tbl", "_bucket")
    cands = (
        it_long.join(F.broadcast(q_long), ["_tbl", "_bucket"])
        .select("query_id", "neighbor_id", "_qv", "_iv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # both sides were unit-normalized once per row -> one dot per candidate
    scored = cands.select(
        "query_id",
        "neighbor_id",
        _dot(F.col("_qv"), F.col("_iv")).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def pq_codebooks(
    items: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Product-quantization codebooks as ONE broadcastable row
    (``_books: array<array<array<double>>>``, shape m × ksub × dim/m).

    Training is the same deterministic hash-ranked sample the IVF coarse
    quantizer uses (stable under retries, no iterations): ksub sample
    vectors are unit-normalized and sliced into m subvectors — book[mi][k]
    is sample k's mi-th slice.  Like the IVF centroids, the books are
    never collected to the driver nor inlined as literals (plan stays a
    few KB at any m × ksub × dim)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    dsub = dim // m
    return (
        items.select(
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_hk"),
            F.col(vec_col).alias("_cv"),
        )
        .orderBy("_hk")
        .limit(ksub)
        .agg(
            # aggregate first (collect_list can't live inside a lambda),
            # normalize each sample once, then slice per subspace
            F.transform(
                F.array_sort(F.collect_list(F.struct("_hk", "_cv"))),
                lambda s: unit_vector(s["_cv"]),
            ).alias("_samples")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda mi: F.transform(
                    F.col("_samples"),
                    lambda s: F.slice(s, mi * dsub + 1, dsub),
                ),
            ).alias("_books")
        )
    )


def _pq_code_expr(vec_unit, books, m: int, dsub: int) -> F.Column:
    """codes[mi] = argmin_k ||sub_mi − book[mi][k]||² as an
    array<int> column — pure HOFs, no UDF.  argmin-L2 is rewritten as
    argmax(⟨sub,c⟩ − ½‖c‖²) so each candidate costs one dot; the
    subvector is bound ONCE per (row, mi) as a lambda variable (the
    interpreted-HOF CSE rule, see text.dedup.shingles).  The whole
    encoder is ONE nested transform over sequence(0, m-1), so the plan
    (and task binary) stays a few KB at any m — a per-subspace Python
    loop built m expression trees and shipped MB-scale binaries."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mi: F.transform(
            F.array(F.slice(vec_unit, mi * dsub + 1, dsub)),
            # max score; ties break to the HIGHER code (deterministic,
            # same struct-sort tiebreak the IVF centroid pick uses)
            lambda s: F.reverse(
                F.array_sort(
                    F.transform(
                        F.element_at(books, mi + 1),
                        lambda c, k: F.struct(
                            (_dot(s, c) - 0.5 * _dot(c, c)).alias("s"),
                            k.alias("k"),
                        ),
                    )
                )
            )[0]["k"],
        )[0],
    )


def pq_encode(
    items: DataFrame,
    books: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistable compressed index: (id, _codes array<int> of length
    m).  This is PQ's 100 TB story — m small ints (one byte each at
    ksub ≤ 256) replace dim floats per vector, a 32× shrink at
    dim=64/m=8, letting the candidate scan stay in memory at corpus
    scale.  Encoding is one broadcast-join pass, no shuffle."""
    dsub = dim // m
    return items.crossJoin(F.broadcast(books)).select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_iv"),
        _pq_code_expr(
            unit_vector(F.col(vec_col)), F.col("_books"), m, dsub
        ).alias("_codes"),
    )


def pq_ann(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    shortlist_mult: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Product-quantization approximate top-k (ADC shortlist → exact
    re-rank) — the memory-bound scale path complementing LSH (hash
    buckets) and IVF (coarse partition):

    1. **Train**: deterministic codebooks (``pq_codebooks``).
    2. **Encode**: every item compresses to m one-byte codes
       (``pq_encode``) — at scale this index is what's scanned, not the
       vectors.
    3. **ADC**: each query precomputes a lookup table
       ``_lut[mi][k] = ⟨q_mi, book[mi][k]⟩`` (m × ksub dots, once per
       query); scoring an item is then m table lookups + adds —
       O(m) per pair instead of O(dim), and the only per-item data
       touched is the byte codes.
    4. **Re-rank**: the ADC top ``k·shortlist_mult`` per query re-score
       with the exact dot — recall recovers from quantization error
       while exact work stays O(queries · shortlist).

    Deterministic end to end; quality is gated by ``ann_pq_recall`` in
    the catalog (the approximate-operator contract, like LSH/IVF).
    """
    dsub = dim // m
    books = pq_codebooks(items, id_col, vec_col, dim, m, ksub, seed)
    it = pq_encode(items, books, dim, m, id_col, vec_col)
    def _lut_expr(vec_unit, books_col) -> F.Column:
        # _lut[mi][k] = ⟨q_sub_mi, book[mi][k]⟩; the query subvector is
        # bound once per (row, mi) as a lambda variable (HOF CSE rule),
        # and the whole LUT is one nested transform (constant plan size)
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.transform(
                F.array(F.slice(vec_unit, mi * dsub + 1, dsub)),
                lambda s: F.transform(
                    F.element_at(books_col, mi + 1), lambda c: _dot(s, c)
                ),
            )[0],
        )

    q = queries.crossJoin(F.broadcast(books)).select(
        F.col(query_id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qv"),
        _lut_expr(unit_vector(F.col(vec_col)), F.col("_books")).alias("_lut"),
    )
    # ADC scan touches ONLY the byte codes (the compressed index) — the
    # vectors are fetched afterwards for the shortlist alone, which is
    # what makes PQ memory-bound-scan-friendly at corpus scale
    scored = (
        it.select("neighbor_id", "_codes")
        .crossJoin(F.broadcast(q.select("query_id", "_lut")))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, mi: acc
                + F.element_at(
                    F.element_at(F.col("_lut"), mi + 1),
                    F.element_at(F.col("_codes"), mi + 1) + 1,
                ),
            ).alias("_adc"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("_adc"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_arank", F.row_number().over(w_adc))
        .filter(F.col("_arank") <= k * shortlist_mult)
        .select("query_id", "neighbor_id")
    )
    rescored = (
        shortlist.join(it.select("neighbor_id", "_iv"), "neighbor_id")
        .join(F.broadcast(q.select("query_id", "_qv")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("_qv"), F.col("_iv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def ivfpq_ann(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    shortlist_mult: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ (the FAISS composition): coarse inverted lists bound WHICH
    items are scored, PQ residual codes bound WHAT is read per item —
    together the memory- and compute-bound scale paths in one index.

    1. **Coarse**: n_lists deterministic centroids (same pick as
       ``ivf_ann``); every item assigned to its nearest list.
    2. **Residual PQ**: items encode ``unit(vec) − centroid[list]`` into
       m byte codes (residuals are what PQ quantizes well — they live in
       a ball around the origin instead of spanning the sphere).
    3. **Probe + ADC**: each query probes its ``n_probe`` nearest lists;
       PER PROBED LIST it builds the LUT over ``unit(q) − centroid`` and
       ADC-scores only that list's codes — O(N·n_probe/n_lists) pairs ×
       O(m) lookups each.
    4. **Re-rank**: ADC top ``k·shortlist_mult`` per query re-score
       exactly.

    Scoring identity: ⟨q̂,x̂⟩ = ⟨q̂−c, x̂−c⟩ + ⟨x̂,c⟩ + ⟨q̂,c⟩ − ‖c‖² for
    the shared list centroid c.  The ADC sum approximates the residual
    dot; ⟨x̂,c⟩ rides as one double per item and (⟨q̂,c⟩ − ‖c‖²) as one
    double per (query, probed list), so the reconstructed score is
    cross-list comparable at the shortlist cut.  Deterministic end to
    end; recall-gated in the catalog like the other approximate paths.
    """
    dsub = dim // m
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    # coarse centroids: identical deterministic pick to ivf_ann
    cent_row = (
        items.select(
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_hk"),
            F.col(vec_col).alias("_cv"),
        )
        .orderBy("_hk")
        .limit(n_lists)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_hk", "_cv"))),
                lambda s: unit_vector(s["_cv"]),
            ).alias("_cents")
        )
    )
    # PQ books trained on the RESIDUALS of a second deterministic sample
    # (offset seed): sample vectors are normalized, assigned to their
    # list, residual sliced per subspace
    def _nearest_list_id(vec):
        scored = F.transform(
            F.col("_cents"),
            lambda c, i: F.struct(_dot(vec, c).alias("s"), i.alias("i")),
        )
        return F.reverse(F.array_sort(scored))[0]["i"]

    def _residual(vec_unit):
        cent = F.element_at(F.col("_cents"), _nearest_list_id(vec_unit) + 1)
        return F.zip_with(vec_unit, cent, lambda a, b: a - b)

    books = (
        items.select(
            F.xxhash64(F.col(id_col), F.lit(seed + 7)).alias("_hk"),
            F.col(vec_col).alias("_cv"),
        )
        .orderBy("_hk")
        .limit(ksub)
        .agg(
            F.array_sort(F.collect_list(F.struct("_hk", "_cv"))).alias("_s")
        )
        .crossJoin(F.broadcast(cent_row))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda mi: F.transform(
                    F.col("_s"),
                    lambda s: F.slice(
                        F.transform(
                            F.array(unit_vector(s["_cv"])),
                            lambda u: F.zip_with(
                                u,
                                F.element_at(
                                    F.col("_cents"), _nearest_list_id(u) + 1
                                ),
                                lambda a, b: a - b,
                            ),
                        )[0],
                        mi * dsub + 1,
                        dsub,
                    ),
                ),
            ).alias("_books")
        )
    )
    side = F.broadcast(books.crossJoin(F.broadcast(cent_row)))

    # items: list id, residual codes, correction term <x̂, c>, and the
    # unit vector for the exact re-rank
    it = (
        items.crossJoin(side)
        .select(
            F.col(id_col).alias("neighbor_id"),
            unit_vector(F.col(vec_col)).alias("_iv"),
            F.col("_cents"),
            F.col("_books"),
        )
        .select(
            "neighbor_id",
            "_iv",
            "_books",
            "_cents",
            _nearest_list_id(F.col("_iv")).alias("_list"),
        )
        .select(
            "neighbor_id",
            "_iv",
            "_list",
            F.element_at(F.col("_cents"), F.col("_list") + 1).alias("_c"),
            "_books",
        )
        .select(
            "neighbor_id",
            "_iv",
            "_list",
            _dot(F.col("_iv"), F.col("_c")).alias("_xc"),
            _pq_code_expr(
                F.zip_with(F.col("_iv"), F.col("_c"), lambda a, b: a - b),
                F.col("_books"),
                m,
                dsub,
            ).alias("_codes"),
        )
    )

    # queries: explode to n_probe (query, list) rows, each with the LUT
    # over (q̂ − centroid_list) and the correction <q̂, c>
    def _nearest_lists(vec, n):
        scored = F.transform(
            F.col("_cents"),
            lambda c, i: F.struct(_dot(vec, c).alias("s"), i.alias("i")),
        )
        return F.slice(F.reverse(F.array_sort(scored)), 1, n)

    q = (
        queries.crossJoin(side)
        .select(
            F.col(query_id_col).alias("query_id"),
            unit_vector(F.col(vec_col)).alias("_qv"),
            F.col("_cents"),
            F.col("_books"),
        )
        .select(
            "query_id",
            "_qv",
            "_books",
            "_cents",
            F.explode(
                F.transform(_nearest_lists(F.col("_qv"), n_probe), lambda s: s["i"])
            ).alias("_list"),
        )
        .select(
            "query_id",
            "_qv",
            "_list",
            F.element_at(F.col("_cents"), F.col("_list") + 1).alias("_c"),
            "_books",
        )
    )

    def _lut(vec_resid, books_col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.transform(
                F.array(F.slice(vec_resid, mi * dsub + 1, dsub)),
                lambda s: F.transform(
                    F.element_at(books_col, mi + 1), lambda c: _dot(s, c)
                ),
            )[0],
        )

    q = q.select(
        "query_id",
        "_qv",
        "_list",
        _lut(
            F.zip_with(F.col("_qv"), F.col("_c"), lambda a, b: a - b),
            F.col("_books"),
        ).alias("_lut"),
        # per-(query, list) constant ⟨q̂,c⟩ − ‖c‖²: restores cross-LIST
        # comparability of the reconstructed ⟨q̂,x̂⟩ when shortlisting
        # across the probed lists
        (_dot(F.col("_qv"), F.col("_c")) - _dot(F.col("_c"), F.col("_c"))).alias(
            "_qc"
        ),
    )

    scored = (
        it.select("neighbor_id", "_list", "_codes", "_xc")
        .join(F.broadcast(q.select("query_id", "_list", "_lut", "_qc")), "_list")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.lit(0.0),
                    lambda acc, mi: acc
                    + F.element_at(
                        F.element_at(F.col("_lut"), mi + 1),
                        F.element_at(F.col("_codes"), mi + 1) + 1,
                    ),
                )
                + F.col("_xc")
                + F.col("_qc")
            ).alias("_adc"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("_adc"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_arank", F.row_number().over(w_adc))
        .filter(F.col("_arank") <= k * shortlist_mult)
        .select("query_id", "neighbor_id")
    )
    rescored = (
        shortlist.join(it.select("neighbor_id", "_iv"), "neighbor_id")
        .join(
            F.broadcast(q.select("query_id", "_qv").dropDuplicates(["query_id"])),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("_qv"), F.col("_iv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def ivf_ann(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path complementing ``lsh_bucketed_ann``:

    1. **Train**: ``n_lists`` centroids picked deterministically from the
       item set itself (hash-ranked sample — stable under retries, no
       k-means iterations; for ANN recall the coarse partition only needs
       to be spread, not optimal).  Centroids are pre-normalized and
       packed into a ONE-ROW DataFrame (``array<array<double>>``) that is
       broadcast — never collected to the driver and never inlined as
       literals, so the physical plan stays a few KB regardless of
       ``n_lists × dim`` (the previous literal-expression encoding built
       a ~n_lists·dim-node Catalyst tree whose codegen dominated wall
       time and shipped MB-scale task binaries).
    2. **Assign**: every item gets its nearest centroid id — one
       ``transform`` over the broadcast centroid array (argmax of
       dot(vec, ĉ); ĉ unit-norm, so the per-row ``/|vec|`` factor is
       constant and ordering-equivalent to cosine).  No shuffle.  This
       is the inverted file: at 100 TB you would ``partitionBy`` the
       list id so each probe touches only its lists' files.
    3. **Probe**: each query scores the same centroids and keeps its
       ``n_probe`` nearest lists; candidates = items in those lists
       (broadcast join on list id), then the exact cosine re-rank runs
       on candidates only — O(N · n_probe / n_lists) instead of O(N).
    """
    # 1) deterministic "training" sample: top-n_lists items by seeded
    #    hash, packed into a single row.  collect_list runs on <= n_lists
    #    rows (post-limit), so the agg is trivially bounded; struct sort
    #    on the hash key keeps centroid order (and thus list ids) stable.
    cent_row = (
        items.select(
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_hk"),
            F.col(vec_col).alias("_cv"),
        )
        .orderBy("_hk")
        .limit(n_lists)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_hk", "_cv"))),
                lambda s: unit_vector(s["_cv"]),
            ).alias("_cents")
        )
    )

    if refine_iters:
        # optional spherical-Lloyd refinement of the coarse quantizer
        # (semdedup.lloyd_refine — bounded combinable aggs, k*dim scalar
        # shuffle keys); checkpointed so downstream stages don't replay
        # the iterations.  Lazy import: semdedup imports this module.
        from .semdedup import lloyd_refine

        vn_df = items.select(
            F.col(id_col).alias("vec_id"), unit_vector(F.col(vec_col)).alias("_vn")
        )
        cent_row = lloyd_refine(vn_df, cent_row, refine_iters).localCheckpoint()

    def _nearest_lists(vec, n):
        # score = dot(vec, ĉ): ĉ unit-norm ⇒ same ordering as cosine
        scored = F.transform(
            F.col("_cents"),
            lambda c, i: F.struct(_dot(vec, c).alias("score"), i.alias("list_id")),
        )
        ordered = F.reverse(F.array_sort(scored))  # score desc, list_id desc tiebreak
        return F.slice(ordered, 1, n)

    # list assignment uses the RAW vector (argmax over unit centroids is
    # scale-invariant); the carried payload is unit-normalized once per
    # row so the re-rank below is a single dot per candidate
    it = items.crossJoin(F.broadcast(cent_row)).select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_iv"),
        _nearest_lists(F.col(vec_col), 1)[0]["list_id"].alias("_list"),
    )
    q = queries.crossJoin(F.broadcast(cent_row)).select(
        F.col(query_id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qv"),
        F.explode(
            F.transform(
                _nearest_lists(F.col(vec_col), n_probe), lambda s: s["list_id"]
            )
        ).alias("_list"),
    )
    cands = it.join(F.broadcast(q), "_list").select(
        "query_id", "neighbor_id", "_qv", "_iv"
    )
    # both sides were unit-normalized once per row -> one dot per candidate
    scored = cands.select(
        "query_id",
        "neighbor_id",
        _dot(F.col("_qv"), F.col("_iv")).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )
