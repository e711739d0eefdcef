"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shape:

- **exact**: one hash aggregate on a canonical content fingerprint —
  map-side combinable, no window, no sort.
- **MinHash LSH**: shingle → H portable min-hashes → band keys → self-join
  on band key.  The only shuffle keys are band hashes (uniform by
  construction), so the candidate join never skews; at 100 TB you bound
  candidate blowup by banding (r rows/band) instead of an O(n²) cross.
- **n-gram Jaccard**: exact verification on candidate pairs only
  (explode-join-aggregate), the standard verify step after LSH.
- Hash primitive is selectable via ``hash_fn``: ``"md5"`` (default —
  identical bytes in Spark and DuckDB, so every operator here is
  oracle-checkable cross-engine) or ``"xxhash64"`` (production mode —
  Spark's native 64-bit hash, no hex round-trip, measurably faster;
  engine-private, so candidate SETS are verified equivalent against the
  md5 mode in tests rather than against the SQL oracle).  Either way the
  min-hash family is ONE hash per shingle, then H XOR permutations (pure
  long arithmetic, whole-stage codegen) — not H hash calls: hashing cost
  is O(shingles), not O(shingles × H).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Column, functions as F


def _canon(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(col) -> Column:
    t = F.trim(_canon(col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def shingles(col, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string> column.

    The token array is bound ONCE per row as a lambda variable
    (``transform(array(tokens), tt -> ...)``) before the per-shingle
    loop: referencing the raw tokenize expression inside the inner
    lambda re-evaluates the regex split per element (interpreted HOFs
    don't CSE across lambda invocations), which measured 10x slower
    (7.3s vs 0.7s warm for the sf0.1 shingle explode)."""

    def _build(tt):
        return F.array_distinct(
            F.when(
                F.size(tt) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(tt) - k),
                    lambda i: F.concat_ws(" ", F.slice(tt, i + 1, k)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", tt)))
        )

    return F.transform(F.array(tokens(col)), _build)[0]


def _check_hash_fn(hash_fn: str) -> None:
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def content_fingerprint(text_col, hash_fn: str = "md5") -> Column:
    """Canonical-content fingerprint expression shared by the exact-dedup
    family: md5 hex in oracle mode; in production mode 128 bits from two
    seeded xxhash64 passes — same collision regime as md5 without the hex
    materialization."""
    _check_hash_fn(hash_fn)
    if hash_fn == "md5":
        return F.md5(_canon(text_col))
    return F.concat_ws(
        ":",
        F.xxhash64(_canon(text_col)).cast("string"),
        F.xxhash64(F.lit("fp2"), _canon(text_col)).cast("string"),
    )


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Exact-duplicate groups on canonicalized content: per fingerprint the
    kept (minimum) id and the duplicate count.  Single hash aggregate."""
    fp = content_fingerprint(text_col, hash_fn)
    return (
        docs.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def family_constant(i: int) -> int:
    """Deterministic 60-bit XOR-permutation constant for hash family i —
    identical on the oracle side (derived with the same md5 recipe)."""
    return int(hashlib.md5(f"family:{i}".encode()).hexdigest()[:15], 16)


def shingle_base_hash(sh: Column, hash_fn: str = "md5") -> Column:
    """One 64-bit-ish base hash per shingle; hash families are XOR
    permutations of this base.

    - ``md5``: folded to a 60-bit long via hex (portable: DuckDB mirrors
      with ``('0x' || substr(md5(s),1,15))::BIGINT``).
    - ``xxhash64``: Spark's native long hash — no hex string round-trip,
      the production fast path."""
    if hash_fn == "xxhash64":
        return F.transform(sh, lambda s: F.xxhash64(s))
    return F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """H engine-portable min-hashes per doc (bigint columns mh_0..mh_H-1).

    Family i = ``min(base_hash(s) XOR C_i)`` over the doc's shingles; the
    XOR constants are a (weak but standard) permutation family, and the
    whole signature costs one base hash + H long-XORs per shingle — all
    whole-stage codegen, no Python."""
    _check_hash_fn(hash_fn)
    # explode to one row per (doc, shingle-hash), then H plain `min`
    # aggregates: md5 runs once per shingle, the aggregate is map-side
    # combinable (shuffle carries ~#docs x H longs, not shingles), and no
    # per-shingle arrays are allocated (an array-fold variant measured 2x
    # slower; H separate array_min(transform) columns 13x slower — they
    # re-evaluate the md5 pipeline per column)
    ex = docs.select(
        F.col(id_col),
        F.explode(
            shingle_base_hash(shingles(text_col, shingle_k), hash_fn)
        ).alias("_b"),
    )
    return ex.groupBy(id_col).agg(
        *[
            F.min(F.col("_b").bitwiseXOR(F.lit(family_constant(i)))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc LSH band keys: ``(id, band_idx, band_key)`` long form.

    This is the *persistable* side of the LSH index: write it out
    (bucketed by ``band_key``) and later batches probe it with
    ``incremental_lsh_candidates`` instead of re-shingling the corpus.
    """
    assert num_hashes % bands == 0
    _check_hash_fn(hash_fn)
    r = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k, hash_fn)

    # band index folded into the hash input → a single-column join key with
    # no cross-band false joins (and, in md5 mode, a trivially mirrorable
    # SQL oracle); xxhash64 mode hashes the longs directly — no string
    # concat in the hot loop
    def _band_key(b: int) -> Column:
        members = [F.col(f"mh_{b * r + j}") for j in range(r)]
        if hash_fn == "xxhash64":
            return F.xxhash64(F.lit(b), *members)
        return F.md5(
            F.concat_ws("|", F.lit(str(b)), *[m.cast("string") for m in members])
        )

    band_cols = [_band_key(b).alias(f"band_{b}") for b in range(bands)]
    banded = sig.select(F.col(id_col), *band_cols)
    return banded.unpivot(
        id_col, [f"band_{b}" for b in range(bands)], "band_idx", "band_key"
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band.

    Signature split into ``bands`` bands of r = H/bands rows; band key =
    hash of the concatenated band slice; self-join per band; pairs
    deduped with id_a < id_b.
    """
    long = lsh_band_keys(
        docs, id_col, text_col, num_hashes, bands, shingle_k, hash_fn
    )
    left = long.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_key"
    )
    right = long.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity per pair.

    With ``pairs`` given (id_a, id_b), verifies only those candidates —
    the LSH-then-verify pattern.  The candidate restriction is applied
    BEFORE the shingle self-join (semi-join of the exploded shingles to
    the ids appearing in ``pairs``), so verification cost is
    O(candidate docs' shingles), not O(all docs' shingles) — at 100 TB
    the candidate set is orders of magnitude smaller than the corpus.
    Without ``pairs``, compares all pairs sharing at least one shingle
    (still never a cross join: the shingle join IS the candidate
    generator).
    """
    sh = docs.select(
        F.col(id_col), shingles(text_col, shingle_k).alias("sh"), F.size(
            shingles(text_col, shingle_k)
        ).alias("n_sh"),
    )
    ex = sh.select(id_col, "n_sh", F.explode("sh").alias("s"))
    if pairs is not None:
        # prune EARLY: only docs named in a candidate pair enter the
        # self-join (LSH already did discovery; verify must not re-pay it)
        cand_ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        ex = ex.join(cand_ids, id_col, "left_semi")
    a = ex.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"), "s")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if pairs is not None:
        # exact restriction to the candidate PAIRS (two candidate docs may
        # share shingles without being an LSH candidate pair)
        common = common.join(pairs, ["id_a", "id_b"], "left_semi")
    return common.select(
        "id_a",
        "id_b",
        F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a pair graph → ``(doc_id, cluster_id)``
    with cluster_id = the component's minimum doc id.

    Algorithm: iterative min-label propagation — each round every node
    takes ``min(own label, neighbors' labels)`` (one join + one
    map-side-combinable min aggregate per round), with ``localCheckpoint``
    per round to keep lineage flat and a driver-side convergence check
    (labels-changed count).  Rounds needed = graph diameter; LSH
    near-duplicate components are band-collision cliques of tiny
    diameter, so 2-3 rounds settle real corpora.  For adversarial
    long-chain graphs at web scale, swap in alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce"),
    which is O(log²) rounds of the same join+agg shape — the plumbing
    here (flat-lineage loop, checkpointed labels) is already the harness
    it needs.

    Reference analog: none (the reference dedups exact rows only); this
    is the missing step between candidate PAIRS and usable duplicate
    GROUPS (keep one doc per cluster) in the training-data pipeline.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    # symmetric closure; distinct so multi-band pairs don't amplify
    edges = (
        edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["b"] == labels["id"])
            .select(edges["a"].alias("id"), "label")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def simhash_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-doc SimHash: sign-aggregated token-hash bits → one integer.

    Token hash = first 8 hex chars of md5 (32 bits, engine-portable via
    conv/hex-cast).  Implemented as explode + 32 conditional sums in ONE
    hash aggregate — vectorized, no UDF, map-side combinable.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.alias("simhash"))


# ---------------------------------------------------------------------------
# Incremental dedup — new-batch vs already-ingested corpus
#
# The CDC-shaped variant of the family above: once a corpus is ingested,
# dedup of each NEW change-batch must not re-read (let alone re-shingle)
# corpus text.  The corpus side is a compact index instead:
#
#   exact    → fingerprint_ledger:  (fingerprint, owner_id)
#   near-dup → lsh_band_keys:       (doc_id, band_idx, band_key)
#
# Both are O(distinct docs) small relative to content, persist as bucketed
# tables (bucket by fingerprint / band_key), and make every batch probe a
# co-located join.  Accepted rows ARE the ledger increment — append them
# and the next batch sees them, which is exactly the monotonic-ledger
# shape the CDC merge engine already uses for LSNs (lake/table.py).
# ---------------------------------------------------------------------------


def fingerprint_ledger(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Compact ``(fingerprint, owner_id)`` ledger of an ingested corpus.

    owner = min id per fingerprint — the deterministic canonical document
    that later duplicates point at.  One map-side-combinable aggregate;
    at scale, write it ``bucketBy(fingerprint)`` so batch probes skip the
    shuffle."""
    return (
        docs.select(
            content_fingerprint(text_col, hash_fn).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("owner_id"))
    )


def incremental_exact_dedup(
    batch: DataFrame,
    ledger: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Dedup a new batch against the corpus fingerprint ledger + itself.

    Returns one row per batch doc: ``(doc_id, fingerprint, status,
    dup_of)`` with status ∈ {'accepted', 'dup_corpus', 'dup_batch'}:

    - **dup_corpus**: fingerprint already in the ledger → points at the
      corpus owner (corpus precedence is what makes replay idempotent —
      re-delivering an accepted batch marks every row dup_corpus).
    - **dup_batch**: first occurrence in THIS batch wins (min id);
      losers point at the batch winner.
    - **accepted**: the ledger increment — union ``(fingerprint,
      doc_id)`` of these back into the ledger for the next batch.

    Plan shape: one fingerprint scan of the batch, one groupBy(fp) for
    the batch winner, one left join against the ledger on fp.  Keys are
    uniform hashes → no skew; corpus text is never touched."""
    fp = (
        batch.select(
            F.col(id_col),
            content_fingerprint(text_col, hash_fn).alias("fingerprint"),
        )
    )
    winners = fp.groupBy("fingerprint").agg(F.min(id_col).alias("_batch_winner"))
    led = ledger.select("fingerprint", F.col("owner_id").alias("_owner"))
    return (
        fp.join(winners, "fingerprint")
        .join(led, "fingerprint", "left")
        .select(
            F.col(id_col),
            "fingerprint",
            F.when(F.col("_owner").isNotNull(), F.lit("dup_corpus"))
            .when(F.col(id_col) != F.col("_batch_winner"), F.lit("dup_batch"))
            .otherwise(F.lit("accepted"))
            .alias("status"),
            F.when(F.col("_owner").isNotNull(), F.col("_owner"))
            .when(F.col(id_col) != F.col("_batch_winner"), F.col("_batch_winner"))
            .alias("dup_of"),
        )
    )


def incremental_lsh_candidates(
    batch: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate candidates for a new batch: vs the corpus band
    index AND within the batch itself.

    ``corpus_bands`` is a persisted ``lsh_band_keys`` output — only the
    BATCH is shingled/hashed here; the corpus side contributes index rows
    (``#docs × bands`` longs), so per-batch cost is O(batch shingles) +
    a band-key join whose keys are uniform by construction.

    Returns ``(id_new, id_other, origin)`` with origin ∈ {'corpus',
    'batch'}; within-batch pairs are emitted once (id_new < id_other)."""
    nb = lsh_band_keys(
        batch, id_col, text_col, num_hashes, bands, shingle_k, hash_fn
    )
    cb = corpus_bands.select(
        F.col(id_col).alias("id_other"), "band_idx", "band_key"
    )
    cross = (
        nb.select(F.col(id_col).alias("id_new"), "band_idx", "band_key")
        .join(cb, ["band_idx", "band_key"])
        .select("id_new", "id_other", F.lit("corpus").alias("origin"))
    )
    left = nb.select(F.col(id_col).alias("id_new"), "band_idx", "band_key")
    right = nb.select(F.col(id_col).alias("id_other"), "band_idx", "band_key")
    within = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_new") < F.col("id_other"))
        .select("id_new", "id_other", F.lit("batch").alias("origin"))
    )
    return cross.unionByName(within).distinct()


def dup_shingle_fraction(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Cross-document duplicate-span signal: per doc, the fraction of its
    word k-shingles that also occur in at least one OTHER document — the
    "duplicated substring" filter of training-data pipelines (flag or
    trim docs dominated by boilerplate shared across the corpus).
    Distinct from ``curation.repetition_signals``, which measures repeats
    WITHIN a doc.

    Shape: one shingle explode, one count-distinct-docs aggregate over
    shingle keys (partial aggs absorb hot stopword shingles), one join
    back on the same keys, one per-doc aggregate.  No pair join — cost is
    O(total shingles), never O(docs²)."""
    ex = docs.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("_s")
    )
    dup = (
        ex.groupBy("_s")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("_s", F.lit(1).alias("_dup"))
    )
    return (
        ex.join(dup, "_s", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0)).alias(
                "n_dup"
            ),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 6).alias("dup_frac"),
        )
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """End-to-end near-duplicate REMOVAL: given candidate pairs, cluster
    them (connected components) and keep exactly one canonical doc per
    cluster — the minimum id, the usual deterministic tie-break — while
    every un-paired doc passes through untouched.

    Shape: the CC loop runs only over docs that appear in a pair (near
    -dup graphs at corpus scale are a small fraction of the corpus); the
    corpus itself is touched by ONE left-anti join against the loser id
    set.  Composes with any pair source: LSH candidates, LSH-then-verify
    confirmed pairs, or embedding near-dup pairs."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = (
        cc.filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
