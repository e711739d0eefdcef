"""Training-data curation operators over the documents table.

The dataset-assembly steps a large-scale pretraining pipeline runs after
dedup/quality scoring: deterministic train/val/test splitting, per-source
mixture sampling, vocabulary building, benchmark-contamination checks,
quantile-based quality filtering, PII masking, and token-budget sequence
packing.  All but packing are pure column expressions / built-in
aggregations (JVM-side, whole-stage codegen) with exact DuckDB oracles in
plans/catalog.py; packing is an ``applyInPandas`` grouped kernel (greedy
fill is inherently sequential per group) gated by an invariant contract.

Hash-derived decisions (splits, sampling) use the same engine-portable
md5-fold idiom as text.dedup (``shingle_base_hash``): DuckDB mirrors
``F.conv(F.substring(F.md5(s), 1, 8), 16, 10)`` with
``('0x' || substr(md5(s), 1, 8))::BIGINT``, so the oracle reproduces the
exact membership decisions, not just aggregate rates.

Scale notes (100 TB): splitting / sampling / masking are zero-shuffle map
stages over the documents scan.  The vocabulary build is one map-side-
combinable count aggregate + a TakeOrdered top-k (no global sort).  The
contamination check broadcasts the benchmark shingle set (benchmark
suites are thousands of docs — MB-scale — by construction) so the sweep
over training data stays a broadcast semi-join, no shuffle of the corpus.
Packing shuffles once on the group key; within a group the greedy fill is
O(docs-in-group) in a single Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import shingles, tokens


def _hash_bucket(col, seed: int, mod: int) -> Column:
    """Deterministic bucket in [0, mod): md5 of "value:seed" folded to a
    32-bit long (engine-portable — see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    tagged = F.concat_ws(":", c.cast("string"), F.lit(str(seed)))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long") % mod
    )


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Append a deterministic ``split`` column (train/val/test).

    Membership is a pure function of the row id and seed — stable across
    runs, retries, cluster sizes, and data order, which is what makes the
    split reproducible at 100 TB (no sampled RNG state to checkpoint).
    """
    b = _hash_bucket(id_col, seed, 1000)
    return docs.withColumn(
        "split",
        F.when(b < int(train * 1000), F.lit("train"))
        .when(b < int((train + val) * 1000), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-group subsampling to hit a target source mixture
    (e.g. upweight curated sources, downweight crawl).  A row survives iff
    its id-hash bucket falls under its group's rate — exact, reproducible
    membership, no RNG."""
    rate = None
    for g, r in sorted(rates.items()):
        cond = F.col(group_col) == g
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    b = _hash_bucket(id_col, seed, 1_000_000)
    return docs.filter(b < (rate * 1_000_000).cast("long"))


def vocab_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 50,
) -> DataFrame:
    """Corpus vocabulary: top-N terms by total frequency with document
    frequency alongside (the tf/df pair an IDF table needs).

    One explode + one combinable aggregate; the top-N is TakeOrdered
    (per-partition heaps), never a global sort.  Ties break on the term
    for determinism."""
    ex = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    counts = ex.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(F.col(id_col)).alias("df"),
    )
    top = counts.orderBy(F.desc("tf"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return top.select(
        "term", "tf", "df", F.row_number().over(w).cast("long").alias("rank")
    )


def contamination_check(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination scan: for each training doc, the fraction
    of its distinct k-gram shingles that appear anywhere in the eval
    (benchmark) corpus; docs above ``flag_threshold`` are flagged for
    removal.  This is the n-gram-overlap decontamination step from the
    GPT-3/PaLM data papers.

    The eval shingle set is broadcast (benchmark suites are small by
    construction), so the training sweep is ONE pass: scan + explode,
    broadcast left-join marking hits, and a single combinable aggregate
    counting total and hit shingles together — the corpus is neither
    shuffled nor exploded twice."""
    ev = (
        eval_docs.select(F.explode(shingles(text_col, shingle_k)).alias("_s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ex = train_docs.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("_s")
    )
    agg = (
        ex.join(F.broadcast(ev), "_s", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hits"),
        )
    )
    frac = F.col("n_hits") / F.col("n_shingles")
    return agg.select(
        id_col,
        "n_shingles",
        "n_hits",
        F.round(frac, 4).alias("contamination"),
        (frac >= flag_threshold).alias("flagged"),
    )


def quality_percent_rank_filter(
    docs: DataFrame,
    quality_col: Column,
    id_col: str = "doc_id",
    drop_bottom: float = 0.1,
) -> DataFrame:
    """Drop the bottom ``drop_bottom`` quantile of docs by quality score.

    Membership uses ``percent_rank`` ((rank-1)/(n-1), ties share a rank)
    rather than an interpolated quantile threshold, so the cut is an
    exact rational of integers — bit-identical across engines, no
    float-boundary flakiness.  The single global-order window is the
    documented cost: at 100 TB you would pre-aggregate a quality
    histogram, derive the threshold from it, and filter map-side; the
    windowed form here is the exact-semantics reference."""
    scored = docs.select(F.col(id_col), F.round(quality_col, 4).alias("quality"))
    w = Window.orderBy("quality")
    pr = F.percent_rank().over(w)
    return (
        scored.withColumn("pr", F.round(pr, 6))
        .filter(F.col("pr") >= drop_bottom)
        .select(id_col, "quality", "pr")
    )


# PII patterns kept to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB): plain character classes, no backrefs or lookaround.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9() .-]{6,}[0-9]"


def lm_perplexity_score(
    docs: DataFrame,
    ref_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style perplexity-proxy quality signal: per-doc average
    surprisal (bits/token) under an add-α-smoothed UNIGRAM language
    model trained on ``ref_docs`` (default: the corpus itself).  Low
    bits = looks like the reference distribution (CCNet keeps the
    head/middle perplexity buckets); high bits / high OOV = gibberish,
    wrong language, or boilerplate the reference never saw.

    P(w) = (C(w) + α) / (N + α·(V+1)) with one reserved OOV slot, so
    unseen tokens score the same explicit floor instead of -inf.

    Shape at 100 TB: one combinable term-count aggregate over the
    reference, a scalar (N, V) row broadcast, one token-keyed join of
    the scored corpus against the term table (uniform hash keys — the
    LM table is orders of magnitude smaller than the corpus and
    broadcastable when it fits), one per-doc average.  No UDFs, no
    global sort.  Returns (doc_id, n_tokens, n_oov, avg_bits); docs
    with zero tokens are absent (no surprisal is defined for them).
    """
    ref = ref_docs if ref_docs is not None else docs
    counts = (
        ref.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
    )
    stats = counts.agg(
        F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    ex = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    scored = (
        ex.join(counts, "term", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                -F.log2(
                    (F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(alpha))
                    / (F.col("_n") + F.lit(alpha) * (F.col("_v") + 1))
                )
            ).alias("_bits"),
            F.col("_c").isNull().cast("int").alias("_oov"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_oov").cast("long").alias("n_oov"),
        F.round(F.avg("_bits"), 4).alias("avg_bits"),
    )


def pii_mask(col) -> Column:
    """Mask emails then phone-number-shaped digit runs — the cheap
    regex-only PII scrub pass (order matters: emails can contain digit
    runs).  Pure column expression, zero-shuffle map stage."""
    c = F.col(col) if isinstance(col, str) else col
    masked = F.regexp_replace(c, _PII_EMAIL, "[EMAIL]")
    return F.regexp_replace(masked, _PII_PHONE, "[PHONE]")


def repetition_signals(col, k: int = 2) -> Column:
    """Gopher-style within-document repetition signals as a struct:

    - ``dup_token_frac``: 1 - distinct_tokens / total_tokens — the
      duplicate-word fraction;
    - ``top_gram_frac``: occurrences of the single most frequent word
      k-gram / total k-gram occurrences (non-distinct) — the
      "top n-gram fraction" repetition filter from the Gopher / RefinedWeb
      data-quality recipes.

    Pure column expressions, zero shuffle: the k-gram multiset is built
    per row, sorted, and its longest equal-run found with one
    ``aggregate`` fold (equal grams are adjacent after the sort, so the
    max run IS the max multiplicity).  Both the token array and the gram
    array are bound once per row as lambda variables (the
    ``transform(array(x), v -> ...)[0]`` idiom — interpreted HOFs don't
    CSE across lambda invocations, see text.dedup.shingles).

    At 100 TB this is a map-only stage over the documents scan; the fold
    is O(grams·log grams) per row with no per-row Python.
    """

    def _ratios(tt: Column, gg: Column) -> Column:
        zero = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def _step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        best = F.aggregate(F.array_sort(gg), zero, _step, lambda acc: acc["best"])
        top_frac = F.when(
            F.size(gg) > 0, best.cast("double") / F.size(gg)
        ).otherwise(F.lit(0.0))
        dup_frac = F.when(
            F.size(tt) > 0,
            F.lit(1.0) - F.size(F.array_distinct(tt)).cast("double") / F.size(tt),
        ).otherwise(F.lit(0.0))
        return F.struct(
            F.round(dup_frac, 4).alias("dup_token_frac"),
            F.round(top_frac, 4).alias("top_gram_frac"),
        )

    def _build(tt: Column) -> Column:
        grams = (
            F.when(
                F.size(tt) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(tt) - k),
                    lambda i: F.concat_ws(" ", F.slice(tt, i + 1, k)),
                ),
            )
            .when(F.size(tt) > 0, F.array(F.concat_ws(" ", tt)))
            .otherwise(F.array().cast("array<string>"))
        )
        return F.transform(F.array(grams), lambda gg: _ratios(tt, gg))[0]

    return F.transform(F.array(tokens(col)), _build)[0]


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy token-budget sequence packing: within each group (ordered
    by id for determinism) documents fill a bin until adding the next one
    would exceed ``budget``, then a new bin starts — the pretraining
    batch-assembly step that turns variable-length docs into fixed-budget
    training sequences.

    The fill is inherently sequential per group (bin state carries
    across rows), so this is a grouped ``applyInPandas`` kernel: one
    shuffle on the group key, then O(rows) numpy-side per group in a
    single Arrow batch.  An oversized doc (tokens > budget) gets a bin of
    its own rather than being dropped."""
    import pandas as pd

    from .analysis import token_count

    sized = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, acc, cur = [], 0, 0
        for t in pdf["n_tokens"].tolist():
            if acc > 0 and acc + t > budget:
                cur += 1
                acc = 0
            acc += t
            bins.append(cur)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    out_schema = "grp string, doc_id long, n_tokens long, bin_id long"
    return (
        sized.groupBy("grp")
        .applyInPandas(_pack, schema=out_schema)
        .withColumnRenamed("grp", group_col)
    )
