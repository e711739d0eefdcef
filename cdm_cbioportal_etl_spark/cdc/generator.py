"""Deterministic synthetic WAL: change events over source-code repos.

Input shape mandated by BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``;
the change stream adds ``(lsn:long, op:string)``.

Fully distributed and reproducible: every column is a pure expression of
``lsn`` and the seed (hash-based PRNG via ``xxhash64``), so generating
10^10 events is an embarrassingly parallel ``spark.range`` with zero
driver-side data, zero Python row loops, and stable output under retries
(no ``rand()``, which re-draws on task retry).

Repo sizes are Zipf-skewed (power-law concentration of keys into a few hot
repos) to exercise the merge path's skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

_LANGS = ["python", "java", "ts", "go", "rust", "md"]


def _u01(col, salt: int, seed: int):
    """Deterministic uniform[0,1) from a column + salt (hash PRNG)."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / F.lit(1_000_000_007.0)


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 50,
    seed: int = 42,
    delete_frac: float = 0.05,
    zipf_exp: float = 3.0,
    lsn_start: int = 0,
    parallelism: int | None = None,
    content_repeat_max: int = 17,
) -> DataFrame:
    """Events lsn_start .. lsn_start+n_events-1, one row per LSN."""
    rng = spark.range(lsn_start, lsn_start + n_events, 1, parallelism or 32)
    u_repo = _u01(F.col("id"), 1, seed)
    u_path = _u01(F.col("id"), 2, seed)
    u_op = _u01(F.col("id"), 3, seed)
    u_len = _u01(F.col("id"), 4, seed)
    # Zipf-ish: pow(u, exp) concentrates mass near repo 0 (hot repos)
    repo_id = F.floor(F.pow(u_repo, F.lit(zipf_exp)) * F.lit(float(n_repos))).cast("int")
    path_id = F.floor(u_path * F.lit(float(paths_per_repo))).cast("int")
    commit = F.substring(
        F.sha2(F.concat_ws(":", F.lit("c"), F.col("id").cast("string"), F.lit(seed)), 256), 1, 40
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(5), F.lit(seed)), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    # pseudo-text 64..~64*content_repeat_max chars: repeat a seeded chunk
    chunk = F.sha2(F.concat_ws(":", F.lit("t"), F.col("id").cast("string"), F.lit(seed)), 256)
    content = F.repeat(chunk, (F.floor(u_len * (content_repeat_max - 1)) + 1).cast("int"))
    is_delete = u_op < F.lit(delete_frac)
    return rng.select(
        F.col("id").alias("lsn"),
        F.when(is_delete, F.lit("delete"))
        .when(u_op < F.lit(delete_frac + 0.2), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("org/repo-"), F.lpad(repo_id.cast("string"), 4, "0")).alias("repo"),
        F.concat(
            F.lit("src/dir"),
            F.pmod(path_id, F.lit(10)).cast("string"),
            F.lit("/file"),
            F.lpad(path_id.cast("string"), 4, "0"),
            F.lit(".py"),
        ).alias("path"),
        F.when(is_delete, F.lit(None)).otherwise(commit).alias("commit"),
        F.when(is_delete, F.lit(None)).otherwise(lang).alias("lang"),
        F.when(is_delete, F.lit(None)).otherwise(content).alias("content"),
    )
