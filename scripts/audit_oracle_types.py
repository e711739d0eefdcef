"""Audit per-column types between each Spark catalog query and its DuckDB
oracle. The driver's value-hash compare is type-sensitive (round-3 red on
dup_shingle_fraction_docs was DuckDB HUGEINT vs Spark BIGINT), so every
oracle column must land on the same Arrow-level type as Spark's output.

Usage: python scripts/audit_oracle_types.py [sf_dir] [names...]
Prints one line per query; MISMATCH lines list col -> (spark, duckdb).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402
from cdm_cbioportal_etl_spark.plans import ORACLES, QUERIES  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Spark simpleString -> acceptable DuckDB arrow type names
EQUIV = {
    "bigint": {"int64"},
    "int": {"int32"},
    "smallint": {"int16"},
    "tinyint": {"int8"},
    "double": {"double", "float64"},
    "float": {"float", "float32"},
    "string": {"string", "large_string", "utf8", "large_utf8"},
    "boolean": {"bool"},
    "date": {"date32[day]", "date32"},
    "binary": {"binary", "large_binary"},
    "timestamp": {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"},
    "timestamp_ntz": {"timestamp[us]", "timestamp[ns]"},
}


def compatible(spark_t: str, duck_t: str) -> bool:
    duck_t = duck_t.lower()
    if spark_t.startswith("array<") and duck_t.startswith(("list<", "large_list<")):
        inner_s = spark_t[6:-1]
        inner_d = duck_t.split("<", 1)[1].rsplit(">", 1)[0]
        if inner_d.startswith("item: "):
            inner_d = inner_d[6:]
        return compatible(inner_s, inner_d)
    if spark_t.startswith("decimal") and duck_t.startswith("decimal"):
        return spark_t.replace(" ", "") == duck_t.replace(" ", "")
    return duck_t in EQUIV.get(spark_t, {spark_t})


def main(sf_dir: str, only: list[str] | None = None) -> int:
    spark = get_spark("typeaudit")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_bad = 0
    for name in QUERIES:
        if only and name not in only:
            continue
        if name not in ORACLES:
            print(f"SKIP  {name} (rows-only)")
            continue
        try:
            sdf = QUERIES[name](spark, sf_dir)
            s_types = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as ex:  # pragma: no cover - diagnostic tool
            print(f"ERR   {name}: spark {str(ex)[:160]}")
            n_bad += 1
            continue
        try:
            tbl = con.sql(ORACLES[name]).arrow()
            d_types = {
                f.name.lower(): str(f.type) for f in tbl.schema
            }
        except Exception as ex:  # pragma: no cover
            print(f"ERR   {name}: duckdb {str(ex)[:160]}")
            n_bad += 1
            continue
        bad = {}
        for col, st in s_types.items():
            dt = d_types.get(col)
            if dt is None:
                bad[col] = (st, "<missing>")
            elif not compatible(st, dt):
                bad[col] = (st, dt)
        if bad:
            n_bad += 1
            print(f"MISMATCH {name}: {bad}")
        else:
            print(f"OK    {name}")
    print(f"\n{n_bad} queries with type mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(main(sf, sys.argv[2:] or None))
