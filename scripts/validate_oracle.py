"""Local replica of the driver's correctness gate: run every catalog query
in Spark and its oracle in DuckDB at sf0.01, compare row count, column
names, and order-insensitive values at FULL precision (floats via repr —
no %.6g masking; round in both engines' SQL instead if bit-level drift is
expected). Type-level drift (e.g. DuckDB HUGEINT -> decimal128 vs Spark
BIGINT, round-3's one red row) is caught by the companion gate
scripts/audit_oracle_types.py which compares Arrow schemas — run both."""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402
from cdm_cbioportal_etl_spark.plans import ORACLES, QUERIES  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    # Type-tagged exact canonicalization: int 7 and float 7.0 must NOT
    # collide (the driver's hash is type-sensitive), and floats compare
    # at full precision via repr.
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(canon_cell(r[i]) for i in order) for r in rows)


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark("validate")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    attempted = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error {str(ex)[:200]}")
            continue
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"cols {s_cols} vs {d_cols}"))
            print(f"FAIL  {name}: columns {s_cols} vs {d_cols}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount {len(s_rows)} vs {len(d_rows)}"))
            print(f"FAIL  {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            continue
        a = canon_rows(s_cols, s_rows)
        b = canon_rows(d_cols, d_rows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ e.g. {diff}")
            continue
        print(f"OK    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{attempted - len(failures)}/{attempted} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:] or None))
