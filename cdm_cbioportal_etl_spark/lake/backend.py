"""Merge-backend seam: the minimal surface the CDC engine needs from a
lake table, with two implementations —

- :class:`~cdm_cbioportal_etl_spark.lake.table.LakeTable` (built-in,
  jar-free: portable snapshot/bucket format, COW + MOR modes), and
- :class:`IcebergBackend` (Apache Iceberg ``MERGE INTO`` through Spark
  SQL, for clusters that ship iceberg-spark-runtime jars).

table.py:15 promises the bucket layout "is swappable for Apache Iceberg
MERGE INTO with a bucket partition spec" — this module is that seam made
checkable: the protocol is structural (``runtime_checkable``), LakeTable
already satisfies it unchanged, and the Iceberg implementation maps each
protocol method onto Iceberg's native equivalent (CREATE TABLE ... USING
iceberg PARTITIONED BY bucket(), MERGE INTO, rewrite_data_files,
snapshot history).  Tests parametrize the replay flow over both and skip
the Iceberg leg when the runtime jars are absent (they are not baked
into this sandbox).

Semantics parity notes (documented, not hidden):

- Latest-LSN-wins winner reduction happens BEFORE the merge in both
  backends (``reduce_winners`` — same map-side-combinable ``max_by``
  LakeTable.prepare_batch uses), so MERGE sources are key-unique as
  Iceberg requires (cardinality check).
- The exactly-once ledger: LakeTable commits applied_lsn atomically
  inside the same snapshot manifest as the data.  Iceberg's analog is a
  snapshot summary property — committed by the SAME MERGE commit via the
  write property ``snapshot-property.applied-lsn``; ``applied_lsn``
  reads it back from the current snapshot.  Re-applying an old batch is
  prevented the same way LakeTable does it: winners are filtered to
  ``_lsn > applied_lsn`` before the merge.

Jar status (recorded so the claim is auditable): vendoring
iceberg-spark-runtime was attempted and is impossible in this sandbox —
there is no external DNS (``repo1.maven.org`` unresolvable, verified
with curl), no ivy cache, and no Iceberg jar anywhere on disk.  In lieu
of the live Iceberg leg, :class:`ParquetMergeBackend` below is a THIRD,
structurally different implementation of the same protocol (versioned
parquet snapshots + a pointer file; MERGE expressed as the
full-outer-join plan Iceberg's MERGE INTO physically executes), and the
conformance test drives the identical replay flow over LakeTable AND
ParquetMergeBackend non-skipped — the protocol itself, not one
implementation, is what the tests pin down.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake.table import LSN_COL


@runtime_checkable
class MergeBackend(Protocol):
    """What the replay engine requires of a lake table.

    LakeTable satisfies this structurally (no inheritance needed);
    IcebergBackend implements it over an Iceberg catalog table.
    """

    @property
    def schema(self) -> T.StructType: ...

    @property
    def key_cols(self) -> list[str]: ...

    def read(self) -> DataFrame: ...

    def merge(self, batch: DataFrame) -> object: ...

    def compact(self) -> int: ...

    def row_count(self) -> int: ...

    def applied_lsn(self) -> int: ...


def reduce_winners(batch: DataFrame, key_cols: list[str], lsn_col: str = "lsn") -> DataFrame:
    """Latest-LSN-wins per key: ONE aggregation (``max_by(struct, lsn)``)
    with map-side partial combine, so hot keys pre-reduce before the
    single key exchange — the same shape as LakeTable.prepare_batch's
    shuffle path.  (Physically a SortAggregate — struct-valued max_by —
    with per-partition local sorts; no window, no global sort.)"""
    payload = [c for c in batch.columns if c not in key_cols]
    agg = batch.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(lsn_col)).alias("_w")
    )
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True when an Iceberg Spark catalog is configured AND its classes
    load — the skip condition for the Iceberg leg of backend tests."""
    if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class ParquetMergeBackend:
    """Conformance reference: the MergeBackend protocol over plain
    versioned parquet snapshots — NO bucket manifests, NO per-file
    stats, none of LakeTable's machinery.  Each merge writes a new
    ``v<N>/`` snapshot directory and atomically swings a pointer file
    that also carries the applied-LSN ledger (data + ledger move
    together, the same atomicity contract LakeTable and Iceberg's
    snapshot-summary property give).

    The merge itself is expressed as the FULL OUTER JOIN between target
    and winner-reduced source that Iceberg's MERGE INTO physically
    plans: matched+delete drops the row, matched+upsert takes the
    source image, unmatched target rows pass through, unmatched
    non-delete source rows insert.  Purpose: prove the replay flow is
    pinned to the PROTOCOL, not to LakeTable's implementation — the
    in-sandbox stand-in for the jar-gated Iceberg leg."""

    def __init__(self, spark: SparkSession, root: str, key_cols: list[str],
                 schema: T.StructType) -> None:
        import os

        self.spark = spark
        self.root = root
        self._key_cols = list(key_cols)
        self._schema = schema
        self._ptr = os.path.join(root, "POINTER")

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 4,  # accepted for signature parity; unused
    ) -> "ParquetMergeBackend":
        import json
        import os

        os.makedirs(root, exist_ok=True)
        be = cls(spark, root, key_cols, schema)
        with open(be._ptr, "w") as fh:
            json.dump({"version": 0, "applied_lsn": -1, "data": None}, fh)
        return be

    def _pointer(self) -> dict:
        import json

        with open(self._ptr) as fh:
            return json.load(fh)

    def _swing(self, ptr: dict) -> None:
        import json
        import os

        tmp = self._ptr + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ptr, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._ptr)

    # protocol surface ------------------------------------------------- #
    @property
    def schema(self) -> T.StructType:
        return self._schema

    @property
    def key_cols(self) -> list[str]:
        return list(self._key_cols)

    def read(self) -> DataFrame:
        import os

        ptr = self._pointer()
        if ptr["data"] is None:
            return self.spark.createDataFrame([], self._schema)
        return self.spark.read.parquet(os.path.join(self.root, ptr["data"])).select(
            *[f.name for f in self._schema.fields]
        )

    def row_count(self) -> int:
        return self.read().count()

    def applied_lsn(self) -> int:
        return int(self._pointer()["applied_lsn"])

    def merge(self, batch: DataFrame, lsn_col: str = "lsn",
              op_col: str = "op") -> dict:
        import os

        ptr = self._pointer()
        applied = int(ptr["applied_lsn"])
        winners = reduce_winners(batch, self._key_cols, lsn_col).filter(
            F.col(lsn_col) > F.lit(applied)
        )
        stats = winners.agg(
            F.count(F.lit(1)).alias("keys"),
            F.coalesce(F.max(lsn_col), F.lit(applied)).alias("max_lsn"),
        ).collect()[0]
        if stats["keys"] == 0:
            return {"keys": 0, "max_lsn": applied, "skipped": True}
        data_cols = [f.name for f in self._schema.fields if f.name not in self._key_cols]
        t = self.read().alias("t")
        s = winners.alias("s")
        on = [t[k].eqNullSafe(s[k]) for k in self._key_cols]
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        merged = (
            t.join(s, cond, "full_outer")
            # source-matched deletes vanish; everything else resolves to
            # the source image when present, else the target image
            .filter(~(s[op_col] == "delete").eqNullSafe(F.lit(True)))
            .select(
                *[F.coalesce(s[k], t[k]).alias(k) for k in self._key_cols],
                *[
                    F.when(s[lsn_col].isNotNull(), s[c]).otherwise(t[c]).alias(c)
                    for c in data_cols
                ],
            )
        )
        new_version = int(ptr["version"]) + 1
        rel = f"v{new_version:06d}"
        merged.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        self._swing(
            {"version": new_version, "applied_lsn": int(stats["max_lsn"]), "data": rel}
        )
        return {"keys": int(stats["keys"]), "max_lsn": int(stats["max_lsn"]),
                "skipped": False}

    def compact(self) -> int:
        import os

        ptr = self._pointer()
        if ptr["data"] is None:
            return 0
        rel = f"v{int(ptr['version']) + 1:06d}"
        self.read().coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, rel)
        )
        self._swing({**ptr, "version": int(ptr["version"]) + 1, "data": rel})
        return 1


class IcebergBackend:
    """Iceberg-native implementation of the merge seam.

    Requires a session configured with iceberg-spark-runtime and a
    catalog (e.g. ``spark.sql.catalog.local`` = SparkCatalog,
    type=hadoop, warehouse=...).  Table layout mirrors LakeTable: user
    columns + ``_lsn``, partitioned by ``bucket(n, first-key)`` so MERGE
    prunes to touched buckets — the exact swap table.py:15 promises.
    """

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        key_cols: list[str],
    ) -> None:
        self.spark = spark
        self.identifier = identifier
        self._key_cols = list(key_cols)

    # ---------------------------------------------------------------- #
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        identifier: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> "IcebergBackend":
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {identifier} ({cols}, `{LSN_COL}` BIGINT) "
            f"USING iceberg "
            f"PARTITIONED BY (bucket({n_buckets}, `{key_cols[0]}`)) "
            f"TBLPROPERTIES ('format-version'='2', "
            f"'write.merge.mode'='merge-on-read')"
        )
        return cls(spark, identifier, key_cols)

    # ---------------------------------------------------------------- #
    @property
    def schema(self) -> T.StructType:
        fields = [
            f
            for f in self.spark.table(self.identifier).schema.fields
            if f.name != LSN_COL
        ]
        return T.StructType(fields)

    @property
    def key_cols(self) -> list[str]:
        return list(self._key_cols)

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier).drop(LSN_COL)

    def row_count(self) -> int:
        return self.spark.table(self.identifier).count()

    def applied_lsn(self) -> int:
        """Ledger read: the applied-lsn summary property of the current
        snapshot (committed atomically by the MERGE that carried it)."""
        rows = (
            self.spark.sql(
                f"SELECT summary['applied-lsn'] AS lsn "
                f"FROM {self.identifier}.snapshots "
                f"ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
            )
        ).collect()
        if not rows or rows[0].lsn is None:
            return -1
        return int(rows[0].lsn)

    # ---------------------------------------------------------------- #
    def merge(
        self, batch: DataFrame, lsn_col: str = "lsn", op_col: str = "op"
    ) -> dict:
        """Exactly-once idempotent upsert of a change-event batch —
        LakeTable.merge's convention (key cols + payload + op upsert/delete +
        lsn): winner-reduce, drop already-applied LSNs, then ONE
        Iceberg MERGE INTO whose commit also advances the ledger
        property."""
        applied = self.applied_lsn()
        winners = reduce_winners(batch, self._key_cols, lsn_col).filter(
            F.col(lsn_col) > F.lit(applied)
        )
        stats = winners.agg(
            F.count(F.lit(1)).alias("keys"),
            F.coalesce(F.max(lsn_col), F.lit(applied)).alias("max_lsn"),
        ).collect()[0]
        if stats["keys"] == 0:
            return {"keys": 0, "max_lsn": applied, "skipped": True}
        # the MERGE commit carries the ledger advance in its snapshot
        # summary -> data + ledger move atomically, as in LakeTable
        self.spark.conf.set(
            "spark.wap.snapshot-property.applied-lsn", str(int(stats["max_lsn"]))
        )
        winners = winners.withColumnRenamed(lsn_col, LSN_COL)
        view = f"_cdc_src_{abs(hash(self.identifier)) % 10**8}"
        winners.createOrReplaceTempView(view)
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in self._key_cols)
        payload_cols = [
            c for c in winners.columns if c not in (*self._key_cols, op_col)
        ]
        set_clause = ", ".join(f"t.`{c}` = s.`{c}`" for c in payload_cols)
        insert_cols = ", ".join(
            f"`{c}`" for c in (*self._key_cols, *payload_cols)
        )
        insert_vals = ", ".join(
            f"s.`{c}`" for c in (*self._key_cols, *payload_cols)
        )
        self.spark.sql(
            f"MERGE INTO {self.identifier} t USING {view} s ON {on} "
            f"WHEN MATCHED AND s.`{op_col}` = 'delete' THEN DELETE "
            f"WHEN MATCHED THEN UPDATE SET {set_clause} "
            f"WHEN NOT MATCHED AND s.`{op_col}` != 'delete' "
            f"THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
        )
        self.spark.catalog.dropTempView(view)
        return {
            "keys": int(stats["keys"]),
            "max_lsn": int(stats["max_lsn"]),
            "skipped": False,
        }

    def compact(self) -> int:
        """Fold MOR deltas back into base files (Iceberg's
        rewrite_data_files action — LakeTable.compact's analog)."""
        catalog = self.identifier.split(".", 1)[0]
        out = self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files(table => "
            f"'{self.identifier.split('.', 1)[1]}')"
        ).collect()
        return int(out[0][0]) if out else 0
