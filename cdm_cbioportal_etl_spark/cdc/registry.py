"""Avro-style schema registry mediating evolution before upsert.

The reference evolves schemas implicitly — adding a YAML config widens the
merged summary table with new columns (reference
pipeline/lib/summary/summary_merger.py:196-250) and the metadata header is
regenerated from configs (reference
pipeline/summary/create_summary_header.py:42-201).  Here that becomes an
explicit, monotone registry: batch schemas are registered, diffed against
the table, and legal deltas (add column, int→long / float→double widening)
are applied as table DDL *before* the MERGE — events referencing a newer
schema can never apply ahead of the DDL they depend on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable, SchemaEvolutionError
from cdm_cbioportal_etl_spark.lake.table import _WIDENINGS, schema_to_json


class SchemaRegistry:
    """Monotone sequence of versioned schemas for one subject (table)."""

    def __init__(self) -> None:
        self.versions: list[T.StructType] = []

    def register(self, schema: T.StructType) -> int:
        """Validate compatibility vs latest and append; returns version id."""
        if self.versions:
            self._check_compatible(self.versions[-1], schema)
        if self.versions and schema_to_json(schema) == schema_to_json(self.versions[-1]):
            return len(self.versions) - 1
        self.versions.append(schema)
        return len(self.versions) - 1

    @staticmethod
    def _check_compatible(old: T.StructType, new: T.StructType) -> None:
        new_by_name = {f.name: f for f in new.fields}
        for f in old.fields:
            if f.name not in new_by_name:
                raise SchemaEvolutionError(f"column drop not allowed: {f.name}")
            t_old = f.dataType.simpleString()
            t_new = new_by_name[f.name].dataType.simpleString()
            if t_old != t_new and (t_old, t_new) not in _WIDENINGS:
                raise SchemaEvolutionError(f"illegal change {f.name}: {t_old}->{t_new}")

    def ensure_table_schema(self, table: LakeTable, batch: DataFrame) -> bool:
        """Register the batch's data schema and evolve the table if needed.

        Returns True when DDL was issued.  System/stream columns (lsn, op)
        are excluded from the subject schema.
        """
        data_fields = [
            f for f in batch.schema.fields if f.name not in ("lsn", "op", "_bucket")
        ]
        target, changed = merged_evolution(table.schema, data_fields)
        self.register(target)
        if changed:
            table.evolve_schema(target)
        return changed


def merged_evolution(
    table_schema: T.StructType, incoming: "list[T.StructField]"
) -> "tuple[T.StructType, bool]":
    """The registry's compatibility fold as a pure function: union the
    incoming fields into the table schema, applying legal widenings,
    rejecting everything else.  Shared by the typed batch path above and
    the wire-schema path (cdc/router.py auto_evolve)."""
    table_fields = {f.name: f for f in table_schema.fields}
    merged: list[T.StructField] = list(table_schema.fields)
    changed = False
    for f in incoming:
        cur = table_fields.get(f.name)
        if cur is None:
            merged.append(T.StructField(f.name, f.dataType, True))
            changed = True
        else:
            t_cur = cur.dataType.simpleString()
            t_new = f.dataType.simpleString()
            if t_cur != t_new:
                if (t_cur, t_new) in _WIDENINGS:
                    idx = [i for i, g in enumerate(merged) if g.name == f.name][0]
                    merged[idx] = T.StructField(f.name, f.dataType, True)
                    changed = True
                elif (t_new, t_cur) in _WIDENINGS:
                    pass  # batch narrower than table: cast at merge, no DDL
                else:
                    raise SchemaEvolutionError(
                        f"incompatible batch column {f.name}: {t_cur} vs {t_new}"
                    )
    return T.StructType(merged), changed
