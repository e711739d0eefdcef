"""SQL front-end for lake tables: the statement surface a user of a
Delta/Iceberg warehouse types, over LakeTable's merge/DML engine.

Design: the statement SKELETON is parsed structurally (small regexes —
statement kind, table names, clause boundaries) and every expression
fragment (WHERE conditions, SET right-hand sides, MERGE routing
predicates) is handed verbatim to Spark's own expression parser via
``F.expr`` — there is deliberately no second expression language, so
anything Catalyst can optimize (pushdown, constant folding) works
unchanged.  Reads run as real ``spark.sql`` over temp views bound to
FRESH snapshot reads per statement, so Catalyst plans them natively.

Supported statements (one per ``sql()`` call):

  SELECT ...                          -- plain Spark SQL; lake tables
                                         resolve by name; ``t VERSION AS
                                         OF n`` time-travels; the
                                         ``TABLE_CHANGES(t, a[, b])``
                                         table function serves the CDF
  DELETE FROM t [WHERE c]             -- LakeTable.delete_where
  UPDATE t SET a = e[, ...] [WHERE c] -- LakeTable.update_where
  INSERT INTO t [(cols)] <query>      -- upsert merge at the next DML LSN
  MERGE INTO t [AS a] USING <src> [AS] s ON <key equality>
      [WHEN MATCHED AND <c> THEN DELETE]
      [WHEN MATCHED THEN UPDATE SET *]
      [WHEN NOT MATCHED THEN INSERT *]
                                      -- the CDC apply idiom, routed
                                         through the exactly-once merge

MERGE restrictions (enforced, with errors that say so): the ON clause
must equate exactly the table's key columns; the update/insert actions
are the whole-row ``SET *`` / ``INSERT *`` forms (partial-column MERGE
belongs to ``UPDATE``); a matched-delete routing predicate is evaluated
against the SOURCE row.  If the source carries an ``lsn`` column it is
used (replaying a WAL via SQL keeps exactly-once semantics); otherwise
every row is stamped with the table's next DML LSN.

Provenance: re-expresses the reference's load-then-overwrite table
registration step (reference pipeline/lib/summary/
summary_config_processor.py:373-419) as declarative DML over an
incremental lake — the SQL a user would actually migrate to.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from .table import LakeTable, MergeStats

_WS = re.compile(r"\s+")


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero (SET lists, VALUES)."""
    out, depth, cur, i, q = [], 0, [], 0, None
    while i < len(s):
        ch = s[i]
        if q:
            cur.append(ch)
            if ch == q and not (i + 1 < len(s) and s[i + 1] == q):
                q = None
            elif ch == q:  # doubled quote inside literal
                cur.append(s[i + 1])
                i += 1
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _strip_alias(expr: str, *aliases: str) -> str:
    """Remove ``alias.`` qualifiers so a routing predicate written over
    the MERGE source alias parses against the bare source columns."""
    for a in aliases:
        if a:
            expr = re.sub(rf"\b{re.escape(a)}\s*\.", "", expr)
    return expr


class LakeSession:
    """Statement router over a named set of LakeTables.

    ``sql()`` returns a DataFrame for SELECT and a ``MergeStats`` for
    DML — the same objects the programmatic API returns, so scripts mix
    both styles freely."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, LakeTable] = {}

    # ------------------------------------------------------------------ #
    def register(self, name: str, table: LakeTable) -> None:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"invalid table name: {name!r}")
        self._tables[name.lower()] = table

    def table(self, name: str) -> LakeTable:
        try:
            return self._tables[name.lower()]
        except KeyError:
            raise ValueError(
                f"unknown lake table {name!r} (registered: "
                f"{sorted(self._tables)})"
            ) from None

    # ------------------------------------------------------------------ #
    def sql(self, stmt: str) -> DataFrame | MergeStats:
        s = stmt.strip().rstrip(";").strip()
        head = s.split(None, 1)[0].upper() if s else ""
        if head in ("SELECT", "WITH", "VALUES"):
            return self._select(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "INSERT":
            return self._insert(s)
        if head == "MERGE":
            return self._merge(s)
        if head == "ALTER":
            return self._alter(s)
        if head == "DESCRIBE":
            return self._describe(s)
        if head == "OPTIMIZE":
            return self._optimize(s)
        if head == "SHOW":
            m = re.fullmatch(
                r"SHOW\s+TBLPROPERTIES\s+([A-Za-z_][A-Za-z0-9_]*)",
                s,
                flags=re.IGNORECASE,
            )
            if not m:
                raise ValueError(f"only SHOW TBLPROPERTIES t is supported: {s!r}")
            props = self.table(m.group(1)).snapshot.get("properties", {})
            return self.spark.createDataFrame(
                sorted((str(k), str(v)) for k, v in props.items()),
                "key string, value string",
            )
        if head == "CREATE":
            return self._create(s)
        if head == "VACUUM":
            m = re.fullmatch(
                r"VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)", s, flags=re.IGNORECASE
            )
            if not m:
                raise ValueError(f"cannot parse VACUUM statement: {s!r}")
            return self.table(m.group(1)).vacuum()
        raise ValueError(f"unsupported statement: {head or stmt!r}")

    # ------------------------------------------------------------------ #
    # DDL / maintenance (the Delta-SQL operational surface)
    # ------------------------------------------------------------------ #
    def _create(self, s: str):
        """``CREATE TABLE new [SHALLOW|DEEP] CLONE src [VERSION AS OF n]
        LOCATION 'path'`` — Delta's CLONE statement.  The clone is
        registered under the new name in this session and returned."""
        m = re.fullmatch(
            r"CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+"
            r"(?:(SHALLOW|DEEP)\s+)?CLONE\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
            r"\s+LOCATION\s+'([^']+)'",
            s,
            flags=re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "only CREATE TABLE new [SHALLOW|DEEP] CLONE src "
                f"[VERSION AS OF n] LOCATION 'path' is supported: {s!r}"
            )
        new_name, mode, src_name, ver, dest = m.groups()
        t = self.table(src_name).clone(
            dest,
            version=int(ver) if ver is not None else None,
            mode=(mode or "shallow").lower(),
        )
        self.register(new_name, t)
        return t

    def _alter(self, s: str):
        # branch / tag lifecycle (write-audit-publish surface)
        bm = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+"
            r"(CREATE|DROP|PUBLISH)\s+(BRANCH|TAG)\s+"
            r"([A-Za-z_][A-Za-z0-9_.-]*)"
            r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?",
            s,
            flags=re.IGNORECASE,
        )
        if bm:
            t = self.table(bm.group(1))
            verb, kind, name = bm.group(2).upper(), bm.group(3).upper(), bm.group(4)
            at = int(bm.group(5)) if bm.group(5) else None
            if verb == "CREATE":
                if kind == "BRANCH":
                    return t.create_branch(name, at_version=at)
                return t.create_tag(name, at_version=at)
            if verb == "DROP":
                return t.drop_ref(name)
            if kind != "BRANCH":
                raise ValueError("only branches can be published")
            return t.publish_branch(name)
        cm = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+CONSTRAINT\s+"
            r"([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((.+)\)",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if cm:
            return self.table(cm.group(1)).add_constraint(
                cm.group(2), cm.group(3).strip()
            )
        dm = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+CONSTRAINT\s+"
            r"([A-Za-z_][A-Za-z0-9_]*)",
            s,
            flags=re.IGNORECASE,
        )
        if dm:
            return self.table(dm.group(1)).drop_constraint(dm.group(2))
        pm = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+"
            r"TBLPROPERTIES\s*\((.+)\)",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        rm = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+RENAME\s+COLUMN\s+"
            r"([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)",
            s,
            flags=re.IGNORECASE,
        )
        if rm:
            return self.table(rm.group(1)).rename_column(
                rm.group(2), rm.group(3)
            )
        xm = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+COLUMN\s+"
            r"([A-Za-z_][A-Za-z0-9_]*)",
            s,
            flags=re.IGNORECASE,
        )
        if xm:
            return self.table(xm.group(1)).drop_column(xm.group(2))
        if pm:
            props = {}
            for item in _split_top(pm.group(2)):
                k, eq, v = item.partition("=")
                if not eq:
                    # 'k' without '=v' must be a parse error, not a
                    # silent k='' (a falsy value that would DISABLE the
                    # very feature the user was turning on)
                    raise ValueError(
                        f"cannot parse TBLPROPERTIES item {item.strip()!r}: "
                        "expected 'key' = 'value'"
                    )
                props[k.strip().strip("'\"")] = v.strip().strip("'\"")
            if not props or any(not k for k in props):
                raise ValueError(f"cannot parse TBLPROPERTIES: {pm.group(2)!r}")
            return self.table(pm.group(1)).set_properties(props)
        m = re.fullmatch(
            r"ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+COLUMNS?\s*"
            r"\(?\s*(.+?)\s*\)?",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "only ALTER TABLE t ADD COLUMN(S) / RENAME COLUMN a TO b / "
                "DROP COLUMN c / ADD CONSTRAINT name CHECK (expr) / "
                f"DROP CONSTRAINT name are supported: {s!r}"
            )
        t = self.table(m.group(1))
        from pyspark.sql import types as T

        new_fields = list(t.schema.fields)
        for part in _split_top(m.group(2)):
            cm = re.fullmatch(
                r"([A-Za-z_][A-Za-z0-9_]*)\s+(.+)", part, flags=re.DOTALL
            )
            if not cm:
                raise ValueError(f"cannot parse column definition: {part!r}")
            # Spark's own DDL parser handles the type text (incl. nested)
            dt = T._parse_datatype_string(cm.group(2))
            new_fields.append(T.StructField(cm.group(1), dt))
        return t.evolve_schema(T.StructType(new_fields))

    def _describe(self, s: str) -> DataFrame:
        m = re.fullmatch(
            r"DESCRIBE\s+(HISTORY|FILES)\s+([A-Za-z_][A-Za-z0-9_]*)",
            s,
            flags=re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                f"only DESCRIBE HISTORY|FILES t is supported: {s!r}"
            )
        t = self.table(m.group(2))
        return t.history() if m.group(1).upper() == "HISTORY" else t.files()

    def _optimize(self, s: str):
        m = re.fullmatch(
            r"OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s+ZORDER\s+BY\s*\(\s*(.+?)\s*\))?",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse OPTIMIZE statement: {s!r}")
        t = self.table(m.group(1))
        if m.group(2):
            cols = [c.strip() for c in m.group(2).split(",")]
            return t.cluster_files(cols)
        return t.compact(max_files_per_bucket=1)

    # ------------------------------------------------------------------ #
    # reads
    # ------------------------------------------------------------------ #
    def _bind_views(self) -> None:
        for name, t in self._tables.items():
            t.read().createOrReplaceTempView(name)

    def _select(self, s: str) -> DataFrame:
        # time travel: `<table> VERSION AS OF <n>` binds a view of that
        # snapshot under a generated name and rewrites the reference
        n_tt = 0

        def _tt(m: re.Match) -> str:
            nonlocal n_tt
            t = self.table(m.group(1))
            v = int(m.group(2))
            alias = f"__tt_{m.group(1).lower()}_{v}_{n_tt}"
            n_tt += 1
            t.read(version=v).createOrReplaceTempView(alias)
            return alias

        s = re.sub(
            r"\b([A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+(\d+)",
            _tt,
            s,
            flags=re.IGNORECASE,
        )

        # `t VERSION AS OF '<ref>'` reads a named branch/tag head
        def _ref(m: re.Match) -> str:
            nonlocal n_tt
            t = self.table(m.group(1))
            v = t._read_ref(m.group(2))["version"]
            alias = f"__ref_{m.group(1).lower()}_{n_tt}"
            n_tt += 1
            t.read(version=v).createOrReplaceTempView(alias)
            return alias

        s = re.sub(
            r"\b([A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+"
            r"'([A-Za-z_][A-Za-z0-9_.-]*)'",
            _ref,
            s,
            flags=re.IGNORECASE,
        )

        # `t TIMESTAMP AS OF <epoch-seconds | 'ISO datetime'>` resolves
        # to the newest retained version committed at or before it
        def _ts(m: re.Match) -> str:
            nonlocal n_tt
            t = self.table(m.group(1))
            raw = m.group(2).strip()
            if raw.startswith(("'", '"')):
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(raw[1:-1])
                ts = (
                    dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
                ).timestamp()
            else:
                ts = float(raw)
            v = t.version_at_timestamp(ts)
            alias = f"__ts_{m.group(1).lower()}_{n_tt}"
            n_tt += 1
            t.read(version=v).createOrReplaceTempView(alias)
            return alias

        s = re.sub(
            r"\b([A-Za-z_][A-Za-z0-9_]*)\s+TIMESTAMP\s+AS\s+OF\s+"
            r"([0-9.]+|'[^']*'|\"[^\"]*\")",
            _ts,
            s,
            flags=re.IGNORECASE,
        )

        # change feed: TABLE_CHANGES(t, from[, to]) as a table function
        n_tc = 0

        def _tc(m: re.Match) -> str:
            nonlocal n_tc
            t = self.table(m.group(1))
            from_v = int(m.group(2))
            to_v = int(m.group(3)) if m.group(3) else None
            alias = f"__tc_{m.group(1).lower()}_{n_tc}"
            n_tc += 1
            t.table_changes(from_v, to_v).createOrReplaceTempView(alias)
            return alias

        s = re.sub(
            r"\bTABLE_CHANGES\s*\(\s*'?([A-Za-z_][A-Za-z0-9_]*)'?\s*,"
            r"\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
            _tc,
            s,
            flags=re.IGNORECASE,
        )

        self._bind_views()
        return self.spark.sql(s)

    # ------------------------------------------------------------------ #
    # DML
    # ------------------------------------------------------------------ #
    def _delete(self, s: str):
        # extension: DELETE FROM t KEYS USING (<select of key tuples>) —
        # the O(1)-write equality delete (lake/table.py::delete_keys, the
        # erasure-feed statement); the subquery runs through the ordinary
        # SELECT path so it can read other registered lake tables.
        km = re.fullmatch(
            r"DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+KEYS\s+USING\s+"
            r"\(\s*(.+?)\s*\)",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if km:
            keys_df = self._select(km.group(2))
            return self.table(km.group(1)).delete_keys(keys_df)
        m = re.fullmatch(
            r"DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s+WHERE\s+(.+))?",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse DELETE statement: {s!r}")
        cond = m.group(2) or "true"
        return self.table(m.group(1)).delete_where(cond)

    def _update(self, s: str) -> MergeStats:
        m = re.fullmatch(
            r"UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)"
            r"(?:\s+WHERE\s+(.+))?",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse UPDATE statement: {s!r}")
        assignments: dict[str, Any] = {}
        for part in _split_top(m.group(2)):
            am = re.fullmatch(
                r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)", part, flags=re.DOTALL
            )
            if not am:
                raise ValueError(f"cannot parse SET assignment: {part!r}")
            assignments[am.group(1)] = F.expr(am.group(2))
        cond = m.group(3) or "true"
        return self.table(m.group(1)).update_where(cond, assignments)

    def _insert(self, s: str) -> MergeStats:
        m = re.fullmatch(
            r"INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s*\(([^)]*)\))?\s+(.+)",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse INSERT statement: {s!r}")
        t = self.table(m.group(1))
        self._bind_views()
        src = self.spark.sql(m.group(3))
        schema_cols = [f.name for f in t.schema.fields]
        if m.group(2):
            names = [c.strip() for c in m.group(2).split(",")]
        else:
            names = schema_cols
        if len(src.columns) != len(names):
            raise ValueError(
                f"INSERT column count mismatch: query yields "
                f"{len(src.columns)}, target list has {len(names)}"
            )
        src = src.toDF(*names)
        missing = [c for c in schema_cols if c not in names]
        batch = src.select(
            *[F.col(c) for c in names],
            *[F.lit(None).cast(t.schema[c].dataType).alias(c) for c in missing],
            F.lit(t._dml_lsn()).cast("long").alias("lsn"),
            F.lit("upsert").alias("op"),
        )
        return t.merge(batch, extra_lineage={"operation": "insert_into"})

    # ------------------------------------------------------------------ #
    def _merge(self, s: str) -> MergeStats:
        m = re.fullmatch(
            r"MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s+AS)?(?:\s+([A-Za-z_][A-Za-z0-9_]*))?"
            r"\s+USING\s+(.+?)(?:\s+AS)?\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"\s+ON\s+(.+?)\s+(WHEN\s+.+)",
            s,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse MERGE statement: {s!r}")
        t_name, t_alias, src_sql, s_alias, on, actions = m.groups()
        t = self.table(t_name)
        t_alias = t_alias or t_name

        # --- ON: must equate exactly the key columns ------------------- #
        keys = set(t.key_cols)
        seen: set[str] = set()
        for conj in re.split(r"\s+AND\s+", on, flags=re.IGNORECASE):
            cm = re.fullmatch(
                r"\s*([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)"
                r"\s*=\s*([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)\s*",
                conj,
            )
            cols = (
                {cm.group(2), cm.group(4)}
                if cm
                and {cm.group(1), cm.group(3)} == {t_alias, s_alias}
                else None
            )
            if not cols or len(cols) != 1:
                raise ValueError(
                    f"MERGE ON must be key equality "
                    f"{t_alias}.<key> = {s_alias}.<key>; got {conj!r}"
                )
            seen |= cols
        if seen != keys:
            raise ValueError(
                f"MERGE ON must cover exactly the key columns "
                f"{sorted(keys)}; got {sorted(seen)}"
            )

        # --- actions: the CDC idiom only ------------------------------- #
        delete_cond: str | None = None
        saw_update = saw_insert = False
        for am in re.finditer(
            r"WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+"
            r"(DELETE|UPDATE\s+SET\s+\*|INSERT\s+\*)",
            actions,
            flags=re.IGNORECASE | re.DOTALL,
        ):
            not_matched, cond, act = am.groups()
            act = _WS.sub(" ", act.upper())
            if act == "DELETE":
                if not_matched:
                    raise ValueError("WHEN NOT MATCHED THEN DELETE is a no-op")
                delete_cond = cond or "true"
            elif act == "UPDATE SET *":
                if not_matched or cond:
                    raise ValueError(
                        "only unconditional WHEN MATCHED THEN UPDATE SET * "
                        "is supported (partial/conditional column updates "
                        "belong to UPDATE ... WHERE)"
                    )
                saw_update = True
            else:  # INSERT *
                if not not_matched or cond:
                    raise ValueError(
                        "only unconditional WHEN NOT MATCHED THEN INSERT * "
                        "is supported"
                    )
                saw_insert = True
        if not (saw_update or saw_insert or delete_cond):
            raise ValueError(f"MERGE has no recognizable action: {actions!r}")
        if saw_update != saw_insert:
            raise ValueError(
                "MERGE requires both UPDATE SET * and INSERT * (the engine "
                "is an upsert: a matched and an unmatched source row take "
                "the same whole-row image)"
            )

        # --- translate to an upsert batch ------------------------------ #
        self._bind_views()
        src_sql = src_sql.strip()
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", src_sql):
            src = self.spark.sql(f"SELECT * FROM {src_sql}")
        elif src_sql.startswith("(") and src_sql.endswith(")"):
            src = self.spark.sql(src_sql[1:-1])
        else:
            raise ValueError(
                f"MERGE USING must be a view name or (subquery); got "
                f"{src_sql!r}"
            )
        data_cols = [f.name for f in t.schema.fields if f.name in src.columns]
        missing_keys = keys - set(src.columns)
        if missing_keys:
            raise ValueError(
                f"MERGE source lacks key columns: {sorted(missing_keys)}"
            )
        op = (
            F.when(F.expr(_strip_alias(delete_cond, s_alias, t_alias)), "delete")
            .otherwise("upsert")
            if delete_cond
            else F.lit("upsert")
        )
        lsn = (
            F.col("lsn").cast("long")
            if "lsn" in src.columns
            else F.lit(t._dml_lsn()).cast("long")
        )
        batch = src.select(
            *[F.col(c) for c in data_cols],
            lsn.alias("lsn"),
            op.alias("op"),
        )
        return t.merge(batch, extra_lineage={"operation": "merge_sql"})
