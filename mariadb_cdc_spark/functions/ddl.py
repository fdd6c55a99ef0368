"""DDL classification — semantic port of the reference QueryDecider.

Re-expresses /root/reference/src/main/java/mariadbcdc/QueryDecider.java:9-85
(alter/rename/drop detection incl. backticks, schema qualifiers, n-to-n rename
lists, wait/nowait, if-exists) in Python; verified against the reference's 23
golden cases (QueryDeciderTest.java:9-88). DDL rows are rare control-plane
events, so classification runs on the driver on collected QUERY rows — no UDF.

Beyond the reference (which only *detects* schema change and invalidates its
name cache, MariadbCdc.java:131-133), `parse_alter_actions` extracts
add/rename/modify-column actions so the engine can apply them to the lake
table (Iceberg-style evolution).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ALTER = re.compile(r"alter\s+table\s+((`?\S+`?)\.)?`?(\S+)`?\s+", re.IGNORECASE)
_RENAME = re.compile(r"rename\s+table\s+", re.IGNORECASE)
_DROP = re.compile(
    r"drop\s+table\s+(if\s+exists)?(.*)(wait [0-9]+|nowait)?\s*(restrict|cascade)?",
    re.IGNORECASE,
)
_RENAME_SUB = re.compile(
    r"\s*(`?(\S+)`?\.)?`?([^\s`]+)`?\s+((wait [0-9]+|nowait)\s+)?"
    r"to\s+(`?(\S+)`?\.)?`?([^\s`]+)`?",
    re.IGNORECASE,
)
_DROP_NAME = re.compile(r"\s*(`?([^`\s]+)`?\.)?`?([^`\s,]+)`?", re.IGNORECASE)


@dataclass(frozen=True)
class SchemaChangedTable:
    """Reference SchemaChangedTable.java:5-16."""

    database: str | None
    table: str


@dataclass(frozen=True)
class SchemaChangeDecision:
    is_schema_change: bool
    tables: tuple[SchemaChangedTable, ...]


def _strip(ident: str | None) -> str | None:
    return ident.replace("`", "") if ident is not None else None


def decide_schema_change(sql: str) -> SchemaChangeDecision:
    m = _ALTER.search(sql)
    if m:
        return SchemaChangeDecision(
            True, (SchemaChangedTable(_strip(m.group(2)), _strip(m.group(3))),)
        )
    m = _RENAME.search(sql)
    if m:
        tables = tuple(
            SchemaChangedTable(_strip(sm.group(2)), _strip(sm.group(3)))
            for sm in _RENAME_SUB.finditer(sql[m.end() :])
        )
        return SchemaChangeDecision(True, tables)
    m = _DROP.search(sql)
    if m:
        part = m.group(2) or ""
        tables = tuple(
            SchemaChangedTable(sm.group(2), sm.group(3))
            for sm in _DROP_NAME.finditer(part)
            if sm.group(3)
        )
        return SchemaChangeDecision(True, tables)
    return SchemaChangeDecision(False, ())


# ---------------------------------------------------------------- alter apply

_ADD_COL = re.compile(
    r"add\s+(column\s+)?`?(\w+)`?\s+(\w+(\(\s*\d+(\s*,\s*\d+)?\s*\))?)",
    re.IGNORECASE,
)
_RENAME_COL = re.compile(
    r"(?:rename\s+column|change\s+column)\s+`?(\w+)`?\s+(?:to\s+)?`?(\w+)`?",
    re.IGNORECASE,
)
_MODIFY_COL = re.compile(
    r"modify\s+(column\s+)?`?(\w+)`?\s+(\w+(\(\s*\d+(\s*,\s*\d+)?\s*\))?)",
    re.IGNORECASE,
)

# MySQL DDL type -> lake (Spark) type
_TYPE_MAP = {
    "tinyint": "int",
    "smallint": "int",
    "mediumint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "date": "date",
    "datetime": "timestamp_ntz",
    "timestamp": "timestamp",
    "char": "string",
    "varchar": "string",
    "text": "string",
    "json": "string",
    "blob": "binary",
    "boolean": "boolean",
    "year": "int",
}


def mysql_type_to_lake(t: str) -> str:
    base = t.split("(")[0].strip().lower()
    if base == "decimal":
        inner = t[t.index("(") + 1 : t.index(")")] if "(" in t else "10,0"
        parts = [x.strip() for x in inner.split(",")]
        p = parts[0]
        s = parts[1] if len(parts) > 1 else "0"
        return f"decimal({p},{s})"
    return _TYPE_MAP.get(base, "string")


@dataclass(frozen=True)
class AlterAction:
    kind: str  # add | rename | modify
    column: str
    new_name: str | None = None
    lake_type: str | None = None


def parse_alter_actions(sql: str) -> list[AlterAction]:
    """Extract column-level actions from an ALTER TABLE statement."""
    actions: list[AlterAction] = []
    for m in _ADD_COL.finditer(sql):
        actions.append(
            AlterAction("add", m.group(2), lake_type=mysql_type_to_lake(m.group(3)))
        )
    for m in _RENAME_COL.finditer(sql):
        actions.append(AlterAction("rename", m.group(1), new_name=m.group(2)))
    for m in _MODIFY_COL.finditer(sql):
        actions.append(
            AlterAction("modify", m.group(2), lake_type=mysql_type_to_lake(m.group(3)))
        )
    return actions


_TRUNCATE = re.compile(
    r"^\s*truncate\s+(?:table\s+)?(?:`?([^`\s.]+)`?\.)?`?([^`\s.;]+)`?\s*;?\s*$",
    re.IGNORECASE,
)


def decide_data_reset(sql: str) -> SchemaChangedTable | None:
    """TRUNCATE TABLE classifier — deliberately SEPARATE from
    decide_schema_change: the reference's QueryDecider does not flag
    TRUNCATE as a schema change (its golden set covers alter/rename/drop
    only, QueryDeciderTest.java:9-88), and this engine keeps that parity.
    But a CDC consumer that ignores a TRUNCATE in the stream diverges
    from the source permanently, so the pipeline treats it as a
    DATA-RESET epoch boundary: merge pre-truncate events, clear the
    table (LakeTable.truncate with the statement's position as the new
    position floor), continue with post-truncate events."""
    m = _TRUNCATE.match(sql or "")
    if not m:
        return None
    return SchemaChangedTable(m.group(1), m.group(2))
