"""Typed accessors over change-record images — the engine's DataRow surface.

The reference exposes row values through ``DataRow`` typed getters with
accessor-side coercions (/root/reference/src/main/java/mariadbcdc/
BaseDataRow.java:15-150, interface DataRow.java:8-34):

  - name lookup is case-insensitive — ``valueMap`` is keyed by the
    lower-cased column name (``BaseDataRow.java:171-175``) and getters
    lower-case the requested field;
  - ``getString`` stringifies anything non-null (``:25-31``);
  - ``getLong``/``getInt`` accept Numbers (``Number.longValue()``) and
    integral Strings (``Long.parseLong`` — a non-integral string throws);
  - ``getBoolean`` on a Number is ``== 1``; on a String it is
    ``Boolean.valueOf`` (true iff equalsIgnoreCase("true")) (``:142-149``);
  - temporal getters pass through already-decoded java.time values and
    reject anything else;
  - every other combination raises ``UnsupportedTypeException``
    (UnsupportedTypeException.java:3-7);
  - index access addresses the positional ``col<i>`` schema the engine
    synthesizes when names are unknown
    (shyikobinlog/BinaryLogEventProcessor.java:227-236).

Here the image is a ``map<string,string>`` column and every accessor is a
pure Catalyst expression — no UDFs, fully codegen-eligible except the one
``transform`` used for case-insensitive lookup. The engine's wire decoder
renders decoded values to canonical strings (ISO dates/timestamps, decimal
text), so "the value is already a LocalDate" translates to "the string is
the canonical ISO rendering"; the temporal accessors parse exactly that
rendering and treat anything else as unsupported.

``strict=True`` (default) reproduces ``UnsupportedTypeException`` via
``raise_error`` at evaluation time; ``strict=False`` degrades to NULL so a
set-wise batch can survive isolated bad values (filter-then-inspect).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "img_get",
    "get_string",
    "get_long",
    "get_int",
    "get_boolean",
    "get_local_date",
    "get_local_datetime",
    "get_local_time",
    "has_column",
    "column_count",
    "column_names",
]

_INT_RE = r"^[+-]?[0-9]+$"
_NUM_RE = r"^[+-]?[0-9]+(\.[0-9]+)?$"
_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
_DATETIME_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]{1,6})?$"
_TIME_RE = r"^-?[0-9]{1,3}:[0-9]{2}:[0-9]{2}(\.[0-9]{1,6})?$"


def _as_col(image) -> Column:
    return F.col(image) if isinstance(image, str) else image


def img_get(image, field) -> Column:
    """Raw value lookup: case-insensitive by name (BaseDataRow.java:171-175
    keys the valueMap lower-cased), or positional ``col<i>`` by int index
    (BinaryLogEventProcessor.java:230)."""
    image = _as_col(image)
    if isinstance(field, int):
        return F.element_at(image, f"col{field}")
    lowered = F.map_from_entries(
        F.transform(
            F.map_entries(image),
            lambda e: F.struct(
                F.lower(e["key"]).alias("key"), e["value"].alias("value")
            ),
        )
    )
    return F.element_at(lowered, field.lower())


def _unsupported(kind: str, v: Column, strict: bool) -> Column:
    if not strict:
        return F.lit(None).cast("string")
    return F.raise_error(
        F.concat(F.lit(f"UnsupportedTypeException: not a {kind} value: "), v)
    ).cast("string")


def get_string(image, field) -> Column:
    """getString: any non-null value stringifies (BaseDataRow.java:25-31) —
    the identity on a string-rendered image."""
    return img_get(image, field)


def get_long(image, field, strict: bool = True) -> Column:
    """getLong: Number.longValue() / Long.parseLong (BaseDataRow.java:46-54);
    a non-integral string is unsupported (parseLong throws on '1.5')."""
    v = img_get(image, field)
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(v.rlike(_INT_RE), v.cast("long"))
        .otherwise(_unsupported("long", v, strict).cast("long"))
        .alias(f"{field}_long" if isinstance(field, str) else f"col{field}_long")
    )


def get_int(image, field, strict: bool = True) -> Column:
    """getInt: as getLong with Number.intValue() (BaseDataRow.java:68-76)."""
    v = img_get(image, field)
    return (
        F.when(v.isNull(), F.lit(None).cast("int"))
        .when(v.rlike(_INT_RE), v.cast("long").cast("int"))
        .otherwise(_unsupported("int", v, strict).cast("int"))
        .alias(f"{field}_int" if isinstance(field, str) else f"col{field}_int")
    )


def get_boolean(image, field, strict: bool = True) -> Column:
    """getBoolean (BaseDataRow.java:142-149): a numeric value is ``== 1``
    (the MariaDB BOOL = TINYINT(1) convention); a non-numeric string is
    ``Boolean.valueOf`` — true iff it equals "true" ignoring case, false
    for every other string (Boolean.valueOf never throws)."""
    v = img_get(image, field)
    return (
        F.when(v.isNull(), F.lit(None).cast("boolean"))
        .when(v.rlike(_NUM_RE), v.cast("decimal(38,6)").cast("long") == 1)
        .otherwise(F.lower(v) == "true")
        .alias(f"{field}_bool" if isinstance(field, str) else f"col{field}_bool")
    )


def get_local_date(image, field, strict: bool = True) -> Column:
    """getLocalDate (BaseDataRow.java:108-116): only an already-decoded
    LocalDate passes — here, only the wire decoder's canonical ISO
    rendering parses; any other non-null string is unsupported."""
    v = img_get(image, field)
    return (
        F.when(v.isNull(), F.lit(None).cast("date"))
        .when(v.rlike(_DATE_RE), v.cast("date"))
        .otherwise(_unsupported("LocalDate", v, strict).cast("date"))
        .alias(f"{field}_date" if isinstance(field, str) else f"col{field}_date")
    )


def get_local_datetime(image, field, strict: bool = True) -> Column:
    """getLocalDateTime (BaseDataRow.java:90-94): canonical
    'yyyy-MM-dd HH:mm:ss[.ffffff]' rendering only; TIMESTAMP_NTZ to match
    the reference's zone-less LocalDateTime (SURVEY §1.2)."""
    v = img_get(image, field)
    return (
        F.when(v.isNull(), F.lit(None).cast("timestamp_ntz"))
        .when(v.rlike(_DATETIME_RE), v.cast("timestamp_ntz"))
        .otherwise(_unsupported("LocalDateTime", v, strict).cast("timestamp_ntz"))
        .alias(f"{field}_ts" if isinstance(field, str) else f"col{field}_ts")
    )


def get_local_time(image, field, strict: bool = True) -> Column:
    """getLocalTime (BaseDataRow.java:126-130): Spark has no time type
    (SURVEY §1.2 — TIME stays a string), so this validates the decoder's
    canonical 'HH:mm:ss[.ffffff]' rendering and returns it, mirroring
    pass-through-or-throw."""
    v = img_get(image, field)
    return (
        F.when(v.isNull() | v.rlike(_TIME_RE), v)
        .otherwise(_unsupported("LocalTime", v, strict))
        .alias(f"{field}_time" if isinstance(field, str) else f"col{field}_time")
    )


def has_column(image, field: str) -> Column:
    """hasViaColumnName-style presence probe, case-insensitive."""
    image = _as_col(image)
    return F.exists(
        F.map_keys(image), lambda k: F.lower(k) == F.lit(field.lower())
    )


def column_count(image) -> Column:
    """getColumnCount (BaseDataRow.java:162-164) — the reference returns the
    distinct-name count (its documented undercount quirk, SURVEY §7); a map
    image has unique keys so size() is exactly that."""
    return F.size(_as_col(image))


def column_names(image) -> Column:
    """getColumnNames (BaseDataRow.java:167-169), in image key order."""
    return F.map_keys(_as_col(image))
