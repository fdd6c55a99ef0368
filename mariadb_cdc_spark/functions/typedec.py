"""Binlog wire-type decode kernels, vectorized (pandas/Arrow UDFs).

Re-implements the decoders of the reference's densest file
(binlog/reader/packet/binlog/des/BaseRowsEventBinLogDataDeserializer.java:52-319)
from the PUBLIC MySQL/MariaDB on-disk formats — packed-BCD NEWDECIMAL
(mysql strings/decimal.c layout), DATETIME2 40-bit big-endian bitfield with
fractional seconds, zero-date -> null, sign-extended TINY/SHORT/INT24 —
as batch kernels over binary columns: one Python invocation per Arrow batch,
never per row.

String-image tables (no column_metadata published) skip these entirely; the
`codehub.metrics` typed table carries hex wire bytes through the full engine
path (decode -> registry -> bitmaps -> decode_wire_images -> fold -> MERGE),
verified against a closed-form DuckDB oracle (Q:cdc_typed_decode).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

# digits -> bytes for the leftover (non-full) digit group, decimal.c layout
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _dec_bytes(precision: int, scale: int) -> int:
    intg = precision - scale
    return (
        (intg // 9) * 4
        + _DIG2BYTES[intg % 9]
        + (scale // 9) * 4
        + _DIG2BYTES[scale % 9]
    )


def decode_newdecimal(buf: bytes, precision: int, scale: int) -> Decimal | None:
    """Packed-BCD decimal (NEWDECIMAL, type 246). Sign bit = MSB of first
    byte (1 = non-negative); negatives are stored bitwise-inverted."""
    if buf is None:
        return None
    n = _dec_bytes(precision, scale)
    b = bytearray(buf[:n])
    positive = (b[0] & 0x80) != 0
    b[0] ^= 0x80
    if not positive:
        for i in range(len(b)):
            b[i] = (~b[i]) & 0xFF

    intg = precision - scale
    digits = []
    pos = 0

    def take(nbytes: int, ndigits: int):
        nonlocal pos
        if nbytes == 0:
            return
        v = int.from_bytes(b[pos : pos + nbytes], "big")
        pos += nbytes
        digits.append(str(v).zfill(ndigits))

    take(_DIG2BYTES[intg % 9], intg % 9)
    for _ in range(intg // 9):
        take(4, 9)
    int_part = "".join(digits) or "0"

    digits = []
    for _ in range(scale // 9):
        take(4, 9)
    take(_DIG2BYTES[scale % 9], scale % 9)
    frac_part = "".join(digits)

    s = ("-" if not positive else "") + int_part
    if frac_part:
        s += "." + frac_part
    return Decimal(s)


def encode_newdecimal(value: Decimal, precision: int, scale: int) -> bytes:
    """Test-side encoder (round-trip harness)."""
    value = Decimal(value).quantize(Decimal(1).scaleb(-scale))
    negative = value < 0
    value = abs(value)
    int_part, _, frac_part = f"{value:f}".partition(".")
    intg = precision - scale
    int_part = int_part.zfill(intg) if intg else ""
    frac_part = (frac_part or "").ljust(scale, "0")[:scale]

    out = bytearray()

    def emit(digs: str, nbytes: int):
        if nbytes:
            out.extend(int(digs or "0").to_bytes(nbytes, "big"))

    head = intg % 9
    emit(int_part[:head], _DIG2BYTES[head])
    rest = int_part[head:]
    for i in range(intg // 9):
        emit(rest[i * 9 : (i + 1) * 9], 4)
    for i in range(len(frac_part) // 9 if scale >= 9 else 0):
        emit(frac_part[i * 9 : (i + 1) * 9], 4)
    if scale >= 9:
        frac_tail = frac_part[(scale // 9) * 9 :]
    else:
        frac_tail = frac_part
    emit(frac_tail, _DIG2BYTES[scale % 9])

    out[0] |= 0x80
    if negative:
        for i in range(len(out)):
            out[i] = (~out[i]) & 0xFF
    return bytes(out)


def decode_datetime2(buf: bytes, fsp: int = 0) -> dt.datetime | None:
    """DATETIME2: 5-byte big-endian bitfield (sign 1b, year*13+month 17b,
    day 5b, hour 5b, minute 6b, second 6b) + 0-3 fsp bytes.
    month==0 or day==0 (zero-date) -> null."""
    if buf is None:
        return None
    v = int.from_bytes(buf[:5], "big")
    ym = (v >> 22) & 0x1FFFF
    year, month = divmod(ym, 13)
    day = (v >> 17) & 0x1F
    hour = (v >> 12) & 0x1F
    minute = (v >> 6) & 0x3F
    second = v & 0x3F
    if month == 0 or day == 0:
        return None
    micros = 0
    if fsp < 0 or fsp > 6:
        # corrupt metadata; ValueError is the contained error class the
        # engine's per-value fallback degrades to raw hex
        raise ValueError(f"fsp out of range: {fsp}")
    nb = (fsp + 1) // 2
    if nb:
        frac = int.from_bytes(buf[5 : 5 + nb], "big")
        micros = frac * 10 ** (6 - 2 * nb)
    return dt.datetime(year, month, day, hour, minute, second, micros)


def encode_datetime2(value: dt.datetime, fsp: int = 0) -> bytes:
    v = (
        (1 << 39)
        | ((value.year * 13 + value.month) << 22)
        | (value.day << 17)
        | (value.hour << 12)
        | (value.minute << 6)
        | value.second
    )
    out = v.to_bytes(5, "big")
    nb = (fsp + 1) // 2
    if nb:
        frac = value.microsecond // (10 ** (6 - 2 * nb))
        out += frac.to_bytes(nb, "big")
    return out


def sign_extend_int24(v: int) -> int:
    """INT24 sign extension ((x << 8) >> 8 in 32-bit arithmetic)."""
    v &= 0xFFFFFF
    return v - (1 << 24) if v & 0x800000 else v


def decode_varint(buf: bytes, pos: int = 0) -> tuple[int | None, int]:
    """MySQL protocol length-encoded integer -> (value, next_pos)."""
    first = buf[pos]
    if first < 0xFB:
        return first, pos + 1
    if first == 0xFB:  # NULL
        return None, pos + 1
    if first == 0xFC:
        return int.from_bytes(buf[pos + 1 : pos + 3], "little"), pos + 3
    if first == 0xFD:
        return int.from_bytes(buf[pos + 1 : pos + 4], "little"), pos + 4
    return int.from_bytes(buf[pos + 1 : pos + 9], "little"), pos + 9


# ------------------------------------------------------------- Spark UDFs

def newdecimal_udf(precision: int, scale: int):
    """Vectorized NEWDECIMAL decoder: binary column -> DecimalType(p,s)."""

    @pandas_udf(T.DecimalType(precision, scale))
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda b: decode_newdecimal(b, precision, scale)
            if b is not None
            else None
        )

    return _udf


def datetime2_udf(fsp: int = 0):
    """Vectorized DATETIME2 decoder: binary column -> TimestampNTZType."""

    @pandas_udf(T.TimestampNTZType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda b: decode_datetime2(b, fsp) if b is not None else None
        )

    return _udf


# ---------------------------------------------------------------- more types
# Decoders for the remaining wire-type families the reference handles
# (BaseRowsEventBinLogDataDeserializer.java:52-319), from the PUBLIC
# MySQL/MariaDB row-format layouts. Each has a test-side encoder for
# round-trip harnesses and the synthetic typed-table generator.

import struct


def decode_time2(buf: bytes, fsp: int = 0):
    """TIME2: 3-byte big-endian bitfield, bias 0x800000 (sign), then
    1 reserved bit, 10-bit hour, 6-bit minute, 6-bit second + fsp bytes.
    Returns datetime.time (non-negative times; negative TIME is not
    representable as time-of-day and surfaces as None)."""
    if buf is None:
        return None
    v = int.from_bytes(buf[:3], "big")
    if v < 0x800000:
        return None  # negative TIME
    v -= 0x800000
    hour = (v >> 12) & 0x3FF
    minute = (v >> 6) & 0x3F
    second = v & 0x3F
    micros = _decode_fsp_bytes(buf[3:], fsp)
    return dt.time(hour, minute, second, micros)


def encode_time2(value: dt.time, fsp: int = 0) -> bytes:
    v = 0x800000 | (value.hour << 12) | (value.minute << 6) | value.second
    return v.to_bytes(3, "big") + _encode_fsp_bytes(value.microsecond, fsp)


def _decode_fsp_bytes(frac_buf: bytes, fsp: int) -> int:
    """Fractional-second bytes -> microseconds (readFsp semantics:
    1 byte = centiseconds*? stored as value*10^(6-2*nbytes))."""
    if fsp < 0 or fsp > 6:
        # corrupt metadata: keep the failure inside the contained error
        # set (10**negative would silently go float -> TypeError)
        raise ValueError(f"fsp out of range: {fsp}")
    nb = (fsp + 1) // 2
    if nb == 0:
        return 0
    frac = int.from_bytes(frac_buf[:nb], "big")
    return frac * 10 ** (6 - 2 * nb)


def _encode_fsp_bytes(micros: int, fsp: int) -> bytes:
    nb = (fsp + 1) // 2
    if nb == 0:
        return b""
    return (micros // 10 ** (6 - 2 * nb)).to_bytes(nb, "big")


def decode_timestamp2(buf: bytes, fsp: int = 0):
    """TIMESTAMP2: 4-byte BIG-endian unix seconds + fsp bytes. Returns a
    naive UTC datetime (the engine pins session TZ to UTC). All-zero
    seconds = the zero-timestamp -> None."""
    if buf is None:
        return None
    secs = int.from_bytes(buf[:4], "big")
    if secs == 0:
        return None
    micros = _decode_fsp_bytes(buf[4:], fsp)
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=secs, microseconds=micros)


def encode_timestamp2(value: dt.datetime, fsp: int = 0) -> bytes:
    secs = int((value - dt.datetime(1970, 1, 1)).total_seconds())
    return secs.to_bytes(4, "big") + _encode_fsp_bytes(value.microsecond, fsp)


def decode_date(buf: bytes):
    """DATE: 3-byte little-endian; day 5 bits, month 4 bits, year rest.
    month==0 or day==0 (zero-date) -> None."""
    if buf is None:
        return None
    v = int.from_bytes(buf[:3], "little")
    day = v & 0x1F
    month = (v >> 5) & 0x0F
    year = v >> 9
    if month == 0 or day == 0:
        return None
    return dt.date(year, month, day)


def encode_date(value: dt.date) -> bytes:
    v = (value.year << 9) | (value.month << 5) | value.day
    return v.to_bytes(3, "little")


def decode_bit(buf: bytes, bitlen: int) -> int | None:
    """BIT(n): ceil(n/8) big-endian bytes -> integer value (<= 64 bits).
    (The reference reverses the byte array then indexes bits little-endian —
    readBit, BaseRowsEventBinLogDataDeserializer.java:109-124 — which is
    exactly big-endian integer interpretation.)"""
    if buf is None:
        return None
    mask = (1 << bitlen) - 1
    return int.from_bytes(buf, "big") & mask


def encode_bit(value: int, bitlen: int) -> bytes:
    return int(value).to_bytes((bitlen + 7) // 8, "big")


def decode_enum(buf: bytes, labels: list[str] | None):
    """ENUM: little-endian index (1 or 2 bytes). MySQL indices are 1-based
    with 0 = the invalid empty value; FullMeta labels resolve index->label
    (reference readString ENUM branch :203-208). Unknown index -> the raw
    index (the reference's orElse)."""
    if buf is None:
        return None
    idx = int.from_bytes(buf, "little")
    if idx == 0:
        return ""
    if labels and idx <= len(labels):
        return labels[idx - 1]
    return idx


def encode_enum(idx: int, nbytes: int = 1) -> bytes:
    return int(idx).to_bytes(nbytes, "little")


def decode_set(buf: bytes, labels: list[str] | None):
    """SET: little-endian bitmask (1-8 bytes); bit i set -> labels[i]
    included. Returns comma-joined labels (MySQL textual SET form), or the
    raw mask when no labels are known (the reference leaves SET numeric,
    :209-211 'TODO' — labels are the completed semantics)."""
    if buf is None:
        return None
    mask = int.from_bytes(buf, "little")
    if not labels:
        return mask
    return ",".join(lbl for i, lbl in enumerate(labels) if mask & (1 << i))


def encode_set(mask: int, nbytes: int = 1) -> bytes:
    return int(mask).to_bytes(nbytes, "little")


def decode_float(buf: bytes) -> float | None:
    """FLOAT: 4-byte little-endian IEEE-754 (Float.intBitsToFloat of the
    LE-read int, :68-69)."""
    return None if buf is None else struct.unpack("<f", buf[:4])[0]


def decode_double(buf: bytes) -> float | None:
    """DOUBLE: 8-byte little-endian IEEE-754 (:70-71)."""
    return None if buf is None else struct.unpack("<d", buf[:8])[0]


def encode_float(v: float) -> bytes:
    return struct.pack("<f", v)


def encode_double(v: float) -> bytes:
    return struct.pack("<d", v)


def decode_time_v1(buf: bytes):
    """TIME (v1): 3-byte little-endian integer HHMMSS packing (:218-226)."""
    if buf is None:
        return None
    v = int.from_bytes(buf[:3], "little")
    return dt.time(v // 10000, (v // 100) % 100, v % 100)


def decode_datetime_v1(buf: bytes):
    """DATETIME (v1): 8-byte little-endian YYYYMMDDHHMMSS packing
    (:262-277). Zero month/day -> None."""
    if buf is None:
        return None
    v = int.from_bytes(buf[:8], "little")
    sec, v = v % 100, v // 100
    minute, v = v % 100, v // 100
    hour, v = v % 100, v // 100
    day, v = v % 100, v // 100
    month, year = v % 100, v // 100
    if month == 0 or day == 0:
        return None
    return dt.datetime(year, month, day, hour, minute, sec)


def decode_timestamp_v1(buf: bytes):
    """TIMESTAMP (v1): 4-byte little-endian unix seconds (:96-97)."""
    if buf is None:
        return None
    secs = int.from_bytes(buf[:4], "little")
    if secs == 0:
        return None
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=secs)


def decode_year(buf: bytes) -> int | None:
    """YEAR: 1 byte, offset 1900; 0 -> 0 (the '0000' year)."""
    if buf is None:
        return None
    v = buf[0]
    return 0 if v == 0 else 1900 + v


def decode_int(buf: bytes, nbytes: int, signed: bool = True) -> int | None:
    """TINY/SHORT/INT24/LONG/LONGLONG: little-endian, sign-extended
    (INT24 is the (x<<8)>>8 case, :62-63)."""
    if buf is None:
        return None
    return int.from_bytes(buf[:nbytes], "little", signed=signed)


def encode_int(v: int, nbytes: int, signed: bool = True) -> bytes:
    return int(v).to_bytes(nbytes, "little", signed=signed)


# --------------------------------------------------- string / blob family


def resolve_string_meta(metadata: int) -> tuple[int, int]:
    """STRING's packed dual-format metadata (reference readString,
    BaseRowsEventBinLogDataDeserializer.java:186-200).

    A column transmitted as STRING (254) packs its REAL type into the high
    metadata byte when metadata >= 256:
      * (meta0 & 0x30) != 0x30 — the real type is meta0 | 0x30 and the two
        complemented bits carry the length's bits 8-9, so CHAR(>255 bytes)
        survives: length = meta1 | (((meta0 & 0x30) ^ 0x30) << 4).
      * otherwise meta0 IS the type verbatim (ENUM/SET transmitted as
        STRING) and meta1 is the packed value length.
    Returns (real_type_code, length)."""
    if metadata < 256:
        return 254, metadata
    meta0, meta1 = metadata >> 8, metadata & 0xFF
    if (meta0 & 0x30) != 0x30:
        return meta0 | 0x30, meta1 | (((meta0 & 0x30) ^ 0x30) << 4)
    return meta0, meta1


# MySQL/MariaDB column character sets -> Python codecs. The reference decodes
# string payloads with the column's charset carried through TABLE_MAP metadata
# (BaseRowsEventBinLogDataDeserializer.java:181-216 + FullMeta
# DEFAULT_CHARSET/COLUMN_CHARSET optional blocks); this engine carries a
# charset NAME per column in the envelope's column_charsets array. Unknown or
# absent charsets decode as utf-8 with replacement (the previous behavior, and
# correct for utf8mb4 sources — the dominant modern default).
CHARSET_CODECS = {
    "utf8": "utf-8",
    "utf8mb3": "utf-8",
    "utf8mb4": "utf-8",
    "latin1": "latin-1",  # MySQL latin1 is cp1252-ish; latin-1 covers 8859-1
    "latin2": "iso8859-2",
    "ascii": "ascii",
    "cp932": "cp932",
    "sjis": "cp932",
    "ujis": "euc-jp",
    "euckr": "euc-kr",
    "gbk": "gbk",
    "big5": "big5",
    "cp1251": "cp1251",
    "cp1250": "cp1250",
    "cp1256": "cp1256",
    "cp1257": "cp1257",
    "cp850": "cp850",
    "cp852": "cp852",
    "cp866": "cp866",
    "greek": "iso8859-7",
    "hebrew": "iso8859-8",
    "latin5": "iso8859-9",
    "latin7": "iso8859-13",
    "koi8r": "koi8-r",
    "koi8u": "koi8-u",
    "gb2312": "gb2312",
    "gb18030": "gb18030",
    "tis620": "tis-620",
    # MySQL's utf16/ucs2/utf32 are big-endian, no BOM
    "utf16": "utf-16-be",
    "utf16le": "utf-16-le",
    "ucs2": "utf-16-be",
    "utf32": "utf-32-be",
    "binary": "latin-1",  # lossless byte passthrough for BINARY/CHAR BYTE
}


def _codec(charset: str | None) -> str:
    return CHARSET_CODECS.get((charset or "").lower(), "utf-8")


def decode_varchar(
    buf: bytes, max_len: int, charset: str | None = None
) -> str | None:
    """VARCHAR/VAR_STRING: 1-byte length prefix when the declared max byte
    length fits 255, else 2-byte little-endian (readVarchar :181-184).
    Payload bytes decode with the column charset (default utf-8)."""
    if buf is None:
        return None
    if max_len <= 255:
        n, off = buf[0], 1
    else:
        n, off = int.from_bytes(buf[:2], "little"), 2
    return buf[off : off + n].decode(_codec(charset), "replace")


def encode_varchar(s: str, max_len: int, charset: str | None = None) -> bytes:
    b = s.encode(_codec(charset))
    pre = 1 if max_len <= 255 else 2
    return len(b).to_bytes(pre, "little") + b


def decode_string(
    buf: bytes,
    metadata: int,
    labels: list[str] | None,
    charset: str | None = None,
):
    """STRING (254): resolve the packed dual-format metadata, then decode as
    the real type — ENUM/SET values are `length` index/mask bytes, CHAR
    payloads are length-prefixed with the prefix width chosen by the
    RESOLVED length (readString :201-216) and decoded with the column
    charset."""
    if buf is None:
        return None
    real, length = resolve_string_meta(metadata)
    if real == 247:
        return decode_enum(buf[:length], labels)
    if real == 248:
        return decode_set(buf[:length], labels)
    if length <= 255:
        n, off = buf[0], 1
    else:
        n, off = int.from_bytes(buf[:2], "little"), 2
    return buf[off : off + n].decode(_codec(charset), "replace")


def encode_string(s: str, metadata: int, charset: str | None = None) -> bytes:
    _, length = resolve_string_meta(metadata)
    b = s.encode(_codec(charset))
    pre = 1 if length <= 255 else 2
    return len(b).to_bytes(pre, "little") + b


def decode_blob(buf: bytes, meta: int) -> bytes | None:
    """BLOB family (TINY/MEDIUM/LONG/BLOB, 249-252) and the blob-shaped
    JSON/GEOMETRY payloads: `meta` little-endian length-prefix bytes, then
    the payload (readBlob :177-179, readJson/readGeometry :306-319)."""
    if buf is None:
        return None
    n = int.from_bytes(buf[:meta], "little")
    return buf[meta : meta + n]


def encode_blob(data: bytes, meta: int) -> bytes:
    return len(data).to_bytes(meta, "little") + data


# ------------------------------------------------- canonical-string dispatch

# Wire-typed field codes whose map values carry hex-encoded payload bytes in
# the binary-image envelope convention. Includes the string/blob family:
# VARCHAR(15)/VAR_STRING(253), STRING(254, packed dual-format metadata),
# TINY/MEDIUM/LONG/BLOB(249-252), JSON(245), GEOMETRY(255). Tables that
# publish no column_metadata never reach the decode gate, so plain-text
# string-map sources stay untouched.
WIRE_TYPES = frozenset(
    [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 13, 15, 16, 17, 18, 19]
    + [245, 246, 247, 248, 249, 250, 251, 252, 253, 254, 255]
)

# MariaDB 5.6+ subsecond type codes (MYSQL_TYPE_TIMESTAMP2=17,
# DATETIME2=18, TIME2=19).
TYPE_TIMESTAMP2 = 17
TYPE_DATETIME2 = 18
TYPE_TIME2 = 19


def decode_wire_value(
    type_code: int,
    meta: int,
    buf: bytes,
    labels: list[str] | None = None,
    charset: str | None = None,
) -> str | None:
    """One wire value -> canonical string (the envelope's map-value form;
    LakeTable.merge casts it to the table's typed column). Canonical forms
    parse losslessly in both Spark CAST and DuckDB CAST:
      decimals  '123.4500'   timestamps 'YYYY-MM-DD HH:MM:SS[.ffffff]'
      dates     'YYYY-MM-DD' times      'HH:MM:SS[.ffffff]'
      ints/bit  '42'         doubles    repr() shortest round-trip
      enum      label        set        'a,b'
    """
    if buf is None:
        return None
    if type_code == 246:  # NEWDECIMAL
        precision, scale = meta & 0xFF, meta >> 8
        v = decode_newdecimal(buf, precision, scale)
        return None if v is None else str(v)
    if type_code == TYPE_DATETIME2:
        v = decode_datetime2(buf, meta)
        return None if v is None else v.isoformat(sep=" ")
    if type_code == TYPE_TIMESTAMP2:
        v = decode_timestamp2(buf, meta)
        return None if v is None else v.isoformat(sep=" ")
    if type_code == TYPE_TIME2:
        v = decode_time2(buf, meta)
        return None if v is None else v.isoformat()
    if type_code == 10 or type_code == 14:  # DATE / NEWDATE
        v = decode_date(buf)
        return None if v is None else v.isoformat()
    if type_code == 16:  # BIT
        bitlen = (meta >> 8) * 8 + (meta & 0xFF)
        v = decode_bit(buf, bitlen)
        return None if v is None else str(v)
    if type_code == 247:  # ENUM
        v = decode_enum(buf, labels)
        return None if v is None else str(v)
    if type_code == 248:  # SET
        v = decode_set(buf, labels)
        return None if v is None else str(v)
    if type_code == 4:  # FLOAT
        v = decode_float(buf)
        return None if v is None else repr(v)
    if type_code == 5:  # DOUBLE
        v = decode_double(buf)
        return None if v is None else repr(v)
    if type_code == 7:  # TIMESTAMP v1
        v = decode_timestamp_v1(buf)
        return None if v is None else v.isoformat(sep=" ")
    if type_code == 11:  # TIME v1
        v = decode_time_v1(buf)
        return None if v is None else v.isoformat()
    if type_code == 12:  # DATETIME v1
        v = decode_datetime_v1(buf)
        return None if v is None else v.isoformat(sep=" ")
    if type_code == 13:  # YEAR
        v = decode_year(buf)
        return None if v is None else str(v)
    if type_code == 0:  # old DECIMAL: stored as string on modern servers
        return buf.decode("utf-8", "replace")
    if type_code in (15, 253):  # VARCHAR / VAR_STRING
        return decode_varchar(buf, meta, charset)
    if type_code == 254:  # STRING (packed dual-format metadata)
        v = decode_string(buf, meta, labels, charset)
        return None if v is None else str(v)
    if type_code in (249, 250, 251, 252):  # BLOB family -> canonical hex
        v = decode_blob(buf, meta)
        return None if v is None else v.hex()
    if type_code == 245:  # JSON: MariaDB stores the utf-8 text (LONGBLOB)
        v = decode_blob(buf, meta)
        return None if v is None else v.decode("utf-8", "replace")
    if type_code == 255:  # GEOMETRY: WKB payload -> canonical hex
        v = decode_blob(buf, meta)
        return None if v is None else v.hex()
    nbytes = {1: 1, 2: 2, 9: 3, 3: 4, 8: 8}.get(type_code)
    if nbytes:
        v = decode_int(buf, nbytes)
        return None if v is None else str(v)
    raise ValueError(f"unsupported wire type code {type_code}")
