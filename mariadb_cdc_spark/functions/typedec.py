"""Binlog wire-type decode kernels, vectorized (pandas/Arrow UDFs).

Re-implements the decoders of the reference's densest file
(binlog/reader/packet/binlog/des/BaseRowsEventBinLogDataDeserializer.java:52-319)
from the PUBLIC MySQL/MariaDB on-disk formats — packed-BCD NEWDECIMAL
(mysql strings/decimal.c layout), DATETIME2 40-bit big-endian bitfield with
fractional seconds, zero-date -> null, sign-extended TINY/SHORT/INT24 —
as batch kernels over binary columns: one Python invocation per Arrow batch,
никогда per row.

These run OFF the envelope hot path (they decode payload bytes when the
source emits raw wire images); the synthetic generator emits string maps, so
the kernels are exercised by the type-matrix tests (FIXTURES.md §4.13).
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
