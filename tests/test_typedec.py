"""Type-matrix decode kernels (FIXTURES.md §4.13): round-trip every decoder
against its public wire format, incl. the reference's edge cases
(zero-date -> null, negative decimals, INT24 sign extension)."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from mariadb_cdc_spark.functions.typedec import (
    datetime2_udf,
    decode_datetime2,
    decode_newdecimal,
    decode_varint,
    encode_datetime2,
    encode_newdecimal,
    newdecimal_udf,
    sign_extend_int24,
)


@pytest.mark.parametrize(
    "val,p,s",
    [
        ("0", 10, 0),
        ("1234567890", 10, 0),
        ("-1234567890", 10, 0),
        ("1234.56", 10, 2),
        ("-1234.56", 10, 2),
        ("0.001", 10, 3),
        ("-0.001", 10, 3),
        ("99999999999999999.999", 20, 3),
        ("-99999999999999999.999", 20, 3),
        ("123456789012.123456789", 21, 9),
        ("-0.000000001", 18, 9),
    ],
)
def test_newdecimal_roundtrip(val, p, s):
    d = Decimal(val)
    assert decode_newdecimal(encode_newdecimal(d, p, s), p, s) == d


@pytest.mark.parametrize(
    "value,fsp",
    [
        (dt.datetime(2024, 2, 29, 23, 59, 59), 0),
        (dt.datetime(1970, 1, 1, 0, 0, 0), 0),
        (dt.datetime(2024, 6, 15, 12, 30, 45, 120000), 2),
        (dt.datetime(2024, 6, 15, 12, 30, 45, 123400), 4),
        (dt.datetime(2024, 6, 15, 12, 30, 45, 123456), 6),
        (dt.datetime(9999, 12, 31, 23, 59, 59), 0),
    ],
)
def test_datetime2_roundtrip(value, fsp):
    assert decode_datetime2(encode_datetime2(value, fsp), fsp) == value


def test_zero_date_is_null():
    """month==0 or day==0 -> null (reference zero-date semantics)."""
    v = (1 << 39) | ((2024 * 13 + 0) << 22) | (1 << 17)
    assert decode_datetime2(v.to_bytes(5, "big")) is None
    v2 = (1 << 39) | ((2024 * 13 + 6) << 22) | (0 << 17)
    assert decode_datetime2(v2.to_bytes(5, "big")) is None


def test_int24_sign_extension():
    assert sign_extend_int24(0x7FFFFF) == 8388607
    assert sign_extend_int24(0x800000) == -8388608
    assert sign_extend_int24(0xFFFFFF) == -1
    assert sign_extend_int24(5) == 5


def test_varint():
    assert decode_varint(bytes([0x05])) == (5, 1)
    assert decode_varint(bytes([0xFB])) == (None, 1)
    assert decode_varint(bytes([0xFC, 0x34, 0x12])) == (0x1234, 3)
    assert decode_varint(bytes([0xFD, 0x56, 0x34, 0x12])) == (0x123456, 4)
    assert decode_varint(bytes([0xFE]) + (2**40).to_bytes(8, "little")) == (
        2**40,
        9,
    )


def test_vectorized_udfs(spark):
    rows = [
        (encode_newdecimal(Decimal("-1234.56"), 10, 2),
         encode_datetime2(dt.datetime(2024, 6, 15, 12, 30, 45), 0)),
        (None, None),
    ]
    df = spark.createDataFrame(rows, "dec binary, ts binary")
    out = df.select(
        newdecimal_udf(10, 2)(F.col("dec")).alias("d"),
        datetime2_udf(0)(F.col("ts")).alias("t"),
    ).collect()
    assert out[0]["d"] == Decimal("-1234.56")
    assert out[0]["t"] == dt.datetime(2024, 6, 15, 12, 30, 45)
    assert out[1]["d"] is None and out[1]["t"] is None
