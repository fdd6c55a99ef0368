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


# ---------------------------------------------------------- round 2 kernels

import datetime as dt

from mariadb_cdc_spark.functions import typedec as td


def test_time2_roundtrip():
    for t in [dt.time(0, 0, 0), dt.time(13, 14, 15), dt.time(23, 59, 59)]:
        assert td.decode_time2(td.encode_time2(t)) == t
    # fsp carries microseconds at 2-digit granularity steps
    t = dt.time(1, 2, 3, 450000)
    assert td.decode_time2(td.encode_time2(t, 2), 2) == t


def test_timestamp2_roundtrip_and_zero():
    ts = dt.datetime(2024, 6, 1, 12, 30, 45)
    assert td.decode_timestamp2(td.encode_timestamp2(ts)) == ts
    assert td.decode_timestamp2(b"\x00\x00\x00\x00") is None  # zero-ts -> null


def test_date_roundtrip_and_zero_date():
    d = dt.date(2024, 2, 29)
    assert td.decode_date(td.encode_date(d)) == d
    assert td.decode_date((2024 << 9).to_bytes(3, "little")) is None  # 00-00


def test_bit_byte_order():
    # BIT(12): value 0xABC -> 2 bytes big-endian on the wire
    assert td.decode_bit(td.encode_bit(0xABC, 12), 12) == 0xABC
    assert td.decode_bit(b"\x01\x00", 9) == 256


def test_enum_label_resolution():
    labels = ["active", "archived"]
    assert td.decode_enum(td.encode_enum(1), labels) == "active"
    assert td.decode_enum(td.encode_enum(2), labels) == "archived"
    assert td.decode_enum(td.encode_enum(0), labels) == ""  # invalid value
    assert td.decode_enum(td.encode_enum(9), labels) == 9  # unknown -> index


def test_set_bitmask_labels():
    labels = ["read", "write", "exec"]
    assert td.decode_set(td.encode_set(0b101), labels) == "read,exec"
    assert td.decode_set(td.encode_set(0), labels) == ""
    assert td.decode_set(td.encode_set(3), None) == 3  # no labels -> mask


def test_float_double_bits():
    assert td.decode_float(td.encode_float(1.5)) == 1.5
    assert td.decode_double(td.encode_double(-2.25)) == -2.25


def test_int_families_sign_extension():
    assert td.decode_int(td.encode_int(-5, 3), 3) == -5  # INT24
    assert td.decode_int(td.encode_int(-1, 1), 1) == -1  # TINY
    assert td.decode_int(td.encode_int(2**40, 8), 8) == 2**40  # LONGLONG


def test_v1_temporal_packings():
    assert td.decode_time_v1(int("131415").to_bytes(3, "little")) == dt.time(
        13, 14, 15
    )
    v = 20240102030405
    assert td.decode_datetime_v1(v.to_bytes(8, "little")) == dt.datetime(
        2024, 1, 2, 3, 4, 5
    )
    assert td.decode_timestamp_v1((1704067200).to_bytes(4, "little")) == (
        dt.datetime(2024, 1, 1)
    )


def test_wire_dispatch_canonical_strings():
    assert (
        td.decode_wire_value(246, 12 | (4 << 8),
                             td.encode_newdecimal(td.Decimal("0.0042"), 12, 4))
        == "0.0042"
    )
    assert (
        td.decode_wire_value(18, 0, td.encode_datetime2(
            dt.datetime(2024, 1, 2, 3, 4, 5)))
        == "2024-01-02 03:04:05"
    )
    assert td.decode_wire_value(16, 8, td.encode_bit(170, 8)) == "170"
    assert td.decode_wire_value(5, 8, td.encode_double(2.5)) == "2.5"


def test_varchar_length_prefix_width():
    # declared max <= 255 bytes -> 1-byte prefix; > 255 -> 2-byte
    # (readVarchar, BaseRowsEventBinLogDataDeserializer.java:181-184)
    assert td.encode_varchar("hi", 40)[0] == 2
    assert td.decode_varchar(td.encode_varchar("hi", 40), 40) == "hi"
    long_meta = 400
    enc = td.encode_varchar("x" * 300, long_meta)
    assert enc[:2] == (300).to_bytes(2, "little")
    assert td.decode_varchar(enc, long_meta) == "x" * 300
    # utf-8 multibyte survives
    assert td.decode_varchar(td.encode_varchar("héllo", 40), 40) == "héllo"


def test_resolve_string_meta_dual_format():
    # readString :186-200. metadata < 256: plain CHAR(length)
    assert td.resolve_string_meta(40) == (254, 40)
    # packed real-type bits: CHAR(300) -> meta0 0xEE, meta1 0x2C
    assert td.resolve_string_meta(0xEE2C) == (254, 300)
    # ENUM/SET transmitted verbatim in the high byte ((meta0&0x30)==0x30)
    assert td.resolve_string_meta((247 << 8) | 1) == (247, 1)
    assert td.resolve_string_meta((248 << 8) | 2) == (248, 2)


def test_string_packed_metadata_round_trip():
    meta = 0xEE2C  # CHAR(300): resolved length 300 -> 2-byte prefix
    enc = td.encode_string("title-7", meta)
    assert enc[:2] == (7).to_bytes(2, "little")
    assert td.decode_string(enc, meta, None) == "title-7"
    # short CHAR: 1-byte prefix
    assert td.decode_string(td.encode_string("ab", 10), 10, None) == "ab"


def test_string_carries_enum_and_set():
    # ENUM transmitted as STRING: value bytes are the 1-based index
    enc = td.encode_enum(2, 1)
    assert (
        td.decode_string(enc, (247 << 8) | 1, ["read", "write"]) == "write"
    )
    # SET transmitted as STRING: value bytes are the bitmask
    enc = td.encode_set(0b101, 1)
    assert (
        td.decode_string(enc, (248 << 8) | 1, ["r", "w", "x"]) == "r,x"
    )


def test_blob_prefix_widths():
    # metadata = number of little-endian length bytes (readBlob :177-179)
    for meta in (1, 2, 3, 4):
        data = b"\x00\xffpayload"
        enc = td.encode_blob(data, meta)
        assert enc[:meta] == len(data).to_bytes(meta, "little")
        assert td.decode_blob(enc, meta) == data


def test_wire_dispatch_string_blob_family():
    assert td.decode_wire_value(15, 40, td.encode_varchar("v", 40)) == "v"
    assert td.decode_wire_value(253, 40, td.encode_varchar("v", 40)) == "v"
    assert (
        td.decode_wire_value(254, 0xEE2C, td.encode_string("s", 0xEE2C))
        == "s"
    )
    assert (
        td.decode_wire_value(252, 2, td.encode_blob(b"\x01\x02", 2))
        == "0102"
    )
    assert (
        td.decode_wire_value(245, 4, td.encode_blob(b'{"k":1}', 4))
        == '{"k":1}'
    )
    assert (
        td.decode_wire_value(255, 4, td.encode_blob(b"\x00\x01WKB", 4))
        == b"\x00\x01WKB".hex()
    )


def test_wire_kernels_raise_only_contained_error_types():
    """Poison-pill contract: whatever garbage bytes a corrupt event
    carries, every wire kernel either decodes or raises one of the error
    types decode_wire_images contains (ValueError / IndexError /
    OverflowError / OSError / struct.error) — anything else would escape
    the per-value fallback and kill the batch. Seeded fuzz."""
    import random
    import struct as _struct

    from mariadb_cdc_spark.functions import typedec as td

    contained = (ValueError, IndexError, OverflowError, OSError, _struct.error)
    rng = random.Random(42)
    bufs = [b"", b"\x00", b"\xff" * 3, b"\xff" * 8, b"\xff" * 64] + [
        bytes(rng.randrange(256) for _ in range(n))
        for n in (1, 2, 5, 7, 9, 16, 33)
        for _ in range(6)
    ]
    metas = [0, 1, 2, 3, 0x0C04, 0xFEFF, 65535]
    for code in sorted(td.WIRE_TYPES):
        for buf in bufs:
            for meta in metas:
                try:
                    td.decode_wire_value(code, meta, buf, ["a", "b"])
                except contained:
                    pass  # the engine path degrades these to raw hex


def test_decode_errors_surface_and_quarantine_stats(spark):
    """Dead-letter observability: a corrupt wire value degrades to raw hex
    (containment) AND is surfaced in decode_errors / quarantine_stats."""
    from pyspark.sql import functions as F

    from mariadb_cdc_spark.functions import typedec as td
    from mariadb_cdc_spark.operators.decode import (
        decode_wire_images,
        quarantine_stats,
    )

    good_price = td.encode_newdecimal(__import__("decimal").Decimal("12.3400"), 12, 4).hex()
    corrupt = "zz-not-hex"
    rows = [
        # row 0: price decodes; row 1: price corrupt (before image clean)
        ("db", "metrics", "bin.000001", 100, {"price": good_price}, None),
        ("db", "metrics", "bin.000001", 200, {"price": corrupt}, {"price": corrupt}),
        # string-image table (no metadata): untouched, no errors
        ("db", "plain", "bin.000001", 300, {"x": "1"}, None),
    ]
    schema = (
        "database string, table string, binlog_file string, binlog_pos long,"
        " after map<string,string>, before map<string,string>"
    )
    df = spark.createDataFrame(rows, schema)
    meta = F.when(
        F.col("table") == "metrics",
        F.struct(
            F.array(F.lit("price")).alias("column_names"),
            F.array(F.lit(246)).alias("column_types"),
            F.array(F.lit(12 | (4 << 8))).alias("column_metadata"),
            F.array(F.lit(None).cast("array<string>")).alias("column_enum_values"),
        ),
    )
    df = df.select(
        "*",
        meta.getField("column_names").alias("column_names"),
        meta.getField("column_types").alias("column_types"),
        meta.getField("column_metadata").alias("column_metadata"),
        meta.getField("column_enum_values").alias("column_enum_values"),
    )
    out = decode_wire_images(df, with_errors=True).collect()
    by_pos = {r["binlog_pos"]: r for r in out}
    assert by_pos[100]["after"]["price"] == "12.3400"
    assert by_pos[100]["decode_errors"] == []
    assert by_pos[200]["after"]["price"] == corrupt  # contained, inspectable
    assert sorted(by_pos[200]["decode_errors"]) == ["after.price", "before.price"]
    assert by_pos[300]["after"]["x"] == "1" and by_pos[300]["decode_errors"] == []

    q = quarantine_stats(decode_wire_images(df, with_errors=True)).collect()
    got = {(r["image"], r["column"]): r for r in q}
    assert set(got) == {("after", "price"), ("before", "price")}
    r = got[("after", "price")]
    assert r["n_failures"] == 1 and r["first_pos"] == 200

    # default mode: unchanged surface (no decode_errors column)
    assert "decode_errors" not in decode_wire_images(df).columns


def test_charset_aware_varchar_and_string_decode():
    """Column-charset decode (reference carries charset through TABLE_MAP
    metadata, BaseRowsEventBinLogDataDeserializer.java:181-216): latin1
    wire bytes for 'café°' are single high bytes (0xE9, 0xB0) — invalid
    utf-8 — so only a charset-aware decode round-trips them; the default
    (no charset) stays utf-8 and mojibakes with U+FFFD replacement."""
    from mariadb_cdc_spark.functions import typedec as td

    s = "café-7°"
    wire = td.encode_varchar(s, 80, "latin1")
    assert td.decode_varchar(wire, 80, "latin1") == s
    # without the charset the high bytes are invalid utf-8 -> replacement
    assert "�" in td.decode_varchar(wire, 80)
    # utf8mb4 wire bytes decode identically with or without the hint
    w8 = td.encode_varchar(s, 80, "utf8mb4")
    assert td.decode_varchar(w8, 80, "utf8mb4") == s == td.decode_varchar(w8, 80)

    # STRING (254) path with packed dual-format metadata
    meta = 0xEE2C  # CHAR(300), 2-byte prefixes
    ws = td.encode_string(s, meta, "latin1")
    assert td.decode_string(ws, meta, None, "latin1") == s
    assert "�" in td.decode_string(ws, meta, None)

    # dispatch surface threads the charset through
    assert td.decode_wire_value(15, 80, wire, None, "latin1") == s
    assert td.decode_wire_value(254, meta, ws, None, "latin1") == s

    # unknown charset name degrades to utf-8-with-replacement, never raises
    assert "caf" in td.decode_varchar(wire, 80, "klingon")


import pytest as _pytest


@_pytest.mark.parametrize(
    "charset,sample",
    [
        ("cp1251", "Привет, мир — Вова"),          # Cyrillic, 1-byte high
        ("gbk", "你好，世界"),                      # Simplified Chinese, 2-byte
        ("big5", "繁體中文測試"),                   # Traditional Chinese
        ("euckr", "안녕하세요 세계"),               # Korean
        ("ujis", "こんにちは世界"),                 # Japanese EUC-JP
        ("cp932", "日本語テスト①"),                # Shift-JIS incl. NEC ①
        ("latin2", "Příliš žluťoučký kůň"),        # Central European
        ("ascii", "plain ascii only"),
        ("utf8mb4", "emoji 🚀 + combining é"),
        ("cp1250", "Zażółć gęślą jaźń"),           # Polish, Windows CE
        ("cp1256", "مرحبا بالعالم"),                # Arabic
        ("greek", "Γειά σου Κόσμε"),               # ISO 8859-7
        ("hebrew", "שלום עולם"),                   # ISO 8859-8
        ("latin5", "İstanbul'da ğüşıöç"),          # Turkish
        ("koi8r", "Съешь же ещё этих булок"),      # Russian KOI8-R
        ("koi8u", "Ґанок і ґудзик"),               # Ukrainian KOI8-U
        ("gb18030", "你好𠀀扩展字符"),              # GB18030 4-byte ext
        ("tis620", "สวัสดีชาวโลก"),                  # Thai
        ("cp866", "Привет ДОС"),                   # DOS Cyrillic
        ("utf16", "UTF-16 БЕ 测试 🚀"),            # MySQL utf16 = BE
        ("ucs2", "UCS-2 БМП 测试"),                # BMP only
        ("utf32", "UTF-32 БЕ 测试 🚀"),
    ],
)
def test_charset_roundtrip_breadth(charset, sample):
    """The common MySQL charset set round-trips through both the VARCHAR and
    the packed-metadata STRING wire paths (CHARSET_CODECS breadth)."""
    from mariadb_cdc_spark.functions import typedec as td

    w = td.encode_varchar(sample, 400, charset)
    assert td.decode_varchar(w, 400, charset) == sample
    meta = 0xEE2C  # CHAR(300), 2-byte prefixes
    ws = td.encode_string(sample, meta, charset)
    assert td.decode_string(ws, meta, None, charset) == sample
    # dispatch surface
    assert td.decode_wire_value(15, 400, w, None, charset) == sample


def test_binary_charset_is_lossless_byte_passthrough():
    """CHAR BYTE / BINARY columns: every byte value 0..255 survives the
    decode->encode cycle unchanged (latin-1 is the identity byte codec)."""
    from mariadb_cdc_spark.functions import typedec as td

    raw = bytes(range(256))
    wire = len(raw).to_bytes(2, "little") + raw
    s = td.decode_varchar(wire, 400, "binary")
    assert s.encode("latin-1") == raw
    assert td.encode_varchar(s, 400, "binary") == wire


def test_quarantine_stats_counts_contained_failures(spark):
    """Dead-letter aggregation: decode_wire_images(with_errors=True) keeps
    corrupt values as raw hex (containment) AND surfaces them countable;
    quarantine_stats groups per (database, table, image, column) with the
    first affected position."""
    from mariadb_cdc_spark.operators.decode import quarantine_stats

    rows = [
        # two price failures in the after image, one before-image failure
        ("db", "t", "bin.1", 10, ["after.price"]),
        ("db", "t", "bin.1", 30, ["after.price", "before.ts"]),
        ("db", "t", "bin.1", 20, []),
        ("db", "u", "bin.2", 5, ["after.price"]),
    ]
    decoded = spark.createDataFrame(
        rows,
        "database string, table string, binlog_file string,"
        " binlog_pos long, decode_errors array<string>",
    )
    got = {
        (r["database"], r["table"], r["image"], r["column"]): (
            r["n_failures"],
            r["first_file"],
            r["first_pos"],
        )
        for r in quarantine_stats(decoded).collect()
    }
    assert got == {
        ("db", "t", "after", "price"): (2, "bin.1", 10),
        ("db", "t", "before", "ts"): (1, "bin.1", 30),
        ("db", "u", "after", "price"): (1, "bin.2", 5),
    }
