"""Property tests for the wire layer: frame/unframe is lossless on
arbitrary envelopes, and ANY single-byte corruption of a frame is
detected (CRC32 detects all 1-byte errors; truncation trips the length
claim). Driven locally (pure-Python mirrors of the Catalyst exprs run
in one Spark job per case batch) to keep hypothesis fast."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mariadb_cdc_spark.operators.wire import (
    frame_events,
    unframe_events,
    verify_event_checksums,
)
from mariadb_cdc_spark.schema import EVENT_SCHEMA

_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " _-./😀é", max_size=24
)
_IMG = st.lists(
    st.dictionaries(_TEXT.filter(bool), _TEXT, max_size=3), max_size=2
)


@st.composite
def envelopes(draw):
    ev_type = draw(
        st.sampled_from(["WRITE_ROWS", "UPDATE_ROWS", "DELETE_ROWS", "QUERY",
                         "XID", "TABLE_MAP", "HEARTBEAT", "ROTATE"])
    )
    return (
        draw(st.integers(1, 2**31)),           # server_id
        "bin.%06d" % draw(st.integers(1, 99)),  # binlog_file
        draw(st.integers(0, 2**31)),           # binlog_pos
        ev_type,
        draw(st.datetimes(min_value=__import__("datetime").datetime(2000, 1, 1),
                          max_value=__import__("datetime").datetime(2030, 1, 1))
             ).replace(microsecond=0),
        draw(st.none() | _TEXT),               # gtid
        draw(st.none() | st.integers(0, 2**40)),  # table_id
        draw(st.none() | _TEXT),               # database
        draw(st.none() | _TEXT),               # table
        draw(st.none() | st.lists(st.integers(0, 255), max_size=4)),
        draw(st.none() | st.lists(_TEXT, max_size=4)),
        None,                                   # column_metadata
        None,                                   # column_enum_values
        None,                                   # column_charsets
        draw(st.none() | st.lists(st.booleans(), max_size=4)),
        draw(st.none() | st.lists(st.booleans(), max_size=4)),
        draw(st.none() | _IMG),                 # rows_before
        draw(st.none() | _IMG),                 # rows_after
        draw(st.none() | _TEXT),                # sql
        draw(st.none() | st.integers(0, 2**40)),  # xid
        None,
        None,
    )


@settings(max_examples=6, deadline=None)
@given(st.lists(envelopes(), min_size=1, max_size=6))
def test_frame_unframe_lossless(spark, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    framed = frame_events(df)
    assert (
        verify_event_checksums(framed)
        .where(F.col("frame_status") != "ok")
        .count()
        == 0
    )
    back = unframe_events(framed)
    canon = lambda d: d.select(  # noqa: E731
        F.to_json(
            F.struct(*[c for c in d.columns if c not in ("binlog_pos",)])
        ).alias("j"),
        # header next_pos is u32 on the wire — compare modulo 2^32
        F.pmod(F.col("binlog_pos"), F.lit(1 << 32)).alias("p"),
    )
    a = sorted((r.j, r.p) for r in canon(df).collect())
    b = sorted((r.j, r.p) for r in canon(back).collect())
    assert a == b


@settings(max_examples=4, deadline=None)
@given(
    st.lists(envelopes(), min_size=1, max_size=3),
    st.integers(0, 10**9),
    st.integers(1, 255),
)
def test_any_single_byte_flip_is_detected(spark, rows, pos_seed, xor_val):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    framed = frame_events(df)
    # flip one byte at a per-row pseudo-random offset
    nbytes = (F.length("frame_hex") / 2).cast("long")
    off = F.pmod(F.lit(pos_seed) + F.col("binlog_pos"), nbytes)  # 0-based byte
    hex_off = (off * 2 + 1).cast("int")
    byte = F.conv(F.substring(F.col("frame_hex"), hex_off, 2), 16, 10).cast("int")
    flipped = F.lpad(
        F.lower(F.hex(byte.bitwiseXOR(F.lit(xor_val)))), 2, "0"
    )
    corrupted = framed.withColumn(
        "frame_hex",
        F.concat(
            F.substring(F.col("frame_hex"), 1, (hex_off - 1).cast("int")),
            flipped,
            F.substring(
                F.col("frame_hex"),
                (hex_off + 2).cast("int"),
                F.length("frame_hex").cast("int"),
            ),
        ),
    )
    v = verify_event_checksums(corrupted)
    assert v.where(F.col("frame_status") == "ok").count() == 0
