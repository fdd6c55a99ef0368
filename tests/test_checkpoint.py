"""Bad-position recovery + resume-filter semantics (SURVEY.md S5/S6).

Reference: a saved position the server no longer has (err 1236) either fails
the start or falls back to the latest position, per
usingLastPositionWhenBadPosition (DefaultBinaryLogWrapper.java:71-87,
MariadbCdcConfig.java:89-95, MariadbCdc_BadSavedPosition_Test.java:46-123).
Missing checkpoint = start from current master position (MariadbCdc.java:96-114).
"""

import pytest
from pyspark.sql import types as T

from mariadb_cdc_spark.sources.checkpoint import (
    BadPositionError,
    BinlogPosition,
    events_after,
    validate_position,
)

ENV_SCHEMA = T.StructType(
    [
        T.StructField("server_id", T.LongType()),
        T.StructField("binlog_file", T.StringType()),
        T.StructField("binlog_pos", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "bin.000001", 100, "WRITE_ROWS"),
            (1, "bin.000001", 200, "WRITE_ROWS"),
            (1, "bin.000002", 50, "WRITE_ROWS"),
            (2, "bin.000001", 400, "WRITE_ROWS"),
        ],
        ENV_SCHEMA,
    )


def test_no_saved_position_starts_from_beginning(spark):
    assert validate_position(_events(spark), None) is None


def test_valid_saved_position_kept(spark):
    p = BinlogPosition("bin.000001", 200)
    assert validate_position(_events(spark), p) == p


def test_bad_position_raises_by_default(spark):
    with pytest.raises(BadPositionError):
        validate_position(_events(spark), BinlogPosition("bin.000009", 4))


def test_bad_position_falls_back_to_latest_when_configured(spark):
    got = validate_position(
        _events(spark),
        BinlogPosition("bin.000009", 4),
        use_latest_on_bad_position=True,
    )
    assert got == BinlogPosition("bin.000002", 50)


def test_events_after_filters_per_server(spark):
    lineage = {"1": {"file": "bin.000001", "pos": 150}}
    kept = sorted(
        (r["server_id"], r["binlog_file"], r["binlog_pos"])
        for r in events_after(_events(spark), lineage).collect()
    )
    # server 1 resumes after (000001,150); server 2 has no checkpoint -> all
    assert kept == [
        (1, "bin.000001", 200),
        (1, "bin.000002", 50),
        (2, "bin.000001", 400),
    ]


def test_events_after_keeps_metadata_events(spark):
    """FD/TABLE_MAP survive the resume filter even at-or-before the saved
    position: they never advance the checkpoint (P5) and later rows events
    are only decodable through their preceding TABLE_MAP (J1)."""
    ev = spark.createDataFrame(
        [
            (1, "bin.000001", 4, "FORMAT_DESCRIPTION"),
            (1, "bin.000001", 20, "TABLE_MAP"),
            (1, "bin.000001", 100, "WRITE_ROWS"),
            (1, "bin.000001", 200, "WRITE_ROWS"),
        ],
        ENV_SCHEMA,
    )
    lineage = {"1": {"file": "bin.000001", "pos": 150}}
    kept = sorted(
        (r["binlog_pos"], r["event_type"])
        for r in events_after(ev, lineage).collect()
    )
    assert kept == [
        (4, "FORMAT_DESCRIPTION"),
        (20, "TABLE_MAP"),
        (200, "WRITE_ROWS"),
    ]


def test_gtid_lineage_tracks_max_seq_per_domain_server(spark):
    from pyspark.sql import functions as F

    from mariadb_cdc_spark.gen import generate_events, repo_table
    from mariadb_cdc_spark.sources.checkpoint import gtid_lineage

    events = generate_events(
        repo_table(spark, "/root/testdata/sf0.001"), include_audit=False
    )
    lin = gtid_lineage(events)
    expect = (
        events.where(F.col("gtid").isNotNull())
        .select(F.max(F.split("gtid", "-")[2].cast("long")))
        .collect()[0][0]
    )
    assert lin == {"0-1": int(expect)}


def test_resume_after_gtid_replays_exactly_the_suffix(spark):
    """Cut the stream at a GTID, resume from the prefix's gtid_lineage:
    the result holds every gtid event past the cut, none at/below it, and
    all metadata events (a rows event is only decodable through its map)."""
    from pyspark.sql import functions as F

    from mariadb_cdc_spark.gen import generate_events, repo_table
    from mariadb_cdc_spark.schema import NO_POSITION_SAVE_TYPES
    from mariadb_cdc_spark.sources.checkpoint import (
        gtid_lineage,
        resume_after_gtid,
    )

    events = generate_events(
        repo_table(spark, "/root/testdata/sf0.001"), include_audit=False
    )
    seq = F.split("gtid", "-")[2].cast("long")
    cut = int(
        events.where(F.col("gtid").isNotNull())
        .select(F.percentile_approx(seq, 0.5))
        .collect()[0][0]
    )
    prefix = events.where(F.col("gtid").isNull() | (seq <= cut))
    resumed = resume_after_gtid(events, gtid_lineage(prefix))

    # no consumed gtid event replays
    assert resumed.where(seq <= cut).count() == 0
    # every post-cut gtid event is present
    n_suffix = events.where(seq > cut).count()
    assert resumed.where(seq > cut).count() == n_suffix
    # metadata events all survive the resume filter
    n_meta = events.where(
        F.col("event_type").isin(*NO_POSITION_SAVE_TYPES)
    ).count()
    assert (
        resumed.where(
            F.col("event_type").isin(*NO_POSITION_SAVE_TYPES)
        ).count()
        == n_meta
    )


def test_resume_after_gtid_unknown_domain_replays_all(spark):
    from mariadb_cdc_spark.gen import generate_events, repo_table
    from mariadb_cdc_spark.sources.checkpoint import resume_after_gtid

    events = generate_events(
        repo_table(spark, "/root/testdata/sf0.001"), include_audit=False
    )
    # saved position names a domain-server this stream never produced
    resumed = resume_after_gtid(events, {"7-99": 10**9})
    assert resumed.count() == events.count()


def test_replication_lag_per_server(spark):
    import datetime as dt

    from mariadb_cdc_spark.sources.checkpoint import replication_lag

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # server 1: checkpoint at (bin.000001, 200) -> 2 pending
        (1, "bin.000001", 100, "WRITE_ROWS", s(0)),
        (1, "bin.000001", 200, "WRITE_ROWS", s(10)),
        (1, "bin.000001", 300, "WRITE_ROWS", s(20)),
        (1, "bin.000002", 50, "XID", s(30)),
        # metadata never counts toward lag (position-save predicate)
        (1, "bin.000002", 60, "TABLE_MAP", s(31)),
        # server 2: no checkpoint -> everything pending
        (2, "bin.000001", 400, "WRITE_ROWS", s(5)),
        (2, "bin.000001", 500, "WRITE_ROWS", s(9)),
    ]
    ev = spark.createDataFrame(
        rows,
        "server_id long, binlog_file string, binlog_pos long, "
        "event_type string, ts timestamp",
    )
    out = {
        r["server_id"]: r
        for r in replication_lag(
            ev, {"1": {"file": "bin.000001", "pos": 200}}
        ).collect()
    }
    r1 = out[1]
    assert (r1["head_file"], r1["head_pos"]) == ("bin.000002", 50)
    assert (r1["applied_file"], r1["applied_pos"]) == ("bin.000001", 200)
    assert r1["events_behind"] == 2  # pos 300 + XID; TABLE_MAP excluded
    assert r1["lag_us"] == 10_000_000  # head ts 30s - oldest pending 20s
    r2 = out[2]
    assert r2["applied_file"] is None and r2["events_behind"] == 2
    assert r2["lag_us"] == 4_000_000  # 9s - 5s

    # caught-up server: lag 0, nothing behind
    caught = replication_lag(
        ev.where("server_id = 1"),
        {"1": {"file": "bin.000002", "pos": 999}},
    ).collect()[0]
    assert caught["events_behind"] == 0 and caught["lag_us"] == 0
    assert caught["oldest_pending_ts_us"] is None
