"""GTID coverage accounting (operators.gtid) against hand-computed truth."""

from pyspark.sql import functions as F

from mariadb_cdc_spark.operators.gtid import gtid_coverage, parse_gtid


def _df(spark, gtids):
    return spark.createDataFrame([(g,) for g in gtids], "gtid string")


def test_parse_drops_malformed(spark):
    df = _df(spark, ["0-1-5", None, "garbage", "1-2", "2-3-10"])
    got = parse_gtid(df).select("gtid_domain", "gtid_server", "gtid_seq")
    assert sorted(tuple(r) for r in got.collect()) == [(0, 1, 5), (2, 3, 10)]


def test_coverage_gaps_and_replays(spark):
    # domain 0 server 1: seqs 1,2,3,5,6,9 (gaps 4,7,8; seq 2 replayed)
    # domain 0 server 2: dense 10..13 (no gap)
    # domain 1 server 1: single seq
    gtids = (
        ["0-1-1", "0-1-2", "0-1-2", "0-1-3", "0-1-5", "0-1-6", "0-1-9"]
        + [f"0-2-{s}" for s in range(10, 14)]
        + ["1-1-42"]
    )
    rows = {
        (r.gtid_domain, r.gtid_server): r
        for r in gtid_coverage(_df(spark, gtids)).collect()
    }
    a = rows[(0, 1)]
    assert (a.n_events, a.n_seqs, a.min_seq, a.max_seq) == (7, 6, 1, 9)
    assert a.n_missing == 3 and a.first_gap == 4
    b = rows[(0, 2)]
    assert (b.n_events, b.n_seqs, b.n_missing) == (4, 4, 0)
    assert b.first_gap is None
    c = rows[(1, 1)]
    assert (c.n_seqs, c.n_missing, c.first_gap) == (1, 0, None)
