"""The parity gate must mirror the driver's hash semantics: DuckDB types the
driver hashes differently from Spark (HUGEINT from sum(INTEGER), etc.) must
fail the local gate loudly instead of silently passing value comparison.

Round-4 regression: 5 oracles emitted sum(int)->HUGEINT; values matched so
tools/parity.py said OK while the driver's hash_match said red. The guard
added in round 5 (tools/parity.py:assert_hash_stable) closes that class.
"""

import duckdb
import pytest

from tools.parity import TABLES, assert_hash_stable


def test_uncast_sum_fails_loudly():
    con = duckdb.connect()
    rel = con.sql("select sum(1) as s from range(10)")
    with pytest.raises(TypeError, match="HUGEINT"):
        assert_hash_stable("demo", rel)


def test_cast_sum_passes():
    con = duckdb.connect()
    rel = con.sql("select sum(1)::BIGINT as s from range(10)")
    assert_hash_stable("demo", rel)


def test_all_registered_oracles_hash_stable():
    """Sweep every oracle_sql() entry at sf0.001 — no HUGEINT/unstable types."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
    for name, sql in em.oracle_sql().items():
        assert_hash_stable(name, con.sql(sql))
