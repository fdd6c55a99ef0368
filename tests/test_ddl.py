"""Golden DDL-classification cases — port of the reference QueryDeciderTest
(/root/reference/src/test/java/mariadbcdc/QueryDeciderTest.java:9-88)."""

import pytest

from mariadb_cdc_spark.functions.ddl import (
    SchemaChangedTable as SCT,
    decide_schema_change,
    mysql_type_to_lake,
    parse_alter_actions,
)


def assert_changed(sql, *expected):
    d = decide_schema_change(sql)
    assert d.is_schema_change
    assert d.tables == expected


ALTER_CASES = [
    ("alter table user add column aaa char(10)", SCT(None, "user")),
    ("alter table test.user add column aaa char(10)", SCT("test", "user")),
    ("alter table member add column aaa char(10)", SCT(None, "member")),
    ("alter table mysys.member add column aaa char(10)", SCT("mysys", "member")),
    ("alter  table\nmember\nadd column aaa char(10)", SCT(None, "member")),
    ("alter  table\nmysys.member\nadd column aaa char(10)", SCT("mysys", "member")),
    ("\n   alter  table\nmysys.member\nadd column aaa char(10)", SCT("mysys", "member")),
    (
        "ALTER TABLE `mysys`.`member` \nCHANGE COLUMN `recmsg` `recmsg` "
        "VARCHAR(100) NULL DEFAULT NULL COMMENT 'memo' AFTER `invoice_no`",
        SCT("mysys", "member"),
    ),
    (
        "ALTER TABLE mysys.`member` \nCHANGE COLUMN `recmsg` `recmsg` "
        "VARCHAR(100) NULL DEFAULT NULL AFTER `invoice_no`",
        SCT("mysys", "member"),
    ),
    (
        "ALTER TABLE `mysys`.member \nCHANGE COLUMN `recmsg` `recmsg` "
        "VARCHAR(100) NULL DEFAULT NULL AFTER `invoice_no`",
        SCT("mysys", "member"),
    ),
]


@pytest.mark.parametrize("sql,expected", ALTER_CASES)
def test_alter_cases(sql, expected):
    assert_changed(sql, expected)


def test_not_alter():
    d = decide_schema_change("# dum")
    assert not d.is_schema_change
    assert d.tables == ()


RENAME_CASES = [
    ("rename table old to new", (SCT(None, "old"),)),
    ("rename table `old` to `new`", (SCT(None, "old"),)),
    ("RENAME TABLE old TO new", (SCT(None, "old"),)),
    ("rename table IF exists old to new", (SCT(None, "old"),)),
    ("rename table test.old to test.new", (SCT("test", "old"),)),
    (
        "rename table old1 to new1, old2 to new2",
        (SCT(None, "old1"), SCT(None, "old2")),
    ),
    (
        "rename table test.old1 to test.new1, test2.old2 to new2",
        (SCT("test", "old1"), SCT("test2", "old2")),
    ),
    ("rename table `test`.`old` to `test`.`new`", (SCT("test", "old"),)),
]


@pytest.mark.parametrize("sql,expected", RENAME_CASES)
def test_rename_cases(sql, expected):
    assert_changed(sql, *expected)


DROP_CASES = [
    ("drop table test.member", (SCT("test", "member"),)),
    ("drop table test.member, user", (SCT("test", "member"), SCT(None, "user"))),
    ("drop table `test`.`member`", (SCT("test", "member"),)),
]


@pytest.mark.parametrize("sql,expected", DROP_CASES)
def test_drop_cases(sql, expected):
    assert_changed(sql, *expected)


def test_parse_alter_add_column():
    acts = parse_alter_actions(
        "alter table codehub.repo_files add column stars int"
    )
    assert acts[0].kind == "add"
    assert acts[0].column == "stars"
    assert acts[0].lake_type == "int"


def test_parse_alter_rename_column():
    acts = parse_alter_actions(
        "alter table t rename column old_name to new_name"
    )
    assert acts[0].kind == "rename"
    assert (acts[0].column, acts[0].new_name) == ("old_name", "new_name")


def test_parse_alter_modify_widen():
    acts = parse_alter_actions("alter table t modify column n bigint")
    assert acts[0].kind == "modify"
    assert acts[0].lake_type == "bigint"


def test_type_mapping():
    assert mysql_type_to_lake("varchar(200)") == "string"
    assert mysql_type_to_lake("DECIMAL(10,2)") == "decimal(10,2)"
    assert mysql_type_to_lake("datetime") == "timestamp_ntz"
    assert mysql_type_to_lake("bigint") == "bigint"


def test_classifiers_total_on_arbitrary_input():
    """The DDL and data-reset classifiers must be TOTAL functions of any
    SQL-ish string (a malformed QUERY event must never kill the batch):
    hypothesis fuzz for no-crash + stable return types."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mariadb_cdc_spark.functions.ddl import (
        decide_data_reset,
        decide_schema_change,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=120))
    def _run(sql):
        d = decide_schema_change(sql)
        assert isinstance(d.is_schema_change, bool)
        assert isinstance(d.tables, tuple)
        r = decide_data_reset(sql)
        assert r is None or r.table

    _run()


def test_ddl_prefilter_is_superset_of_classifiers():
    """The Spark-side rlike prefilter (pipeline._DDL_CANDIDATE_RE) must match
    every statement the exact classifiers match (else a DDL would be silently
    dropped) while rejecting per-transaction BEGIN/COMMIT QUERY noise (the
    reference receives ALL query events,
    shyikobinlog/BinaryLogEventProcessor.java:67-69 — at 10^10 events an
    unfiltered collect is O(transactions))."""
    import re

    from mariadb_cdc_spark.pipeline import _DDL_CANDIDATE_RE

    rx = re.compile(_DDL_CANDIDATE_RE)
    positives = (
        [sql for sql, _ in ALTER_CASES]
        + [sql for sql, _ in RENAME_CASES]
        + [sql for sql, _ in DROP_CASES]
        + ["truncate table codehub.repo_files", "  TRUNCATE repo_files;"]
    )
    for sql in positives:
        assert rx.search(sql), f"prefilter must keep: {sql!r}"
    noise = [
        "BEGIN",
        "COMMIT",
        "begin",
        "SET TIMESTAMP=1704067200",
        "insert into t values (1)",
        "# node of the cluster restarted",
        "GRANT SELECT ON db.* TO 'reader'",
        "FLUSH LOGS",
    ]
    for sql in noise:
        assert not rx.search(sql), f"prefilter must drop: {sql!r}"


def test_ddl_collect_is_bounded_by_ddl_statements(spark):
    """A reference-shaped binlog emits one BEGIN QUERY per transaction; the
    driver-side DDL collect must stay O(DDL statements), not O(transactions):
    the rlike prefilter runs in the Spark plan so only DDL candidates are
    collected, and classification over 5k BEGIN/COMMIT + 2 relevant DDLs
    yields exactly those 2 (in position order)."""
    from pyspark.sql import functions as F

    from mariadb_cdc_spark.pipeline import (
        CdcConfig,
        _DDL_CANDIDATE_RE,
        _classify_ddl_statements,
    )

    n_txn = 5000
    ctrl = (
        spark.range(n_txn)
        .select(
            F.lit("bin.000001").alias("binlog_file"),
            (F.col("id") * 10).alias("binlog_pos"),
            F.lit("QUERY").alias("event_type"),
            F.when(F.col("id") % 2 == 0, F.lit("BEGIN"))
            .otherwise(F.lit("COMMIT"))
            .alias("sql"),
        )
        .union(
            spark.createDataFrame(
                [
                    ("bin.000001", 25_000, "QUERY",
                     "alter table codehub.repo_files add column stars int"),
                    ("bin.000001", 35_000, "QUERY",
                     "truncate table codehub.repo_files"),
                    ("bin.000001", 45_000, "QUERY",
                     "alter table otherdb.other add column x int"),
                ],
                "binlog_file string, binlog_pos long, event_type string,"
                " sql string",
            )
        )
    )
    # the prefilter keeps only the 3 DDL candidates out of 5003 QUERY rows —
    # this is the set that reaches the driver
    kept = ctrl.where(F.col("sql").rlike(_DDL_CANDIDATE_RE)).count()
    assert kept == 3
    cfg = CdcConfig(database="codehub", table="repo_files", keys=["id"])
    ddls = _classify_ddl_statements(ctrl, cfg)
    assert [(r["binlog_pos"], kind) for r, kind in ddls] == [
        (25_000, "ddl"),
        (35_000, "truncate"),
    ]
