"""DataRow accessor coercions (reference BaseDataRow.java:15-175).

Ports the coercion matrix: case-insensitive name lookup, positional col<i>
access, Number/String → long/int/boolean rules, temporal pass-through,
UnsupportedTypeException on anything else (strict) vs NULL (lenient).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from mariadb_cdc_spark.functions import accessors as A


@pytest.fixture(scope="module")
def img_df(spark):
    return spark.createDataFrame(
        [
            (
                1,
                {
                    "Id": "42",
                    "Name": "widget",
                    "Price": "19.99",
                    "Active": "1",
                    "Flag": "true",
                    "Born": "2024-03-05",
                    "Seen": "2024-03-05 06:07:08.125000",
                    "Tod": "13:45:00",
                },
            ),
            (2, {"Id": None, "Name": None, "col0": "7"}),
        ],
        "k int, after map<string,string>",
    )


def _one(df, col, k=1):
    return df.filter(F.col("k") == k).select(col.alias("v")).collect()[0]["v"]


def test_name_lookup_is_case_insensitive(img_df):
    # valueMap is keyed lower-cased and the getter lower-cases the field
    # (BaseDataRow.java:15-16,171-175)
    assert _one(img_df, A.get_string("after", "id")) == "42"
    assert _one(img_df, A.get_string("after", "ID")) == "42"
    assert _one(img_df, A.get_string("after", "name")) == "widget"
    assert _one(img_df, A.get_string("after", "missing")) is None


def test_positional_index_access(img_df):
    # index access = the synthesized col<i> positional schema
    # (BinaryLogEventProcessor.java:230)
    assert _one(img_df, A.get_long("after", 0), k=2) == 7


def test_long_and_int_parse_integral_strings(img_df):
    assert _one(img_df, A.get_long("after", "id")) == 42
    assert _one(img_df, A.get_int("after", "id")) == 42
    assert _one(img_df, A.get_long("after", "id"), k=2) is None  # null passes


def test_long_on_non_integral_raises_strict_nulls_lenient(img_df):
    # Long.parseLong("19.99") throws -> UnsupportedTypeException
    with pytest.raises(Exception, match="UnsupportedType"):
        img_df.select(A.get_long("after", "price")).collect()
    assert _one(img_df, A.get_long("after", "price", strict=False)) is None


def test_boolean_number_eq_1_and_string_valueof(img_df):
    # Number -> ==1; String -> Boolean.valueOf (BaseDataRow.java:142-149)
    assert _one(img_df, A.get_boolean("after", "active")) is True
    assert _one(img_df, A.get_boolean("after", "flag")) is True
    assert _one(img_df, A.get_boolean("after", "name")) is False  # "widget"
    assert _one(img_df, A.get_boolean("after", "price")) is False  # 19.99 != 1


def test_temporal_accessors_parse_canonical_renderings(img_df):
    assert _one(img_df, A.get_local_date("after", "born")) == datetime.date(
        2024, 3, 5
    )
    assert _one(
        img_df, A.get_local_datetime("after", "seen")
    ) == datetime.datetime(2024, 3, 5, 6, 7, 8, 125000)
    assert _one(img_df, A.get_local_time("after", "tod")) == "13:45:00"


def test_temporal_on_non_temporal_raises(img_df):
    # a String is not a LocalDate (BaseDataRow.java:108-116)
    with pytest.raises(Exception, match="UnsupportedType"):
        img_df.select(A.get_local_date("after", "name")).collect()
    assert _one(img_df, A.get_local_date("after", "name", strict=False)) is None


def test_presence_count_and_names(img_df):
    assert _one(img_df, A.has_column("after", "BORN")) is True
    assert _one(img_df, A.has_column("after", "nope")) is False
    assert _one(img_df, A.column_count("after")) == 8
    assert set(_one(img_df, A.column_names("after"))) >= {"Id", "Name"}


def test_accessors_are_catalyst_only(img_df):
    # the DataRow surface must not introduce Python row-at-a-time execution
    plan = img_df.select(
        A.get_long("after", "id"), A.get_boolean("after", "active")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
