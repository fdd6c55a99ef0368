"""Column masking at ingest (operators.mask + CdcConfig.column_masks)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mariadb_cdc_spark.operators.mask import mask_images

SF = "/root/testdata/sf0.001"


def _changes(spark):
    rows = [
        ({"email": "a@b.com", "card": "4111111111111111", "n": "x"},
         {"email": "c@d.com", "card": "4111111111111234", "n": "y"}),
        ({"email": None, "card": "77", "n": "z"}, None),
    ]
    return spark.createDataFrame(
        rows, "before map<string,string>, after map<string,string>"
    )


def test_modes_and_null_passthrough(spark):
    out = mask_images(
        _changes(spark),
        {"email": "sha256", "card": "last4", "n": "redact"},
    ).collect()
    r0 = out[0]
    assert r0.before["email"] == hashlib.sha256(b"a@b.com").hexdigest()
    assert r0.after["email"] == hashlib.sha256(b"c@d.com").hexdigest()
    assert r0.before["card"] == "***1111" and r0.after["card"] == "***1234"
    assert r0.before["n"] == "***"
    r1 = out[1]
    assert r1.before["email"] is None  # null stays null, not a pseudonym
    assert r1.before["card"] == "***77"  # short value: kept behind the mark
    assert r1.after is None


def test_unknown_mode_rejected(spark):
    with pytest.raises(ValueError, match="unknown mask mode"):
        mask_images(_changes(spark), {"email": "rot13"})


def test_masked_pipeline_state(spark):
    """End-to-end: protected plaintexts never reach the lake, and the
    pseudonym is deterministic (join-stable across batches)."""
    import __spark_entry__ as entry

    typed = entry.q_cdc_masked_apply(spark, SF)
    rows = {r.id: r for r in typed.collect()}
    assert rows  # non-vacuous
    for i, r in rows.items():
        assert r.name == hashlib.sha256(f"doc-{i}".encode()).hexdigest()
        assert r.label == "***"
        raw = f"p{i}".encode().hex()
        assert r.payload == "***" + raw[-4:]
        # unmasked columns untouched
        assert r.status in ("active", "archived")
