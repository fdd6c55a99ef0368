"""Audit-gated apply (pipeline.apply_batch_audited): a failing post-batch
audit rolls the table back and reopens the exactly-once marker so the
corrected batch re-applies under the same id."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.pipeline import (
    BatchAuditFailed,
    CdcConfig,
    apply_batch_audited,
)
from mariadb_cdc_spark.sources.lake import LakeTable

REPO_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType())
        for c in ["repo", "path", "commit", "lang", "content"]
    ]
)


def _state(table):
    return sorted((r.repo, r.path, r.commit) for r in table.read().collect())


def test_failing_audit_rolls_back_and_allows_retry(spark, sf_dir, tmp_path):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    cfg = CdcConfig()

    def too_many_nulls(t, res):
        n = t.read().where(F.col("content").isNull()).count()
        return f"{n} null contents" if n > -1 else None  # always fails

    pre = table.metadata()["version"]
    with pytest.raises(BatchAuditFailed) as ei:
        apply_batch_audited(
            events, table, cfg, too_many_nulls, stream_id="s", batch_id=0
        )
    assert ei.value.rolled_back_to == pre
    assert table.read().count() == 0  # state restored
    assert table.committed_batch("s") == -1  # marker reopened

    # corrected run (audit passes) applies the SAME batch id
    res = apply_batch_audited(
        events, table, cfg, lambda t, r: None, stream_id="s", batch_id=0
    )
    assert not res.get("skipped")
    assert table.read().count() > 0
    final = _state(table)

    # replay of the now-committed batch skips the audit entirely
    called = []
    res2 = apply_batch_audited(
        events, table, cfg,
        lambda t, r: called.append(1) or "boom",
        stream_id="s", batch_id=0,
    )
    assert res2.get("skipped") and not called
    assert _state(table) == final
