"""Stage-by-stage timing of the bench cdc_apply job (tools only, not graded)."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import REPO_SCHEMA, bench_repo_table
from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events
from mariadb_cdc_spark.pipeline import (
    CdcConfig, decoded_changes, fold_for_merge, _load_registry,
)
from mariadb_cdc_spark.session import get_spark
from mariadb_cdc_spark.sources.checkpoint import batch_lineage
from mariadb_cdc_spark.sources.lake import LakeTable

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label:30s} {time.time()-t0:7.2f}s", flush=True)
    return r


spark = get_spark(app_name="profile", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

repo = bench_repo_table(spark, SF)
events = generate_events(repo, rows_per_event=4, include_audit=False, n_buckets=256)
events = events.persist()
t("gen+persist count", lambda: events.count())

tmp = tempfile.mkdtemp(prefix="prof_")
table = LakeTable.create(spark, f"{tmp}/t", REPO_SCHEMA, MERGE_KEYS, n_buckets=64)
cfg = CdcConfig(apply_ddl=False)

lineage = t("batch_lineage", lambda: batch_lineage(events))
maps, has_wire, all_named = t("load_registry", lambda: _load_registry(events, table))
changes = decoded_changes(events, cfg, table_maps=maps, wire_decode=has_wire,
                          all_named=all_named)
t("decode+registry count", lambda: changes.count())
folded = fold_for_merge(changes, cfg)
t("fold noop-write", lambda: folded.write.format("noop").mode("overwrite").save())
t("merge", lambda: table.merge(folded, stream_id="p", batch_id=0))
print("rows:", table.read().count())
