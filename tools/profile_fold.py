"""Compare fold strategies at bench scale."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import bench_repo_table
from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events
from mariadb_cdc_spark.operators.decode import decode_rows_events
from mariadb_cdc_spark.operators.fold import extract_keys, fold_changes
from mariadb_cdc_spark.operators.registry import (
    positional_fallback, resolve_table_metadata, table_map_registry,
)
from mariadb_cdc_spark.operators.filters import filter_tables
from mariadb_cdc_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label:30s} {time.time()-t0:7.2f}s", flush=True)
    return r


spark = get_spark(app_name="proffold", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

repo = bench_repo_table(spark, SF)
events = generate_events(repo, rows_per_event=4, include_audit=False, n_buckets=256)

changes = decode_rows_events(events)
changes = resolve_table_metadata(changes, table_map_registry(events))
changes = positional_fallback(changes)
changes = filter_tables(changes, ["codehub.repo_files"], None)
changes = extract_keys(changes, MERGE_KEYS).persist()
t("materialize changes", lambda: changes.count())

for phase in (True, False, True, False):
    f = fold_changes(changes, MERGE_KEYS, two_phase=phase)
    t(f"fold two_phase={phase}", lambda: f.write.format("noop").mode("overwrite").save())
