"""Finer-grained decode/registry profiling."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import bench_repo_table
from mariadb_cdc_spark.gen import generate_events
from mariadb_cdc_spark.operators.decode import decode_rows_events
from mariadb_cdc_spark.operators.filters import filter_tables
from mariadb_cdc_spark.operators.registry import (
    positional_fallback, resolve_table_metadata, table_map_registry,
)
from mariadb_cdc_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label:30s} {time.time()-t0:7.2f}s  -> {r}", flush=True)
    return r


spark = get_spark(app_name="profdec", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

repo = bench_repo_table(spark, SF)
events = generate_events(repo, rows_per_event=4, include_audit=False, n_buckets=256)
events = events.persist()
t("events count", lambda: events.count())
print("events partitions:", events.rdd.getNumPartitions())

maps = table_map_registry(events)
t("n table_maps", lambda: maps.count())

dec = decode_rows_events(events)
t("decode only count", lambda: dec.count())
t("decode count again", lambda: dec.count())

res = resolve_table_metadata(dec, maps)
t("decode+resolve count", lambda: res.count())
fb = positional_fallback(res)
filt = filter_tables(fb, ["codehub.repo_files"], None)
t("+fallback+filter count", lambda: filt.count())
filt.explain("formatted")
