"""Does parquet-backed events scale better than cached events?"""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import REPO_SCHEMA, bench_repo_table
from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.session import get_spark
from mariadb_cdc_spark.sources.lake import LakeTable

SF = "/root/testdata/sf0.1"
CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32

spark = get_spark(app_name=f"pq{CPUS}", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")

repo = bench_repo_table(spark, SF, repeat=4)
ev_dir = tempfile.mkdtemp(prefix="ev_") + "/events"
t0 = time.time()
generate_events(repo, rows_per_event=4, include_audit=False,
                n_buckets=256).write.parquet(ev_dir)
print(f"gen+write parquet: {time.time()-t0:.1f}s", flush=True)
events = spark.read.parquet(ev_dir)
print("n_events:", events.count())

for i in range(3):
    tmp = tempfile.mkdtemp(prefix=f"pqt{i}_")
    table = LakeTable.create(spark, f"{tmp}/t", REPO_SCHEMA, MERGE_KEYS,
                             n_buckets=64)
    t0 = time.time()
    apply_batch(events, table, CdcConfig(apply_ddl=False), stream_id="b",
                batch_id=0)
    dt = time.time() - t0
    print(f"apply run {i}: {dt:.2f}s  ({1570836/dt:.0f} ev/s)", flush=True)
