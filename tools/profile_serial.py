"""Find the serial fraction of the scaled-up apply job (repeat=4)."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import REPO_SCHEMA, bench_repo_table
from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events
from mariadb_cdc_spark.pipeline import (
    CdcConfig, decoded_changes, fold_for_merge, _latest_maps, _load_registry,
)
from mariadb_cdc_spark.session import get_spark
from mariadb_cdc_spark.sources.checkpoint import batch_lineage
from mariadb_cdc_spark.sources.lake import LakeTable, _bucket_col

SF = "/root/testdata/sf0.1"
CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label:30s} {time.time()-t0:7.2f}s", flush=True)
    return r


spark = get_spark(app_name="profserial", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")

repo = bench_repo_table(spark, SF, repeat=4)
events = generate_events(repo, rows_per_event=4, include_audit=False, n_buckets=256)
events = events.persist()
t("gen+persist count", lambda: events.count())

# warm-up full apply once (JIT)
tmp0 = tempfile.mkdtemp(prefix="ser0_")
table0 = LakeTable.create(spark, f"{tmp0}/t", REPO_SCHEMA, MERGE_KEYS, n_buckets=64)
from mariadb_cdc_spark.pipeline import apply_batch
t("warmup full apply", lambda: apply_batch(
    events, table0, CdcConfig(apply_ddl=False), stream_id="w", batch_id=0))

tmp = tempfile.mkdtemp(prefix="ser_")
table = LakeTable.create(spark, f"{tmp}/t", REPO_SCHEMA, MERGE_KEYS, n_buckets=64)
cfg = CdcConfig(apply_ddl=False)

t0_all = time.time()
ctrl = events.drop("rows_before", "rows_after").persist()
lineage = t("batch_lineage(ctrl)", lambda: batch_lineage(ctrl))
maps, has_wire, all_named = _load_registry(ctrl, table)
changes = decoded_changes(events, cfg, table_maps=maps,
                          wire_decode=has_wire, all_named=all_named)
folded = fold_for_merge(changes, cfg)

meta = table.metadata()
keys, n_buckets = meta["keys"], meta["n_buckets"]
u = folded.withColumn("_bucket", _bucket_col(keys, n_buckets)).persist()
stats = t("stats collect (fold exec)", lambda: u.agg(
    F.collect_set("_bucket").alias("bks"),
    F.array_distinct(F.flatten(F.collect_set(F.map_keys(F.col("image"))))).alias("cols"),
).collect()[0])
affected = sorted(stats["bks"])
print("affected buckets:", len(affected))

# fast-path merged projection (as in lake.merge)
logical = meta["schema"]
from mariadb_cdc_spark.sources.lake import _parse_type, CDC_FILE, CDC_POS, CDC_IDX, CDC_DELETED
out_cols = []
for n, st in logical:
    typ = _parse_type(st)
    if n in keys:
        out_cols.append(F.col(f"u.{n}").cast(typ).alias(n))
    else:
        out_cols.append(
            F.when(F.col("u.final_op") == "DELETE", F.lit(None).cast(typ))
            .otherwise(F.col("u.image").getItem(n).cast(typ)).alias(n))
out_cols += [
    F.col("u.last_file").alias(CDC_FILE), F.col("u.last_pos").alias(CDC_POS),
    F.col("u.last_row_idx").alias(CDC_IDX),
    (F.col("u.final_op") == "DELETE").alias(CDC_DELETED),
]
merged = u.alias("u").select(*out_cols)
t("write merged", lambda: (
    merged.withColumn("_bucket", _bucket_col(keys, n_buckets))
    .repartition(max(len(affected), 1), "_bucket")
    .write.mode("overwrite").partitionBy("_bucket")
    .parquet(f"{tmp}/t/data/v1")))
t("latest_maps collect", lambda: _latest_maps(maps))
u.unpersist(); ctrl.unpersist()
print(f"TOTAL apply-ish: {time.time()-t0_all:.2f}s")
