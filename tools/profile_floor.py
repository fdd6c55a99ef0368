"""Decompose the ~20s apply floor at 8 vs 32 cores with REST metrics."""
import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import REPO_SCHEMA, materialize_events
from mariadb_cdc_spark.gen import MERGE_KEYS
from mariadb_cdc_spark.pipeline import (
    CdcConfig, decoded_changes, fold_for_merge, _latest_maps, _load_registry,
)
from mariadb_cdc_spark.session import get_spark
from mariadb_cdc_spark.sources.checkpoint import batch_lineage
from mariadb_cdc_spark.sources.lake import LakeTable, _bucket_col

CPUS = int(sys.argv[1])
EV = sys.argv[2] if len(sys.argv) > 2 else None

spark = get_spark(app_name=f"floor{CPUS}", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS,
                  extra_conf={
                      "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
                      "spark.sql.files.openCostInBytes": str(1024 * 1024),
                      "spark.ui.enabled": "true",
                  })
spark.sparkContext.setLogLevel("ERROR")

if EV:
    ev_path = EV
else:
    ev_path, _ = materialize_events(spark, "/root/testdata/sf0.1", 4)
    print("events at", ev_path)


def one_apply(tag):
    events = spark.read.parquet(ev_path)
    cfg = CdcConfig(apply_ddl=False)
    tmp = tempfile.mkdtemp(prefix=f"fl{tag}_")
    table = LakeTable.create(spark, f"{tmp}/t", REPO_SCHEMA, MERGE_KEYS, n_buckets=64)

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{CPUS}c {tag} {label:22s} {time.time()-t0:6.2f}s", flush=True)
        return r

    t0_all = time.time()
    ctrl = events.drop("rows_before", "rows_after").persist()
    lineage = t("lineage", lambda: batch_lineage(ctrl))
    maps, has_wire, all_named = _load_registry(ctrl, table)
    changes = decoded_changes(events, cfg, table_maps=maps,
                              wire_decode=has_wire, all_named=all_named)
    folded = fold_for_merge(changes, cfg)
    meta = table.metadata()
    u = folded.withColumn("_bucket", _bucket_col(MERGE_KEYS, 64)).persist()
    stats = t("stats(fold exec)", lambda: u.agg(
        F.collect_set("_bucket").alias("bks"),
        F.array_distinct(F.flatten(F.collect_set(F.map_keys(F.col("image"))))).alias("cols"),
        F.slice(F.collect_list(F.when(F.col("n_changes") >= 100000, F.struct(*MERGE_KEYS))), 1, 10000).alias("hot"),
    ).collect()[0])
    affected = sorted(stats["bks"])
    from mariadb_cdc_spark.sources.lake import _parse_type, CDC_FILE, CDC_POS, CDC_IDX, CDC_DELETED
    out_cols = []
    for n, st in meta["schema"]:
        typ = _parse_type(st)
        if n in MERGE_KEYS:
            out_cols.append(F.col(f"u.{n}").cast(typ).alias(n))
        else:
            out_cols.append(F.when(F.col("u.final_op") == "DELETE", F.lit(None).cast(typ))
                            .otherwise(F.col("u.image").getItem(n).cast(typ)).alias(n))
    out_cols += [F.col("u.last_file").alias(CDC_FILE), F.col("u.last_pos").alias(CDC_POS),
                 F.col("u.last_row_idx").alias(CDC_IDX),
                 (F.col("u.final_op") == "DELETE").alias(CDC_DELETED)]
    merged = u.alias("u").select(*out_cols)
    t("write", lambda: (merged.withColumn("_bucket", _bucket_col(MERGE_KEYS, 64))
                        .repartition(64, "_bucket").write.mode("overwrite")
                        .partitionBy("_bucket").parquet(f"{tmp}/t/data/v1")))
    t("latest_maps", lambda: _latest_maps(maps))
    u.unpersist(); ctrl.unpersist()
    print(f"{CPUS}c {tag} TOTAL {time.time()-t0_all:6.2f}s", flush=True)


one_apply("warm")
one_apply("hot")

base = "http://localhost:4040/api/v1/applications"
app = json.load(urllib.request.urlopen(base))[0]["id"]
stages = json.load(urllib.request.urlopen(f"{base}/{app}/stages?status=complete"))
for s in sorted(stages, key=lambda x: -x["executorRunTime"])[:6]:
    sid = s["stageId"]
    try:
        q = json.load(urllib.request.urlopen(
            f"{base}/{app}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"))
        dur = q["duration"]
    except Exception:
        dur = []
    print(f"STAGE {sid:3d} tasks={s['numCompleteTasks']:4d} run={s['executorRunTime']/1000:7.1f}s "
          f"cpu={s.get('executorCpuTime',0)/1e9:6.1f}s taskdur(p50,max)={dur}")
