"""Measure file-level stats pruning (sources/stats.py + LakeTable.read_where)
on the e2e CDC table at a real scale factor: files/bytes skipped and the
wall-clock delta vs the same predicate as a full-scan residual filter.

Usage: python tools/probe_data_skipping.py [sf_dir] (default sf0.1)
Prints one JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table  # noqa: E402
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch  # noqa: E402
from mariadb_cdc_spark.session import get_spark  # noqa: E402
from mariadb_cdc_spark.sources.lake import LakeTable  # noqa: E402
from mariadb_cdc_spark.sources.stats import residual_filter  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="probe-skipping",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    tmp = tempfile.mkdtemp(prefix="probe_skip_")
    table = LakeTable.create(
        spark, f"{tmp}/repo_files", schema, MERGE_KEYS, n_buckets=32
    )
    events = generate_events(repo_table(spark, sf), include_audit=False)
    apply_batch(events, table, CdcConfig(), stream_id="p", batch_id=0)
    table.compact(sort_by=["path"], files_per_bucket=8)

    filters = [("lang", "=", "en"), ("path", "prefix", "src/en/doc_00001")]
    plan = table.pruning_plan(filters)

    # warm both paths once (JIT / FS cache), then time
    table.read_where(filters).count()
    residual_filter(table.read(), filters).count()

    t0 = time.time()
    n_pruned = table.read_where(filters).count()
    t_pruned = time.time() - t0
    t0 = time.time()
    n_full = residual_filter(table.read(), filters).count()
    t_full = time.time() - t0
    assert n_pruned == n_full, (n_pruned, n_full)

    out = {
        "metric": "data_skipping",
        "sf": sf,
        "filters": [list(f) for f in filters],
        "rows": n_pruned,
        **plan,
        "files_skipped_pct": round(
            100 * (1 - plan["files_scanned"] / max(plan["files_live"], 1)), 1
        ),
        "bytes_skipped_pct": round(
            100 * (1 - plan["bytes_scanned"] / max(plan["bytes_live"], 1)), 1
        ),
        "sec_pruned_scan": round(t_pruned, 3),
        "sec_full_scan": round(t_full, 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
