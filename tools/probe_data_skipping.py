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

    # ---- point reads: per-file key blooms + key min/max bounds ----
    # Accumulate MoR delta files (the steady-state CDC layout point reads
    # hit in production), then compare read_keys' file-pruned scan against
    # the bucket-granular scan it used before blooms existed.
    from pyspark.sql import functions as F  # noqa: E402

    keys = MERGE_KEYS
    waves = 6
    touched: list[dict] = []
    t_bloom_write = 0.0
    for i in range(waves):
        sampled = (
            table.read()
            .where(F.abs(F.xxhash64("path", F.lit(i))) % 60 == 0)
            .limit(60)
            .collect()
        )
        assert sampled, f"wave {i} picked no keys"
        rows = [
            (
                r["repo"], r["path"], "UPSERT",
                {
                    "repo": r["repo"], "path": r["path"],
                    "commit": r["commit"], "lang": r["lang"],
                    "content": (r["content"] or "") + f"+d{i}",
                },
                "bin.000099", 10_000_000 + i * 1000 + j, 0, 1,
            )
            for j, r in enumerate(sampled)
        ]
        folded = spark.createDataFrame(
            rows,
            "repo string, path string, final_op string,"
            " image map<string,string>, last_file string, last_pos long,"
            " last_row_idx int, n_changes long",
        )
        t0 = time.time()
        table.merge(folded, stream_id="probe-delta", batch_id=i + 1)
        t_bloom_write += time.time() - t0
        touched.extend(
            {"repo": r["repo"], "path": r["path"]} for r in sampled[:2]
        )

    want = touched[:6] + [{"repo": "nosuch", "path": "nosuch"}]
    pp = table.point_plan(want)
    meta = table.metadata()
    assert any(meta.get("deltas", {}).values()), "no MoR deltas accumulated"

    # unpruned control: the pre-bloom read path (bucket granularity)
    types = dict(meta["schema"])
    present = {int(b) for b in meta["buckets"]} | {
        int(b) for b, rels in meta.get("deltas", {}).items() if rels
    }
    from mariadb_cdc_spark.sources.lake import (  # noqa: E402
        CDC_DELETED, _bucket_col, _parse_type,
    )

    want_df = spark.createDataFrame(
        [tuple(w[k] for k in keys) for w in want],
        T.StructType([T.StructField(k, _parse_type(types[k])) for k in keys]),
    )
    hit = sorted(
        {
            int(r["b"])
            for r in want_df.select(
                _bucket_col(keys, meta["n_buckets"]).alias("b")
            ).collect()
        }
        & present
    )

    def bucket_scan():
        df = table._read_state(meta, hit).join(
            F.broadcast(want_df), on=keys, how="left_semi"
        )
        return df.where(
            ~F.coalesce(F.col(CDC_DELETED), F.lit(False))
        ).count()

    table.read_keys(want).count()  # warm
    bucket_scan()
    t0 = time.time()
    n_point = table.read_keys(want).count()
    t_point = time.time() - t0
    t0 = time.time()
    n_bucket = bucket_scan()
    t_bucket = time.time() - t0
    assert n_point == n_bucket == len(want) - 1, (n_point, n_bucket)

    print(
        json.dumps(
            {
                "metric": "point_read_skipping",
                "sf": sf,
                "want_keys": len(want),
                **pp,
                "files_skipped_pct": round(
                    100 * (1 - pp["files_scanned"] / max(pp["files_live"], 1)),
                    1,
                ),
                "bytes_skipped_pct": round(
                    100 * (1 - pp["bytes_scanned"] / max(pp["bytes_live"], 1)),
                    1,
                ),
                "sec_read_keys_bloom": round(t_point, 3),
                "sec_read_keys_bucket_only": round(t_bucket, 3),
                "sec_delta_commits_total": round(t_bloom_write, 3),
                "delta_waves": waves,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
