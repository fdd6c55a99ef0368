"""Cluster job entry point: run the CDC ingest under spark-submit.

The north rule's deployment shape — `spark-submit --py-files
mariadb_cdc_spark.zip submit.py ...` on a multi-executor cluster. This
script never sets a master or core-count: the cluster manager provides
them; all engine configs that must hold everywhere (AQE, Arrow, UTC) are
applied as runtime conf on whatever session spark-submit built.

Two modes:
  --events DIR        stream binlog-shaped parquet events from DIR
                      (Structured Streaming file source; exactly-once via
                      checkpoint + position-gated MERGE). Omit for batch
                      mode: one apply_batch over DIR read as a static frame.
  --generate SF_DIR   sandbox convenience: synthesize the deterministic
                      event stream from SF_DIR's documents table and apply
                      it as one batch (what the bench does).

Example (cluster):
  zip -r mariadb_cdc_spark.zip mariadb_cdc_spark
  spark-submit --deploy-mode cluster --num-executors 64 \
      --py-files mariadb_cdc_spark.zip submit.py \
      --events s3://bucket/binlog-events --table s3://bucket/repo_files \
      --checkpoint s3://bucket/ckpt --stream-id prod --streaming

Example (sandbox smoke, exercised by tests/test_submit.py):
  /opt/spark/bin/spark-submit --master 'local[8]' \
      --py-files mariadb_cdc_spark.zip submit.py \
      --generate /root/testdata/sf0.001 --table /tmp/repo_files
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import types as T

RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
}

REPO_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType())
        for c in ["repo", "path", "commit", "lang", "content"]
    ]
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--events", help="dir of binlog-shaped parquet events")
    src.add_argument("--frames", help="dir of a CRC-sealed frame archive "
                     "(operators.wire.write_frame_archive layout); frames "
                     "failing the integrity gate are dropped and counted "
                     "(batch: frames_quarantined rollup; streaming: "
                     "'frame_gate' observed metric per epoch, totalled in "
                     "the output JSON)")
    src.add_argument("--generate", metavar="SF_DIR",
                     help="synthesize events from SF_DIR/documents.parquet")
    src.add_argument("--maintenance", action="store_true",
                     help="no ingest: run table maintenance "
                          "(--compact / --rebucket / --expire-keep)")
    ap.add_argument("--table", required=True, help="lake table path")
    ap.add_argument("--checkpoint", help="streaming checkpoint dir")
    ap.add_argument("--stream-id", default="cdc")
    ap.add_argument("--streaming", action="store_true",
                    help="run as a Structured Streaming query (--events)")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--retain-versions", type=int, default=None,
                    help="expire all but the newest N snapshots after each "
                         "committed batch (in-line maintenance; default: "
                         "keep full history)")
    ap.add_argument("--compact", action="store_true",
                    help="(--maintenance) fold all delta files into a "
                         "fresh base")
    ap.add_argument("--rebucket", type=int, metavar="N",
                    help="(--maintenance) rewrite into an N-bucket layout")
    ap.add_argument("--expire-keep", type=int, metavar="N",
                    help="(--maintenance) expire all but the newest N "
                         "snapshots")
    ap.add_argument("--tag", metavar="NAME",
                    help="(--maintenance) pin the current (post-ops) "
                         "version under NAME")
    ap.add_argument("--rollback-to", metavar="V_OR_TAG",
                    help="(--maintenance) restore the table to version "
                         "number or tag name")
    args = ap.parse_args(argv)

    from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
    from mariadb_cdc_spark.sources.lake import LakeTable
    from mariadb_cdc_spark.streaming.stream import (
        read_event_stream,
        start_cdc_stream,
    )

    spark = SparkSession.builder.appName("mariadb-cdc-spark").getOrCreate()
    for k, v in RUNTIME_CONF.items():
        spark.conf.set(k, v)

    if args.maintenance:
        table = LakeTable(spark, args.table)
        if not table.exists():
            ap.error(f"--maintenance: no table at {args.table}")
        # `is not None`, not truthiness: an explicit `--rebucket 0` /
        # `--expire-keep 0` must reach the op (and fail loudly there),
        # not be silently skipped.
        if not (args.compact or args.rebucket is not None
                or args.expire_keep is not None
                or args.tag or args.rollback_to):
            ap.error("--maintenance needs --compact, --rebucket, "
                     "--expire-keep, --tag or --rollback-to")
        ops: dict = {}
        if args.rollback_to:
            # tags win over version numbers: an all-digit TAG name (e.g.
            # "20240101") must resolve to its tagged version, not be
            # misread as version 20240101
            tags = table.tags()
            v = (tags[args.rollback_to]
                 if args.rollback_to in tags
                 else int(args.rollback_to) if args.rollback_to.isdigit()
                 else table.resolve_tag(args.rollback_to))
            ops["rollback"] = {"to": v, "version": table.rollback(v)}
        if args.compact:
            ops["compact"] = table.compact()
        if args.rebucket is not None:
            ops["rebucket"] = table.rebucket(args.rebucket)
        if args.expire_keep is not None:
            ops["expire"] = table.expire_snapshots(keep_last=args.expire_keep)
        if args.tag:
            ops["tag"] = {
                "name": args.tag,
                "version": table.tag(args.tag, replace=True),
            }
        meta = table.metadata()
        print(json.dumps({
            "table": args.table,
            "version": meta["version"],
            "maintenance": ops,
        }))
        return 0

    table = (
        LakeTable(spark, args.table)
        if LakeTable(spark, args.table).exists()
        else LakeTable.create(
            spark, args.table, REPO_SCHEMA, ["repo", "path"],
            n_buckets=args.n_buckets,
        )
    )
    cfg = CdcConfig(retain_versions=args.retain_versions)

    quarantined = None
    gate_listener = None
    gate_totals = {"n_frames": 0, "n_quarantined": 0}
    gate_done = []
    if args.streaming:
        if not ((args.events or args.frames) and args.checkpoint):
            ap.error("--streaming requires --events or --frames, "
                     "and --checkpoint")
        if args.frames:
            # Accumulate the frame_gate observation via a listener: it sees
            # EVERY progress event, unlike q.recentProgress which Spark caps
            # (spark.sql.streaming.numRecentProgressUpdates, default 100) —
            # a long run would silently under-report drops from the evicted
            # epochs. Counts are per-run: epochs consumed by a previous run
            # of the same checkpoint were reported by that run.
            from pyspark.sql.streaming import StreamingQueryListener

            class _GateAccumulator(StreamingQueryListener):
                def onQueryStarted(self, event):
                    pass

                def onQueryProgress(self, event):
                    om = (event.progress.observedMetrics or {}).get(
                        "frame_gate"
                    )
                    if om is not None:
                        gate_totals["n_frames"] += int(om["n_frames"])
                        gate_totals["n_quarantined"] += int(
                            om["n_quarantined"]
                        )

                def onQueryIdle(self, event):
                    pass

                def onQueryTerminated(self, event):
                    gate_done.append(True)

            gate_listener = _GateAccumulator()
            spark.streams.addListener(gate_listener)
        if args.frames:
            from mariadb_cdc_spark.operators.wire import (
                FRAME_ARCHIVE_SCHEMA,
                framed_to_events,
            )

            events = framed_to_events(
                spark.readStream.schema(FRAME_ARCHIVE_SCHEMA).parquet(
                    args.frames
                ),
                observe_gate=True,
            )
        else:
            events = read_event_stream(spark, args.events)
        q = start_cdc_stream(
            events, table, cfg,
            checkpoint_dir=args.checkpoint, stream_id=args.stream_id,
        )
        q.awaitTermination()
        if gate_listener is not None:
            # listener delivery is async: wait (bounded) for the terminated
            # event so the final progress updates have been drained
            import time as _time

            deadline = _time.time() + 10
            while not gate_done and _time.time() < deadline:
                _time.sleep(0.1)
            spark.streams.removeListener(gate_listener)
            quarantined = dict(gate_totals)
    else:
        if args.generate:
            from mariadb_cdc_spark.gen import generate_events, repo_table

            events = generate_events(
                repo_table(spark, args.generate), include_audit=False
            )
        elif args.frames:
            from mariadb_cdc_spark.operators.wire import (
                frame_quarantine,
                framed_to_events,
            )

            framed = spark.read.parquet(args.frames)
            events = framed_to_events(framed)
            quarantined = [
                r.asDict() for r in frame_quarantine(framed).collect()
            ]
        else:
            events = spark.read.parquet(args.events)
        apply_batch(events, table, cfg, stream_id=args.stream_id, batch_id=0)

    meta = table.metadata()
    out = {
        "table": args.table,
        "version": meta["version"],
        "n_rows": meta["metrics"].get("n_rows"),
        "lineage": table.lineage(),
    }
    if quarantined is not None:
        out["frames_quarantined"] = quarantined
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
