"""The spark-submit deployment shape: package the engine as a zip, launch
submit.py through real spark-submit with --py-files from a directory where
the package is NOT otherwise importable, and check the resulting table."""

import json
import os
import shutil
import subprocess
import zipfile

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest):
    zpath = os.path.join(dest, "mariadb_cdc_spark.zip")
    pkg = os.path.join(REPO, "mariadb_cdc_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_batch(spark, tmp_path):
    workdir = str(tmp_path / "job")
    os.makedirs(workdir)
    zpath = _build_zip(workdir)
    shutil.copy(os.path.join(REPO, "submit.py"), workdir)
    table_path = str(tmp_path / "repo_files")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "submit.py",
            "--generate", "/root/testdata/sf0.001",
            "--table", table_path,
            "--n-buckets", "8",
        ],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    # metadata n_rows counts every key ever written (tombstones included)
    assert result["n_rows"] == 500
    assert result["version"] >= 1
    assert result["lineage"]

    # live final state (read from this process): 500 docs, keys with
    # gate<5 or gate>=15 survive the wave plan
    from mariadb_cdc_spark.sources.lake import LakeTable

    assert LakeTable(spark, table_path).read().count() == 444

    # maintenance mode against the same table: compact + rebucket, state
    # preserved in the new layout
    out2 = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "submit.py",
            "--maintenance", "--compact", "--rebucket", "16",
            "--tag", "post-maint",
            "--table", table_path,
        ],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-4000:]
    m = json.loads(out2.stdout.strip().splitlines()[-1])
    assert m["maintenance"]["rebucket"]["n_buckets"] == 16
    t = LakeTable(spark, table_path)
    assert t.metadata()["n_buckets"] == 16
    assert t.read().count() == 444
    assert t.tags()["post-maint"] == m["version"]


def test_spark_submit_streaming(spark, tmp_path):
    """The north rule's streaming deployment: events land as parquet files,
    submit.py --streaming consumes them via the Structured Streaming file
    source (availableNow), exactly-once into the lake table."""
    from mariadb_cdc_spark.gen import generate_events, repo_table

    events_dir = str(tmp_path / "events")
    generate_events(
        repo_table(spark, "/root/testdata/sf0.001"), include_audit=False
    ).write.parquet(events_dir)

    workdir = str(tmp_path / "job")
    os.makedirs(workdir)
    zpath = _build_zip(workdir)
    shutil.copy(os.path.join(REPO, "submit.py"), workdir)
    table_path = str(tmp_path / "repo_files")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "submit.py",
            "--events", events_dir,
            "--table", table_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--streaming", "--n-buckets", "8",
        ],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]

    from mariadb_cdc_spark.sources.lake import LakeTable

    assert LakeTable(spark, table_path).read().count() == 444


def test_spark_submit_frames_archive(spark, tmp_path):
    """--frames mode: a CRC-sealed frame archive (with a few corrupted
    heartbeat frames) ingests through real spark-submit; corrupt frames
    are dropped, counted in the output report, and — being heartbeats —
    leave the final state identical to the plain batch run."""
    from pyspark.sql import functions as F

    from mariadb_cdc_spark.gen import generate_events, repo_table
    from mariadb_cdc_spark.operators.wire import frame_events

    workdir = str(tmp_path / "job")
    os.makedirs(workdir)
    zpath = _build_zip(workdir)
    shutil.copy(os.path.join(REPO, "submit.py"), workdir)
    table_path = str(tmp_path / "repo_files")
    arch = str(tmp_path / "archive")

    events = generate_events(
        repo_table(spark, "/root/testdata/sf0.001"), include_audit=False
    )
    framed = frame_events(events)
    hb = F.col("event_type") == "HEARTBEAT"
    byte = F.conv(F.substring("frame_hex", 41, 2), 16, 10).cast("int")
    flipped = F.lpad(F.lower(F.hex(byte.bitwiseXOR(F.lit(255)))), 2, "0")
    framed = framed.withColumn(
        "frame_hex",
        F.when(
            hb,
            F.concat(
                F.substring("frame_hex", 1, 40),
                flipped,
                F.expr("substring(frame_hex, 43)"),
            ),
        ).otherwise(F.col("frame_hex")),
    )
    n_bad = framed.where(hb).count()
    assert n_bad > 0
    framed.select(
        "binlog_file", "binlog_pos", F.unhex("frame_hex").alias("frame")
    ).write.partitionBy("binlog_file").parquet(arch)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "submit.py",
            "--frames", arch,
            "--table", table_path,
            "--n-buckets", "8",
        ],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["n_rows"] == 500
    q = {}
    for r in result["frames_quarantined"]:  # one row per (file, status)
        q[r["frame_status"]] = q.get(r["frame_status"], 0) + r["n_events"]
    assert q == {"crc_mismatch": n_bad}
