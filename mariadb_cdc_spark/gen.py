"""Deterministic, DataFrame-native binlog-shaped event generator.

The reference is tested against a live MariaDB emitting real binlog events
(Testcontainers, /root/reference/src/test/java/mariadbcdc/MariaCdcTestHelper.java).
This sandbox has no server, so the generator synthesizes the same event
*shapes* (FIXTURES.md §2) from the input repo table — fully deterministic
(hash-derived, no RNG state) and fully distributed (every step is a DataFrame
transform; no driver-side loops), so the same generator runs at 10^10-event
scale on a real cluster.

Determinism strategy: per-key op sequences and positions derive from md5 of
the key, so any subset of the data generates identical events, and a pure-
Python oracle (oracle.py) can reproduce the expected final state.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 (pandas_udf type-hint resolution)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .schema import (
    EVENT_SCHEMA,
    EVT_ANNOTATE,
    EVT_FORMAT_DESCRIPTION,
    EVT_HEARTBEAT,
    EVT_QUERY,
    EVT_ROTATE,
    EVT_STOP,
    EVT_TABLE_MAP,
    EVT_UPDATE_ROWS,
    EVT_WRITE_ROWS,
    EVT_XID,
    FIELD_TYPE,
)

# The CDC'd table: source-code repo files keyed (repo, path) per BASELINE input_hint.
MAIN_TABLE_ID = 101
MAIN_DATABASE = "codehub"
MAIN_TABLE = "repo_files"
MAIN_COLUMNS = ["repo", "path", "commit", "lang", "content"]
MAIN_COLUMN_TYPES = [FIELD_TYPE["VARCHAR"]] * 5
MERGE_KEYS = ["repo", "path"]

# Decoy second table for include/exclude-filter and interleaved-TABLE_MAP
# scenarios (reference BinaryLogEventProcessorTest.java:217-256).
AUDIT_TABLE_ID = 202
AUDIT_TABLE = "audit"
AUDIT_COLUMNS = ["audit_id", "repo", "action"]

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _hash64(*cols, salt: str = "") -> F.Column:
    """Deterministic 60-bit hash of string columns: md5 hex -> bigint.

    md5 (not xxhash64) so the pure-Python oracle reproduces it exactly.
    """
    joined = F.concat_ws("\x1f", F.lit(salt), *cols)
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def repo_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the input repo table (repo, path, commit, lang, content)
    deterministically from the driver-provided documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("repo_"), F.col("source")).alias("repo"),
        F.concat(
            F.lit("src/"),
            F.col("lang"),
            F.lit("/doc_"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
            F.lit(".txt"),
        ).alias("path"),
        F.substring(
            F.concat(F.md5(F.col("text")), F.md5(F.concat(F.col("text"), F.lit("#")))),
            1,
            40,
        ).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _full_image(prefix: str = "", overrides: dict[str, F.Column] | None = None) -> F.Column:
    """map<string,string> image of the current repo-row columns.

    `overrides` substitutes final values per column at map-construction time,
    so every image is built by ONE create_map with unique keys — no
    map_concat over duplicates, no dependence on a non-default
    spark.sql.mapKeyDedupPolicy.
    """
    overrides = overrides or {}
    pairs = []
    for c in MAIN_COLUMNS:
        pairs.extend([F.lit(c), overrides.get(c, F.col(prefix + c))])
    return F.create_map(*pairs)


def generate_changes(repo_df: DataFrame) -> DataFrame:
    """Derive a deterministic per-key op sequence from the repo table.

    Output: one row per (key, wave) with columns
      wave:int, op:string, before:map, after:map, key_hash:long
    Wave plan (hash-gated so the mix is stable at any scale):
      0 INSERT full image                       (always)
      1 UPDATE full image (content rev 2)       (~60% of keys)
      2 UPDATE minimal row image: before=PK     (~35%)
        only, after=changed column only
        (reference README.md:200-235)
      3 DELETE                                  (~15%)
      4 re-INSERT after delete                  (~5%)
    """
    df = repo_df.withColumn("key_hash", _hash64(F.col("repo"), F.col("path")))
    gate = F.pmod(F.col("key_hash"), F.lit(100))

    rev2_content = F.concat(F.col("content"), F.lit("\n// rev 2"))
    rev3_content = F.concat(F.col("content"), F.lit("\n// rev 3"))
    commit2 = F.substring(
        F.concat(F.md5(F.col("commit")), F.col("commit")), 1, 40
    )

    full0 = _full_image()
    full1 = _full_image(overrides={"content": rev2_content, "commit": commit2})
    # state after wave 1 (if it ran) else wave 0 — used as DELETE before-image
    full_after_upd = F.when(gate < 60, full1).otherwise(full0)
    # wave 2 is the MINIMAL-ROW-IMAGE wave: as on the real wire
    # (binlog_row_image=minimal, reference README.md:200-235) the event
    # carries ONLY the used columns' values — before = PK, after = changed
    # column — plus the matching sparse bitmaps emitted by generate_events.
    # The engine's apply_column_bitmaps runs over these rows (sparse bitmap
    # => no short-circuit) and must agree with the image; the
    # full-image-with-garbage adversarial case is pinned by
    # test_column_bitmaps_are_authoritative.
    pk_map = F.create_map(
        F.lit("repo"), F.col("repo"), F.lit("path"), F.col("path")
    )
    partial2 = F.create_map(F.lit("content"), rev3_content)
    resurrect = _full_image(
        overrides={"content": F.concat(F.col("content"), F.lit("\n// resurrected"))}
    )

    def _op(wave, op, before, after, cond):
        s = F.struct(
            F.lit(wave).alias("wave"),
            F.lit(op).alias("op"),
            (before if before is not None else F.lit(None).cast("map<string,string>")).alias("before"),
            (after if after is not None else F.lit(None).cast("map<string,string>")).alias("after"),
        )
        return F.when(cond, s).otherwise(F.lit(None))

    ops = F.array(
        _op(0, "INSERT", None, full0, F.lit(True)),
        _op(1, "UPDATE", full0, full1, gate < 60),
        _op(2, "UPDATE", pk_map, partial2, gate < 35),
        _op(3, "DELETE", full_after_upd, None, gate < 15),
        _op(4, "INSERT", None, resurrect, gate < 5),
    )
    ops = F.filter(ops, lambda x: x.isNotNull())

    return df.select(
        "repo", "path", "key_hash", F.explode(ops).alias("o")
    ).select(
        "repo",
        "path",
        "key_hash",
        F.col("o.wave").alias("wave"),
        F.col("o.op").alias("op"),
        F.col("o.before").alias("before"),
        F.col("o.after").alias("after"),
    )


def generate_events(
    repo_df: DataFrame,
    *,
    server_id: int = 1,
    n_buckets: int = 32,
    events_per_file: int = 4096,
    rows_per_event: int = 1,
    include_audit: bool = True,
    include_stop: bool = False,
    include_annotate: bool = False,
    include_query_noise: bool = False,
    extra_events: DataFrame | None = None,
) -> DataFrame:
    """Build the full binlog-shaped event table (EVENT_SCHEMA).

    Position assignment is shuffle-light and cluster-scalable: instead of one
    global row_number (a single-task sort at 10^10 events), each change gets a
    unique, per-key-monotone slot
        slot = ((wave * n_buckets + bucket) * cap + rn)
    where bucket = hash(key) % n_buckets and rn is a row_number *within*
    (wave, bucket) — n_buckets-way parallel windows, no global sort.
    (binlog_file, binlog_pos) ordering == slot ordering.
    """
    changes = generate_changes(repo_df)

    cap = repo_df.count() + 2  # slot capacity per (wave,bucket); any bound works
    changes = changes.withColumn(
        "bucket", F.pmod(F.col("key_hash"), F.lit(n_buckets))
    ).withColumn(
        "h3", _hash64(F.col("repo"), F.col("path"), F.col("wave").cast("string"), salt="seq")
    )
    w = Window.partitionBy("wave", "bucket").orderBy("h3", "repo", "path")
    changes = changes.withColumn("rn", F.row_number().over(w))
    changes = changes.withColumn(
        "slot",
        (
            (F.col("wave").cast("long") * n_buckets + F.col("bucket")) * F.lit(cap)
            + F.col("rn")
        ),
    )

    # Group consecutive changes of the same (wave,bucket,op) into one
    # multi-row event (reference delivers N rows per event in one callback:
    # shyikobinlog/BinaryLogEventProcessor.java:162-172).
    changes = changes.withColumn(
        "event_group", F.floor((F.col("rn") - 1) / F.lit(rows_per_event))
    )
    grouped = (
        changes.groupBy("wave", "bucket", "op", "event_group")
        .agg(
            F.max("slot").alias("slot"),  # next-position semantics
            F.array_sort(
                F.collect_list(F.struct("slot", "before", "after")),
                # structs holding maps aren't orderable; compare slot only
                lambda a, b: F.when(a["slot"] < b["slot"], F.lit(-1))
                .when(a["slot"] > b["slot"], F.lit(1))
                .otherwise(F.lit(0)),
            ).alias("rows"),
        )
    )

    file_idx = F.floor(F.col("slot") / F.lit(events_per_file))
    pos_in_file = (F.pmod(F.col("slot"), F.lit(events_per_file)) + 1) * 256

    rows_events = grouped.select(
        F.lit(server_id).cast("long").alias("server_id"),
        F.concat(F.lit("bin."), F.lpad((file_idx + 1).cast("string"), 6, "0")).alias(
            "binlog_file"
        ),
        pos_in_file.cast("long").alias("binlog_pos"),
        F.concat(F.col("op"), F.lit("_ROWS"))
        .alias("event_type"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("slot")).alias("ts"),
        F.concat_ws("-", F.lit("0"), F.lit(server_id), F.col("slot")).alias("gtid"),
        F.lit(MAIN_TABLE_ID).cast("long").alias("table_id"),
        F.lit(None).cast("string").alias("database"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("array<int>").alias("column_types"),
        F.lit(None).cast("array<string>").alias("column_names"),
        # Honest wire bitmaps: the minimal-image wave (wave 2) marks only
        # the PK in columns_used (before image) and only the changed column
        # in update_columns_used (after image); full-image waves mark all.
        F.when(
            F.col("wave") == 2,
            F.expr("array(true,true,false,false,false)"),
        )
        .otherwise(F.expr("array(true,true,true,true,true)"))
        .alias("columns_used"),
        F.when(
            F.col("op") == "UPDATE",
            F.when(
                F.col("wave") == 2,
                F.expr("array(false,false,false,false,true)"),
            ).otherwise(F.expr("array(true,true,true,true,true)")),
        ).alias("update_columns_used"),
        F.when(
            F.col("op").isin("UPDATE", "DELETE"),
            F.expr("transform(rows, r -> r.before)"),
        ).alias("rows_before"),
        F.when(
            F.col("op").isin("INSERT", "UPDATE"),
            F.expr("transform(rows, r -> r.after)"),
        ).alias("rows_after"),
        F.lit(None).cast("string").alias("sql"),
        F.lit(None).cast("long").alias("xid"),
        F.lit(None).cast("string").alias("rotate_file"),
        F.lit(None).cast("long").alias("rotate_pos"),
    ).withColumn(
        "event_type",
        F.when(F.col("event_type") == "INSERT_ROWS", F.lit(EVT_WRITE_ROWS)).otherwise(
            F.col("event_type")
        ),
    )
    rows_events = _pad_envelope(rows_events, {})

    # XID commit markers after ~20% of rows events (pos +17 keeps order & uniqueness).
    xids = (
        rows_events.where(F.pmod(F.col("binlog_pos") / 256, F.lit(5)) == 0)
        .select(
            "server_id",
            "binlog_file",
            (F.col("binlog_pos") + 17).alias("binlog_pos"),
            F.lit(EVT_XID).alias("event_type"),
            "ts",
            "gtid",
        )
        .withColumn("xid_val", _hash64(F.col("gtid"), salt="xid"))
    )
    xids = _pad_envelope(xids, {"xid": F.col("xid_val")}).drop("xid_val")

    # Heartbeats (~1%): liveness carriers, never position-advancing payloads.
    hbs = rows_events.where(
        F.pmod(F.col("binlog_pos") / 256, F.lit(97)) == 3
    ).select(
        "server_id",
        "binlog_file",
        (F.col("binlog_pos") + 29).alias("binlog_pos"),
        F.lit(EVT_HEARTBEAT).alias("event_type"),
        "ts",
        F.lit(None).cast("string").alias("gtid"),
    )
    hbs = _pad_envelope(hbs, {})

    # Per-file control events: FORMAT_DESCRIPTION(pos 0), ROTATE(pos 1),
    # TABLE_MAP(pos 2..) — TABLE_MAP precedes every rows event in its file.
    files = rows_events.select("binlog_file").distinct()
    fd = files.select(
        F.lit(server_id).cast("long").alias("server_id"),
        "binlog_file",
        F.lit(0).cast("long").alias("binlog_pos"),
        F.lit(EVT_FORMAT_DESCRIPTION).alias("event_type"),
        F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
        F.lit(None).cast("string").alias("gtid"),
    )
    fd = _pad_envelope(fd, {})
    rot = files.select(
        F.lit(server_id).cast("long").alias("server_id"),
        "binlog_file",
        F.lit(1).cast("long").alias("binlog_pos"),
        F.lit(EVT_ROTATE).alias("event_type"),
        F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
        F.lit(None).cast("string").alias("gtid"),
    )
    rot = _pad_envelope(
        rot, {"rotate_file": F.col("binlog_file"), "rotate_pos": F.lit(4).cast("long")}
    )

    def _table_map(pos, table_id, db, tbl, cols, types):
        return _pad_envelope(
            files.select(
                F.lit(server_id).cast("long").alias("server_id"),
                "binlog_file",
                F.lit(pos).cast("long").alias("binlog_pos"),
                F.lit(EVT_TABLE_MAP).alias("event_type"),
                F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
                F.lit(None).cast("string").alias("gtid"),
            ),
            {
                "table_id": F.lit(table_id).cast("long"),
                "database": F.lit(db),
                "table": F.lit(tbl),
                "column_types": F.array(*[F.lit(t) for t in types]),
                "column_names": F.array(*[F.lit(c) for c in cols]),
            },
        )

    tmap_main = _table_map(
        2, MAIN_TABLE_ID, MAIN_DATABASE, MAIN_TABLE, MAIN_COLUMNS, MAIN_COLUMN_TYPES
    )

    parts = [rows_events, xids, hbs, fd, rot, tmap_main]

    if include_query_noise:
        # Realistic QUERY-event mix. A real row-format binlog delivers one
        # BEGIN QUERY event per transaction — the reference receives EVERY
        # query event (shyikobinlog/BinaryLogEventProcessor.java:67-69) —
        # so the engine's DDL classify must shrug the noise off in-plan
        # (the rlike prefilter in pipeline._DDL_CANDIDATE_RE). Transactions
        # here are the XID grouping (5 rows events per commit); BEGIN sits
        # strictly before the first rows event of each group (pos - 101 is
        # between the previous event's +29 heartbeat slot and this event's
        # -13 annotate slot).
        begins = rows_events.where(
            F.pmod(F.col("binlog_pos") / 256, F.lit(5)) == 1
        ).select(
            "server_id",
            "binlog_file",
            (F.col("binlog_pos") - 101).alias("binlog_pos"),
            F.lit(EVT_QUERY).alias("event_type"),
            "ts",
            F.lit(None).cast("string").alias("gtid"),
        )
        begins = _pad_envelope(begins, {"sql": F.lit("BEGIN")})
        # A few DDLs that DO survive the prefilter but target an unrelated
        # table: they reach the driver-side classifier (QueryDecider golden
        # semantics) and are discarded without an epoch split — the
        # production cost of apply_ddl=True, exercised end-to-end.
        other_ddl = files.select(
            F.lit(server_id).cast("long").alias("server_id"),
            "binlog_file",
            F.lit(5).cast("long").alias("binlog_pos"),
            F.lit(EVT_QUERY).alias("event_type"),
            F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
            F.lit(None).cast("string").alias("gtid"),
        )
        other_ddl = _pad_envelope(
            other_ddl,
            {
                "sql": F.lit(
                    "alter table otherdb.audit_mirror add column note varchar(32)"
                )
            },
        )
        parts.extend([begins, other_ddl])

    if include_annotate:
        # ANNOTATE_ROWS (binlog_annotate_row_events=ON): one statement per
        # (wave, bucket) change group, placed strictly before the group's
        # first rows event (pos - 13 sits between the previous event at
        # pos - 256 and the rows event at pos). Slots order groups
        # contiguously, so every rows event's nearest preceding annotate is
        # its own group's — the closed form cdc_annotate's oracle replays.
        ann = grouped.groupBy("wave", "bucket", "op").agg(
            F.min("slot").alias("slot")
        )
        afile = F.floor(F.col("slot") / F.lit(events_per_file))
        apos = (F.pmod(F.col("slot"), F.lit(events_per_file)) + 1) * 256 - 13
        ann = ann.select(
            F.lit(server_id).cast("long").alias("server_id"),
            F.concat(
                F.lit("bin."), F.lpad((afile + 1).cast("string"), 6, "0")
            ).alias("binlog_file"),
            apos.cast("long").alias("binlog_pos"),
            F.lit(EVT_ANNOTATE).alias("event_type"),
            F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("slot")).alias("ts"),
            F.lit(None).cast("string").alias("gtid"),
            F.concat(
                F.col("op"),
                F.lit(f" {MAIN_DATABASE}.{MAIN_TABLE} /* wave="),
                F.col("wave").cast("string"),
                F.lit(" bucket="),
                F.col("bucket").cast("string"),
                F.lit(" */"),
            ).alias("stmt"),
        )
        ann = _pad_envelope(ann, {"sql": F.col("stmt")}).drop("stmt")
        parts.append(ann)

    if include_stop:
        # STOP: written on clean server shutdown (BinlogEventType.java);
        # position-ADVANCING (only FORMAT_DESCRIPTION/TABLE_MAP are exempt,
        # BinaryLogEventProcessor.java:128-132), carries no payload. Placed
        # in a sentinel file that sorts after every data file.
        stop = _pad_envelope(
            rows_events.sparkSession.range(1).select(
                F.lit(server_id).cast("long").alias("server_id"),
                F.lit("bin.999999").alias("binlog_file"),
                F.lit(4).cast("long").alias("binlog_pos"),
                F.lit(EVT_STOP).alias("event_type"),
                F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
                F.lit(None).cast("string").alias("gtid"),
            ),
            {},
        )
        parts.append(stop)

    if include_audit:
        tmap_audit = _table_map(
            3,
            AUDIT_TABLE_ID,
            MAIN_DATABASE,
            AUDIT_TABLE,
            AUDIT_COLUMNS,
            [FIELD_TYPE["LONGLONG"], FIELD_TYPE["VARCHAR"], FIELD_TYPE["VARCHAR"]],
        )
        # Bucketed slot numbering (same scheme as the main table): arn is
        # unique and deterministic without a single-task global window —
        # n_buckets-way parallel row_numbers, offset by bucket * cap.
        aw = Window.partitionBy("abucket").orderBy("key_hash", "repo", "path")
        audit = (
            repo_df.withColumn("key_hash", _hash64(F.col("repo"), F.col("path")))
            .where(F.pmod(F.col("key_hash"), 100) < 10)
            .withColumn("abucket", F.pmod(F.col("key_hash"), F.lit(n_buckets)))
            .withColumn(
                "arn",
                F.col("abucket") * F.lit(cap) + F.row_number().over(aw),
            )
            .select(
                F.lit(server_id).cast("long").alias("server_id"),
                F.lit("bin.000001").alias("binlog_file"),
                (F.col("arn").cast("long") * 256 + 101).alias("binlog_pos"),
                F.lit(EVT_WRITE_ROWS).alias("event_type"),
                F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
                F.lit(None).cast("string").alias("gtid"),
                F.col("arn"),
                F.col("repo"),
            )
        )
        audit = _pad_envelope(
            audit,
            {
                "table_id": F.lit(AUDIT_TABLE_ID).cast("long"),
                "columns_used": F.expr("array(true,true,true)"),
                "rows_after": F.array(
                    F.create_map(
                        F.lit("audit_id"),
                        F.col("arn").cast("string"),
                        F.lit("repo"),
                        F.col("repo"),
                        F.lit("action"),
                        F.lit("touch"),
                    )
                ),
            },
        )
        parts.extend([tmap_audit, audit])

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if extra_events is not None:
        out = out.unionByName(extra_events, allowMissingColumns=True)
    # Normalize to the canonical envelope column order.
    return out.select(*[f.name for f in EVENT_SCHEMA.fields])


def _pad_envelope(df: DataFrame, overrides: dict[str, F.Column]) -> DataFrame:
    """Fill the remaining EVENT_SCHEMA columns with typed nulls."""
    present = set(df.columns) | set(overrides)
    for f in EVENT_SCHEMA.fields:
        if f.name in overrides:
            df = df.withColumn(f.name, overrides[f.name])
        elif f.name not in present:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[f.name for f in EVENT_SCHEMA.fields])


# ------------------------------------------------------- binary typed table
# A third CDC'd table whose row images are HEX-ENCODED WIRE BYTES decoded by
# the engine's wire kernels (functions.typedec) — the path that exercises
# NEWDECIMAL, DATETIME2, TIME2, TIMESTAMP2, DATE, BIT, ENUM, SET, DOUBLE,
# LONGLONG, VARCHAR, packed-metadata STRING, BLOB and JSON end-to-end
# (reference decode matrix, BaseRowsEventBinLogDataDeserializer.java:52-319).

TYPED_TABLE_ID = 303
TYPED_TABLE = "metrics"
TYPED_COLUMNS = [
    "id", "price", "updated_at", "flags", "ratio",
    "status", "tags", "created", "dur", "seen_at",
    "name", "title", "payload", "attrs", "label",
]
# LONGLONG, NEWDECIMAL, DATETIME2, BIT, DOUBLE, ENUM, SET, DATE, TIME2,
# TIMESTAMP2, VARCHAR, STRING, BLOB, JSON, VARCHAR(latin1)
TYPED_COLUMN_TYPES = [
    8, 246, 18, 16, 5, 247, 248, 10, 19, 17, 15, 254, 252, 245, 15,
]
# wire metadata: decimal precision|scale<<8, fsp, bit length, value length,
# varchar max bytes, STRING packed dual-format (real type STRING + length
# 300 -> meta0 0xEE / meta1 0x2C, resolve_string_meta round-trip), blob/json
# length-prefix width
TYPED_STRING_PACKED_META = 0xEE2C  # CHAR(300): two-byte length prefixes
TYPED_COLUMN_METADATA = [
    0, 12 | (4 << 8), 3, 8, 8, 1, 1, 0, 0, 0,
    40, TYPED_STRING_PACKED_META, 2, 4, 80,
]
TYPED_ENUM_VALUES = [
    None, None, None, None, None,
    ["active", "archived"], ["read", "write", "exec"],
    None, None, None,
    None, None, None, None, None,
]
# Per-column charset names (TABLE_MAP FullMeta DEFAULT_CHARSET/COLUMN_CHARSET
# analog): `label` is a latin1 column whose wire bytes are NOT valid utf-8
# for its non-ASCII chars — a utf-8 decode would mojibake, so agreement with
# the oracle proves the charset actually reaches the decoder.
TYPED_COLUMN_CHARSETS = [None] * 14 + ["latin1"]
TYPED_LAKE_SCHEMA = [
    ("id", "bigint"), ("price", "decimal(12,4)"),
    ("updated_at", "timestamp_ntz"), ("flags", "bigint"),
    ("ratio", "double"), ("status", "string"), ("tags", "string"),
    ("created", "date"), ("dur", "string"), ("seen_at", "timestamp_ntz"),
    ("name", "string"), ("title", "string"), ("payload", "string"),
    ("attrs", "string"), ("label", "string"),
]


def _typed_logical(doc_id: int, updated: bool) -> dict:
    """The logical row for a doc_id — the SAME closed-form the DuckDB oracle
    computes (oracle_sql 'cdc_typed_decode'), so wire encode->decode is
    verified end-to-end against an independent derivation."""
    import datetime as _dt
    from decimal import Decimal as _D

    pv = (doc_id * (104729 if updated else 7919)) % 10**8
    base = _dt.datetime(2024, 1, 1)
    return {
        "id": doc_id,
        "price": _D(pv).scaleb(-4),
        "updated_at": base
        + _dt.timedelta(
            seconds=doc_id + (3600 if updated else 0),
            microseconds=(doc_id % 1000) * 1000,
        ),
        "flags": doc_id % 256,
        "ratio": doc_id / 64,
        "status": ["active", "archived"][doc_id % 2],
        "tags_mask": 1 + doc_id % 7,
        "created": _dt.date(2024, 1, 1) + _dt.timedelta(days=doc_id % 365),
        "dur": _dt.time(
            (doc_id * 37) % 86400 // 3600,
            (doc_id * 37) % 86400 // 60 % 60,
            (doc_id * 37) % 86400 % 60,
        ),
        "seen_at": _dt.datetime(1970, 1, 1)
        + _dt.timedelta(seconds=BASE_EPOCH + doc_id),
        "name": f"doc-{doc_id}",
        "title": "t" * (1 + doc_id % 9) + f"-{doc_id}",
        "payload": f"p{doc_id}".encode("utf-8"),
        "attrs": '{"k":%d}' % doc_id,
        # latin1 column: é (0xE9) and ° (0xB0) are single high bytes on the
        # wire — invalid as utf-8, so this value round-trips ONLY through a
        # charset-aware decode
        "label": f"café-{doc_id}°",
    }


def generate_typed_events(spark, sf_dir: str, *, server_id: int = 1):
    """Binlog-shaped events for codehub.metrics with wire-byte images.

    Wave 0: INSERT (every doc_id), full image, all-true bitmap.
    Wave 1: minimal-image UPDATE (doc_id%5<2): before carries id (PK bit
    only), after carries price+updated_at (update bitmap) — bitmaps AND wire
    decode compose on this path.

    Positions are doc_id-derived (unique, monotone per key): no windows, no
    shuffles — the generator stays embarrassingly parallel at any scale.
    """
    from pyspark.sql.functions import pandas_udf

    from .functions import typedec as td

    cols = TYPED_COLUMNS

    def wire_map(doc_id: int, updated: bool, subset: list[str] | None) -> dict:
        lv = _typed_logical(doc_id, updated)
        enc = {
            "id": td.encode_int(lv["id"], 8),
            "price": td.encode_newdecimal(lv["price"], 12, 4),
            "updated_at": td.encode_datetime2(lv["updated_at"], 3),
            "flags": td.encode_bit(lv["flags"], 8),
            "ratio": td.encode_double(lv["ratio"]),
            "status": td.encode_enum(1 + doc_id % 2, 1),
            "tags": td.encode_set(lv["tags_mask"], 1),
            "created": td.encode_date(lv["created"]),
            "dur": td.encode_time2(lv["dur"], 0),
            "seen_at": td.encode_timestamp2(lv["seen_at"], 0),
            "name": td.encode_varchar(lv["name"], 40),
            "title": td.encode_string(lv["title"], TYPED_STRING_PACKED_META),
            "payload": td.encode_blob(lv["payload"], 2),
            "attrs": td.encode_blob(lv["attrs"].encode("utf-8"), 4),
            "label": td.encode_varchar(lv["label"], 80, "latin1"),
        }
        keep = subset or cols
        return {c: enc[c].hex() for c in keep}

    @pandas_udf("map<string,string>")
    def img_insert(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda d: wire_map(int(d), False, None))

    @pandas_udf("map<string,string>")
    def img_upd_before(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda d: wire_map(int(d), False, ["id"]))

    @pandas_udf("map<string,string>")
    def img_upd_after(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(
            lambda d: wire_map(int(d), True, ["price", "updated_at"])
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    all_true = F.array(*[F.lit(True) for _ in cols])
    pk_only = F.array(*[F.lit(c == "id") for c in cols])
    upd_cols = F.array(*[F.lit(c in ("price", "updated_at")) for c in cols])

    ins = docs.select(
        F.lit(server_id).cast("long").alias("server_id"),
        F.lit("typ.000001").alias("binlog_file"),
        (F.col("doc_id").cast("long") * 256 + 64).alias("binlog_pos"),
        F.lit(EVT_WRITE_ROWS).alias("event_type"),
        F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
        F.lit(None).cast("string").alias("gtid"),
        F.col("doc_id"),
    )
    ins = _pad_envelope(
        ins.withColumn("rows_after", F.array(img_insert("doc_id"))),
        {
            "table_id": F.lit(TYPED_TABLE_ID).cast("long"),
            "columns_used": all_true,
        },
    )

    upd = docs.where(F.pmod("doc_id", F.lit(5)) < 2).select(
        F.lit(server_id).cast("long").alias("server_id"),
        F.lit("typ.000002").alias("binlog_file"),
        (F.col("doc_id").cast("long") * 256 + 64).alias("binlog_pos"),
        F.lit(EVT_UPDATE_ROWS).alias("event_type"),
        F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
        F.lit(None).cast("string").alias("gtid"),
        F.col("doc_id"),
    )
    upd = _pad_envelope(
        upd.withColumn("rows_before", F.array(img_upd_before("doc_id")))
        .withColumn("rows_after", F.array(img_upd_after("doc_id"))),
        {
            "table_id": F.lit(TYPED_TABLE_ID).cast("long"),
            "columns_used": pk_only,
            "update_columns_used": upd_cols,
        },
    )

    files = spark.createDataFrame(
        [("typ.000001",), ("typ.000002",)], "binlog_file string"
    )
    tmap = _pad_envelope(
        files.select(
            F.lit(server_id).cast("long").alias("server_id"),
            "binlog_file",
            F.lit(2).cast("long").alias("binlog_pos"),
            F.lit(EVT_TABLE_MAP).alias("event_type"),
            F.timestamp_seconds(F.lit(BASE_EPOCH)).alias("ts"),
            F.lit(None).cast("string").alias("gtid"),
        ),
        {
            "table_id": F.lit(TYPED_TABLE_ID).cast("long"),
            "database": F.lit(MAIN_DATABASE),
            "table": F.lit(TYPED_TABLE),
            "column_types": F.array(*[F.lit(t) for t in TYPED_COLUMN_TYPES]),
            "column_names": F.array(*[F.lit(c) for c in TYPED_COLUMNS]),
            "column_metadata": F.array(
                *[F.lit(m) for m in TYPED_COLUMN_METADATA]
            ),
            "column_enum_values": F.array(
                *[
                    F.lit(v).cast("array<string>")
                    if v is None
                    else F.array(*[F.lit(x) for x in v])
                    for v in TYPED_ENUM_VALUES
                ]
            ),
            "column_charsets": F.array(
                *[
                    F.lit(c).cast("string")
                    for c in TYPED_COLUMN_CHARSETS
                ]
            ),
        },
    )

    out = ins.unionByName(upd).unionByName(tmap)
    return out.select(*[f.name for f in EVENT_SCHEMA.fields])
