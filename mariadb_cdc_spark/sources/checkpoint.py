"""Binlog-position checkpointing: resume, lineage, bad-position recovery.

Reference contract:
  - after every delivered event, persist `filename/position` (the event's
    NEXT-position) so restart resumes after it (MariadbCdc.java:116-125,
    BinaryLogEventProcessor.java:58-64,109-113);
  - FORMAT_DESCRIPTION / TABLE_MAP never advance the position
    (BinaryLogEventProcessor.java:128-132);
  - missing/empty checkpoint => start from the CURRENT master position, i.e.
    skip history (MariadbCdc.java:96-114 + BinLogSession.fetchBinlogFilePosition);
  - a saved position the server no longer has (err 1236) either fails the
    start or falls back to latest, per usingLastPositionWhenBadPosition
    (DefaultBinaryLogWrapper.java:71-87, MariadbCdcConfig.java:89-95,
    MariadbCdc_BadSavedPosition_Test.java:46-123).

Spark mapping: the position store is the lake table's committed lineage
(per server_id max (binlog_file, binlog_pos)); `events_after` filters the
source scan — a plain envelope predicate, so it pushes down to the parquet
scan (PushedFilters) and replayed history is never decoded.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.filters import position_advancing
from ..schema import NO_POSITION_SAVE_TYPES


class BadPositionError(Exception):
    """Saved position is beyond the available log (reference server err 1236)."""


@dataclass(frozen=True)
class BinlogPosition:
    file: str
    pos: int

    def as_dict(self) -> dict:
        return {"file": self.file, "pos": self.pos}

    @classmethod
    def from_dict(cls, d: dict | None) -> "BinlogPosition | None":
        return cls(d["file"], d["pos"]) if d else None


def batch_lineage(
    events: DataFrame, *, probe_sparse_bitmaps: bool = False
) -> dict | tuple[dict, bool]:
    """Per-server max position among position-advancing events.

    This is the per-partition lineage the north rule requires: computed as a
    distributed agg (partial max per scan partition, tiny final combine).

    `probe_sparse_bitmaps=True` piggybacks the bitmap-sparsity probe (does
    ANY event carry a false bit in columns_used / update_columns_used?) onto
    the SAME aggregation — the pipeline's plan gates need the answer every
    batch, and folding it here costs zero extra jobs. Returns
    (lineage, has_sparse) in that mode.
    """
    sparse = F.coalesce(
        F.exists("columns_used", lambda x: ~x)
        | F.exists("update_columns_used", lambda x: ~x),
        F.lit(False),
    )
    aggs = [
        F.max(F.struct("binlog_file", "binlog_pos")).alias("p"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if probe_sparse_bitmaps:
        aggs.append(F.max(sparse).alias("any_sparse"))
    rows = (
        position_advancing(events).groupBy("server_id").agg(*aggs).collect()
    )
    lineage = {
        str(r["server_id"]): {
            "file": r["p"]["binlog_file"],
            "pos": int(r["p"]["binlog_pos"]),
            "n_events": int(r["n_events"]),
        }
        for r in rows
    }
    if probe_sparse_bitmaps:
        return lineage, any(bool(r["any_sparse"]) for r in rows)
    return lineage


def liveness_metrics(events: DataFrame) -> dict:
    """Per-server liveness: the ReconnectThread/heartbeat observability
    re-expressed batch-wise (reference BinLogReader.java:333-380 tracks
    lastEventTimestamp and reconnects after keepConnectionTimeout of
    silence; BinLogReaderHeartbeatTest.java:56-63 pins heartbeat cadence).

    Returns {server_id: {last_ts, n_events, n_heartbeats,
    max_silence_seconds, heartbeat_interval_seconds}} — one distributed agg
    (the silence gap is a per-server window lag, parallel across servers).
    """
    from ..schema import EVT_HEARTBEAT

    w = Window.partitionBy("server_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    hb_w = Window.partitionBy("server_id", "_is_hb").orderBy("ts")
    hb_gap = F.when(
        F.col("_is_hb"),
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double")).over(hb_w),
    )
    rows = (
        events.where(F.col("ts").isNotNull())
        .withColumn("_is_hb", F.col("event_type") == EVT_HEARTBEAT)
        .withColumn("_gap", gap)
        .withColumn("_hb_gap", hb_gap)
        .groupBy("server_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("_is_hb").cast("long")).alias("n_heartbeats"),
            F.max("_gap").alias("max_silence"),
            F.avg("_hb_gap").alias("hb_interval"),
        )
        .collect()
    )
    return {
        str(r["server_id"]): {
            "last_ts": r["last_ts"].isoformat() if r["last_ts"] else None,
            "last_epoch": (
                int(r["last_ts"].timestamp()) if r["last_ts"] else None
            ),
            "n_events": int(r["n_events"]),
            "n_heartbeats": int(r["n_heartbeats"] or 0),
            "max_silence_seconds": (
                float(r["max_silence"]) if r["max_silence"] is not None else None
            ),
            "heartbeat_interval_seconds": (
                float(r["hb_interval"]) if r["hb_interval"] is not None else None
            ),
        }
        for r in rows
    }


def stalled_servers(
    liveness: dict, *, now_epoch: float, keep_timeout_seconds: float
) -> list[str]:
    """The ReconnectThread condition (BinLogReader.java:344-349):
    servers silent longer than keepConnectionTimeout. The engine's
    equivalent of tryReconnect is restart-from-checkpoint of the source;
    this surfaces WHICH servers need it."""
    return sorted(
        sid
        for sid, m in liveness.items()
        if m["last_epoch"] is not None
        and now_epoch - m["last_epoch"] > keep_timeout_seconds
    )


def events_after(events: DataFrame, lineage: dict) -> DataFrame:
    """Keep only events strictly after each server's saved position — plus
    ALL metadata events (FORMAT_DESCRIPTION / TABLE_MAP) regardless of
    position.

    Metadata events never advance the checkpoint (reference
    BinaryLogEventProcessor.java:128-132) precisely because a resume must
    not lose them: a rows event is only decodable through the most recent
    TABLE_MAP at-or-before its position (J1), and with a scan-based source
    there is no server to "resend" maps after reconnect the way a live
    binlog dump does. Keeping them is O(metadata) rows — tiny, idempotent
    control-plane data the registry coalesces anyway.

    The result is TWO independently-pruned scans unioned, not one OR
    predicate. An OR defeats row-group skipping on both sides: a row group
    of fully-consumed rows events can only be skipped if the reader also
    disproves the `event_type IN (...)` leaf, which string min/max stats
    straddling the IN values never do. Split, each scan pushes a clean
    predicate — the metadata scan's IN is dictionary-prunable (row groups
    whose event_type dictionary lacks FD/TABLE_MAP are skipped wholesale),
    and the data scan's (file, pos) tuple-compare, expanded into flat
    column-vs-literal atoms `file > f OR (file = f AND pos > p)`, skips
    consumed binlog files by their min/max stats. At 10^10-event scale,
    resuming near the tip prunes almost the entire history without reading
    it.
    """
    if not lineage:
        return events
    is_meta = F.col("event_type").isin(*NO_POSITION_SAVE_TYPES)
    pred = F.lit(False)
    saved_servers = [int(s) for s in lineage]
    for sid, p in lineage.items():
        f, pos = F.lit(p["file"]), F.lit(int(p["pos"])).cast("long")
        after = (F.col("binlog_file") > f) | (
            (F.col("binlog_file") == f) & (F.col("binlog_pos") > pos)
        )
        pred = pred | ((F.col("server_id") == int(sid)) & after)
    pred = pred | ~F.col("server_id").isin(saved_servers)
    return events.where(is_meta).unionByName(events.where(~is_meta & pred))


def replication_lag(events: DataFrame, lineage: dict) -> DataFrame:
    """Per-server replication lag: how far the applied checkpoint trails the
    stream head — the alarm metric every CDC deployment watches. The
    reference's equivalent observable is its saved BinlogPosition vs `show
    master status` (MariadbCdc.java:96-114 reads the trace file;
    BinLogSession.java:76-91 fetches the head); this engine computes both
    sides in one distributed pass.

    Returns one row per server_id over position-advancing events:
      head_file/head_pos/head_ts_us  — stream tip seen this scan
      applied_file/applied_pos       — the checkpoint (null if never saved)
      events_behind                  — position-advancing events past it
      oldest_pending_ts_us           — ts of the oldest unapplied event
      lag_us                         — head_ts - oldest_pending_ts (0 when
                                       caught up)

    One map-side-combinable groupBy(server_id) agg — no window, no join;
    the per-server pending predicate is the same flat tuple-compare as
    events_after. Timestamps are microsecond epochs (unix_micros) so the
    metric is exact for sub-second lags.
    """
    from ..operators.filters import position_advancing

    adv = position_advancing(events)

    pend = F.lit(True)  # no checkpoint => everything is pending
    applied_file = F.lit(None).cast("string")
    applied_pos = F.lit(None).cast("long")
    if lineage:
        saved = [int(s) for s in lineage]
        pend = ~F.col("server_id").isin(saved)
        for sid, p in lineage.items():
            f, pos = F.lit(p["file"]), F.lit(int(p["pos"])).cast("long")
            after = (F.col("binlog_file") > f) | (
                (F.col("binlog_file") == f) & (F.col("binlog_pos") > pos)
            )
            here = F.col("server_id") == int(sid)
            pend = pend | (here & after)
            applied_file = F.when(here, f).otherwise(applied_file)
            applied_pos = F.when(here, pos).otherwise(applied_pos)

    # cast: envelope ts is TIMESTAMP; NTZ inputs (parquet naive ts) align
    # with the DuckDB oracle's epoch_us under the engine's UTC session tz
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    agg = (
        adv.withColumn("_pend", pend)
        .groupBy("server_id")
        .agg(
            F.max(F.struct("binlog_file", "binlog_pos")).alias("_head"),
            F.max(ts_us).alias("head_ts_us"),
            F.sum(F.col("_pend").cast("long")).alias("events_behind"),
            F.min(F.when(F.col("_pend"), ts_us)).alias("oldest_pending_ts_us"),
        )
    )
    return agg.select(
        "server_id",
        F.col("_head.binlog_file").alias("head_file"),
        F.col("_head.binlog_pos").alias("head_pos"),
        "head_ts_us",
        applied_file.alias("applied_file"),
        applied_pos.alias("applied_pos"),
        "events_behind",
        "oldest_pending_ts_us",
        F.when(
            F.col("oldest_pending_ts_us").isNotNull(),
            F.col("head_ts_us") - F.col("oldest_pending_ts_us"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("lag_us"),
    )


def _gtid_parts() -> tuple[F.Column, F.Column, F.Column]:
    """MariaDB GTID 'domain-server-seq' split into typed parts."""
    p = F.split(F.col("gtid"), "-")
    return (
        p[0].cast("int").alias("gtid_domain"),
        p[1].cast("long").alias("gtid_server"),
        p[2].cast("long").alias("gtid_seq"),
    )


def gtid_lineage(events: DataFrame) -> dict:
    """Per-(domain, server) max GTID sequence among position-advancing
    events — the engine's `gtid_current_pos` equivalent. MariaDB GTID is
    `domain-server-seq`; the reference recognizes GTID_EVENT/GTID_LIST_EVENT
    (BinlogEventType.java:19-20) but resumes by file/pos only — GTID resume
    is the modern replication upgrade (CHANGE MASTER ... master_use_gtid).

    Returns {"domain-server": max_seq}. One distributed agg (partial max per
    scan partition); GTID-less events (heartbeats, control) don't
    participate, exactly as they don't in a server's gtid_current_pos.
    """
    rows = (
        position_advancing(events)
        .where(F.col("gtid").isNotNull())
        .select(*_gtid_parts())
        .groupBy("gtid_domain", "gtid_server")
        .agg(F.max("gtid_seq").alias("seq"))
        .collect()
    )
    return {
        f"{r['gtid_domain']}-{r['gtid_server']}": int(r["seq"]) for r in rows
    }


def resume_after_gtid(events: DataFrame, gtid_pos: dict) -> DataFrame:
    """Resume strictly after a saved GTID position ({"domain-server": seq}).

    Two-step, like a real server honoring master_use_gtid: (1) TRANSLATE the
    GTID position to per-server (binlog_file, binlog_pos) — one bounded
    control-plane aggregate over gtid-carrying events at-or-below the saved
    seqs (start-time-only cost, the analog of the server scanning its index
    to locate the slave's GTID); (2) delegate to `events_after`, whose flat
    (file, pos) atoms push down to the parquet scan — so steady-state
    pruning is identical to file/pos resume, and GTID is only the durable,
    server-independent NAME of the position.

    Domains/servers absent from `gtid_pos` replay from the beginning (same
    as an empty lineage in events_after).
    """
    if not gtid_pos:
        return events
    covered = F.lit(False)
    for ds, seq in gtid_pos.items():
        domain, server = (int(x) for x in ds.split("-"))
        covered = covered | (
            (F.col("gtid_domain") == domain)
            & (F.col("gtid_server") == server)
            & (F.col("gtid_seq") <= int(seq))
        )
    consumed = (
        events.where(F.col("gtid").isNotNull())
        .select("server_id", "binlog_file", "binlog_pos", *_gtid_parts())
        .where(covered)
        .groupBy("server_id")
        .agg(F.max(F.struct("binlog_file", "binlog_pos")).alias("p"))
        .collect()
    )
    lineage = {
        str(r["server_id"]): {
            "file": r["p"]["binlog_file"],
            "pos": int(r["p"]["binlog_pos"]),
        }
        for r in consumed
    }
    return events_after(events, lineage)


def validate_position(
    events: DataFrame,
    saved: BinlogPosition | None,
    *,
    use_latest_on_bad_position: bool = False,
) -> BinlogPosition | None:
    """Reference bad-position semantics at stream start.

    If `saved` is beyond the available event range: raise (default) or fall
    back to the latest available position (usingLastPositionWhenBadPosition).
    Returns the effective start position (None = from the beginning).
    """
    if saved is None:
        return None
    bounds = events.agg(
        F.max(F.struct("binlog_file", "binlog_pos")).alias("mx")
    ).collect()[0]["mx"]
    if bounds is None:
        latest = None
    else:
        latest = BinlogPosition(bounds["binlog_file"], int(bounds["binlog_pos"]))
    if latest is None or (saved.file, saved.pos) > (latest.file, latest.pos):
        if use_latest_on_bad_position:
            return latest
        raise BadPositionError(
            f"saved position {saved} beyond available log end {latest}"
        )
    return saved


def _xid_commit_pred(events: DataFrame) -> F.Column:
    """Predicate: event is covered by a committed transaction (<= the last
    XID position of its server), or is a non-position-advancing control
    event. One tiny control-plane collect (O(servers) rows)."""
    from ..schema import EVT_XID, NO_POSITION_SAVE_TYPES

    commits = (
        events.where(F.col("event_type") == EVT_XID)
        .groupBy("server_id")
        .agg(F.max(F.struct("binlog_file", "binlog_pos")).alias("p"))
        .collect()
    )
    pred = F.col("event_type").isin(*NO_POSITION_SAVE_TYPES)
    for r in commits:
        upto = F.struct(
            F.lit(r["p"]["binlog_file"]).alias("binlog_file"),
            F.lit(int(r["p"]["binlog_pos"])).cast("long").alias("binlog_pos"),
        )
        pred = pred | (
            (F.col("server_id") == int(r["server_id"]))
            & (F.struct(F.col("binlog_file"), F.col("binlog_pos")) <= upto)
        )
    return pred


def gate_on_xid(events: DataFrame) -> DataFrame:
    """Keep only events covered by a committed transaction (XID seen).

    The reference surfaces XID as the transaction-commit marker
    (MariadbCdcListener.onXid, shyikobinlog/BinaryLogEventProcessor.java:103-105);
    gating the apply on it means a batch cut mid-transaction never applies a
    partial transaction. Events past each server's last XID are HELD: they
    are excluded from the batch AND from its lineage. Callers whose source
    re-delivers (resume_from_lineage over a rewindable batch source) get
    them back on the next read; the STREAMING path cannot rewind its file
    source, so streaming.stream carries the held tail in an explicit buffer
    (split_on_xid) — see start_cdc_stream.

    TABLE_MAP / FORMAT_DESCRIPTION pass through untouched: they never
    advance the position (filters.position_advancing) and the held rows
    need their mapping context on replay.
    """
    return events.where(_xid_commit_pred(events))


def split_on_xid(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(committed, held): the XID gate plus its complement — the
    position-advancing tail past each server's last commit, which the caller
    must buffer and merge into the next batch (it will NOT be re-delivered
    by a forward-only source)."""
    pred = _xid_commit_pred(events)
    return events.where(pred), events.where(~pred)
