"""Incremental view maintenance (operators.ivm) and SCD2 history
materialization (operators.history): the downstream-consumer patterns the
reference leaves to listener code (MariadbCdcListener.java:9-26), here
engine-maintained and verified against from-scratch recomputation."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.operators.history import scd2_history
from mariadb_cdc_spark.operators.ivm import AggView, maintain, read_view
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.sources.lake import LakeTable

REPO_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType())
        for c in ["repo", "path", "commit", "lang", "content"]
    ]
)


def split_by_wave(events, repo_count, max_wave_b0=1, n_buckets=32):
    """Split generated events into two batches at a wave boundary using the
    gtid-embedded slot (gen: slot = (wave*n_buckets + bucket)*cap + rn).
    Control events (gtid-less) go to both batches — the registry dedupes."""
    cap = repo_count + 2
    slot = F.split("gtid", "-").getItem(2).cast("long")
    wave = F.floor(slot / (n_buckets * cap))
    b0 = events.where(F.col("gtid").isNull() | (wave <= max_wave_b0))
    b1 = events.where(F.col("gtid").isNull() | (wave > max_wave_b0))
    return b0, b1


def _recompute(table, view):
    return {
        r["repo"]: (r["n"], r["chars"])
        for r in table.read()
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("content")).alias("chars"),
        )
        .collect()
    }


def _view_dict(spark, view):
    return {
        r["repo"]: (r["n_rows"], r["total_chars"])
        for r in read_view(spark, view).collect()
    }


def test_incremental_agg_matches_recompute(spark, sf_dir, tmp_table_path, tmp_path):
    repo = repo_table(spark, sf_dir).cache()
    n = repo.count()
    events = generate_events(repo, include_audit=False)
    b0, b1 = split_by_wave(events, n)

    view = AggView(
        str(tmp_path / "agg"), ["repo"], {"total_chars": "length(content)"}
    )
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    cfg = CdcConfig()

    apply_batch(b0, table, cfg, stream_id="t", batch_id=0, agg_views=[view])
    assert _view_dict(spark, view) == _recompute(table, view)

    apply_batch(b1, table, cfg, stream_id="t", batch_id=1, agg_views=[view])
    final = _view_dict(spark, view)
    assert final == _recompute(table, view)
    # waves 2-4 include deletes: some group shrank, proving retraction works
    assert len(final) > 0

    # replayed batch is exactly-once-skipped -> view untouched
    before = read_view(spark, view).collect()
    apply_batch(b1, table, cfg, stream_id="t", batch_id=1, agg_views=[view])
    assert sorted(map(tuple, read_view(spark, view).collect())) == sorted(
        map(tuple, before)
    )


def test_maintain_is_idempotent_per_table_version(spark, tmp_table_path, tmp_path):
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=2
    )
    folded = spark.createDataFrame(
        [("r1", "a", "UPSERT", {"repo": "r1", "path": "a", "content": "xyz"})],
        "repo string, path string, final_op string, image map<string,string>",
    ).select(
        "repo", "path", "final_op", "image",
        F.lit("f1").alias("last_file"), F.lit(1).cast("long").alias("last_pos"),
        F.lit(0).alias("last_row_idx"), F.lit(1).cast("long").alias("n_changes"),
    )
    pre = table.metadata()["version"]
    table.merge(folded, stream_id="t")
    view = AggView(str(tmp_path / "agg2"), ["repo"], {"total_chars": "length(content)"})
    keys = folded.select("repo", "path")
    r1 = maintain(table, view, keys, pre)
    assert not r1["skipped"]
    assert _view_dict(spark, view) == {"r1": (1, 3)}
    # same post version again: no-op (crash-replay safety)
    r2 = maintain(table, view, keys, pre)
    assert r2["skipped"]
    assert _view_dict(spark, view) == {"r1": (1, 3)}


def _changes_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, op string,"
        " before map<string,string>, after map<string,string>,"
        " binlog_file string, binlog_pos long, row_idx int",
    )


def test_scd2_history_intervals(spark):
    """INSERT -> partial UPDATE -> DELETE -> re-INSERT: four changes, three
    live intervals; the partial update's image merges per column; the DELETE
    closes without opening; only the re-insert row is current."""
    rows = [
        ("r", "a", "INSERT", None, {"repo": "r", "path": "a", "content": "v1", "lang": "py"}, "f1", 10, 0),
        ("r", "a", "UPDATE", {"repo": "r", "path": "a"}, {"content": "v2"}, "f1", 20, 0),
        ("r", "a", "DELETE", {"repo": "r", "path": "a"}, None, "f2", 5, 0),
        ("r", "a", "INSERT", None, {"repo": "r", "path": "a", "content": "v3", "lang": "py"}, "f2", 9, 0),
        # second key: single insert, stays open
        ("r", "b", "INSERT", None, {"repo": "r", "path": "b", "content": "w1", "lang": "go"}, "f1", 15, 0),
    ]
    hist = scd2_history(_changes_df(spark, rows), ["repo", "path"])
    got = {
        (r["repo"], r["path"], r["valid_from_file"], r["valid_from_pos"]): r
        for r in hist.collect()
    }
    assert len(got) == 4  # 3 live intervals for 'a' + 1 for 'b'

    v1 = got[("r", "a", "f1", 10)]
    assert v1["image"]["content"] == "v1"
    assert (v1["valid_to_file"], v1["valid_to_pos"]) == ("f1", 20)
    assert not v1["is_current"]

    v2 = got[("r", "a", "f1", 20)]
    assert v2["image"]["content"] == "v2"
    assert v2["image"]["lang"] == "py"  # partial patch merged onto v1
    assert (v2["valid_to_file"], v2["valid_to_pos"]) == ("f2", 5)
    assert not v2["is_current"]
    # the DELETE at (f2,5) emits no row; it only closed v2

    v3 = got[("r", "a", "f2", 9)]
    assert v3["image"]["content"] == "v3"
    assert v3["valid_to_file"] is None and v3["is_current"]

    vb = got[("r", "b", "f1", 15)]
    assert vb["is_current"] and vb["valid_to_pos"] is None


def test_scd2_current_rows_match_fold(spark, sf_dir):
    """Property: the is_current slice of the history == the LWW fold's final
    UPSERT states, on the full generated change stream."""
    from mariadb_cdc_spark.operators.decode import decode_rows_events
    from mariadb_cdc_spark.operators.fold import extract_keys, fold_changes
    from mariadb_cdc_spark.operators.registry import (
        resolve_table_metadata, table_map_registry,
    )

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False)
    changes = resolve_table_metadata(
        decode_rows_events(events), table_map_registry(events)
    )
    keyed = extract_keys(changes, MERGE_KEYS).cache()

    hist_current = (
        scd2_history(keyed, MERGE_KEYS)
        .where("is_current")
        .select("repo", "path", F.col("image")["content"].alias("content"))
    )
    folded_final = (
        fold_changes(keyed, MERGE_KEYS, two_phase=False)
        .where(F.col("final_op") == "UPSERT")
        .select("repo", "path", F.col("image")["content"].alias("content"))
    )
    assert hist_current.exceptAll(folded_final).isEmpty()
    assert folded_final.exceptAll(hist_current).isEmpty()
    keyed.unpersist()


def _raw_events(spark, rows):
    from mariadb_cdc_spark.schema import EVENT_SCHEMA

    full = []
    for r in rows:
        d = {f.name: None for f in EVENT_SCHEMA.fields}
        d.update(r)
        full.append(tuple(d[f.name] for f in EVENT_SCHEMA.fields))
    return spark.createDataFrame(full, EVENT_SCHEMA)


def _ev(pos, etype, **kw):
    return {
        "server_id": 1,
        "binlog_file": "bin.000001",
        "binlog_pos": pos,
        "event_type": etype,
        **kw,
    }


def test_agg_view_consistent_across_truncate_epoch(spark, tmp_table_path, tmp_path):
    """A TRUNCATE mid-batch resets the maintained view (ivm.rebuild at the
    data-reset boundary) instead of raising; the view stays equal to a full
    recompute before, across, and after the truncate epoch."""
    tmap = _ev(10, "TABLE_MAP", table_id=7, database="codehub",
               table="repo_files", column_types=[15, 15, 15],
               column_names=["repo", "path", "content"])
    table = LakeTable.create(
        spark, tmp_table_path,
        T.StructType([T.StructField(c, T.StringType())
                      for c in ["repo", "path", "content"]]),
        ["repo", "path"], n_buckets=2,
    )
    view = AggView(
        str(tmp_path / "aggt"), ["repo"], {"total_chars": "length(content)"}
    )
    cfg = CdcConfig()

    # batch 0: plain inserts, view established incrementally
    b0 = [
        tmap,
        _ev(20, "WRITE_ROWS", table_id=7,
            rows_after=[{"repo": "r1", "path": "a", "content": "one"},
                        {"repo": "r2", "path": "b", "content": "twotwo"}]),
    ]
    apply_batch(_raw_events(spark, b0), table, cfg, stream_id="t",
                batch_id=0, agg_views=[view])
    assert _view_dict(spark, view) == {"r1": (1, 3), "r2": (1, 6)}

    # batch 1: more rows, TRUNCATE, then post-truncate rows — the view must
    # reflect only the post-truncate state
    b1 = [
        tmap,
        _ev(30, "WRITE_ROWS", table_id=7,
            rows_after=[{"repo": "r1", "path": "c", "content": "xxxx"}]),
        _ev(40, "QUERY", sql="truncate table codehub.repo_files"),
        dict(tmap, binlog_pos=50),
        _ev(60, "WRITE_ROWS", table_id=7,
            rows_after=[{"repo": "r3", "path": "d", "content": "12345"}]),
    ]
    res = apply_batch(_raw_events(spark, b1), table, cfg, stream_id="t",
                      batch_id=1, agg_views=[view])
    assert res["epochs"] == 2
    assert {r["path"] for r in table.read().collect()} == {"d"}
    assert _view_dict(spark, view) == {"r3": (1, 5)}
    assert _view_dict(spark, view) == _recompute(table, view)

    # replay of batch 1 is exactly-once-skipped -> view untouched
    apply_batch(_raw_events(spark, b1), table, cfg, stream_id="t",
                batch_id=1, agg_views=[view])
    assert _view_dict(spark, view) == {"r3": (1, 5)}

    # batch 2 after the truncate maintains incrementally from the reset basis
    b2 = [
        dict(tmap, binlog_pos=70),
        _ev(80, "WRITE_ROWS", table_id=7,
            rows_after=[{"repo": "r3", "path": "e", "content": "67"}]),
        _ev(90, "DELETE_ROWS", table_id=7,
            rows_before=[{"repo": "r3", "path": "d", "content": "12345"}]),
    ]
    apply_batch(_raw_events(spark, b2), table, cfg, stream_id="t",
                batch_id=2, agg_views=[view])
    assert _view_dict(spark, view) == {"r3": (1, 2)}
    assert _view_dict(spark, view) == _recompute(table, view)


def test_truncate_as_last_statement_resets_view(spark, tmp_table_path, tmp_path):
    """TRUNCATE with nothing after it: the final (empty) epoch must leave the
    rebuilt-empty view intact, not resurrect pre-truncate groups."""
    tmap = _ev(10, "TABLE_MAP", table_id=7, database="codehub",
               table="repo_files", column_types=[15, 15, 15],
               column_names=["repo", "path", "content"])
    table = LakeTable.create(
        spark, tmp_table_path,
        T.StructType([T.StructField(c, T.StringType())
                      for c in ["repo", "path", "content"]]),
        ["repo", "path"], n_buckets=2,
    )
    view = AggView(str(tmp_path / "aggt2"), ["repo"], {})
    rows = [
        tmap,
        _ev(20, "WRITE_ROWS", table_id=7,
            rows_after=[{"repo": "r1", "path": "a", "content": "one"}]),
        _ev(30, "QUERY", sql="truncate table codehub.repo_files"),
    ]
    apply_batch(_raw_events(spark, rows), table, CdcConfig(), stream_id="t",
                batch_id=0, agg_views=[view])
    assert table.read().isEmpty()
    assert _view_dict2(spark, view) == {}


def _view_dict2(spark, view):
    return {r["repo"]: r["n_rows"] for r in read_view(spark, view).collect()}
