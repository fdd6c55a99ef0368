"""DBLog-style incremental chunked snapshot (operators.bootstrap.
incremental_bootstrap): consistency under bounded binlog retention, the
watermark-window dedup (anchored drop / patch-only keep), exactly-once
replay of chunk merges and stream slices, and the watermark planner."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.operators.bootstrap import (
    chunk_of,
    incremental_bootstrap,
    position_ticks,
)
from mariadb_cdc_spark.operators.fold import extract_keys, fold_changes
from mariadb_cdc_spark.pipeline import CdcConfig, _pos_lit, decoded_changes
from mariadb_cdc_spark.sources.lake import LakeTable

REPO_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
VALUE_COLS = ["commit", "lang", "content"]


def _split_by_wave(events, repo_count, max_wave_b0, n_buckets=32):
    cap = repo_count + 2
    slot = F.split("gtid", "-").getItem(2).cast("long")
    wave = F.floor(slot / (n_buckets * cap))
    lost = events.where(F.col("gtid").isNull() | (wave <= max_wave_b0))
    kept = events.where(F.col("gtid").isNull() | (wave > max_wave_b0))
    return lost, kept


def _reader(full_changes, read_at="parity"):
    """Simulated chunked SELECT: per-key state folded from the FULL
    history to a read instant inside [lo, hi]."""

    def read_chunk(i, n, lo, hi):
        if read_at == "parity":
            parity = F.pmod(
                F.xxhash64(
                    F.lit("readpos"), *[F.col(k) for k in MERGE_KEYS]
                ),
                F.lit(2),
            )
            rpos = F.when(parity == 0, _pos_lit(lo)).otherwise(_pos_lit(hi))
        else:
            rpos = _pos_lit(lo if read_at == "lo" else hi)
        sub = full_changes.where(
            (chunk_of(MERGE_KEYS, n) == i)
            & (F.struct("binlog_file", "binlog_pos") <= rpos)
        )
        st = fold_changes(sub, MERGE_KEYS).where(
            F.col("final_op") == "UPSERT"
        )
        return st.select(
            *MERGE_KEYS, *[F.col("image")[c].alias(c) for c in VALUE_COLS]
        )

    return read_chunk


def _hashes(df):
    return {
        (r["repo"], r["path"]): hashlib.sha256(
            (r["content"] or "").encode()
        ).hexdigest()
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def scenario(spark, sf_dir):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    _, retained = _split_by_wave(events, repo.count(), max_wave_b0=1)
    cfg = CdcConfig()
    full_changes = extract_keys(
        decoded_changes(events, cfg), MERGE_KEYS
    ).cache()
    # reference final state: full-history replay into a throwaway table
    from mariadb_cdc_spark.pipeline import apply_batch
    import tempfile

    ref = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="inc_ref_") + "/t",
        REPO_SCHEMA,
        MERGE_KEYS,
        n_buckets=8,
    )
    apply_batch(events, ref, cfg, stream_id="ref", batch_id=0)
    want = _hashes(ref.read().select("repo", "path", "content"))
    yield {
        "events": events,
        "retained": retained,
        "full_changes": full_changes,
        "cfg": cfg,
        "want": want,
        "repo_count": repo.count(),
    }
    events.unpersist()
    full_changes.unpersist()


def _fresh(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )


def test_incremental_snapshot_matches_full_replay(spark, tmp_path, scenario):
    """Bounded retention (waves 0-1 gone) + chunked reads == full replay,
    per-key sha256(content)-exact; chunks actually contribute (40% of keys
    have NO retained events) and the window dedup actually fires."""
    table = _fresh(spark, tmp_path)
    res = incremental_bootstrap(
        scenario["retained"],
        _reader(scenario["full_changes"]),
        table,
        scenario["cfg"],
        n_chunks=3,
        stream_id="inc",
    )
    got = _hashes(table.read().select("repo", "path", "content"))
    assert got == scenario["want"]
    # plain replay of the retained stream alone CANNOT reach this state:
    # keys untouched after wave 1 exist only via the chunk reads
    retained_keys = {
        (r["repo"], r["path"])
        for r in extract_keys(
            decoded_changes(scenario["retained"], scenario["cfg"]),
            MERGE_KEYS,
        )
        .select(*MERGE_KEYS)
        .distinct()
        .collect()
    }
    snapshot_only = set(got) - retained_keys
    assert len(snapshot_only) > 0
    # the dedup path fired somewhere: at least one chunk dropped an
    # anchored in-window key (windows cover ~half the retained stream)
    assert sum(c["n_dropped_anchored"] for c in res["chunks"]) > 0
    assert res["batches"] == 3 * 2 + 1
    assert res["lineage"]


def test_read_endpoint_invariance(spark, tmp_path, scenario):
    """The algorithm is correct for ANY per-key read instant inside the
    window: reading every key at lo and every key at hi give the same
    final state."""
    outs = []
    for read_at in ("lo", "hi"):
        table = LakeTable.create(
            spark,
            str(tmp_path / f"t_{read_at}"),
            REPO_SCHEMA,
            MERGE_KEYS,
            n_buckets=8,
        )
        incremental_bootstrap(
            scenario["retained"],
            _reader(scenario["full_changes"], read_at=read_at),
            table,
            scenario["cfg"],
            n_chunks=2,
            stream_id="inc",
        )
        outs.append(_hashes(table.read().select("repo", "path", "content")))
    assert outs[0] == outs[1] == scenario["want"]


def test_replay_is_exactly_once(spark, tmp_path, scenario):
    """Re-running the whole bootstrap against the populated table is a
    position-gated / batch-marker no-op... except the empty-table guard
    fires first; re-running individual committed batch ids is absorbed."""
    table = _fresh(spark, tmp_path)
    incremental_bootstrap(
        scenario["retained"],
        _reader(scenario["full_changes"]),
        table,
        scenario["cfg"],
        n_chunks=2,
        stream_id="inc",
    )
    v = table.metadata()["version"]
    # a replayed chunk merge (batch_id already committed) is a no-op
    some_rows = table.read().limit(1)
    from mariadb_cdc_spark.pipeline import apply_batch

    r = apply_batch(
        scenario["retained"],
        table,
        scenario["cfg"],
        stream_id="inc",
        batch_id=0,
    )
    assert r.get("skipped") is True
    assert table.metadata()["version"] == v
    assert some_rows.count() == 1
    # bootstrapping into a populated table is refused loudly
    with pytest.raises(ValueError):
        incremental_bootstrap(
            scenario["retained"],
            _reader(scenario["full_changes"]),
            table,
            scenario["cfg"],
            n_chunks=2,
        )


def test_patch_only_window_keys_are_kept(spark):
    """The DBLog refinement: a key whose ONLY in-window event is a partial
    update keeps its chunk row (dropping it would strand the patch with no
    base); a key with an anchored in-window event is dropped. Hand-built
    changes drive the dedup split through a real bootstrap."""
    import tempfile

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in ["k", "a", "b"]]
    )
    cfg = CdcConfig(keys=["k"], included_tables=["db.t"])

    def ev(pos, etype, before, after, used=None, upd_used=None):
        return {
            "server_id": 1,
            "binlog_file": "bin.000001",
            "binlog_pos": pos,
            "event_type": etype,
            "ts": None,
            "gtid": f"0-1-{pos}",
            "table_id": 9,
            "database": None,
            "table": None,
            "column_types": None,
            "column_names": None,
            "columns_used": used or [True, True, True],
            "update_columns_used": upd_used,
            "rows_before": [before] if before is not None else None,
            "rows_after": [after] if after is not None else None,
            "sql": None,
            "xid": None,
        }

    tmap = {
        "server_id": 1,
        "binlog_file": "bin.000001",
        "binlog_pos": 1,
        "event_type": "TABLE_MAP",
        "ts": None,
        "gtid": None,
        "table_id": 9,
        "database": "db",
        "table": "t",
        "column_types": [15, 15, 15],
        "column_names": ["k", "a", "b"],
        "columns_used": None,
        "update_columns_used": None,
        "rows_before": None,
        "rows_after": None,
        "sql": None,
        "xid": None,
    }
    from mariadb_cdc_spark.schema import EVENT_SCHEMA

    # retained stream: positions 100..700; the injected watermark window
    # is (250, 450]. Key "p" gets a PATCH inside the window, key "x" a
    # full UPDATE (anchored) inside it, key "q" nothing retained at all.
    rows = [
        tmap,
        ev(100, "WRITE_ROWS", None, {"k": "warm1", "a": "1", "b": "1"}),
        ev(200, "WRITE_ROWS", None, {"k": "warm2", "a": "1", "b": "1"}),
        # patch-only in-window key: partial update (only column b)
        ev(
            300,
            "UPDATE_ROWS",
            {"k": "p"},
            {"b": "patched"},
            used=[True, False, False],
            upd_used=[False, False, True],
        ),
        ev(
            400,
            "UPDATE_ROWS",
            {"k": "x", "a": "0", "b": "0"},
            {"k": "x", "a": "streamed", "b": "streamed"},
        ),
        ev(500, "WRITE_ROWS", None, {"k": "warm3", "a": "1", "b": "1"}),
        ev(600, "WRITE_ROWS", None, {"k": "warm4", "a": "1", "b": "1"}),
        ev(700, "WRITE_ROWS", None, {"k": "warm5", "a": "1", "b": "1"}),
    ]
    retained = spark.createDataFrame(rows, EVENT_SCHEMA)

    # live source state AS-OF the window (what the chunk SELECT sees at
    # some instant in [250, 450]): p carries the patch over its
    # pre-retention base; q is pre-retention only; x reflects the
    # in-window update; warm1/2 inserted before the window; warm3-5 do
    # not exist yet (they arrive via the stream alone)
    src = {
        "p": ("base_a", "patched"),
        "q": ("q_a", "q_b"),
        "x": ("streamed", "streamed"),
        "warm1": ("1", "1"),
        "warm2": ("1", "1"),
    }

    def read_chunk(i, n, lo, hi):
        assert (lo, hi) == (("bin.000001", 250), ("bin.000001", 450))
        df = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in sorted(src.items())],
            ["k", "a", "b"],
        )
        return df.where(chunk_of(["k"], n) == i)

    table = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="inc_unit_") + "/t",
        schema,
        ["k"],
        n_buckets=4,
    )
    res = incremental_bootstrap(
        retained,
        read_chunk,
        table,
        cfg,
        n_chunks=1,
        ticks=[("bin.000001", 250), ("bin.000001", 450)],
    )
    # exactly one anchored in-window key was dropped from the chunk: x
    # (p's patch is unanchored; every other event lies outside the window)
    assert res["chunks"][0]["n_dropped_anchored"] == 1
    got = {
        r["k"]: (r["a"], r["b"])
        for r in table.read().select("k", "a", "b").collect()
    }
    want = dict(
        src,
        warm3=("1", "1"),
        warm4=("1", "1"),
        warm5=("1", "1"),
    )
    # every key lands with live-source values: q from its chunk alone,
    # p via chunk base + idempotent patch re-apply, x via the stream
    # (its chunk row was dropped), warm3-5 via the stream alone
    assert got == want


def test_position_ticks_spacing_and_guards(spark, scenario):
    ticks = position_ticks(scenario["retained"], 6)
    assert len(ticks) == 6
    assert ticks == sorted(ticks)
    assert all(isinstance(f, str) and isinstance(p, int) for f, p in ticks)
    empty = scenario["retained"].where(F.lit(False))
    with pytest.raises(ValueError):
        position_ticks(empty, 2)


def test_deeper_retention_loses_patches_too(spark, tmp_path, scenario):
    """Harder retention: waves 0-2 gone — the minimal-row-image PATCH wave
    is lost along with every anchor, so the chunk reads alone must carry
    the patched state; the retained stream is only deletes + re-inserts.
    Final state still equals the full replay."""
    events = scenario["events"]
    _, retained = _split_by_wave(
        events, scenario["repo_count"], max_wave_b0=2
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    incremental_bootstrap(
        retained,
        _reader(scenario["full_changes"]),
        table,
        scenario["cfg"],
        n_chunks=4,
        stream_id="inc",
    )
    got = _hashes(table.read().select("repo", "path", "content"))
    assert got == scenario["want"]
