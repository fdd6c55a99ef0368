"""Hierarchical drift audit (operators.audit): digest invariance, the
no-drift fast path (no join), drift-class exactness, and null handling."""

from pyspark.sql import functions as F

from mariadb_cdc_spark.operators.audit import (
    drift_report,
    drift_slices,
    slice_digests,
)

KEYS = ["k1", "k2"]
VALS = ["v1", "v2"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k1 string, k2 string, v1 string, v2 string"
    )


def _base(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("a"), (F.col("id") % 7)).alias("k1"),
        F.col("id").cast("string").alias("k2"),
        F.concat(F.lit("v"), F.col("id")).alias("v1"),
        F.when(F.col("id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("w"), F.col("id")))
        .alias("v2"),
    )


def test_digest_is_order_and_partition_invariant(spark):
    a = _base(spark)
    b = _base(spark).repartition(13).sortWithinPartitions("v1")
    da = {r["slice_id"]: r for r in slice_digests(a, KEYS, VALS, 32).collect()}
    db = {r["slice_id"]: r for r in slice_digests(b, KEYS, VALS, 32).collect()}
    assert set(da) == set(db)
    for s in da:
        assert (da[s]["n_rows"], da[s]["x1"], da[s]["x2"]) == (
            db[s]["n_rows"], db[s]["x1"], db[s]["x2"]
        )
    # digests cover MANY slices (hash spread), each bounded output
    assert len(da) == 32


def test_no_drift_means_no_slices_and_empty_report(spark):
    a, b = _base(spark), _base(spark)
    assert drift_slices(a, b, KEYS, VALS, 32) == []
    rep = drift_report(a, b, KEYS, VALS, 32)
    assert rep.columns == ["k1", "k2", "drift_class"]
    assert rep.count() == 0


def test_drift_classes_exact(spark):
    lake = _base(spark, 300)
    doc = F.col("k2").cast("long")
    phantom = _df(spark, [("px", "1", "a", "b"), ("px", "2", "a", None)])
    source = (
        lake.where(doc % 53 != 0)  # lake-only -> extra
        .withColumn(
            "v1",
            F.when(doc % 41 == 0, F.concat(F.col("v1"), F.lit("!"))).otherwise(
                F.col("v1")
            ),
        )
        .unionByName(phantom)  # source-only -> missing
    )
    got = {
        (r["k1"], r["k2"]): r["drift_class"]
        for r in drift_report(source, lake, KEYS, VALS, 16).collect()
    }
    want = {}
    for i in range(300):
        if i % 53 == 0:
            want[(f"a{i % 7}", str(i))] = "extra"
        elif i % 41 == 0:
            want[(f"a{i % 7}", str(i))] = "modified"
    want[("px", "1")] = "missing"
    want[("px", "2")] = "missing"
    assert got == want


def test_null_vs_value_and_null_position_drift_detected(spark):
    a = _df(spark, [("k", "1", None, "x"), ("k", "2", "", "y")])
    b = _df(spark, [("k", "1", "x", None), ("k", "2", None, "y")])
    got = {
        (r["k1"], r["k2"]): r["drift_class"]
        for r in drift_report(a, b, KEYS, VALS, 8).collect()
    }
    # (None,'x') vs ('x',None) and '' vs None both register as modified
    assert got == {("k", "1"): "modified", ("k", "2"): "modified"}


def test_repair_drift_composes_with_live_tail(spark, sf_dir, tmp_path):
    """repair_drift makes the lake match the (drifted) source, and its
    lineage-position stamp loses to FUTURE stream events: a repaired key
    later updated by the stream ends with the stream value, a repaired key
    the stream never touches again keeps the repair."""
    from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
    from mariadb_cdc_spark.operators.audit import repair_drift
    from mariadb_cdc_spark.operators.fold import extract_keys
    from mariadb_cdc_spark.pipeline import (
        CdcConfig,
        apply_batch,
        decoded_changes,
    )
    from mariadb_cdc_spark.sources.lake import LakeTable
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    cap = repo.count() + 2
    slot = F.split("gtid", "-").getItem(2).cast("long")
    wave = F.floor(slot / (32 * cap))
    # split CONTROL events by position too (the wave-split helper's
    # replicate-into-both convention would inflate b0's committed lineage
    # to end-of-stream, and repair stamps at the lineage position); b1's
    # partial first file resolves its TABLE_MAP from the PERSISTED
    # registry, exactly like a real resume
    data0 = events.where(F.col("gtid").isNotNull() & (wave <= 0))
    p = data0.agg(
        F.max(F.struct("binlog_file", "binlog_pos")).alias("p")
    ).first()["p"]
    pos = F.struct("binlog_file", "binlog_pos")
    cut = F.struct(
        F.lit(p["binlog_file"]).alias("binlog_file"),
        F.lit(p["binlog_pos"]).cast("long").alias("binlog_pos"),
    )
    b0 = events.where(
        (F.col("gtid").isNotNull() & (wave <= 0))
        | (F.col("gtid").isNull() & (pos <= cut))
    )
    b1 = events.where(
        (F.col("gtid").isNotNull() & (wave > 0))
        | (F.col("gtid").isNull() & (pos > cut))
    )
    cfg = CdcConfig()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, MERGE_KEYS, n_buckets=8
    )
    apply_batch(b0, table, cfg, stream_id="s", batch_id=0)

    # one key the tail will update again, one it never touches
    later = (
        extract_keys(decoded_changes(b1, cfg), MERGE_KEYS)
        .select(*MERGE_KEYS)
        .distinct()
    )
    state = table.read().select(*MERGE_KEYS)
    k_upd = tuple(state.join(later, MERGE_KEYS, "left_semi").first())
    k_still = tuple(state.join(later, MERGE_KEYS, "left_anti").first())

    def _is(k):
        return (F.col(MERGE_KEYS[0]) == k[0]) & (F.col(MERGE_KEYS[1]) == k[1])

    tainted = _is(k_upd) | _is(k_still)
    source = table.read().select(
        *MERGE_KEYS,
        "commit",
        "lang",
        F.when(tainted, F.concat("content", F.lit("!x")))
        .otherwise(F.col("content"))
        .alias("content"),
    )
    res = repair_drift(source, table, n_slices=16)
    assert res["classes"] == {"modified": 2}

    apply_batch(b1, table, cfg, stream_id="s", batch_id=1)
    final = {
        (r["repo"], r["path"]): r["content"]
        for r in table.read()
        .where(_is(k_upd) | _is(k_still))
        .collect()
    }
    assert not final[k_upd].endswith("!x")  # stream won
    assert final[k_still].endswith("!x")  # repair persisted

    # clean-table fast path: identical source -> nothing repaired
    res2 = repair_drift(
        table.read().select(*MERGE_KEYS, "commit", "lang", "content"),
        table,
        n_slices=16,
    )
    assert res2["classes"] == {} and res2["repaired"] == 0
    events.unpersist()


def test_drift_report_property_random_mutations(spark):
    """Property: for ANY base table and mutation plan (drop / add /
    modify), drift_report returns exactly the set-computed truth. Driven
    by seeded pseudo-random cases rather than hypothesis (each example
    costs Spark jobs); 12 cases x (mutations over a 60-key base)."""
    import random

    for seed in range(12):
        rng = random.Random(seed)
        n = 60
        base = {
            (f"g{i % 5}", str(i)): (f"v{rng.randint(0, 9)}", f"w{i}")
            for i in range(n)
        }
        lake = dict(base)
        source = dict(base)
        want = {}
        keys = list(base)
        rng.shuffle(keys)
        for k in keys[: rng.randint(0, 12)]:
            action = rng.choice(["drop_src", "drop_lake", "modify"])
            if action == "drop_src":
                del source[k]
                want[k] = "extra"
            elif action == "drop_lake":
                del lake[k]
                want[k] = "missing"
            else:
                source[k] = (source[k][0] + "!", source[k][1])
                want[k] = "modified"
        for j in range(rng.randint(0, 3)):  # source-only inserts
            k = ("new", f"n{seed}_{j}")
            source[k] = ("a", "b")
            want[k] = "missing"

        def df(d):
            return spark.createDataFrame(
                [(k1, k2, v1, v2) for (k1, k2), (v1, v2) in sorted(d.items())],
                "k1 string, k2 string, v1 string, v2 string",
            )

        got = {
            (r["k1"], r["k2"]): r["drift_class"]
            for r in drift_report(
                df(source), df(lake), KEYS, VALS, n_slices=rng.choice([4, 16, 64])
            ).collect()
        }
        assert got == want, f"seed={seed}"


def test_binlog_chain_audit_gaps_vs_late_start(spark):
    """A numeric gap inside a server's chain is missing mass; a chain
    that simply STARTS later is not."""
    from mariadb_cdc_spark.operators.audit import binlog_chain_audit

    rows = (
        [(0, f"bin.{n:06d}") for n in (1, 2, 3, 4)]          # clean
        + [(1, f"bin.{n:06d}") for n in (1, 2, 5, 6)]        # lost 3,4
        + [(2, f"bin.{n:06d}") for n in (7, 8)]              # late start
    )
    # duplicates (many events per file) must not distort counts
    df = spark.createDataFrame(rows * 3, "server_id long, binlog_file string")
    got = {r.server_id: r for r in binlog_chain_audit(df).collect()}
    assert (got[0].n_files, got[0].n_missing, got[0].first_missing) == (4, 0, None)
    assert (got[1].n_files, got[1].n_missing, got[1].first_missing) == (4, 2, 3)
    assert (got[2].first_file, got[2].n_missing) == (7, 0)
