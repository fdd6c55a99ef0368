"""Property test: the set-wise Spark fold equals the sequential Python loop
(oracle.replay semantics) on randomized op sequences — the batch-fold
equivalence argument of SURVEY.md §7 made executable. Deterministic seed."""

import random

from pyspark.sql import types as T

from mariadb_cdc_spark.operators.fold import extract_keys, fold_changes

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("binlog_file", T.StringType()),
        T.StructField("binlog_pos", T.LongType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
    ]
)

COLS = ["commit", "lang", "content"]


def _python_fold(ops):
    """Sequential reference apply (mirrors oracle.replay rows handling)."""
    state = None  # None = absent
    for op, after in ops:
        if op == "INSERT":
            state = dict(after)
        elif op == "DELETE":
            state = None
        else:  # UPDATE patch
            if state is None:
                state = dict(after)
            else:
                state.update(after)
    return state


def test_fold_matches_sequential_on_random_sequences(spark):
    rng = random.Random(42)
    rows, expected = [], {}
    for k in range(300):
        key = {"repo": f"r{k % 17}", "path": f"p{k}.txt"}
        n_ops = rng.randint(1, 8)
        ops = []
        pos = rng.randint(1, 50)
        for i in range(n_ops):
            op = rng.choice(["INSERT", "UPDATE", "UPDATE", "DELETE"])
            if i == 0 and rng.random() < 0.7:
                op = "INSERT"
            after = None
            if op != "DELETE":
                # random partial image
                img = {
                    c: f"{c}_{k}_{i}"
                    for c in rng.sample(COLS, rng.randint(1, len(COLS)))
                }
                after = {**key, **img} if op == "INSERT" else img
            file = f"bin.{rng.randint(1, 3):06d}"
            pos += rng.randint(1, 1000)
            rows.append(
                (op, file, pos, rng.randint(0, 3), dict(key), after)
            )
            ops.append((file, pos, rows[-1][3], op, after))
        ops.sort(key=lambda x: (x[0], x[1], x[2]))
        expected[(key["repo"], key["path"])] = _python_fold(
            [(o[3], o[4]) for o in ops]
        )

    df = extract_keys(
        spark.createDataFrame(rows, CHANGE_SCHEMA), ["repo", "path"]
    )
    for two_phase in (False, True, "auto"):
        out = fold_changes(df, ["repo", "path"], two_phase=two_phase)
        got = {
            (r["repo"], r["path"]): (
                None if r["final_op"] == "DELETE" else dict(r["image"])
            )
            for r in out.collect()
        }
        assert set(got) == set(expected)
        for k in expected:
            e = expected[k]
            g = got[k]
            if e is None:
                assert g is None, (k, two_phase, g)
            else:
                # fold image may omit key columns for patch-only sequences;
                # compare on data columns + whatever keys are present
                e_data = {c: v for c, v in e.items()}
                g_full = dict(g)
                for kc, kv in zip(("repo", "path"), k):
                    g_full.setdefault(kc, kv)
                assert g_full == e_data or g == e, (k, two_phase, e, g)
