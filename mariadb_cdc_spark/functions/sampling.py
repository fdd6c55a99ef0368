"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is partition-order-dependent: the same fraction on the same
data yields DIFFERENT rows after a repartition or a cluster resize — useless
for reproducible corpus builds. These operators key the decision on a
content hash instead, so membership is:

  - deterministic: same key + salt -> same decision, on 1 or 1000 executors;
  - re-runnable: an incremental re-ingest keeps prior sampling decisions;
  - shuffle-free: a narrow `where` right after the scan (Catalyst pushes it
    into the file source), no exchange introduced at any scale;
  - auditable: an ANSI-SQL oracle reproduces the exact member set
    (__spark_entry__.oracle_sql: sample_stratified / sample_split).

The hash is the engine's canonical md5->60-bit scheme (gen._hash64 uses the
same construction) mapped to basis points (1 bp = 0.01%), so fractions are
exact rationals, not float thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BP_SCALE = 10_000  # basis points: 10000 = keep everything


def _hash_bp(cols: list[Column], salt: str) -> Column:
    """Deterministic basis-point bucket in [0, 10000) from key columns.

    md5 (not xxhash64) so any SQL engine reproduces it — portability beats
    the cheaper hash here; sampling runs once per corpus build.
    """
    joined = F.concat_ws("\x1f", F.lit(salt), *cols)
    h60 = F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
    return F.pmod(h60, F.lit(BP_SCALE))


def hash_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction_bp: int,
    salt: str = "sample",
) -> DataFrame:
    """Keep rows whose key hashes below `fraction_bp` basis points.

    ~fraction_bp/10000 of rows survive; membership depends only on
    (key, salt). Different salts give independent samples of the same data.
    """
    keys = [F.col(c).cast("string") for c in key_cols]
    return df.where(_hash_bp(keys, salt) < fraction_bp)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions_bp: dict[str, int],
    key_cols: list[str],
    default_bp: int = 0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum hash sampling: each stratum value gets its own rate.

    The standard corpus-mixing move (e.g. downsample boilerplate-heavy
    domains, keep all rare-language docs). One narrow filter — the rate
    lookup is a CASE expression, not a join, so no shuffle and no broadcast
    at any stratum cardinality that fits a literal map.
    """
    rate = F.lit(default_bp)
    for value, bp in sorted(fractions_bp.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(bp)).otherwise(rate)
    keys = [F.col(c).cast("string") for c in key_cols]
    return df.where(_hash_bp(keys, salt) < rate)


def train_eval_split(
    df: DataFrame,
    key_cols: list[str],
    eval_bp: int = 1_000,
    salt: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive train/eval assignment keyed on content hash.

    Every row lands in exactly one split; assignment survives re-ingests
    and cluster-size changes, so eval contamination can't creep in through
    nondeterministic splitting. Adds a `split` column ('train' | 'eval').
    """
    keys = [F.col(c).cast("string") for c in key_cols]
    return df.withColumn(
        "split",
        F.when(_hash_bp(keys, salt) < eval_bp, F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_cols: list[str],
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to the
    training sequence that would contain its FIRST token if the corpus were
    concatenated and cut every `budget` tokens — the standard GPT-style
    pretraining packing, as an assignment plan (which docs feed which
    sequence) rather than a materialized byte stream.

    Scale shape: documents are hash-sharded (same md5 scheme as the other
    sampling ops, so the plan is reproducible on any cluster size and in
    any SQL engine), then packed independently per shard — n_shards
    parallel window scans, never a global sort. Within a shard the order is
    (hash, keys): deterministic and shuffle-once. Sequence ids are globally
    unique as (shard, seq_in_shard).

    Returns the input plus `pack_shard`, `pack_seq` (sequence index within
    the shard) and `pack_offset` (the doc's first-token offset within its
    shard's stream) — enough for a writer to materialize sequences, and for
    an auditor to recompute the plan from SQL (oracle: sample_pack).
    """
    from pyspark.sql import Window

    keys = [F.col(c).cast("string") for c in key_cols]
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), *keys)), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    )
    out = df.withColumn("pack_shard", shard.cast("int"))
    order_h = F.md5(F.concat_ws("\x1f", F.lit(salt + ".order"), *keys))
    w = Window.partitionBy("pack_shard").orderBy(
        order_h, *[F.col(c) for c in key_cols]
    )
    cum = F.sum(F.col(token_col)).over(w)
    offset = (cum - F.col(token_col)).cast("long")
    return out.withColumn("pack_offset", offset).withColumn(
        "pack_seq", F.floor(F.col("pack_offset") / F.lit(budget)).cast("long")
    )


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_cols: list[str],
    salt: str = "quota",
    prefilter_bp: int | None = None,
) -> DataFrame:
    """Cap each stratum at `quota` rows, chosen by deterministic hash rank.

    The per-domain / per-source quota pass of a corpus build ("at most N
    pages per domain"): within each stratum, rows are ranked by their
    60-bit key hash (the engine's canonical md5->60-bit scheme, numeric
    order, key tiebreak) and the first `quota` survive. Membership
    depends only on the stratum's row SET — stable across partitioning,
    cluster size, and re-ingests that only add rows ranked below the cut.

    Scale shape: one shuffle on the stratum key for the ranking window.
    A pathological stratum (one domain = 10% of the corpus) would make
    that a single hot task; `prefilter_bp` bounds it — a shuffle-FREE
    RANGE filter on the SAME hash (h60 < prefilter_bp/10000 of the hash
    space) thins every stratum to ~prefilter_bp/10000 of its rows BEFORE
    the window. Because the kept set is a prefix of the rank order, the
    final top-`quota` set is IDENTICAL to the unfiltered run whenever the
    stratum's post-filter count >= quota (check: survivors-per-stratum
    >= quota, else raise prefilter_bp).
    """
    from pyspark.sql import Window

    keys = [F.col(c).cast("string") for c in key_cols]
    h60 = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), *keys)), 1, 15),
        16,
        10,
    ).cast("long")
    src = df.withColumn("_h60", h60)
    if prefilter_bp is not None:
        # prefix-of-order range filter: h60 is uniform on [0, 2^60)
        src = src.where(
            F.col("_h60") < F.lit((1 << 60) * prefilter_bp // BP_SCALE)
        )
    w = Window.partitionBy(strata_col).orderBy(
        "_h60", *[F.col(c) for c in key_cols]
    )
    return (
        src.withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("quota_rank") <= quota)
        .drop("_h60")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    targets_bp: dict[str, int],
    key_cols: list[str],
    max_total: int | None = None,
    salt: str = "mix",
    weight_col: str | None = None,
) -> DataFrame:
    """Mixture balancing: draw the LARGEST corpus whose stratum proportions
    match `targets_bp` (basis points, summing to <= 10000) exactly —
    the domain/language-reweighting pass of a pretraining data build
    (the fixed-weight core of DoReMi-style mixtures: given weights,
    materialize the sample deterministically).

    Feasibility is data-driven, not user-guessed: the achievable corpus
    size is N* = min over strata of floor(n_s * 10000 / t_s) (the stratum
    that runs out of mass first binds every other stratum's take — classic
    water-filling), optionally capped by `max_total`; each stratum then
    keeps want_s = floor(N* * t_s / 10000) rows. All arithmetic is integer
    (basis points, `div`), so any SQL engine reproduces the member set
    bit-for-bit.

    Fully in-plan — NO driver-side collect at any stratum cardinality:
    the per-stratum counts are a tiny agg, N* is a 1-row agg over it,
    and both broadcast-join back onto the stream; membership is the
    engine's canonical md5 60-bit rank within the stratum (same scheme as
    quota_sample, so membership is stable across partitioning, cluster
    size, and append-only re-ingests). One shuffle (the rank window,
    keyed on the stratum) + two broadcast joins. Strata absent from
    `targets_bp` are dropped (weight 0).

    Returns the kept rows plus `mixture_rank` (1-based rank within the
    stratum) and `mixture_want` (the stratum's computed take).

    `weight_col` switches the budgeting unit from documents to an integer
    per-row weight (token or char count) — the unit a pretraining mixture
    is actually specified in. Mass, N*, and the takes become weight sums,
    and membership is the greedy prefix of the SAME hash order: a row is
    kept iff the total weight hashed BEFORE it in its stratum is under
    the stratum's budget (so proportions are exact to within one
    document). One extra window cumsum on the stratum key — same shuffle
    the rank already pays.
    """
    from pyspark.sql import Window

    targets = sorted(targets_bp.items())
    tdf = df.sparkSession.createDataFrame(
        targets, f"{strata_col} string, _t_bp long"
    )
    mass = (
        F.count(F.lit(1)).alias("_n_s")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).alias("_n_s")
    )
    counts = df.groupBy(strata_col).agg(mass)
    # LEFT join FROM the targets: a stratum requested in targets_bp but
    # absent from the data must reach the water-fill with mass 0 (forcing
    # N* = 0 — no corpus can match the target proportions), not be dropped
    # by an inner join so the returned corpus silently violates the
    # "proportions match exactly" contract. Both sides are tiny aggs.
    j = tdf.join(counts, strata_col, "left").withColumn(
        "_n_s", F.coalesce(F.col("_n_s"), F.lit(0).cast("long"))
    )
    cap = (
        F.expr(f"(_n_s * {BP_SCALE}) div _t_bp")
        if max_total is None
        else F.least(
            F.expr(f"(_n_s * {BP_SCALE}) div _t_bp"),
            F.lit(int(max_total)).cast("long"),
        )
    )
    n_star = j.agg(F.min(cap).alias("_n_star"))
    wants = (
        j.crossJoin(F.broadcast(n_star))
        .withColumn("_want", F.expr(f"(_n_star * _t_bp) div {BP_SCALE}"))
        .select(strata_col, "_want")
    )

    keys = [F.col(c).cast("string") for c in key_cols]
    h60 = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), *keys)), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(
        "_h60", *[F.col(c) for c in key_cols]
    )
    ranked = (
        df.withColumn("_h60", h60)
        .join(F.broadcast(wants), strata_col)
        .withColumn("mixture_rank", F.row_number().over(w))
    )
    if weight_col is None:
        keep = F.col("mixture_rank") <= F.col("_want")
    else:
        wt = F.col(weight_col).cast("long")
        prior = F.coalesce(
            F.sum(wt).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        ranked = ranked.withColumn("_prior_weight", prior)
        keep = F.col("_prior_weight") < F.col("_want")
    return (
        ranked.where(keep)
        .withColumnRenamed("_want", "mixture_want")
        .drop("_h60", "_prior_weight")
    )
