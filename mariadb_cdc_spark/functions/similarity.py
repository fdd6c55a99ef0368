"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline, O(Q x N) — fine when the query
    side is small and broadcastable;
  - IVF (cluster-probed) top-k: the scale path — candidates limited to the
    query's probe cluster(s), so the join is equi on cluster id instead of a
    cross join. At 10^9 vectors brute force is a 10^9-row-per-query cross
    join; IVF with n_probe/n_clusters = 1% does 1% of that work.

Dot products use F.zip_with + F.aggregate (JVM-side, no Python). Results
round similarities to fixed decimals so the DuckDB oracle (list_dot_product)
hash-matches despite float summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# k-means assignment ships centroids as plan literals up to this many k*d
# values (whole-stage-codegen friendly); beyond it they ride a 1-row
# broadcast relation instead — same expressions, same results (pinned by
# test_kmeans_broadcast_path_matches_literal_path).
KMEANS_INLINE_MAX = 16384


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k per query over the full corpus.

    The query side is broadcast (it is small by construction); ranking uses
    the ROUNDED similarity with id tiebreak so results are deterministic
    across engines/summation orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """IVF-style probed search: only the query's own cluster is scanned.

    Here clusters come from the precomputed `label` column (in a full system
    they'd be k-means centroid assignments — the plumbing is identical: an
    equi-join on cluster id replaces the cross join). Recall < 1.0 by design;
    that is the documented scale trade-off (n_probe tunes it).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(cluster_col).alias("cluster"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(cluster_col).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = "label",
    round_to: int = 4,
    all_pairs_limit: int = 100_000,
    force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (sim >= threshold).

    With cluster_col set, pairs are only sought within a cluster (the IVF
    trick again) — near-dups land in the same cluster with high probability.
    cluster_col=None is the exact all-pairs variant for SMALL corpora only:
    the crossJoin is O(n^2), so it refuses corpora above `all_pairs_limit`
    rows (one cheap count) unless `force=True` — a 100 TB misuse must fail
    fast, not cartesian-explode.
    """
    if cluster_col is None and not force:
        n = corpus.limit(all_pairs_limit + 1).count()
        if n > all_pairs_limit:
            raise ValueError(
                f"embedding_near_duplicates(cluster_col=None) is exact "
                f"all-pairs (O(n^2)): corpus has >{all_pairs_limit} rows. "
                "Cluster first (kmeans_assign + cluster_col) or pass "
                "force=True if you really mean it."
            )
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        *( [F.col(cluster_col).alias("cl")] if cluster_col else [] ),
    ).alias("a")
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        *( [F.col(cluster_col).alias("cl")] if cluster_col else [] ),
    ).alias("b")
    cond = F.col("a.id_a") < F.col("b.id_b")
    joined = (
        a.join(b, (F.col("a.cl") == F.col("b.cl")) & cond)
        if cluster_col
        else a.crossJoin(b).where(cond)
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), round_to).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


# ------------------------------------------------------------- IVF build

def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Distributed Lloyd's k-means: the index-BUILD step behind ivf_topk.

    ivf_topk probes a cluster id; this produces that id from raw vectors.
    Fully deterministic and engine-portable so a SQL oracle can replay it
    bit-for-bit:

      - seeding: the k vectors with the smallest (md5(id), id) — a
        uniform-but-deterministic draw, no RNG;
      - assignment: argmin over squared L2 distance ROUNDED to `round_to`
        decimals with cluster-id tiebreak (rounding re-synchronizes
        engines whose float summation orders differ);
      - update: element-wise mean, also rounded, so every iteration
        starts from identical centroids on any engine.

    Plan shape at scale (N vectors, dim d, k clusters):
      - centroids are O(k*d) driver-side state inlined as an array
        LITERAL, so assignment is a pure projection (distances + argmin
        inside whole-stage codegen) — ZERO shuffle, zero row blowup on
        the N side;
      - the update step shuffles (cluster, pos) pairs — N*d rows but only
        k*d groups, map-side combined by partial avg, so the exchange
        carries O(partitions * k * d) bytes, not O(N*d);
      - `iters` is a fixed small constant (IVF needs rough Voronoi cells,
        not convergence). Driver work per iteration is one k-row collect.

    Returns (vec_id, cluster, dist) — dist is the final squared L2 to the
    assigned centroid, rounded.
    """
    cents, _, assign = _kmeans_fit(corpus, k, iters, id_col, vec_col, round_to)
    return assign(cents).select(F.col("vid").alias(id_col), "cluster", "dist")


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """The fitted centroid table (cluster, centroid) from the same Lloyd
    loop as kmeans_assign — the O(k*d) index artifact ivf_probe_topk
    broadcasts. Same seeding/rounding, so assign+centroids from the same
    (corpus, k, iters) are mutually consistent."""
    cents, _, _ = _kmeans_fit(corpus, k, iters, id_col, vec_col, round_to)
    return corpus.sparkSession.createDataFrame(
        cents, "cluster int, centroid array<double>"
    )


def _kmeans_fit(corpus, k, iters, id_col, vec_col, round_to):
    """Shared Lloyd loop: returns (centroids, vecs, assign_fn)."""
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    seeds = (
        vecs.withColumn("hk", F.md5(F.col("vid").cast("string")))
        .orderBy("hk", "vid")
        .limit(k)
        .collect()
    )
    # centroids live driver-side between iterations: O(k*d) control-plane
    # state, re-broadcast each round (same pattern as the TABLE_MAP
    # registry's local relation).
    cents = [
        (i, list(r["v"]))
        for i, r in enumerate(sorted(seeds, key=lambda r: (r["hk"], r["vid"])))
    ]

    def _assign(cent_rows):
        # Assignment is a PURE PROJECTION, not a join: the centroids are
        # O(k*d) driver-side state, delivered to executors one of two ways
        # — both zero-shuffle, zero row blowup, same argmin expression:
        #   * k*d <= KMEANS_INLINE_MAX: inline as an array LITERAL, so the
        #     distances + argmin run inside whole-stage codegen;
        #   * larger: codegen chokes on plans with ~10^5 literals, so the
        #     centroids ship as a 1-ROW BROADCAST relation crossJoined onto
        #     the scan — the same expressions evaluate over a broadcast
        #     COLUMN instead of a literal (no k-fold explode, no N-row
        #     re-aggregation that a conventional broadcast-join+groupBy
        #     formulation would cost).
        # Ties break to the smaller cluster id (array_position returns the
        # FIRST minimum), matching the (dist, cid) ordering the SQL oracle
        # uses. Cluster ids are dense 0..len-1 after the sorted() below but
        # may be a SUBSET of 0..k-1 when a cluster emptied — positions map
        # back to the surviving ids.
        ordered = sorted(cent_rows)
        n_vals = sum(len(c) for _, c in ordered)
        if n_vals <= KMEANS_INLINE_MAX:
            base = vecs
            cvecs = F.array(
                *[F.array(*[F.lit(float(x)) for x in c]) for _, c in ordered]
            )
            cids = F.array(*[F.lit(int(i)) for i, _ in ordered])
        else:
            one = vecs.sparkSession.createDataFrame(
                [
                    (
                        [int(i) for i, _ in ordered],
                        [[float(x) for x in c] for _, c in ordered],
                    )
                ],
                "_cids array<int>, _cvecs array<array<double>>",
            )
            base = vecs.crossJoin(F.broadcast(one))
            cvecs = F.col("_cvecs")
            cids = F.col("_cids")
        d2 = F.transform(
            cvecs,
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_to,
            ),
        )
        return base.select(
            "vid",
            "v",
            F.element_at(
                cids,
                F.array_position(d2, F.array_min(d2)).cast("int"),
            ).alias("cluster"),
            F.array_min(d2).alias("dist"),
        )

    for _ in range(iters):
        asg = _assign(cents)
        upd = (
            asg.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), round_to).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        cents = sorted((r["cluster"], list(r["c"])) for r in upd)

    return cents, vecs, _assign


# ----------------------------------------------------- storage quantization

def quantize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization stats — the 4x storage cut
    (float32 -> int8) an ANN corpus takes before it can live at 10^10
    vectors (scale = max|x|/127, q = round(x/scale); the dot-product math
    of ivf_topk works on q directly with one per-pair rescale).

    Pure per-row array expressions — no shuffle, no UDF: the quantizer
    runs at scan speed and Catalyst pushes the column pruning into the
    parquet read. Returns per-vector verification stats rather than the
    int8 payload (engine-portable scalars the SQL oracle recomputes
    exactly): n_dims, rounded scale, q checksum, max |q| (<=127 by
    construction) and the reconstruction MSE.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(x, lambda v: F.abs(v))) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(x, lambda v: F.lit(0.0))).otherwise(
        F.transform(x, lambda v: F.round(v / scale, 0))
    )
    err = F.zip_with(x, q, lambda a, b: (a - b * scale) * (a - b * scale))
    return corpus.select(
        F.col(id_col),
        F.size(x).alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0.0), lambda acc, v: acc + v)
        .cast("long")
        .alias("sum_q"),
        F.array_max(F.transform(q, lambda v: F.abs(v)))
        .cast("int")
        .alias("max_abs_q"),
        F.round(
            F.aggregate(err, F.lit(0.0), lambda acc, v: acc + v) / F.size(x),
            8,
        ).alias("recon_mse"),
    )


def ivf_probe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    round_to: int = 4,
) -> DataFrame:
    """True multi-probe IVF: each query scans its `n_probe` NEAREST
    centroids' inverted lists — the recall knob of a real IVF index
    (n_probe = n_clusters degrades gracefully to exact brute force).

    Unlike ivf_topk (which assumes the query already carries a cluster
    id), this takes the k-means `centroids` table (cluster, centroid
    array — kmeans_assign's driver-side state materialized, O(k*d) and
    always broadcast) and ranks clusters per query by squared L2, rounded
    with cluster-id tiebreak so the probe set is engine-deterministic.

    Plan shape: queries x centroids is a broadcast cross join of
    |Q| x k rows (both tiny); the corpus side joins on cluster id only —
    the N-row side still never shuffles on anything but its own id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = centroids.select(
        F.col(cluster_col).alias("cluster"),
        F.transform(F.col("centroid"), lambda x: x.cast("double")).alias("cv"),
    )
    qd = F.round(
        F.aggregate(
            F.zip_with(
                F.transform(F.col("q_vec"), lambda x: x.cast("double")),
                F.col("cv"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cdist").asc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(c))
        .select("query_id", "q_vec", "cluster", qd.alias("cdist"))
        .withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= n_probe)
        .select("query_id", "q_vec", "cluster")
    )
    corp = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(cluster_col).alias("cluster"),
    )
    scored = (
        corp.join(F.broadcast(probes), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias(
                "sim"
            ),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def embedding_diversity(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_centroid: int = 6,
    round_to: int = 4,
) -> DataFrame:
    """Per-label embedding diversity: how tightly each label's vectors hug
    their centroid (mean/min cosine-to-centroid). The curation signal for
    balancing a training mix — a label with mean_sim ~1 is redundant mass;
    a low-mean/low-min label carries spread (or mislabeled points).

    Centroid components are ROUNDED (round_centroid) before the cosine so
    the value is independent of float summation order — the same
    determinism device the k-means build uses — and the DuckDB oracle
    replays it exactly.

    Scale shape: posexplode -> (label, dim)-keyed avg with map-side
    combine (shuffle carries one partial per (partition, label, dim), not
    N*d rows), centroids broadcast back (O(labels*d)), cosine as a pure
    array expression, one final per-label agg.
    """
    dims = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), round_centroid).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda x: x["c"],
            ).alias("centroid")
        )
    )
    sim = F.round(cosine(F.col(vec_col), F.col("centroid")), round_to)
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col),
    ).join(F.broadcast(cent), "label").select("vec_id", "label", sim.alias("sim"))
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("sim"), round_to).alias("mean_sim_to_centroid"),
        F.min("sim").alias("min_sim_to_centroid"),
    )


# ------------------------------------------------- product quantization

def pq_fit(
    corpus: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
):
    """Product quantization (Jégou et al., PAMI 2011): split each vector
    into `m` contiguous subvectors and learn an independent k-codebook
    per subspace, so a d-dim float vector stores as m small codes —
    the memory layout 10^10-vector ANN corpora actually ship (IVF-PQ).

    Spark-first: ALL m codebooks train in ONE grouped Lloyd loop — the
    subvectors explode to (vid, sv, sx) rows once, assignment is a
    broadcast join on `sv` against the m codebooks (k*m*sub_dim doubles
    of driver-side control-plane state, same pattern as _kmeans_fit) and
    the centroid update is a single groupBy(sv, code, pos) aggregation.
    No per-subspace jobs, no N-row blowup beyond the m-way explode.

    Returns (cents, sub_dim, codes): the per-subspace codebooks (driver
    state), the subvector width, and one row per (vector, subspace) —
    vid, sv, code, dist (the rounded squared quantization error in that
    subspace). Per-subspace rows keep every value exactly reproducible by
    the SQL oracle (no cross-subspace float summation order to pin down).
    Rounding contract matches _kmeans_fit: centroids and distances round
    to `round_to` at every step.
    """
    d = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subvectors")
    sub = d // m
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    subs = vecs.select(
        "vid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sv"),
                        F.slice("v", s * sub + 1, sub).alias("sx"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("p"),
    ).select("vid", F.col("p.sv").alias("sv"), F.col("p.sx").alias("sx"))

    seeds = (
        vecs.withColumn("hk", F.md5(F.col("vid").cast("string")))
        .orderBy("hk", "vid")
        .limit(k)
        .collect()
    )
    seeds = sorted(seeds, key=lambda r: (r["hk"], r["vid"]))
    cents = {
        s: sorted(
            (i, list(r["v"][s * sub:(s + 1) * sub]))
            for i, r in enumerate(seeds)
        )
        for s in range(m)
    }

    def _assign(cents):
        one = corpus.sparkSession.createDataFrame(
            [
                (s, [int(i) for i, _ in cs], [[float(x) for x in c] for _, c in cs])
                for s, cs in cents.items()
            ],
            "sv int, _cids array<int>, _cvecs array<array<double>>",
        )
        j = subs.join(F.broadcast(one), "sv")
        d2 = F.transform(
            F.col("_cvecs"),
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(F.col("sx"), c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_to,
            ),
        )
        return j.select(
            "vid",
            "sv",
            "sx",
            F.element_at(
                F.col("_cids"),
                F.array_position(d2, F.array_min(d2)).cast("int"),
            ).alias("code"),
            F.array_min(d2).alias("dist"),
        )

    for _ in range(iters):
        upd = (
            _assign(cents)
            .select("sv", "code", F.posexplode("sx").alias("pos", "x"))
            .groupBy("sv", "code", "pos")
            .agg(F.round(F.avg("x"), round_to).alias("mm"))
            .groupBy("sv", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mm"))),
                    lambda st: st["mm"],
                ).alias("c")
            )
            .collect()
        )
        nxt: dict = {}
        for r in upd:
            nxt.setdefault(r["sv"], []).append((r["code"], list(r["c"])))
        cents = {s: sorted(cs) for s, cs in nxt.items()}

    return cents, sub, _assign(cents).select("vid", "sv", "code", "dist")


def pq_codes(
    corpus: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-(vector, subspace) PQ assignment rows — see pq_fit."""
    _, _, codes = pq_fit(corpus, m, k, iters, id_col, vec_col, round_to)
    return codes


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_codes: int = 4,
    iters: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half
    of IVF-PQ: each query builds an m x k lookup table of exact
    query-subvector-to-centroid distances, and every corpus vector is
    scored by m TABLE LOOKUPS on its codes instead of a d-dim distance.
    At 10^10 vectors that turns the scan side into integer-indexed adds
    over 4-8 byte codes — the memory-bandwidth shape PQ exists for.

    Spark plan: codes (N x m rows) BROADCAST-join the LUT (q x m x k rows,
    tiny) on (sv, code); the per-(query, vector) score folds the m
    subspace distances IN SUBSPACE ORDER (array_sort before the fold), so
    the float sum is deterministic and the SQL oracle reproduces it with
    an explicit d0+d1+...+d(m-1). Approximate by construction — the
    returned dist is the quantized distance, monotone in recall terms
    with codebook size."""
    cents, sub, codes = pq_fit(
        corpus, m, k_codes, iters, id_col, vec_col, round_to
    )
    qvecs = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    qsubs = qvecs.select(
        "qid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sv"),
                        F.slice("qv", s * sub + 1, sub).alias("qx"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("p"),
    ).select("qid", F.col("p.sv").alias("sv"), F.col("p.qx").alias("qx"))
    one = corpus.sparkSession.createDataFrame(
        [
            (s, [int(i) for i, _ in cs], [[float(x) for x in c] for _, c in cs])
            for s, cs in cents.items()
        ],
        "sv int, _cids array<int>, _cvecs array<array<double>>",
    )
    lut = (
        qsubs.join(F.broadcast(one), "sv")
        .select(
            "qid",
            "sv",
            F.explode(
                F.arrays_zip(F.col("_cids").alias("code"), F.col("_cvecs").alias("cv"))
            ).alias("e"),
            F.col("qx"),
        )
        .select(
            "qid",
            "sv",
            F.col("e.code").alias("code"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("qx"), F.col("e.cv"),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_to,
            ).alias("d"),
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["sv", "code"])
        .groupBy("qid", "vid")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("sv", "d"))),
                    F.lit(0.0),
                    lambda acc, st: acc + st["d"],
                ),
                round_to,
            ).alias("adist")
        )
        .where(F.col("qid") != F.col("vid"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("adist").asc(), F.col("vid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("vid").alias("neighbor_id"),
            "adist",
        )
    )
