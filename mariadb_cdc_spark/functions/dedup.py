"""Deduplication operators for training-data pipelines.

Five dedup families, each expressed as DataFrame transforms:

  exact          — md5 fingerprint groupBy (one shuffle on the hash)
  ngram_jaccard  — word-shingle self-join + Jaccard (exact near-dup, the
                   quadratic baseline; bounded by grouping key)
  minhash_lsh    — MinHash signatures + banded LSH bucket join (the 100 TB
                   scale path: candidate pairs only, no全-pair join)
  simhash        — 16-bit sign-aggregated token-hash fingerprint
  embedding      — cosine near-dup over embedding vectors (see similarity.py)

Hashes are md5-derived (not xxhash) so the DuckDB oracle can reproduce them
bit-for-bit — determinism across engines is part of the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime; linear-family modulus)


def _md5_long(col: Column, salt: str = "") -> Column:
    """60-bit hash from the first 15 hex chars of md5 (DuckDB-reproducible)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
    ).cast("long")


# ------------------------------------------------------------------- exact

def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns one row per duplicate group with the canonical (min) doc_id,
    group size, and member ids. Scale: one shuffle keyed on the 128-bit
    fingerprint — no skew risk beyond true duplicate mass.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.select("doc_id", F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .where(F.col("group_size") > 1)
    )


# ----------------------------------------------------------- word shingles

def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's core count before a
    CPU-dense per-row kernel (shingling, winnowing, char histograms).

    These kernels are ~100x heavier per input byte than a plain scan, so
    Spark's size-based split planning under-parallelizes them: a corpus
    arriving as one small parquet split would run the whole kernel on ONE
    core (measured: 4.7 s single-threaded vs 0.3 s spread, sf0.1 docs).
    The shuffle moves only the raw docs — cheap relative to the kernel —
    and is a near-no-op at production file counts."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def shingles(col: Column, n: int = 3, distinct: bool = True) -> Column:
    """n-gram word shingles of lowercased text as array<string>.

    `distinct=False` skips the array_distinct pass — correct whenever the
    consumer is dedup-insensitive (min-hash: min over a multiset == min
    over its set), and meaningfully cheaper (array_distinct over string
    arrays is quadratic-ish per row)."""
    toks = tokens(F.lower(col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        grams
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard near-dup pairs via shingle inverted index.

    Plan: explode shingles -> self-join on shingle (the inverted index)
    -> count common shingles per pair -> Jaccard = |∩| / (|A|+|B|-|∩|).
    This is the exact-but-quadratic-in-collisions baseline; minhash_lsh
    below is the sub-quadratic scale path. The explode output is
    (shingle, id) — Catalyst prunes text before the shuffle.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


# ------------------------------------------------- passage (chunk) dedup

def passage_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Passage-level exact dedup — the line/paragraph-dedup analog for
    pretraining corpora (C4 drops duplicated lines; RefinedWeb/Gopher flag
    docs dominated by boilerplate passages). Each document is cut into
    consecutive `chunk_tokens`-token passages; a passage occurring in more
    than one distinct document marks boilerplate.

    Returns per-doc: n_passages, n_dup_passages (occurrences whose passage
    appears in >=2 distinct docs), dup_passage_ratio. Docs with no tokens
    produce no row (no passages to judge).

    Scale shape (unlike the pairwise Jaccard baseline this is LINEAR in
    corpus tokens): explode -> one shuffle keyed on the passage md5 with
    map-side-combined partial counts -> hash-keyed join back -> per-doc agg.
    No pairwise join, no quadratic blow-up in duplicate mass; hot passages
    (the exact boilerplate we hunt) are absorbed by the partial aggregation
    rather than concentrating a reducer.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)),
    )
    occ = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.when(n_chunks > 0, passages)).alias("passage"),
    ).select("id", F.md5(F.col("passage")).alias("ph"))

    # distinct docs per passage hash: two-phase (distinct then count) so both
    # shuffles are on `ph` and partials combine map-side.
    docs_per_passage = (
        occ.distinct()
        .groupBy("ph")
        .agg(F.count(F.lit(1)).alias("n_docs_with_passage"))
    )
    return (
        occ.join(docs_per_passage, "ph")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(
                F.when(F.col("n_docs_with_passage") > 1, 1).otherwise(0)
            ).alias("n_dup_passages"),
        )
        .withColumn(
            "dup_passage_ratio",
            F.round(F.col("n_dup_passages") / F.col("n_passages"), 6),
        )
    )


# ---------------------------------------------------------------- MinHash

def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of h_i(shingle).

    Hash family: ONE md5 per shingle (base = first 8 hex chars as a 32-bit
    int), then h_i = (a_i * base + b_i) mod (2^31 - 1) — a universal linear
    family. One digest per shingle instead of num_hashes digests is a ~16x
    kernel-CPU cut at 10^9-doc scale, and the linear transform is exactly
    reproducible in the DuckDB oracle (no wrap-around: all products stay
    under 2^62).
    """
    based = _spread(df).select(
        F.col(id_col).alias("id"),
        # distinct=False: min over a multiset equals min over its set, and
        # array_distinct is the priciest part of the shingle kernel
        F.explode(shingles(F.col(text_col), n, distinct=False)).alias("sh"),
    ).select(
        "id",
        # materialized ONCE per shingle (a projection before the agg) so the
        # 16 min() children are plain arithmetic, not 16 re-evaluations of
        # the digest subtree
        (
            F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("long")
            % F.lit(MINHASH_P)
        ).alias("base"),
    )
    mins = [
        F.min(
            (F.lit(31 * i + 17) * F.col("base") + F.lit(101 * i + 7))
            % F.lit(MINHASH_P)
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return based.groupBy("id").agg(*mins)


def band_bucket_expr(b: int, num_hashes: int = 16, bands: int = 4):
    """THE band-bucket hash for band b over mh_* signature columns —
    md5('<b>_<mh..>' joined with '_'). Single definition shared by the
    batch path (lsh_buckets), the incremental index (build_lsh_index) and
    the CDC-maintained index (operators.derived.lsh_index_delta): any
    layout change here re-keys every consumer together, so an index built
    by one path always matches probes from another."""
    rows_per_band = num_hashes // bands
    cols = [
        F.col(f"mh_{b * rows_per_band + r}").cast("string")
        for r in range(rows_per_band)
    ]
    return F.md5(F.concat_ws("_", F.lit(str(b)), *cols))


def lsh_buckets(
    sig: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Banded bucket rows (id, band, bucket) from a signature table: the
    join key space of LSH, and the persistable state of an incremental
    index (see build_lsh_index). One narrow projection + explode."""
    band_cols = [
        band_bucket_expr(b, num_hashes, bands).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    return banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    sig: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Banded LSH: hash each band of the signature; docs sharing any band
    bucket are candidate pairs.

    This is the sub-quadratic scale path: the self-join runs per (band,
    bucket) — at 10^9 docs the shuffle key is the band hash, and only true
    near-dups (plus a tunable false-positive tail) meet in a bucket.
    """
    stacked = lsh_buckets(sig, num_hashes, bands)
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates refined by estimated Jaccard (signature agreement)."""
    sig = minhash_signature(df, text_col, n, num_hashes, id_col)
    # sig feeds three consumers (banding + both refinement joins) and AQE's
    # broadcast conversion defeats identical-subplan exchange reuse, so the
    # shingle-explode+digest mass would run 3x. Lazy local checkpoint
    # materializes it once; blocks are freed when the result is released.
    sig = sig.localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(sig, num_hashes, bands)
    a = sig.alias("sa")
    b = sig.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.mh_{i}") == F.col(f"sb.mh_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cands.join(a, cands.id_a == F.col("sa.id"))
        .join(b, cands.id_b == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(num_hashes), 6).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )


def build_lsh_index(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Persistable LSH index rows for a corpus: (id, band, bucket,
    sig array<long>). `bands` rows per document — write them to the lake
    partitioned/bucketed by (band, bucket) and the index APPENDS: indexing
    a new batch never touches existing rows, which is what makes
    streaming/CDC-driven dedup O(new), not O(corpus) (the batch
    alternative recomputes every signature on every arrival).

    The signature rides along denormalized so a probe can refine
    candidates to estimated Jaccard without a second join back to a
    signature table."""
    sig = minhash_signature(df, text_col, n, num_hashes, id_col)
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig")
    return lsh_buckets(sig, num_hashes, bands).join(
        sig.select("id", sig_arr), "id"
    )


def incremental_lsh_matches(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup detection for an ARRIVING batch against an existing
    corpus index (build_lsh_index rows) — the CDC-side of dedup: as
    inserts stream in, find which existing documents they duplicate,
    without re-signaturing the corpus.

    Work is O(new docs + bucket collisions): one signature pass over the
    new batch only, one equi-join on (band, bucket) against the index
    (bucket-pruned if the index is stored bucketed on that key), and the
    Jaccard refinement is a zip_with over the denormalized signatures —
    no joins back to the corpus, no corpus x corpus anything. Returns
    (new_id, old_id, est_jaccard) distinct pairs at/above threshold.

    `max_bucket_size` is the skew guard for boilerplate-heavy corpora: a
    bucket shared by 10^6 near-identical docs (license headers, templated
    pages) would turn the probe join into a hot partition. Buckets whose
    INDEX population exceeds the cap are dropped from the probe (the
    standard saturated-bucket rule in production LSH) — a doc matching
    only through a saturated bucket is boilerplate-dup by definition and
    is better handled by an exact/passage pass. The cap costs one
    map-side-combined count over the index keyed exactly like the join."""
    sig = minhash_signature(new_docs, text_col, n, num_hashes, id_col)
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig")
    probes = lsh_buckets(sig, num_hashes, bands).join(
        sig.select("id", sig_arr), "id"
    )
    old = index.select(
        F.col("band"),
        F.col("bucket"),
        F.col("id").alias("old_id"),
        F.col("sig").alias("old_sig"),
    )
    if max_bucket_size is not None:
        ok_buckets = (
            index.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_bucket_size)
            .select("band", "bucket")
        )
        old = old.join(ok_buckets, ["band", "bucket"], "left_semi")
    hits = (
        probes.join(old, ["band", "bucket"])
        .where(F.col("id") != F.col("old_id"))
        .select(
            F.col("id").alias("new_id"), "old_id", "sig", "old_sig"
        )
        .distinct()
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig", "old_sig", lambda a, b: a == b),
            lambda x: x,
        )
    )
    return (
        hits.withColumn(
            "est_jaccard", F.round(agree / F.lit(num_hashes), 6)
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("new_id", "old_id", "est_jaccard")
    )


def containment_refine(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-set refinement for CANDIDATE pairs: true Jaccard plus the
    ASYMMETRIC containment scores |A∩B|/|A| and |A∩B|/|B| that symmetric
    similarity misses — a short document wholly quoted inside a long one
    has low Jaccard but containment 1.0 (the quote/boilerplate-inclusion
    case ExactSubstr counts at span level; this scores it at doc level).

    Scale shape: the pair list is the (small) LSH candidate output, so
    the shingle stream is first semi-joined down to documents that
    appear in any pair — exact set work is O(candidate docs' shingles),
    never O(corpus); overlap counting is one join keyed (pair, shingle)
    with map-side combine; sizes ride a broadcast."""
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        _spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), n)).alias("sh"),
        )
        .join(ids, "id", "left_semi")
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    ov = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_ov"))
    )
    sa = F.broadcast(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("_na")))
    sb = F.broadcast(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("_nb")))
    o = F.coalesce(F.col("_ov"), F.lit(0))
    return (
        pairs.join(ov, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(o / (F.col("_na") + F.col("_nb") - o), 6).alias(
                "exact_jaccard"
            ),
            F.round(o / F.col("_na"), 6).alias("containment_a"),
            F.round(o / F.col("_nb"), 6).alias("containment_b"),
        )
    )


# ---------------------------------------------------------------- SimHash

def simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint: bit b = majority vote of token-hash bit b.

    Declarative form: explode tokens, per-bit ±1 votes, groupBy(id) sum,
    sign -> bit. bits=16 keeps the oracle SQL tractable; the operator is
    O(tokens) with a map-side-combinable agg, so it scales linearly.
    """
    toks = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    h = _md5_long(F.col("tok"), salt="simhash#")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sig = sum(
        F.when(F.col(f"v_{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        for i in range(bits)
    )
    return agg.select("id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance.

    Join strategy: band the fingerprint into (max_hamming+1) chunks — by
    pigeonhole, any pair within max_hamming agrees on at least one full
    chunk, so the join key is (chunk_idx, chunk_value), never all-pairs.
    """
    sh = simhash(df, text_col, bits, id_col)
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    stacked = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash", "cv.chunk", "cv.val")
    a, b = stacked.alias("a"), stacked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming)


# -------------------------------------------------- duplicate components

def duplicate_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs: each doc gets the
    canonical (min) id of its transitive duplicate group.

    Near-dup PAIRS are not dedup GROUPS: A~B and B~C must collapse to one
    group {A,B,C} before picking survivors, or the pipeline keeps B twice.
    Implemented as iterative min-label propagation (the standard
    Pregel-style CC): labels converge in O(diameter) rounds; duplicate
    clusters are shallow (diameter ~ a few hops), so 3-5 rounds suffice in
    practice and `max_iter` is a safety bound. Each round is one equi-join
    + groupBy-min — all shuffle-partitioned by id, no driver data. At
    10^9-edge scale swap in alternating small-star/large-star (Kiveris et
    al.) which contracts the same result in fewer, cheaper rounds; the
    fixpoint (min label per component) is IDENTICAL and deterministic,
    which is what the DuckDB recursive-CTE oracle checks.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    changed = 0
    for _ in range(max_iter):
        prop = edges.join(labels, edges["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("label")
        )
        new_labels = (
            prop.union(labels.select("id", "label"))
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); the component diameter "
            f"exceeds max_iter — raise max_iter or switch to "
            f"large-star/small-star contraction"
        )
    # Materialize with truncated lineage, then release every cached
    # intermediate — callers get a self-contained result, no cache leak.
    out = labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("canonical_id")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    edges.unpersist()
    return out


def keep_best_duplicates(
    components: DataFrame,
    quality: DataFrame,
    metric_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-BEST canonical selection over duplicate groups.

    Production dedup keeps the highest-quality member of each transitive
    duplicate group (longest, cleanest, newest — whatever `metric_col`
    encodes), not the smallest id. Input: `components` from
    duplicate_components (doc_id, canonical_id) and a `quality` frame
    carrying (id_col, metric_col). Output adds per row the group's
    `keep_id` and a `kept` flag.

    Plan shape: one join on the doc id (both sides corpus-partitioned) +
    one groupBy(canonical_id) whose max_by aggregate is map-side
    combinable — group size never materializes anywhere. Ties on the
    metric break to the SMALLER doc id (deterministic, engine-portable).
    """
    j = components.join(quality.select(id_col, metric_col), id_col)
    best = j.groupBy("canonical_id").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col(metric_col), (-F.col(id_col)).alias("neg")),
        ).alias("keep_id")
    )
    return (
        components.join(best, "canonical_id")
        .withColumn("kept", F.col(id_col) == F.col("keep_id"))
        .select(id_col, "canonical_id", "keep_id", "kept")
    )


# ------------------------------------------------- exact substring spans

def duplicated_window_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-substring accounting, the ExactSubstr dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models Better"
    (ACL 2022), re-expressed at token-window granularity so it runs as a
    linear Spark plan instead of a suffix array.

    Every w-token sliding window is hashed; windows whose hash occurs in
    >= min_docs DISTINCT documents are duplicate hits. Per document,
    overlapping/adjacent hits (gap <= w) merge into maximal spans via
    gaps-and-islands — exactly the span-clipping step of the paper — and
    the output reports, per doc: n_windows, n_dup_windows, n_spans,
    dup_tokens (sum of merged span lengths in tokens), dup_frac.

    Scale: tokenize+window-hash is one narrow projection; duplicate
    detection is one shuffle keyed on the 60-bit window hash with map-side
    combine; span merge shuffles only the HIT windows per doc (duplicate
    mass, not corpus mass). No suffix array, no pairwise comparison.
    Docs shorter than w tokens have no windows and produce no row.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    n_windows = n - w + 1
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda i: _md5_long(F.concat_ws(" ", F.slice(toks, i, w)), salt="xs#"),
    )
    # materialize the hash array in its own projection (see functions.code
    # winnow_fingerprints: inlining into the consumer re-evaluates the md5
    # stream per reference — interpreted HOF, no CSE)
    hdf = _spread(df).select(
        F.col(id_col).alias("id"),
        F.when(n_windows >= 1, hashes).otherwise(F.array()).alias("_hs"),
    )
    occ = hdf.select(
        "id", F.posexplode("_hs").alias("pos", "h")
    )  # pos is 0-based window start
    dup_h = (
        occ.select("id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )
    hits = occ.join(dup_h, "h").select("id", "pos")
    win = Window.partitionBy("id").orderBy("pos")
    islands = (
        hits.withColumn("prev", F.lag("pos").over(win))
        .withColumn(
            "new_span",
            (F.col("prev").isNull() | (F.col("pos") - F.col("prev") > w))
            .cast("int"),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                win.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("id", "span_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            (F.max("pos") - F.min("pos") + w).alias("span_tokens"),
        )
    )
    per_doc = islands.groupBy("id").agg(
        F.sum("n_hits").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    totals = hdf.select("id", F.size("_hs").alias("n_windows")).where(
        F.col("n_windows") > 0
    )
    return (
        totals.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows"), 6
            ),
        )
    )
