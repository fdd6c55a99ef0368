"""Incremental LSH index (dedup.build_lsh_index / incremental_lsh_matches):
probing an arriving batch against a prebuilt index must find EXACTLY the
pairs a full batch recompute finds between the batch and the corpus —
the invariant that makes CDC-driven dedup trustworthy."""

from pyspark.sql import functions as F

from mariadb_cdc_spark.functions.dedup import (
    build_lsh_index,
    incremental_lsh_matches,
    minhash_dedup_pairs,
)

SF = "/root/testdata/sf0.001"


def test_incremental_equals_batch_restriction(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)

    index = build_lsh_index(old, n=3, num_hashes=16, bands=4)
    inc = incremental_lsh_matches(new, index, n=3, num_hashes=16, bands=4,
                                  threshold=0.5)
    got = {(r.new_id, r.old_id, r.est_jaccard) for r in inc.collect()}

    batch = minhash_dedup_pairs(docs, n=3, num_hashes=16, bands=4,
                                threshold=0.5)
    want = set()
    for r in batch.collect():
        a_new, b_new = r.id_a % 10 == 0, r.id_b % 10 == 0
        if a_new and not b_new:
            want.add((r.id_a, r.id_b, r.est_jaccard))
        elif b_new and not a_new:
            want.add((r.id_b, r.id_a, r.est_jaccard))
    assert got == want and got  # non-vacuous


def test_index_appends_cover_second_batch(spark):
    """Index old, probe batch1, append batch1's index rows, probe batch2:
    batch2's matches against (old + batch1) come out of the UNION of
    index rows — no corpus recompute."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 10 > 1)
    b1 = docs.where(F.col("doc_id") % 10 == 0)
    b2 = docs.where(F.col("doc_id") % 10 == 1)

    idx = build_lsh_index(old, n=3, num_hashes=16, bands=4)
    idx2 = idx.unionByName(build_lsh_index(b1, n=3, num_hashes=16, bands=4))
    inc = incremental_lsh_matches(b2, idx2, n=3, num_hashes=16, bands=4,
                                  threshold=0.5)
    got = {(r.new_id, r.old_id) for r in inc.collect()}

    batch = minhash_dedup_pairs(docs, n=3, num_hashes=16, bands=4,
                                threshold=0.5)
    want = set()
    for r in batch.collect():
        a2, b2_ = r.id_a % 10 == 1, r.id_b % 10 == 1
        if a2 and not b2_:
            want.add((r.id_a, r.id_b))
        elif b2_ and not a2:
            want.add((r.id_b, r.id_a))
    assert got == want


def test_saturated_bucket_cap(spark):
    """A bucket holding more than max_bucket_size index entries is dropped
    from the probe; normal buckets still match."""
    from mariadb_cdc_spark.functions.dedup import (
        build_lsh_index,
        incremental_lsh_matches,
    )

    boiler = "permission is hereby granted free of charge to any person"
    uniq = "completely different words describing a unique document body"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(20)] + [(100, uniq)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(200, boiler), (201, uniq)], "doc_id long, text string"
    )
    idx = build_lsh_index(old)
    uncapped = incremental_lsh_matches(new, idx, threshold=0.5)
    assert uncapped.where(F.col("new_id") == 200).count() == 20
    capped = incremental_lsh_matches(new, idx, threshold=0.5,
                                     max_bucket_size=5)
    got = {(r.new_id, r.old_id) for r in capped.collect()}
    assert (201, 100) in got          # unique doc still matches its source
    assert not any(n == 200 for n, _ in got)  # boilerplate bucket saturated


def test_containment_scores_hand_case(spark):
    """A short doc fully contained in a long one: containment 1.0 on the
    short side, exact Jaccard well below it."""
    from mariadb_cdc_spark.functions.dedup import containment_refine

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = quote + " while seventeen additional tokens pad this text out to a much longer document body"
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = containment_refine(docs, pairs, n=3).collect()[0]
    # quote has 7 shingles (9 tokens, n=3), all present in long_doc
    assert r.containment_a == 1.0
    assert r.containment_b < 1.0
    assert r.exact_jaccard == r.containment_b  # A subset of B
    # zero-overlap candidate pair survives with 0 scores
    docs2 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    z = containment_refine(docs2, pairs, n=3).collect()[0]
    assert (z.exact_jaccard, z.containment_a, z.containment_b) == (0.0, 0.0, 0.0)
