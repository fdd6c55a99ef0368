"""Training-data operators: local sanity tests (the value-exact gate vs
DuckDB runs via tools/parity.py and the driver's CORRECTNESS check)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mariadb_cdc_spark.functions.dedup import (
    exact_duplicates,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from mariadb_cdc_spark.functions.multimodal import (
    featurize,
    frame_sample_plan,
    synthesize_media,
)
from mariadb_cdc_spark.functions.similarity import brute_force_topk, ivf_topk
from mariadb_cdc_spark.functions.text import language_id, quality_features


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "srcX", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_duplicates_groups(spark):
    docs = _docs(
        spark,
        [("the cat  sat", "en"), ("The cat sat", "en"), ("unique words here", "en")],
    )
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["group_size"] == 2
    assert groups[0]["canonical_id"] == 0
    assert groups[0]["members"] == [0, 1]


def test_ngram_jaccard_finds_near_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [(base, "en"), (base + " lambda", "en"), ("totally different text", "en")],
    )
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] > 0.8


def test_minhash_lsh_agrees_with_exact(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [(base, "en"), (base + " lambda", "en"), ("totally different text", "en")],
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.5).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 1)}


def test_simhash_near_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [(base, "en"), (base + " mu", "en"), ("qq ww ee rr tt yy uu", "en")],
    )
    sh = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert bin(sh[0] ^ sh[1]).count("1") < bin(sh[0] ^ sh[2]).count("1")
    near = simhash_near_pairs(docs, max_hamming=3).collect()
    assert all({p["id_a"], p["id_b"]} != {0, 2} for p in near)


def test_quality_and_langid(spark):
    docs = _docs(
        spark,
        [
            ("the cat and the dog went to the park in the morning", "en"),
            ("el perro de la casa que en los dias del verano", "es"),
            ("!!! ,,, ...", "en"),
        ],
    )
    q = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert q[0]["passes_quality"] is True
    assert q[2]["passes_quality"] is False  # punct-only
    lid = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert lid[0]["pred_lang"] == "en" and lid[0]["agrees"]
    assert lid[1]["pred_lang"] == "es"
    assert lid[2]["pred_lang"] == "und"


def test_topk_shapes_and_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    bf = brute_force_topk(emb, q, k=5)
    rows = bf.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        sims = [r["sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rs)
    # IVF is a subset search: its neighbors' sims never beat brute force rank-1
    ivf = {(r["query_id"], r["rank"]): r["sim"] for r in ivf_topk(emb, q, k=5).collect()}
    bfm = {(r["query_id"], r["rank"]): r["sim"] for r in rows}
    for qid in by_q:
        assert ivf[(qid, 1)] <= bfm[(qid, 1)]


def test_multimodal_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = synthesize_media(docs)
    feats = featurize(media, dim=8).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert len(r["payload_sha"]) == 64
        assert r["n_bytes"] > 0
    plan = frame_sample_plan(media, every_ms=1000)
    vids = media.where(F.col("kind") == "video").count()
    assert plan.count() >= vids  # at least frame 0 per video
    assert plan.groupBy("media_id").count().count() == vids


def test_decode_stub_raises():
    import pytest as _pytest

    from mariadb_cdc_spark.functions.multimodal import _decode_image_stub

    with _pytest.raises(NotImplementedError):
        _decode_image_stub(b"\x89PNG")


def test_duplicate_components_transitive_chain(spark):
    """A~B, B~C, D~E: components {A,B,C} and {D,E}; canonical = min id."""
    from mariadb_cdc_spark.functions.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 9)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in duplicate_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


# --------------------------------------------------- real media codecs (r2)

def test_wav_roundtrip_and_malformed():
    import numpy as np
    import pytest
    from mariadb_cdc_spark.functions import multimodal as mm

    wave = np.where((np.arange(1600) // 4) % 2 == 0, 2500, -2500)
    f = mm.decode_wav(mm.encode_wav(wave, 8000))
    assert f["sample_rate"] == 8000
    assert f["n_samples"] == 1600
    assert f["duration_ms"] == 200
    assert f["peak"] == 2500.0 and f["rms"] == 2500.0
    with pytest.raises(ValueError):
        mm.decode_wav(b"not a wav")


def test_ppm_roundtrip_resize_and_stub_intact():
    import numpy as np
    import pytest
    from mariadb_cdc_spark.functions import multimodal as mm

    px = np.zeros((5, 7, 3), dtype=np.uint8)
    px[..., 0] = 9
    back = mm.decode_ppm(mm.encode_ppm(px))
    assert (back == px).all()
    th = mm.resize_ppm(back, 2)
    assert th.shape == (3, 4, 3)  # ceil semantics
    with pytest.raises(ValueError):
        mm.decode_ppm(b"JFIF....")
    # compressed formats remain explicitly stubbed
    with pytest.raises(NotImplementedError):
        mm._decode_image_stub(b"\xff\xd8\xff")


def test_png_roundtrip_full_filter_matrix():
    """encode_png cycles scanline filters (y % 5), so a single round-trip
    of a tall-enough gradient exercises None/Sub/Up/Average/Paeth decode."""
    import numpy as np
    import pytest
    from mariadb_cdc_spark.functions import multimodal as mm

    h, w = 11, 13  # >= 5 rows -> all five filter types present
    arr = (
        np.arange(h * w * 3, dtype=np.int64) ** 2 * 2654435761 % 256
    ).reshape(h, w, 3).astype(np.uint8)
    for cyc in (True, False):
        back = mm.decode_png(mm.encode_png(arr, filter_cycle=cyc))
        assert (back == arr).all()
    # degenerate dims
    for shape in ((1, 1, 3), (1, 9, 3), (9, 1, 3)):
        px = (np.arange(np.prod(shape)) * 31 % 256).reshape(shape).astype(
            np.uint8
        )
        assert (mm.decode_png(mm.encode_png(px)) == px).all()
    # container errors are loud, not silent
    with pytest.raises(ValueError):
        mm.decode_png(b"GIF89a....")
    good = mm.encode_png(arr)
    corrupted = bytearray(good)
    corrupted[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError):
        mm.decode_png(bytes(corrupted))


def test_png_stats_distributed(spark):
    """synthesize -> decode in executors; sums match the gradient's closed
    form (the same formula the DuckDB oracle uses)."""
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions import multimodal as mm

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    got = {
        r["media_id"]: r
        for r in mm.png_stats(mm.synthesize_png_media(docs)).collect()
    }
    assert set(got) == set(range(12))
    for d in (0, 5, 11):
        w, h = 16 + d % 48, 16 + (d * 3) % 32
        assert (got[d]["width"], got[d]["height"]) == (w, h)
        exp_r = sum(
            (x + 3 * y + d) % 256 for x in range(w) for y in range(h)
        )
        exp_b = sum(
            (x + 3 * y + 14 + d) % 256 for x in range(w) for y in range(h)
        )
        assert got[d]["sum_r"] == exp_r and got[d]["sum_b"] == exp_b


def test_media_features_distributed(spark):
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions import multimodal as mm

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    media = mm.synthesize_real_media(docs)
    au = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    im = {r["media_id"]: r for r in mm.image_stats(media).collect()}
    assert set(au) == {d for d in range(20) if d % 2 == 0}
    assert set(im) == {d for d in range(20) if d % 2 == 1}
    assert au[4]["rms"] == float(1000 + 4 * 37 % 20000)
    assert im[3]["width"] == 16 + 3 % 48 and im[3]["mean_g"] == float(21)


# ------------------------------------------- sampling + PII redaction (r2)

def test_hash_sample_deterministic_under_repartition(spark):
    """Membership must not change with partitioning — the property
    df.sample() lacks and the whole reason these operators exist."""
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions import sampling as sp

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in sp.hash_sample(docs, ["doc_id"], 3000).collect()}
    b = {
        r["doc_id"]
        for r in sp.hash_sample(
            docs.repartition(17), ["doc_id"], 3000
        ).collect()
    }
    assert a == b
    assert 0.25 < len(a) / 2000 < 0.35  # ~30% +- sampling noise
    # different salts give (near-)independent member sets
    c = {
        r["doc_id"]
        for r in sp.hash_sample(docs, ["doc_id"], 3000, salt="other").collect()
    }
    assert c != a


def test_train_eval_split_disjoint_exhaustive(spark):
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions import sampling as sp

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    s = sp.train_eval_split(docs, ["doc_id"], eval_bp=2000)
    counts = {r["split"]: r["n"] for r in
              s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["eval"] + counts["train"] == 1000
    assert 0.15 < counts["eval"] / 1000 < 0.25


def test_stratified_sample_rates(spark):
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions import sampling as sp

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zz").alias("lang"),
    )
    s = sp.stratified_sample(
        docs, "lang", {"en": 5000}, ["doc_id"], default_bp=0
    )
    got = {r["lang"]: r["n"] for r in
           s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "zz" not in got            # default 0 bp -> dropped entirely
    assert 0.4 < got["en"] / 2000 < 0.6


def test_redact_pii_counts_and_replacement(spark):
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions.text import redact_pii

    rows = [
        (1, "mail a.b+c@x-corp.io and 192.168.0.1 then 555-123-4567 end"),
        (2, "no pii here, just 3.14 and v1.2"),
        (3, "two mails: a@b.com b@c.org; ip 10.0.0.7; tel 800.555.1234"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 1, 1)
    assert got[1]["text_redacted"] == (
        "mail <EMAIL> and <IP> then <PHONE> end"
    )
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 0, 0)
    assert got[2]["text_redacted"] == rows[1][1]
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (2, 1, 1)
    assert "<EMAIL>" in got[3]["text_redacted"]
    assert "a@b.com" not in got[3]["text_redacted"]


def test_pack_sequences_plan_properties(spark):
    """Concat-and-chunk packing: offsets are the exclusive running token sum
    per shard, sequence ids are contiguous chunks of the shard stream, and
    the whole plan is partitioning-independent."""
    import pandas as pd
    from pyspark.sql import functions as F
    from mariadb_cdc_spark.functions import sampling as sp

    docs = spark.range(200).select(
        F.col("id").cast("int").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, 90) + 10).cast("long").alias("n_tok"),
    )
    packed = sp.pack_sequences(
        docs, "n_tok", budget=100, key_cols=["doc_id"], n_shards=4
    ).toPandas()

    for _, g in packed.groupby("pack_shard"):
        g = g.sort_values("pack_offset").reset_index(drop=True)
        # exclusive cumsum reproduces the offsets exactly
        assert (
            g["pack_offset"] == g["n_tok"].cumsum().shift(fill_value=0)
        ).all()
        # seq id is the offset's chunk index, non-decreasing and gap-free
        assert (g["pack_seq"] == g["pack_offset"] // 100).all()
        seqs = g["pack_seq"].unique()
        assert list(seqs) == list(range(len(seqs)))

    again = (
        sp.pack_sequences(
            docs.repartition(13), "n_tok", budget=100,
            key_cols=["doc_id"], n_shards=4,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again.equals(
        packed.sort_values("doc_id").reset_index(drop=True)
    )


def test_repetition_features_hand_cases(spark):
    from mariadb_cdc_spark.functions.text import repetition_features

    docs = spark.createDataFrame(
        [
            (0, "a b a b a"),      # 5 toks, 2 distinct; bigrams: ab x2, ba x2
            (1, "x y z"),          # all distinct; bigrams xy, yz each once
            (2, "solo"),           # 1 token: no bigrams
            (3, ""),               # empty
            (4, "w w w w"),        # max repetition
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_word_frac"], r["top_bigram_frac"])
        for r in repetition_features(docs).collect()
    }
    assert got[0] == (5, round(1 - 2 / 5, 6), 0.5)
    assert got[1] == (3, 0.0, 0.5)
    assert got[2] == (1, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0)
    assert got[4] == (4, 0.75, 1.0)


def test_passage_duplicates_hand_case(spark):
    from mariadb_cdc_spark.functions.dedup import passage_duplicates

    boiler = " ".join(f"b{i}" for i in range(4))  # one shared 4-token passage
    uniq = lambda d, k: " ".join(f"u{d}_{i}" for i in range(k))  # noqa: E731
    docs = _docs(
        spark,
        [
            (boiler + " " + uniq(0, 4), "en"),  # passages: [boiler, uniq]
            (boiler + " " + uniq(1, 4), "en"),  # passages: [boiler, uniq]
            (uniq(2, 8), "en"),                 # 2 unique passages
            ("", "en"),                          # no tokens -> no row
        ],
    )
    out = {
        r["doc_id"]: r
        for r in passage_duplicates(docs, chunk_tokens=4).collect()
    }
    assert set(out) == {0, 1, 2}
    for d in (0, 1):
        assert out[d]["n_passages"] == 2
        assert out[d]["n_dup_passages"] == 1
        assert abs(out[d]["dup_passage_ratio"] - 0.5) < 1e-9
    assert out[2]["n_passages"] == 2 and out[2]["n_dup_passages"] == 0


def test_tfidf_topk_hand_case(spark):
    import math

    from mariadb_cdc_spark.functions.text import tfidf_topk

    docs = _docs(
        spark,
        [
            ("apple apple banana shared", "en"),
            ("cherry shared", "en"),
            ("shared shared shared", "en"),
        ],
    )
    out = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=1 -> ln(3);
    # shared df=3 -> idf 0, never ranks above them
    top0 = sorted(by_doc[0], key=lambda r: r["rank"])
    assert [r["term"] for r in top0] == ["apple", "banana"]
    assert abs(top0[0]["tfidf"] - round(2 * math.log(3), 6)) < 1e-9
    # doc 2 has ONLY the idf-0 term: still returned (rank 1, score 0)
    assert [r["term"] for r in by_doc[2]] == ["shared"]
    assert by_doc[2][0]["tfidf"] == 0.0


def test_bigram_logprob_hand_case(spark):
    import math

    from mariadb_cdc_spark.functions.text import bigram_logprob

    # corpus: "a b a b" + "a b" + "x" (single token -> no row)
    docs = _docs(spark, [("a b a b", "en"), ("a b", "en"), ("x", "en")])
    out = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.7).collect()}
    assert set(out) == {0, 1}
    # counts: uni a=3 b=3 x=1, T=7; bigrams: (a,b)=3, (b,a)=1
    lam, T = 0.7, 7
    p_ab = lam * (3 / 3) + 0.3 * (3 / T)
    p_ba = lam * (1 / 3) + 0.3 * (3 / T)
    exp0 = round(-(2 * math.log2(p_ab) + math.log2(p_ba)) / 3, 6)
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["bits_per_bigram"] - exp0) < 1e-9
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["bits_per_bigram"] - round(-math.log2(p_ab), 6)) < 1e-9


def test_embedding_diversity_hand_case(spark):
    from mariadb_cdc_spark.functions.similarity import embedding_diversity

    # label 0: identical vectors -> sim-to-centroid exactly 1
    # label 1: two orthogonal vectors -> centroid at 45deg, sim ~0.7071
    rows = [
        (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 1), (3, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in embedding_diversity(emb).collect()}
    assert out[0]["n_vectors"] == 2
    assert out[0]["mean_sim_to_centroid"] == 1.0
    assert out[1]["n_vectors"] == 2
    assert abs(out[1]["mean_sim_to_centroid"] - 0.7071) < 1e-9
    assert abs(out[1]["min_sim_to_centroid"] - 0.7071) < 1e-9


def test_hll_distinct_rollup_union_is_lossless(spark):
    """Sketch contract: union-of-daily-sketches gives the IDENTICAL
    estimate as one direct sketch over everything (HLL register merge is
    lossless at equal lg_k), and estimates sit near exact counts."""
    from mariadb_cdc_spark.functions.sketches import (
        distinct_rollup,
        rollup_union,
    )

    rows = [(d, f"u{u % (50 + 100 * d)}") for d in range(4) for u in range(500)]
    df = spark.createDataFrame(rows, "day int, user string")

    daily = distinct_rollup(df, ["day"], "user").cache()
    exact = {
        r["day"]: r["n"]
        for r in df.groupBy("day").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).countDistinct("user").alias("n")
        ).collect()
    }
    for r in daily.collect():
        assert abs(r["n_distinct_est"] - exact[r["day"]]) <= 0.05 * exact[r["day"]]

    merged = rollup_union(daily, []).collect()[0]
    direct = distinct_rollup(df, [], "user").collect()[0]
    assert merged["n_distinct_est"] == direct["n_distinct_est"]
    daily.unpersist()


def test_jpeg_codec_roundtrip_and_containment():
    """Baseline JPEG codec (functions/jpeg.py): lossy roundtrip within the
    contract bound on smooth AND noisy inputs, grayscale replication, odd
    (non-multiple-of-8) dimensions, corrupt-payload containment, and loud
    rejection of non-baseline frames."""
    import numpy as np
    import pytest

    from mariadb_cdc_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from mariadb_cdc_spark.functions.multimodal import _jpeg_truth

    # smooth ground truth at quality 90: bounded reconstruction error
    for d in (0, 21, 194, 337):  # includes the worst measured ids
        t = _jpeg_truth(d)
        px = decode_jpeg(encode_jpeg(t, 90))
        assert px.shape == t.shape
        err = np.abs(px.astype(int) - t.astype(int))
        assert err.max() <= 24 and err.mean() <= 4.0

    # noise at quality 100 (all-ones quant): only DCT rounding remains
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, 100))
    assert np.abs(out.astype(int) - noisy.astype(int)).max() <= 8

    # odd dimensions survive the 8-pad/crop cycle
    odd = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, 95)).shape == (13, 9, 3)

    # grayscale encodes 1-component and decodes replicated to 3 channels
    g = (np.arange(20 * 16).reshape(20, 16) % 200).astype(np.uint8)
    og = decode_jpeg(encode_jpeg(g, 95))
    assert og.shape == (20, 16, 3)
    assert (og[:, :, 0] == og[:, :, 1]).all()

    # containment: bad magic, truncation, malformed scan script,
    # genuinely-unsupported frame type (arithmetic coding)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    good = encode_jpeg(_jpeg_truth(3), 90)
    with pytest.raises((ValueError, IndexError, Exception)):
        decode_jpeg(good[: len(good) // 3])
    flipped = bytearray(good)
    sof = flipped.find(b"\xff\xc0")
    flipped[sof + 1] = 0xC2  # SOF0 -> SOF2 but scan header stays Ss=0,Se=63
    with pytest.raises(ValueError):  # illegal progressive scan script
        decode_jpeg(bytes(flipped))
    arith = bytearray(good)
    arith[sof + 1] = 0xC9  # SOF9: arithmetic-coded sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))


def test_progressive_jpeg_roundtrip():
    """Progressive (SOF2) encode/decode: successive-approximation DC + AC
    first/refinement scans with EOB-run coding must reconstruct EXACTLY the
    same pixels as the baseline path (both carry identical quantized
    coefficients), across smooth, noisy, sparse, constant, odd-dimension,
    and grayscale inputs."""
    import numpy as np

    from mariadb_cdc_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mariadb_cdc_spark.functions.multimodal import _jpeg_truth

    rng = np.random.default_rng(42)
    cases = [_jpeg_truth(d) for d in (0, 21, 337)]
    cases.append(np.full((64, 80, 3), 130, dtype=np.uint8))  # EOBRUN-heavy
    sparse = np.full((96, 128, 3), 128, dtype=np.uint8)
    for _ in range(40):
        y, x = rng.integers(0, 96), rng.integers(0, 128)
        sparse[y, x] = rng.integers(0, 256, 3)
    cases.append(sparse)
    cases.append(rng.integers(0, 256, (72, 56, 3), dtype=np.uint8))  # noise
    cases.append(rng.integers(0, 256, (13, 9, 3), dtype=np.uint8))  # odd
    for q in (35, 90):
        for t in cases:
            prog = decode_jpeg(encode_jpeg_progressive(t, q))
            base = decode_jpeg(encode_jpeg(t, q))
            assert (prog == base).all()

    g = (np.arange(20 * 16).reshape(20, 16) % 200).astype(np.uint8)
    og = decode_jpeg(encode_jpeg_progressive(g, 95))
    assert og.shape == (20, 16, 3)
    assert (og[:, :, 0] == og[:, :, 1]).all()


def test_jpeg_stats_distributed(spark):
    """jpeg_stats over the synthesized corpus: every row decodes, every row
    meets the quality bound, dimensions match the closed form; a corrupt
    payload degrades to a null-feature row (poison-pill containment)."""
    import pandas as pd

    from mariadb_cdc_spark.functions import multimodal as mm

    docs = spark.range(40).selectExpr("id as doc_id")
    media = mm.synthesize_jpeg_media(docs)
    rows = {r["media_id"]: r for r in mm.jpeg_stats(media).collect()}
    assert len(rows) == 40
    for d, r in rows.items():
        assert r["decode_ok"] and r["within_tol"]
        assert r["width"] == 16 + d % 24
        assert r["height"] == 16 + (d * 3) % 16

    corrupt = spark.createDataFrame(
        pd.DataFrame({"media_id": [99], "payload": [b"\xff\xd8garbage"]})
    )
    (bad,) = mm.jpeg_stats(corrupt).collect()
    assert bad["media_id"] == 99 and bad["decode_ok"] is None


def test_progressive_jpeg_in_media_flow(spark):
    """Progressive (SOF2) JPEGs decode for REAL through the distributed
    media_jpeg_stats flow — same quality bound as baseline — while a
    genuinely-unsupported variant (arithmetic-coded SOF9) still degrades to
    a null-feature row, never a task failure (contained capability
    boundary, _DECODE_ERRORS)."""
    import pandas as pd

    from mariadb_cdc_spark.functions import multimodal as mm
    from mariadb_cdc_spark.functions.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mariadb_cdc_spark.functions.multimodal import _jpeg_truth

    prog = encode_jpeg_progressive(_jpeg_truth(7), 90)
    good = encode_jpeg(_jpeg_truth(8), 90)
    arith = bytearray(good)
    arith[arith.find(b"\xff\xc0") + 1] = 0xC9  # arithmetic-coded SOF9
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [7, 8, 9],
             "payload": [prog, good, bytes(arith)]}
        )
    )
    rows = {r["media_id"]: r for r in mm.jpeg_stats(media).collect()}
    assert rows[7]["decode_ok"] and rows[7]["within_tol"]  # SOF2 decodes
    assert rows[8]["decode_ok"] and rows[8]["within_tol"]
    assert rows[9]["decode_ok"] is None and rows[9]["width"] is None


def test_mp4_container_roundtrip_and_containment(spark):
    """ISO-BMFF support: the skeleton writer and parser agree on every
    structural field; version-1 (64-bit) mvhd/mdhd parse too; corrupt or
    non-MP4 payloads degrade to null-feature rows through the distributed
    mp4_stats flow, never a task failure."""
    import struct

    import pandas as pd
    import pytest

    from mariadb_cdc_spark.functions import multimodal as mm

    p = mm.encode_mp4_skeleton(
        width=640, height=352, fps=30, n_frames=90, codec=b"mp4v",
        brand=b"mp42",
    )
    m = mm.parse_mp4(p)
    assert m == {
        "brand": "mp42", "codec": "mp4v", "width": 640, "height": 352,
        "duration_ms": 3000, "n_frames": 90, "fps": 30,
    }

    # version-1 mvhd (64-bit times): hand-build and parse
    mvhd_v1 = mm._full_box(
        b"mvhd", 1, 0,
        struct.pack(">QQIQ", 0, 0, 600, 1800)  # ts=600, dur=1800 -> 3000ms
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    ftyp = mm._box(b"ftyp", struct.pack(">4sI4s", b"isom", 0, b"isom"))
    v1 = ftyp + mm._box(b"moov", mvhd_v1)
    assert mm.parse_mp4(v1)["duration_ms"] == 3000

    with pytest.raises(ValueError):
        mm.parse_mp4(b"RIFF not an mp4 at all, longer than 16")
    with pytest.raises(ValueError):
        mm.parse_mp4(p[:40])  # truncated mid-moov

    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [p, b"x" * 32]})
    )
    rows = {r["media_id"]: r for r in mm.mp4_stats(media).collect()}
    assert rows[1]["codec"] == "mp4v" and rows[1]["n_frames"] == 90
    assert rows[2]["brand"] is None and rows[2]["width"] is None


def test_mp4_synthesized_corpus_closed_forms(spark):
    """mp4_stats over the synthesized corpus matches the doc_id closed
    forms the DuckDB oracle uses (the in-Spark half of media_mp4_stats)."""
    from mariadb_cdc_spark.functions import multimodal as mm

    docs = spark.range(30).selectExpr("id as doc_id")
    rows = {
        r["media_id"]: r
        for r in mm.mp4_stats(mm.synthesize_mp4_media(docs)).collect()
    }
    fps_tab = [10, 15, 24, 25, 30]
    codecs = ["avc1", "hev1", "mp4v"]
    for d, r in rows.items():
        fps = fps_tab[d % 5]
        n = 8 + d % 120
        assert r["width"] == 160 + (d % 32) * 8
        assert r["height"] == 120 + ((d * 3) % 24) * 8
        assert r["fps"] == fps and r["n_frames"] == n
        assert r["codec"] == codecs[d % 3] and r["brand"] == "isom"
        assert r["duration_ms"] == n * (90000 // fps) * 1000 // 90000


def test_mjpeg_video_frames_real_decode(spark):
    """REAL video frame extraction: Motion-JPEG MP4s decode frame-by-frame
    through the in-repo JPEG codec via the sample-table walk; an
    inter-coded (avc1) container degrades to a null-feature row and a
    corrupt sample to a per-frame null row — never a task failure."""
    import pandas as pd

    from mariadb_cdc_spark.functions import multimodal as mm

    docs = spark.range(12).selectExpr("id as doc_id")
    media = mm.synthesize_mjpeg_media(docs)
    rows = mm.extract_video_frames(media).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    assert set(by_doc) == set(range(12))
    fps_tab = [10, 15, 24, 25, 30]
    for d, rs in by_doc.items():
        assert len(rs) == 2 + d % 4
        for r in sorted(rs, key=lambda r: r["frame_idx"]):
            assert r["decode_ok"] and r["within_tol"]
            assert r["width"] == 16 + d % 24
            assert r["height"] == 16 + (d * 3) % 16
            fps = fps_tab[d % 5]
            assert r["pts_ms"] == (
                r["frame_idx"] * (90000 // fps) * 1000 // 90000
            )

    # avc1 container (no decodable samples) and a corrupt-sample MJPEG
    avc = mm.encode_mp4_skeleton(
        width=64, height=48, fps=25, n_frames=4, codec=b"avc1"
    )
    mj = bytearray(
        mm.encode_mp4_mjpeg([mm._mjpeg_frame_truth(3, 0)], fps=25)
    )
    off, size, _ = mm.mp4_sample_table(bytes(mj))[0]
    mj[off : off + 2] = b"XX"  # smash the frame's SOI
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [50, 51], "payload": [avc, bytes(mj)]})
    )
    got = {r["media_id"]: r for r in mm.extract_video_frames(bad).collect()}
    assert got[50]["frame_idx"] is None and got[50]["decode_ok"] is None
    assert got[51]["frame_idx"] == 0 and got[51]["decode_ok"] is None


def test_wav_all_depths_and_stereo():
    """WAV decode across the PCM matrix: 8/16/24/32-bit x mono/stereo
    round-trip exactly (24-bit = packed 3-byte sign extension), chunk walk
    skips LIST chunks, and non-PCM formats stay loud."""
    import struct as _struct

    import numpy as np
    import pytest
    from mariadb_cdc_spark.functions import multimodal as mm

    rng = np.random.default_rng(3)
    for bits, lim in ((8, 127), (16, 30000), (24, 8_000_000), (32, 2**30)):
        mono = rng.integers(-lim, lim, 400)
        f = mm.decode_wav(mm.encode_wav(mono, 16000, bits=bits))
        assert (f["bits"], f["n_channels"], f["n_samples"]) == (bits, 1, 400)
        assert f["peak"] == float(np.max(np.abs(mono)))
        stereo = rng.integers(-lim, lim, (300, 2))
        f2 = mm.decode_wav(mm.encode_wav(stereo, 8000, bits=bits))
        assert (f2["n_channels"], f2["n_samples"]) == (2, 300)
        assert f2["duration_ms"] == 300 * 1000 // 8000
        assert f2["rms"] == float(
            np.sqrt(np.mean(stereo.astype(np.float64) ** 2))
        )

    # LIST chunk between fmt and data parses fine (real chunk walk)
    wav = bytearray(mm.encode_wav(np.arange(-50, 50), 8000))
    lst = _struct.pack("<4sI", b"LIST", 6) + b"INFOab"
    spliced = bytes(wav[:36]) + lst + bytes(wav[36:])
    spliced = (
        spliced[:4]
        + _struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert mm.decode_wav(spliced)["n_samples"] == 100

    # IEEE-float format (3) is a declared, contained boundary
    flt = bytearray(mm.encode_wav(np.arange(10), 8000))
    flt[20] = 3
    with pytest.raises(NotImplementedError):
        mm.decode_wav(bytes(flt))


# ------------------------------------------- generic image decode (r4)


def test_bmp_roundtrip_and_variants():
    """24bpp BI_RGB round-trip incl. row padding (odd widths), top-down
    row order, and contained rejection of unsupported depths."""
    import struct as _struct

    from mariadb_cdc_spark.functions import imagefmt as im

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (3, 5), (17, 31), (2, 3)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (im.decode_bmp(im.encode_bmp(px)) == px).all()

    # top-down variant (negative height) decodes to the same pixels
    px = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    b = bytearray(im.encode_bmp(px))
    flipped = im.encode_bmp(px[::-1])
    b = bytearray(flipped)
    b[22:26] = _struct.pack("<i", -4)
    assert (im.decode_bmp(bytes(b)) == px).all()

    # 8bpp is a declared boundary, not a crash
    b = bytearray(im.encode_bmp(px))
    b[28:30] = _struct.pack("<H", 8)
    with pytest.raises(NotImplementedError):
        im.decode_bmp(bytes(b))
    with pytest.raises(ValueError):
        im.decode_bmp(b"XXnot a bmp")


def test_gif_roundtrip_including_lzw_table_reset():
    """GIF89a LZW round-trip: solid, binary, 200-color gradient big
    enough to overflow the 4096-entry LZW table (clear/reset path), and
    the <=256-color encode contract."""
    from mariadb_cdc_spark.functions import imagefmt as im

    cases = [
        np.full((5, 7, 3), 200, np.uint8),
        np.tile(
            np.array([[0, 0, 0], [255, 255, 255]], np.uint8), (20, 5, 1)
        ).reshape(40, 5, 3),
        (np.indices((200, 300)).sum(0) % 200).astype(np.uint8)[
            ..., None
        ].repeat(3, 2),
    ]
    for px in cases:
        assert (im.decode_gif(im.encode_gif(px)) == px).all()

    with pytest.raises(ValueError):
        im.encode_gif(
            np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8)
        )
    # extension blocks are skipped; interlace is a declared boundary
    g = bytearray(im.encode_gif(cases[0]))
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE before image block
    gct_end = 13 + (1 << ((g[10] & 7) + 1)) * 3
    spliced = bytes(g[:gct_end]) + ext + bytes(g[gct_end:])
    assert (im.decode_gif(spliced) == cases[0]).all()
    h = bytearray(spliced)
    h[gct_end + len(ext) + 9] |= 0x40  # set interlace flag
    with pytest.raises(NotImplementedError):
        im.decode_gif(bytes(h))


def test_decode_image_dispatch_all_formats():
    """decode_image sniffs magic bytes and routes to all five in-repo
    codecs, returning the same (h, w, 3) contract; unknown payloads
    raise ValueError (contained by the media flow)."""
    from mariadb_cdc_spark.functions import imagefmt as im
    from mariadb_cdc_spark.functions import multimodal as mm
    from mariadb_cdc_spark.functions.jpeg import encode_jpeg

    px = np.full((16, 24, 3), 99, np.uint8)
    payloads = {
        "ppm": mm.encode_ppm(px),
        "png": mm.encode_png(px),
        "jpeg": encode_jpeg(px),
        "gif": im.encode_gif(px),
        "bmp": im.encode_bmp(px),
    }
    for fmt, payload in payloads.items():
        assert im.sniff_image_format(payload) == fmt
        out = im.decode_image(payload)
        assert out.shape == (16, 24, 3)
        err = np.abs(out.astype(int) - 99).max()
        assert err <= (6 if fmt == "jpeg" else 0), fmt
    with pytest.raises(ValueError):
        im.decode_image(b"\x00\x01nonsense")
    with pytest.raises(ValueError):
        im.sniff_image_format(None)


def test_mixed_image_stats_distributed(spark):
    """The format-blind media query end to end: 5 formats in one binary
    column, decoded per-partition via mapInPandas; closed-form dims and
    exact/tolerance color contract hold; a corrupt payload yields a
    null-feature row, not a task failure."""
    from pyspark.sql import functions as F

    from mariadb_cdc_spark.functions.imagefmt import (
        mixed_image_stats,
        synthesize_mixed_media,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = synthesize_mixed_media(docs)
    stats = mixed_image_stats(media).collect()
    assert len(stats) == 40
    fmts = {"ppm", "png", "jpeg", "gif", "bmp"}
    for r in stats:
        d = r["media_id"]
        assert r["fmt"] == ["ppm", "png", "jpeg", "gif", "bmp"][d % 5]
        assert r["width"] == 8 + d % 24
        assert r["height"] == 8 + (d * 3) % 16
        assert r["n_pixels"] == r["width"] * r["height"]
        assert r["color_ok"] is True
    assert {r["fmt"] for r in stats} == fmts

    corrupt = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 7, F.lit(b"\xff\xd8garbage")).otherwise(
            F.col("payload")
        ),
    )
    rows = {r["media_id"]: r for r in mixed_image_stats(corrupt).collect()}
    assert rows[7]["fmt"] is None and rows[7]["color_ok"] is None
    assert rows[8]["color_ok"] is True


def test_embedding_neardup_all_pairs_guard(spark):
    """cluster_col=None is O(n^2): above all_pairs_limit rows it must fail
    fast instead of cartesian-exploding; force=True overrides."""
    from mariadb_cdc_spark.functions.similarity import (
        embedding_near_duplicates,
    )

    df = spark.range(12).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_near_duplicates(
            df, cluster_col=None, all_pairs_limit=10
        ).count()
    # under the limit: runs; forced over the limit: runs
    assert (
        embedding_near_duplicates(
            df, threshold=-1.0, cluster_col=None, all_pairs_limit=100
        ).count()
        == 12 * 11 // 2
    )
    assert (
        embedding_near_duplicates(
            df, threshold=-1.0, cluster_col=None, all_pairs_limit=10,
            force=True,
        ).count()
        == 12 * 11 // 2
    )


def test_pq_codes_properties(spark):
    """Product quantization invariants: one row per (vector, subspace),
    codes within the codebook, non-negative rounded errors — and a corpus
    of k distinct repeated vectors quantizes losslessly (each codebook
    collapses onto the distinct subvectors)."""
    from mariadb_cdc_spark.functions.similarity import pq_codes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    out = pq_codes(emb, m=4, k=4, iters=2).collect()
    assert len(out) == n * 4
    assert all(0 <= r["code"] < 4 and r["dist"] >= 0 for r in out)

    # lossless case: exactly k distinct vectors — every one is a seed, so
    # each becomes (and stays) its own centroid and quantization is exact
    base = [[float((i * 7 + j) % 5) for j in range(8)] for i in range(4)]
    df = spark.createDataFrame(
        list(enumerate(base)), "vec_id long, embedding array<float>"
    )
    z = pq_codes(df, m=2, k=4, iters=2).collect()
    assert len(z) == 4 * 2
    assert all(r["dist"] == 0.0 for r in z)

    # indivisible dims fail loudly
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="divisible"):
        pq_codes(bad, m=2, k=2)


def test_pq_topk_beats_random_and_is_deterministic(spark):
    """ADC ranking sanity. On near-random 64-dim synthetic embeddings
    exact-recall is inherently tiny for any small codebook (distance
    concentration), so the honest criterion is RANKING QUALITY: the true
    L2 distance of PQ-chosen neighbors must beat the corpus mean by a
    clear margin (random top-10 would match the mean). Plus shape and
    determinism pins."""
    import numpy as np

    from mariadb_cdc_spark.functions.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = pq_topk(
        emb, emb.where(F.col("vec_id") < 3), m=8, k_codes=8, k=10
    ).collect()
    assert len(got) == 30
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.collect()}
    for qid, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
            == list(range(1, 11))
        q = vecs[qid]
        dists = {vid: float(np.sum((v - q) ** 2))
                 for vid, v in vecs.items() if vid != qid}
        mean_all = np.mean(list(dists.values()))
        mean_pq = np.mean([dists[r["neighbor_id"]] for r in rows])
        assert mean_pq < 0.9 * mean_all, (qid, mean_pq, mean_all)
        # and the reported quantized distances are monotone in rank
        adists = [r["adist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert adists == sorted(adists)
    # determinism across runs
    again = pq_topk(
        emb, emb.where(F.col("vec_id") < 3), m=8, k_codes=8, k=10
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
