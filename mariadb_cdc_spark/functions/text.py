"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, whole-stage codegen) — no Python in
the hot path, so they run at 100 TB scan speed. Each has a matching ANSI-SQL
oracle in __spark_entry__.oracle_sql (DuckDB), so every function is verified
value-for-value against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists (deterministic heuristic language ID).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "en", "los", "del", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "une"],
    "de": ["der", "die", "das", "und", "von", "mit", "den", "ein"],
}


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed text; empty text -> empty array."""
    c = F.trim(col) if not isinstance(col, Column) else F.trim(col)
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer shape: letter runs, SINGLE digits (BPE vocabs
# split numbers), runs of other symbols. Explicit character classes (no \s /
# \p) so Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\r\\n]+"


def subword_count(col) -> Column:
    """BPE-ish subword token count — the LLM-cost estimator companion to the
    whitespace count (a budget/stats column every training-data pipeline
    carries). Pure Catalyst regexp, no UDF."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def word_match_count(col, words: list[str]) -> Column:
    """How many tokens of `col` are in `words` (case-insensitive)."""
    toks = tokens(F.lower(col))
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    The classic pre-training quality screen: all integer counts plus ratios
    rounded to fixed decimals (deterministic across engines).
    """
    c = F.col(text_col)
    n_tokens = token_count(c)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}]", ""))
    n_stop = word_match_count(c, STOPWORDS["en"])
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        subword_count(c).alias("n_subwords"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        (
            (n_tokens >= 5)
            & (n_chars >= 30)
            & (n_punct / F.greatest(n_chars, F.lit(1)) < 0.2)
        ).alias("passes_quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID (n-gram-free heuristic, fully declarative).

    Returns doc_id, per-language hit counts, predicted language ('und' when
    no stopword hits), and agreement with the labeled lang column.
    """
    c = F.lower(F.col(text_col))
    hits = {lang: word_match_count(c, ws) for lang, ws in STOPWORDS.items()}
    langs = sorted(STOPWORDS)  # deterministic tie-break: alphabetical
    best = F.greatest(*[hits[lg] for lg in langs])
    pred = F.lit("und")
    # reverse order so earlier alphabetical language wins ties
    for lg in reversed(langs):
        pred = F.when(hits[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    out = df.select(
        "doc_id",
        *[hits[lg].alias(f"hits_{lg}") for lg in langs],
        pred.alias("pred_lang"),
        F.col("lang").alias("labeled_lang"),
    )
    return out.withColumn(
        "agrees", (F.col("pred_lang") == F.col("labeled_lang"))
    )


# PII patterns in the Java-regex / RE2 shared subset (explicit classes, no
# lookaround, no \b) so Spark and the DuckDB oracle match byte-for-byte.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+"
PII_PHONE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, phone numbers, and IPv4 addresses from text.

    The standard pre-training privacy pass. Pure Catalyst regexp_replace —
    JVM-side, codegen'd, scan-speed at 100 TB. Counts are taken BEFORE
    redaction, and patterns apply in a fixed order (email, then ip, then
    phone) so overlapping matches resolve identically on any engine.
    Emits the redacted text plus per-category counts for audit metrics.
    """
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0)))
    after_email = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    n_ips = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_IPV4), F.lit(0))
    )
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phones = F.size(
        F.regexp_extract_all(after_ip, F.lit(PII_PHONE), F.lit(0))
    )
    redacted = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return df.select(
        "doc_id",
        redacted.alias("text_redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over case/whitespace-normalized text.

    The cheap exact-dup key for content-defined dedup; normalization makes it
    robust to whitespace-only diffs.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    standard cheap screen for base64/hex blobs (entropy near log2(16)=4+
    with a tiny alphabet skew), repeated-character spam (entropy near 0),
    and binary-as-text (high entropy, huge alphabet). CCNet/RefinedWeb-class
    corpus filters carry exactly this signal.

    Entropy is computed from integer counts as
    log2(n) - sum(c*log2(c))/n — one (id, char) map-side-combined shuffle,
    then one per-id agg; linear in corpus chars, no UDF.

    Output: id_col, n_chars_counted, distinct_chars, entropy (round 4).
    """
    chars = F.transform(
        F.sequence(F.lit(1), F.length(F.col(text_col))),
        lambda i: F.substring(F.col(text_col), i, 1),
    )
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    occ = spread.where(F.length(F.col(text_col)) > 0).select(
        F.col(id_col).alias("id"), F.explode(chars).alias("ch")
    )
    counts = occ.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("id")
        .agg(
            F.sum("c").alias("n_chars_counted"),
            F.count(F.lit(1)).alias("distinct_chars"),
            F.sum(F.col("c") * F.log2("c")).alias("_clogc"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_chars_counted",
            "distinct_chars",
            F.round(
                F.log2("n_chars_counted")
                - F.col("_clogc") / F.col("n_chars_counted"),
                4,
            ).alias("entropy"),
        )
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: the quality axis length/punct/
    stopword ratios miss — machine-generated and boilerplate text repeats
    itself. Returns per doc:

      n_tokens          whitespace tokens (same tokenizer as quality_features)
      dup_word_frac     1 - distinct/total tokens (0 for empty docs)
      top_bigram_frac   occurrences of the most frequent word bigram over
                        total bigrams (0 when n_tokens < 2)

    Scale shape: dup_word_frac is a pure array expression on the scan (no
    shuffle); the bigram mode needs a count per (doc, bigram) — one shuffle
    whose key includes the doc id, so it partitions with the corpus and has
    no hot keys regardless of content skew.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col,
        "_toks",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.when(F.size("_toks") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("_toks"))
                / F.size("_toks").cast("double"),
                6,
            )
        )
        .alias("dup_word_frac"),
    )
    ex = base.select(
        id_col, "n_tokens", "dup_word_frac",
        F.posexplode_outer("_toks").alias("_pos", "_tok"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    bg = (
        ex.withColumn("_next", F.lead("_tok").over(w))
        .where(F.col("_next").isNotNull())
        .withColumn("_bg", F.concat_ws(" ", "_tok", "_next"))
    )
    counts = bg.groupBy(id_col, "n_tokens", "dup_word_frac", "_bg").count()
    tops = counts.groupBy(id_col, "n_tokens", "dup_word_frac").agg(
        F.round(
            F.max("count") / F.sum("count").cast("double"), 6
        ).alias("top_bigram_frac")
    )
    # docs with < 2 tokens produce no bigrams: restore them with frac 0
    return (
        base.select(id_col, "n_tokens", "dup_word_frac")
        .join(tops.select(id_col, "top_bigram_frac"), id_col, "left")
        .na.fill({"top_bigram_frac": 0.0})
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Corpus-wide top-k token frequency table (the vocabulary/heavy-hitters
    pass of a tokenizer-training or corpus-stats pipeline).

    Plan shape at 100 TB: explode to (token) -> ONE groupBy(token) shuffle
    whose exchange carries partial counts (hash-aggregate map-side combine
    collapses each partition's duplicates first — the shuffled rows are
    O(distinct tokens per partition), not O(corpus tokens)); the final
    top-k is a TakeOrderedAndProject over the aggregated (distinct-token)
    set, never a global sort of the corpus. Ties break on the token string
    so the ranking is total and engine-portable.
    """
    toks = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # per-partition heap + k-row driver merge, NOT a global sort (the
    # single-task Window.orderBy(lit) shape is banned in this repo).
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "token", "n"
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-trained unigram-LM score per document: mean -log2 P(token)
    under the corpus's own unigram distribution — the cheap stand-in for
    the perplexity-based quality filters of CCNet-style pipelines (docs
    whose tokens are uniformly rare or boilerplate-repetitive separate
    cleanly on bits/token).

    Two passes over the tokens, both shuffle-lean:
      1. corpus unigram counts — groupBy(token) with map-side combine
         (exchange carries distinct tokens per partition, not the corpus);
      2. per-doc mean -log2(count/total) — the exploded (doc, token) side
         joins the count table and re-aggregates on doc_id. The count
         table is BROADCAST here (vocab of a web corpus is ~1e7-1e8 rows,
         at the edge; for a bigger-than-memory vocab swap to a shuffle
         join — AQE's skew handling splits the hot-token partitions).

    OOV is impossible by construction (the vocabulary is the corpus
    itself), so the score is total. Returns (doc_id, n_tokens,
    bits_per_token) with the mean rounded for engine parity.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    scored = toks.join(F.broadcast(counts), "token").crossJoin(
        F.broadcast(total)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log2(F.col("n") / F.col("t"))), 6
            ).alias("bits_per_token"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram-LM score per document — one model order above
    `unigram_logprob`, closing most of the gap to the KenLM-style
    perplexity filters (CCNet) without an external model:

        P(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1})
                         + (1-lam) * c(w_i)/T
        bits_per_bigram  = mean over i>=2 of -log2 P(w_i | w_{i-1})

    The unigram interpolation floor makes the score total (no zero
    probabilities: every token exists in the corpus vocabulary by
    construction). Docs with fewer than 2 tokens emit no row.

    Scale shape: bigrams come from arrays_zip over each doc's own token
    array (no self-join); ONE shuffle keyed on the bigram for its counts
    (map-side combined); unigram counts and the corpus total ride the
    same broadcast pattern as unigram_logprob.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("prev"),
        F.slice(toks, 2, n - 1).alias("cur"),
    )
    occ = df.where(n >= 2).select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("bg")
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))

    uni = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = uni.agg(F.sum("n").alias("t"))
    big = occ.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("nb"))

    np_ = uni.select(F.col("token").alias("prev"), F.col("n").alias("np"))
    nc_ = uni.select(F.col("token").alias("cur"), F.col("n").alias("nc"))
    scored = (
        occ.join(big, ["prev", "cur"])
        .join(F.broadcast(np_), "prev")
        .join(F.broadcast(nc_), "cur")
        .crossJoin(F.broadcast(total))
    )
    # round(1-lam): 1.0-0.7 in binary is 0.30000000000000004 while an
    # engine parsing the literal "0.3" gets the nearest-to-0.3 double —
    # rounding pins both sides to the same literal double
    p = F.lit(lam) * (F.col("nb") / F.col("np")) + F.lit(
        round(1.0 - lam, 12)
    ) * (F.col("nc") / F.col("t"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(-F.log2(p)), 6).alias("bits_per_bigram"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 relevance of every document to a bag-of-words query — the
    classic retrieval scorer (Robertson/Sparck Jones), used in training-data
    pipelines for targeted corpus carving (pull the docs most relevant to a
    topic) and as the lexical leg of hybrid lexical+ANN search next to
    `similarity.brute_force_topk`.

    Scale shape: per-term tf is a pure scan expression (size(filter(tokens)))
    — no explode, no shuffle on the corpus; the corpus-level stats (N, avgdl,
    per-term df) reduce to ONE map-side-combined row broadcast back via
    crossJoin; the final top-k is orderBy+limit = TakeOrderedAndProject
    (per-partition heaps + driver merge of top_k rows, never a global sort).
    At 100 TB: one scan + one 1-row agg + one top-k.

    idf uses the +1-inside-the-log BM25 variant (always positive, no
    negative-idf clamp needed): ln(1 + (N - df + 0.5) / (df + 0.5)).
    Deterministic output: score rounded to 4 decimals, ties broken by id.
    """
    if not query_terms:
        # fail at entry with a usable message — an empty term list would
        # otherwise surface as an opaque crash inside F.round(None, 4)
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.lower(F.col(text_col)))

    def _tf(word):
        # NB: the lambda must be unary — F.filter passes the element INDEX
        # as a second argument to two-parameter lambdas.
        return F.size(F.filter(toks, lambda t: t == F.lit(word)))

    tf_cols = [
        _tf(w).alias(f"tf_{i}") for i, w in enumerate(query_terms)
    ]
    base = df.select(
        F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        term = idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    return (
        scored.select("doc_id", F.round(score, 4).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k keywords per document by tf-idf — the topical-fingerprint /
    keyword-extraction pass (cluster labeling, domain tagging, corpus
    carving by topic) next to the query-driven `bm25_scores`.

    score(term, doc) = tf * ln(N / df); ties broken by term text so the
    ranking is total and engine-reproducible (score rounded to 6 decimals).

    Scale shape: explode -> ONE shuffle keyed (doc, term) with map-side
    combine -> term-keyed df(term) agg reusing the same exploded frame ->
    corpus size as a 1-row broadcast -> per-doc top-k via a doc-partitioned
    window (millions of independent partitions, no global sort). The df
    join is term-keyed; stopword-scale hot terms are bounded by the
    distinct-doc pre-aggregation, not by raw occurrence counts.
    """
    terms = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        terms.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            "df_t",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "term", "tf", "df_t", "tfidf", "rank"
        )
    )
