"""Distributed BPE (byte-pair-encoding) vocabulary learning + tokenization.

The training-data pipeline's tokenizer step, Spark-first. The scale trick
is the classic one (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016): BPE training operates on the
WORD-FREQUENCY table, not the raw corpus — a 100 TB corpus has a distinct
vocabulary orders of magnitude smaller than its token stream, so one
corpus scan builds the (word, count) relation and every merge iteration
after that is a shuffle over distinct words only.

Training loop (per merge):
  1. explode each word's adjacent symbol pairs, weighted by word count;
  2. groupBy(pair).sum — map-side combinable;
  3. take the arg-max pair (count desc, pair asc — the deterministic
     tie-break), one driver row;
  4. rewrite every word's symbol array with the merged pair (a pure
     Catalyst left-to-right fold — greedy non-overlapping, the BPE rule).
Driver state is O(num_merges) merge rules. Plans are re-materialized
every few iterations (localCheckpoint) so the chained array folds don't
grow an unbounded lineage.

Tokenization (`apply_bpe`) is the hot path — per-document, corpus-sized —
so it runs as an Arrow-batched pandas UDF with the merge ranks compiled
into a dict (the standard merge-priority algorithm); training stays
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_SPLIT = r"\s+"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace-split text — the one corpus-sized scan."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), _WORD_SPLIT)).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs per word, weighted by word frequency."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (s, i) -> struct(s as a, syms[i + 1] as b))"
    )
    return (
        words.where(F.size("syms") > 1)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right non-overlapping merge of (a,b) -> a+b inside a
    symbol array, as one Catalyst aggregate fold."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        F.col("syms"),
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(lab)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merge rules from the corpus. Deterministic:
    ties on pair count break to the lexicographically smallest (a, b).
    Returns the ordered merge list."""
    words = word_counts(docs, text_col).withColumn(
        # split-to-characters; drop the trailing empty string Spark's
        # split(limit=-1) keeps
        "syms",
        F.filter(F.split("word", "(?!^)"), lambda s: s != ""),
    ).select("syms", "n").persist()
    words.count()

    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        prev = words
        words = words.withColumn("syms", _merge_expr(a, b))
        if (i + 1) % checkpoint_every == 0:
            # truncate the chained-fold lineage; keep the iteration cheap
            words = words.localCheckpoint(eager=True)
        else:
            words = words.persist()
            words.count()
        prev.unpersist()
    words.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: Arrow-batched pandas UDF, the
    merge-priority algorithm (repeatedly merge the best-ranked adjacent
    pair) per word. Corpus-sized but embarrassingly parallel — no shuffle."""
    from pyspark.sql.functions import pandas_udf

    rank = {pair: r for r, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _tok(text):
        import re

        def word_tokens(w):
            syms = list(w)
            while len(syms) > 1:
                best, best_r = None, None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best, best_r = i, r
                if best is None:
                    break
                syms[best : best + 2] = [syms[best] + syms[best + 1]]
            return syms

        return text.map(
            lambda t: [
                s
                for w in re.split(_WORD_SPLIT, t or "")
                if w
                for s in word_tokens(w)
            ]
        )

    return docs.withColumn(out_col, _tok(F.col(text_col)))


def initial_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The first training iteration's relation — adjacent CHARACTER pairs
    weighted by word frequency — exposed for oracle checking: (a, b, cnt)."""
    words = word_counts(docs, text_col).withColumn(
        "syms", F.filter(F.split("word", "(?!^)"), lambda s: s != "")
    )
    return _pair_counts(words).withColumnRenamed("cnt", "cnt")
