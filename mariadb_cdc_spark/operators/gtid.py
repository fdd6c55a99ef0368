"""GTID-set coverage accounting over a MariaDB GTID stream.

The reference carries GTIDs as opaque strings: it captures the GTID_EVENT
text into `currentGtid`/`GtidSet` for resume (`binlog/
BinLogReaderEventProcessor.java`, `MariadbCdcConfig.java` gtid support)
but never REASONS about the set — a replication monitor built on it
cannot answer "which sequence numbers are missing per domain" without
re-reading the whole stream. MariaDB GTIDs are `domain-server-seq`
triples where `seq` is dense per (domain, server) on a healthy stream,
so coverage is pure arithmetic and aggregates distributively:

  * n_events / n_seqs       -- replays show up as n_events > n_seqs
  * min_seq / max_seq       -- the observed span
  * n_missing               -- span - n_seqs: gap mass without
                               materializing gaps (count+min+max are all
                               map-side combinable: one shuffle)
  * first_gap               -- smallest missing seq, for targeted
                               re-fetch; lead() over the per-group sorted
                               seqs — the only part that pays a per-group
                               sort, and it sorts WITHIN partitions after
                               one hash exchange on (domain, server), so
                               it scales with the largest single group,
                               not the stream

At 10^10 events the whole report is one exchange keyed on the (tiny)
(domain, server) space plus one window pass; no driver state, no
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_gtid(df: DataFrame, gtid_col: str = "gtid") -> DataFrame:
    """Split `domain-server-seq` into typed columns (rows with a null or
    malformed GTID are dropped — control events carry no GTID)."""
    parts = F.split(F.col(gtid_col), "-")
    return (
        df.where(F.col(gtid_col).rlike(r"^\d+-\d+-\d+$"))
        .withColumn("gtid_domain", parts.getItem(0).cast("long"))
        .withColumn("gtid_server", parts.getItem(1).cast("long"))
        .withColumn("gtid_seq", parts.getItem(2).cast("long"))
    )


def gtid_coverage(df: DataFrame, gtid_col: str = "gtid") -> DataFrame:
    """Per-(domain, server) GTID coverage report; see module docstring."""
    parsed = parse_gtid(df, gtid_col).select(
        "gtid_domain", "gtid_server", "gtid_seq"
    )
    seqs = parsed.distinct()

    w = Window.partitionBy("gtid_domain", "gtid_server").orderBy("gtid_seq")
    nxt = F.lead("gtid_seq").over(w)
    gaps = (
        seqs.withColumn("nxt", nxt)
        .where(F.col("nxt") > F.col("gtid_seq") + 1)
        .groupBy("gtid_domain", "gtid_server")
        .agg((F.min("gtid_seq") + 1).alias("first_gap"))
    )

    base = parsed.groupBy("gtid_domain", "gtid_server").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("gtid_seq").alias("n_seqs"),
        F.min("gtid_seq").alias("min_seq"),
        F.max("gtid_seq").alias("max_seq"),
    )
    out = base.join(gaps, ["gtid_domain", "gtid_server"], "left")
    return out.select(
        "gtid_domain",
        "gtid_server",
        "n_events",
        "n_seqs",
        "min_seq",
        "max_seq",
        (F.col("max_seq") - F.col("min_seq") + 1 - F.col("n_seqs")).alias(
            "n_missing"
        ),
        "first_gap",
    )
