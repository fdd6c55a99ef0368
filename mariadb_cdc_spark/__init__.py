"""mariadb_cdc_spark — a from-scratch, PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference Java library madvirus/mariadb-cdc
(/root/reference) as an idiomatic Spark pipeline:

    binlog-shaped change events (TABLE_MAP, WRITE/UPDATE/DELETE_ROWS, ROTATE,
    QUERY/DDL, XID, HEARTBEAT, FORMAT_DESCRIPTION)
      -> decode / explode into row-level change records     (operators.decode)
      -> include/exclude table filter                        (operators.filters)
      -> TABLE_MAP registry as-of join + name enrichment     (operators.registry)
      -> total order by (binlog_file, binlog_pos), replay
         dedup, per-key last-writer-wins fold w/ partial-
         image coalesce and skew salting                     (operators.fold)
      -> MERGE upsert into a snapshot-versioned lake table
         with schema evolution + per-partition lineage       (sources.lake, operators.merge)
      -> resumable checkpoint (binlog position tracking)     (sources.checkpoint)

The reference is a single-threaded event loop (one reader thread, callback
delivery: /root/reference/src/main/java/mariadbcdc/MariadbCdc.java); this
engine is set-wise and distributed: every stage is a DataFrame transform so
Catalyst/AQE handle pushdown, broadcast, and skew, and the only driver-side
loop is the per-micro-batch apply (foreachBatch).
"""

__version__ = "0.1.0"
