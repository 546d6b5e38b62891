package graft.operators

import org.apache.spark.sql.SparkSession

/** Table-maintenance utilities for a parquet warehouse — the operational
  * side of running this engine continuously at scale. Streaming sinks and
  * incremental upserts ([[Upsert]], [[graft.streaming.EventStreams]])
  * accrete one small file per micro-batch/merge; at 100 TB the resulting
  * small-file population is the classic scan killer (every file costs a
  * task, a footer read, and an object-store request — a table that should
  * scan as thousands of ~128 MB splits degrades into millions of KB-sized
  * ones). Compaction rewrites a table into target-sized files; clustering
  * additionally range-sorts it so parquet row-group min/max stats prune
  * selective scans.
  */
object Maintenance {

  /** Data bytes currently on disk for the parquet table at `path`
    * (top-level part files; `_`/`.`-prefixed metadata is excluded, the
    * same rule Spark's file index applies). */
  def tableBytes(path: String): Long =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length()).sum

  /** Rewrite the parquet table at `path` into `ceil(bytes/targetFileBytes)`
    * files (at least one). With `clusterBy` columns the rewrite is
    * `repartitionByRange` + `sortWithinPartitions` on them — globally
    * range-clustered output, so each file owns a disjoint key range and
    * parquet min/max stats skip whole files for selective key predicates;
    * without, a plain round-robin `repartition` (uniform file sizes, no
    * ordering guarantee).
    *
    * The rewrite goes through [[Upsert.mergeParquet]]'s staged write-swap,
    * so a crash mid-compaction never loses the table and the applied-batch
    * marker of a streaming rollup target survives the rewrite. Returns the
    * target file count.
    *
    * Sizing note: `targetFileBytes` is compared against bytes ON DISK
    * (encoded + compressed), so output files land near the target only
    * when input and output encode similarly — true for compaction, where
    * both sides are the same rows in the same schema. Flat tables only:
    * a hive-partitioned table is compacted per partition directory (run
    * this against each leaf), never whole-table — rewriting it flat would
    * discard the partitioning. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): Int = {
    // a prior run may have died between the swap renames — restore the
    // table BEFORE sizing/reading it, or a recoverable table fails the
    // read (mergeParquet would recover it, but only after these reads)
    Upsert.recoverStagedSwap(path)
    val bytes = tableBytes(path)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val current = spark.read.parquet(path)
    val rewritten =
      if (clusterBy.nonEmpty) {
        val cols = clusterBy.map(current.col)
        current.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      } else current.repartition(n)
    Upsert.mergeParquet(spark, path, rewritten)((_, updates) => updates)
    n
  }
}
