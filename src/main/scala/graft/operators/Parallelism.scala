package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Partition-count guard for compute-heavy narrow stages.
  *
  * Spark parallelizes a narrow (per-row) stage by INPUT SPLIT, so a small
  * single-file parquet scan — one split — runs the whole stage on one core
  * no matter how many the cluster has. That is invisible at corpus scale
  * (a 100 TB table scans as tens of thousands of splits) but serializes
  * the CPU-dominant passes of this library (minhash/simhash signatures,
  * embedding dot products) on small inputs, which is exactly the regime
  * benchmarks and backfills of a single shard run in.
  */
object Parallelism {

  /** Repartition `df` on `key` up to the session's default parallelism iff
    * its plan currently yields fewer partitions. Above the threshold this
    * is a metadata check and a no-op — no shuffle is ever added to a
    * well-split scan. Hash-partitioning on `key` (not round-robin) avoids
    * the sort-before-repartition determinism pass and leaves the data
    * keyed for the self-joins that typically follow. */
  private[graft] def ensureMinPartitions(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
