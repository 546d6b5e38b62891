package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataloader-layout operators — the ordering/batching decisions between
  * a cleaned corpus and the training loop ([[Packing]] lays out token
  * streams; these order and batch whole documents). Reference behavior:
  * TopN-ClashRoyal-ETL-SQL-snapshot stops at ordered SQL output; layout
  * for training consumption is this engine's extension surface
  * (SURVEY.md §2.12). Everything here is INTEGER arithmetic over
  * hash-deterministic ranks, so layouts are reproducible across runs,
  * engines, and partitionings — the same discipline as [[Sampling]] and
  * [[Packing]].
  *
  * Scale shape (shared by both operators): the within-group (md5(key),
  * key) rank is computed HASH-SHARDED, not with one window partition per
  * group value — `Window.partitionBy(group)` alone would sort every
  * group's full row set on a single task (parallelism = #groups; a
  * 5-stratum 100 TB corpus would single-task-sort ~20 TB per stratum).
  * Instead each group is split into 16^`shardDigits` sub-shards keyed by
  * the md5 PREFIX — a prefix of the sort key, so concatenating shards in
  * shard order reproduces the global (md5, key) order bit-exactly — the
  * rank window runs partitioned by (group, shard), and per-(group, shard)
  * base offsets come from an index-sized broadcast totals frame: the same
  * pattern as [[Packing.packSequences]]'s per-shard sequence-id bases.
  * Output is a pure function of the data — identical for any
  * `shardDigits` (pinned in DataloaderSpec).
  */
object Dataloader {

  /** Proportional stratum interleave — a deterministic global training
    * ORDER over a mixture of strata in which every stratum is consumed
    * evenly (the i-th of a stratum's s rows sits at relative position
    * (i − ½)/s, so a 10%-of-corpus stratum appears every ~10 rows):
    * epoch-curriculum ordering without an RNG.
    *
    * The sort key is the exact integer
    * `okey = ((2·rank − 1) · 10⁹) div (2·s)` — the midpoint rational
    * floored at 10⁻⁹ granularity, overflow-safe to strata of ~4.6e9 rows
    * ((2·rank−1)·10⁹ < 2⁶³). Rank is the (md5(key), key) order within
    * the stratum, so the interleave is a pure function of the data.
    * Returns (id, stratum, rank, okey); consumers ORDER BY (okey,
    * stratum, rank) — a total order, no dense global index needed (and
    * none is computed: a global row_number would serialize the corpus
    * through one task).
    *
    * Scale: one sharded rank window (object scaladoc) + one tiny
    * broadcast join carrying both the shard base and the stratum total
    * `s`; everything else is scan-fused arithmetic. Raise `shardDigits`
    * until each (stratum, shard) slice is executor-sized (2 → 256 shards
    * per stratum; 3 → 4096). */
  def interleaveOrder(df: DataFrame, key: Column, stratum: Column,
      shardDigits: Int = 2): DataFrame =
    shardedRank(
      df.select(key.as("id"), stratum.as("stratum"),
        md5(key.cast("string")).as("__h")),
      "stratum", shardDigits)
      .select(col("id"), col("stratum"), col("rank"),
        expr("((2 * rank - 1) * 1000000000) div (2 * __s)").as("okey"))

  /** Length-bucketed batching — group rows of similar `units` (token
    * counts) into fixed-size batches to bound padding waste (the
    * dynamic-batching move every sequence trainer makes: batch cost is
    * max-length · batch-size, so mixing a 10-token doc into a 2000-token
    * batch wastes 99% of its slot).
    *
    * Buckets are powers of two: bucket = bit-length of `units` (length
    * of its binary representation — integer, engine-portable as
    * `length(bin(n))`), so lengths within a bucket differ by at most 2×
    * and padding is bounded at 50% before batching even starts. Within a
    * bucket, rows order by (md5(key), key) and cut every `batchSize`
    * rows. Returns per-batch accounting: (bucket, batch_id, n_docs,
    * max_units, sum_units, padding) where padding = n_docs·max − sum —
    * the exact waste the layout pays. batch_id is bucket-local;
    * (bucket, batch_id) is the global batch key.
    *
    * Scale: one sharded rank window (object scaladoc — ~20–30 distinct
    * buckets would otherwise bound parallelism) + one map-side-combined
    * groupBy on (bucket, batch_id). Rows with units <= 0 are dropped
    * (nothing to batch). */
  def lengthBucketBatches(df: DataFrame, key: Column, units: Column,
      batchSize: Int, shardDigits: Int = 2): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    shardedRank(
      df.select(key.as("id"), units.cast("long").as("n"),
          md5(key.cast("string")).as("__h"))
        .filter(col("n") > 0L)
        .withColumn("bucket", length(bin(col("n"))).cast("int")),
      "bucket", shardDigits)
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n")).as("max_units"),
        sum(col("n")).as("sum_units"))
      .withColumn("padding",
        col("n_docs") * col("max_units") - col("sum_units"))
  }

  /** Hash-deterministic CONTRASTIVE NEGATIVES — each row paired with `k`
    * negatives from its stratum, chosen at modular rank offsets
    * (neg_rank = (rank − 1 + ⌊j·s/(k+1)⌋) mod s + 1 for j = 1..k): the
    * negative-pair generation contrastive/embedding training needs,
    * without an RNG. The offsets are distinct and nonzero whenever
    * s > k (no self-pairs, uniform coverage of the rank circle); since
    * rank is the (md5, key) order, the pairing is a pure function of
    * the stratum's key SET. Self-pairs arising in tiny strata (s ≤ k)
    * are filtered; tiny strata may also repeat a negative across j
    * (the circle is shorter than k — documented, deterministic).
    * Returns (id, stratum, j, neg_id).
    *
    * Scale: the sharded rank (object scaladoc) + one explode(k) + one
    * equi-join on (stratum, rank) — both sides shuffle-partitioned by
    * the same key; no window wider than the sharded rank's. */
  def modularNegatives(df: DataFrame, key: Column, stratum: Column,
      k: Int, shardDigits: Int = 2): DataFrame = {
    require(k >= 1, "k must be positive")
    val ranked = shardedRank(
      df.select(key.as("id"), stratum.as("stratum"),
        md5(key.cast("string")).as("__h")),
      "stratum", shardDigits)
      .select(col("id"), col("stratum"), col("rank"), col("__s"))
    ranked
      .select(col("id"), col("stratum"), col("rank"), col("__s"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"))
      .withColumn("__nrank",
        expr(s"((rank - 1 + (j * __s) div ${k + 1}) % __s) + 1"))
      .join(ranked.select(col("stratum"), col("rank").as("__nrank"),
        col("id").as("neg_id")), Seq("stratum", "__nrank"))
      .filter(col("neg_id") =!= col("id"))
      .select(col("id"), col("stratum"), col("j"), col("neg_id"))
  }

  /** Hash-sharded within-group rank (object scaladoc). `keyed` must carry
    * `group`, `id`, and the md5 sort key `__h`; returns it plus `rank`
    * (1-based (md5, key) rank within the group) and `__s` (group row
    * count). Shard = first `shardDigits` hex chars of `__h` (0 → one
    * shard, the unsharded plan); bases/totals come from a
    * #groups × 16^`shardDigits`-row frame — index-sized, broadcast by
    * construction. */
  private def shardedRank(keyed: DataFrame, group: String,
      shardDigits: Int): DataFrame = {
    require(shardDigits >= 0 && shardDigits <= 8,
      s"shardDigits must be in [0, 8], got $shardDigits")
    val sharded = keyed
      .withColumn("__shard", substring(col("__h"), 1, shardDigits))
    val bases = sharded.groupBy(col(group), col("__shard"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col(group), col("__shard"),
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(col(group)).orderBy(col("__shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__base"),
        sum(col("__cnt")).over(Window.partitionBy(col(group))).as("__s"))
    val w = Window.partitionBy(col(group), col("__shard"))
      .orderBy(col("__h").asc, col("id").asc)
    sharded
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(broadcast(bases), Seq(group, "__shard"))
      .withColumn("rank", col("__rn") + col("__base"))
  }
}
