package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Fs, Upsert}

/** Streaming top-N per key WITH REPLACEMENT — the reference's TopN
  * snapshot (`/root/reference/scripts/etl_snapshot_topn.py`'s head-N
  * slice) made continuous: the standing state is each source's current
  * top `n` documents by (score desc, doc_id asc), and every micro-batch
  * may displace standing entries that a better-scored arrival beats.
  * Contrast [[QuotaStream]]: a quota is first-come-first-served and
  * never evicts; a leaderboard keeps the BEST seen so far.
  *
  * State is AT MOST n×|sources| rows — bounded by the domain vocabulary
  * and the board size, never the corpus. Each batch folds as
  * top-N(state ∪ batch) per source and REPLACES the state through
  * [[Upsert.mergeParquet]]'s staged swap. Replay needs no special case
  * beyond the applied-marker skip: top-N is idempotent under re-merge
  * (top-N(top-N(S ∪ B) ∪ B) = top-N(S ∪ B) — the merge property of any
  * total order), so a replayed batch folded against the already-folded
  * state would reproduce it bit-for-bit anyway; the marker just makes
  * the skip free.
  *
  * At 100 TB: the per-batch work is one window over (state ∪ batch) —
  * state is board-sized, the batch is batch-sized, and nothing rescans
  * the corpus; the final board is the state table itself, read back in
  * one board-sized scan.
  */
object TopNStream {

  val defaultLandingSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The per-batch board fold — [[runTopN]]'s loop body, exposed so it
    * also plugs into [[AdmissionStream.runAdmission]]'s `onBatchAdmitted`
    * observer seam (the dedup → leaderboard composition: only
    * near-dup-admitted rows compete for the board, q162). Idempotent per
    * batchId — and idempotent even WITHOUT the marker, by top-N's merge
    * property; the marker makes the skip free. */
  def boardFold(spark: SparkSession, statePath: String, n: Int,
      scoreCol: String)(batch: DataFrame, batchId: Long): Unit = {
    Upsert.recoverStagedSwap(statePath)
    // board-size fail-fast (the p_* discipline): a board built at one n
    // is a DIFFERENT leaderboard at another — the standing state must
    // not silently shrink or pad
    val state =
      if (Fs.exists(statePath)) Some(spark.read.parquet(statePath))
      else None
    state.foreach { st =>
      val ns = st.select(col("p_n")).distinct()
        .collect().map(_.getInt(0)).toSet
      require(ns == Set(n),
        s"top-N state at $statePath was built with n=${ns.mkString(",")}; " +
          s"refusing to fold with n=$n — start a new state table for " +
          "a new board size")
    }
    if (!Upsert.appliedBatches(statePath).contains(batchId)) {
      val arrivals = batch.select(col("doc_id"), col("source"),
        col(scoreCol).cast("long").as("score"))
      val cand = state
        .map(_.select(col("doc_id"), col("source"), col("score"))
          .unionByName(arrivals))
        .getOrElse(arrivals)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("score").desc, col("doc_id").asc)
      // pinned off the state files BEFORE the swap relocates them
      val next = cand.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n)
        .select(col("doc_id"), col("source"), col("score"))
        .withColumn("p_n", lit(n))
        .localCheckpoint(true)
      // REPLACE semantics: the fold already merged the old board
      Upsert.mergeParquet(spark, statePath, next,
        Some(batchId))((_, updates) => updates)
    }
  }

  /** Read the standing board at `statePath` (empty frame when none). */
  def readBoard(spark: SparkSession, statePath: String): DataFrame =
    if (Fs.exists(statePath))
      spark.read.parquet(statePath)
        .select(col("source"), col("doc_id"), col("score"))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("source", StringType),
          StructField("doc_id", LongType), StructField("score", LongType))))

  /** Run a bounded landing stream to completion, maintaining each
    * source's top-`n` board by (`score` desc, doc_id asc). `scoreCol`
    * names the landing column used as the score (must be castable to
    * long — exact-integer ordering, no float ties). Returns the final
    * board (`source`, `doc_id`, `score`). */
  def runTopN(spark: SparkSession, landingDir: String, statePath: String,
      n: Int, scoreCol: String,
      maxFilesPerTrigger: Option[Int] = None,
      schemaFallback: Option[StructType] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    require(n > 0, "n must be positive")
    val ckpt = checkpointDir.map(java.nio.file.Paths.get(_))
      .getOrElse(EventStreams.scratchDir("graft_topn_ckpt_"))
    val landingSchema =
      scala.util.Try(spark.read.parquet(landingDir).schema).toOption
        .orElse(schemaFallback).getOrElse(defaultLandingSchema)
    val reader = spark.readStream.schema(landingSchema)
    maxFilesPerTrigger.foreach(m =>
      reader.option("maxFilesPerTrigger", m.toString))
    val q = reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        boardFold(spark, statePath, n, scoreCol)(batch, batchId)
        ()
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    if (checkpointDir.isEmpty)
      graft.operators.Maintenance.rmTree(ckpt.toFile)
    readBoard(spark, statePath)
  }
}
