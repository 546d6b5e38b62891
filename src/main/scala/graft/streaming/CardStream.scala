package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.{TextFunctions => TF}
import graft.operators.{QualityModel, Sketch, Upsert}

/** STREAMING DATASET CARD — the q132 release summary maintained
  * INCREMENTALLY: every leg of the card is additive or mergeable (doc/
  * char/token counts and the model-score/kept aggregates are plain sums;
  * the vocabulary-richness leg is a KMV sketch, whose merge law makes
  * per-batch sketches fold into the whole-corpus sketch bit-exactly), so
  * a document firehose can keep the card current by folding one
  * source-count-sized partial per micro-batch into a standing parquet
  * state table — never recomputing over the corpus. At 100 TB this is
  * the difference between a card that is hours stale after a full-corpus
  * job and one that is one micro-batch stale for the cost of scanning
  * the batch.
  *
  * State = one row per source: the five counters plus the k-min hash
  * array. Exactly-once via [[Upsert.mergeParquet]]'s batchId-keyed
  * staged swap (the [[EventStreams.incrementalRollup]] discipline), and
  * the same cross-session guard as `streamingCmsCells`: a standing card
  * with applied-batch markers requires the durable checkpoint that
  * produced it — a scratch checkpoint would restart ids at 0 and
  * silently skip data.
  *
  * The final card read derives `est_distinct_tokens` from the stored
  * mins with [[Sketch.kmvEstimate]] — identical integers to the batch
  * card's direct estimate, which is exactly how the driver oracle
  * checks it (q135's oracle IS q132's SQL: streaming ≡ batch).
  */
object CardStream {

  /** Landing schema (the documents shape the card consumes — four
    * columns, so the stream scans prune to them at the source). */
  val landingSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  private val stateCols =
    Seq("docs", "chars", "tokens", "model_score_micros", "kept_docs")

  /** One micro-batch's card partial: per-source counters + the batch's
    * KMV token sketch — exactly q132's three legs computed over the
    * batch alone. Source-count-sized output. */
  private[graft] def cardPartial(batch: DataFrame, weights: Seq[Long],
      k: Int): DataFrame = {
    val base = batch.groupBy(col("source")).agg(
      count(lit(1)).as("docs"),
      sum(col("n_chars")).cast("long").as("chars"),
      sum(TF.tokenCount(col("text"))).cast("long").as("tokens"))
    val mins = batch
      .select(col("source"), explode(TF.tokens(lower(col("text")))).as("w"))
      .select(col("source"), Sketch.hash60(col("w")).as("__h"))
      .filter(col("__h").isNotNull)
      .groupBy(col("source"))
      .agg(Sketch.kmv(k)(col("__h")).as("mins"))
    val gate = QualityModel.score(batch, col("doc_id"), col("text"), weights)
      .join(batch.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("score_micros")).as("model_score_micros"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"))
    base.join(mins, Seq("source"), "left")
      .join(gate, Seq("source"), "left")
      .select(col("source") +: (stateCols.map(col) ++ Seq(
        coalesce(col("mins"), expr("CAST(array() AS array<bigint>)"))
          .as("mins"),
        // the sketch size rides the state as an embedded parameter (the
        // nearDupIndex versioned-artifact discipline): merging or
        // reading k-A state as k-B silently corrupts the estimate, so
        // both fail fast instead
        lit(k).as("p_k"))): _*)
  }

  /** Fold a batch partial into the standing card state: counters sum
    * (full outer on source — a batch can introduce a new source), mins
    * merge as the k smallest DISTINCT of the union — the
    * KmvMergeAggregator law as a plain array expression, so the merged
    * sketch is bit-identical to the direct whole-stream sketch. */
  private[graft] def mergeCards(k: Int)(cur: DataFrame,
      upd: DataFrame): DataFrame = {
    val c = cur.select(col("source") +:
      (stateCols.map(n => col(n).as(s"c_$n")) :+ col("mins").as("c_mins")): _*)
    val u = upd.select(col("source") +:
      (stateCols.map(n => col(n).as(s"u_$n")) :+ col("mins").as("u_mins")): _*)
    val empty = "CAST(array() AS array<bigint>)"
    c.join(u, Seq("source"), "full_outer")
      .select(col("source") +: (stateCols.map(n =>
        (coalesce(col(s"c_$n"), lit(0L)) + coalesce(col(s"u_$n"), lit(0L)))
          .as(n)) ++ Seq(
        expr(s"slice(array_sort(array_distinct(concat(" +
            s"coalesce(c_mins, $empty), coalesce(u_mins, $empty)))), 1, $k)")
          .as("mins"),
        lit(k).as("p_k"))): _*)
  }

  /** Fail fast when standing card state at `targetPath` was built under
    * a different sketch size than `k` — the embedded-parameter check
    * (one bounded distinct over an RLE'd constant column). ONLY an
    * absent table counts as "no evidence" and passes: any other read
    * failure (corrupt footer, permission error) rethrows — a damaged
    * standing card must fail loudly here, not slip past this guard AND
    * the applied-marker guard to be overwritten by the first merge. */
  private def validateCardK(spark: SparkSession, targetPath: String,
      k: Int): Unit =
    if (graft.operators.Fs.exists(targetPath)) {
      val t = spark.read.parquet(targetPath)
      if (t.columns.contains("p_k")) {
        t.select(col("p_k")).filter(col("p_k").isNotNull)
          .distinct().collect()
          .foreach { r =>
            val pk = r.getInt(0)
            require(pk == k,
              s"card state at $targetPath carries k=$pk sketches but was " +
                s"asked for k=$k — merging or estimating across sketch " +
                "sizes silently corrupts the vocabulary estimate; match " +
                "the build-time k or start a fresh targetPath")
          }
      }
    }

  /** Run a bounded document stream to completion, folding each
    * micro-batch's card partial into the standing state at
    * `targetPath`. `weights` is the quality model (q130's shape);
    * `k` the KMV size. */
  def runCardStream(spark: SparkSession, landingDir: String,
      targetPath: String, weights: Seq[Long], k: Int = 64,
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None): Unit = {
    // same silent-data-loss guard as streamingCmsCells: a standing card
    // + scratch checkpoint means restarted batch ids colliding with the
    // applied set
    // a prior session may have died mid-swap — restore the table BEFORE
    // any pre-merge read, or the recoverable state looks missing and
    // BOTH fail-fast guards below silently pass (the recoverStagedSwap
    // contract)
    Upsert.recoverStagedSwap(targetPath)
    validateCardK(spark, targetPath, k)
    require(checkpointDir.nonEmpty
        || Upsert.appliedBatches(targetPath).isEmpty,
      s"standing card at $targetPath already carries applied-batch " +
        "markers and no durable checkpointDir was supplied — a scratch " +
        "checkpoint restarts batch ids at 0, which would collide with " +
        "the applied set and silently skip this session's data; pass " +
        "the prior session's checkpointDir (or start a fresh targetPath)")
    val ckpt = checkpointDir.map(java.nio.file.Paths.get(_))
      .getOrElse(EventStreams.scratchDir("graft_card_ckpt_"))
    val reader = spark.readStream.schema(landingSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val q = reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Upsert.mergeParquet(spark, targetPath,
          cardPartial(batch, weights, k), batchId = Some(batchId))(
          mergeCards(k))
        ()
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    if (checkpointDir.isEmpty)
      graft.operators.Maintenance.rmTree(ckpt.toFile)
  }

  /** The card read off the standing state — q132's output shape, with
    * the vocabulary estimate derived from the stored sketch (the k must
    * match the state's embedded `p_k`; a mismatch fails fast). */
  def readCard(spark: SparkSession, targetPath: String,
      k: Int = 64): DataFrame = {
    Upsert.recoverStagedSwap(targetPath)
    validateCardK(spark, targetPath, k)
    spark.read.parquet(targetPath)
      .select(col("source"), col("docs"), col("chars"), col("tokens"),
        Sketch.kmvEstimate("mins", k).as("est_distinct_tokens"),
        col("model_score_micros"), col("kept_docs"))
  }
}
