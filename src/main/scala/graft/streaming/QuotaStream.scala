package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Fs, Upsert}

/** Per-domain QUOTA admission over a bounded landing stream — the
  * continuous-ingest form of
  * [[graft.operators.Sampling.exactNPerStratum]]'s cap: every source
  * (domain) may contribute at most `capPerSource` admitted documents
  * ACROSS the whole stream, first-come-first-served. The mix recipe a
  * tokens-per-domain budget specifies, enforced while the corpus is
  * still arriving instead of by a full re-selection pass.
  *
  * State is ONE ROW PER SOURCE (`source`, `admitted`) — bounded by the
  * domain vocabulary, never the corpus — folded additively per batch
  * through [[Upsert.mergeParquet]]'s applied-batch markers. A replayed
  * batch is recognized BEFORE recomputation: its admitted subdir is
  * already exactly the rows the original attempt wrote (the per-batch
  * admission is a deterministic function of the batch and the
  * pre-batch state), and the state fold is a marker no-op — so crash
  * replay can neither double-count a source nor admit a different set.
  * Within a batch the admitted rows are the per-source doc_id-ascending
  * head of the REMAINING quota; `rk` carries each row's position in its
  * source's overall admitted sequence (prior count + in-batch rank).
  *
  * At 100 TB: the per-batch work is one window over the batch
  * (partitioned by source) plus a join against the |sources|-row state
  * table — broadcast-sized by construction; rejected rows are dropped,
  * not deferred (the quota is a budget, not a queue), so no state ever
  * grows with the corpus.
  *
  * Reference scope: the head-N cap of
  * `/root/reference/scripts/etl_snapshot_topn.py` (TOP_N slice),
  * generalized per-domain and made continuous.
  */
object QuotaStream {

  /** Landing schema fallback when the dir holds no parquet file yet:
    * the documents shape this stream consumes. */
  val defaultLandingSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType)))

  /** The per-batch quota fold — [[runQuotaAdmission]]'s loop body,
    * exposed so it also plugs straight into
    * [[AdmissionStream.runAdmission]]'s `onBatchAdmitted` observer seam
    * (the dedup → quota composition of a continuous ingest: only
    * near-dup-admitted rows reach the quota, q160). Idempotent per
    * batchId: the state's applied markers gate the WHOLE fold, so a
    * replayed batch neither recomputes against post-fold counts nor
    * double-counts. */
  def quotaFold(spark: SparkSession, statePath: String, outPath: String,
      capPerSource: Long)(batch: DataFrame, batchId: Long): Unit = {
    // the state's applied-set gates the WHOLE batch: recomputing a
    // replayed batch against the post-merge counts would admit a
    // smaller (wrong) set — the original attempt's subdir stands
    Upsert.recoverStagedSwap(statePath)
    val state =
      if (Fs.exists(statePath)) Some(spark.read.parquet(statePath))
      else None
    // embedded-parameter fail-fast (the index p_* discipline): counts
    // accumulated under one budget are not comparable under another — a
    // cap change needs a fresh state table. Checked BEFORE the applied
    // gate so a replayed batch under a changed cap fails loudly instead
    // of silently serving the old budget's output. p_cap is an RLE'd
    // constant; the distinct is |sources|-bounded.
    state.foreach { st =>
      val caps = st.select(col("p_cap")).distinct()
        .collect().map(_.getLong(0)).toSet
      require(caps == Set(capPerSource),
        s"quota state at $statePath was built with capPerSource=" +
          s"${caps.mkString(",")}; refusing to fold with " +
          s"$capPerSource — start a new state table for a new budget")
    }
    if (!Upsert.appliedBatches(statePath).contains(batchId)) {
      val counts = state
        .map(_.select(col("source"), col("admitted").as("__got")))
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("source", StringType),
            StructField("__got", LongType)))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id").asc)
      val admitted = batch.select(col("doc_id"), col("source"))
        .withColumn("__rn", row_number().over(w).cast("long"))
        .join(broadcast(counts), Seq("source"), "left")
        .filter(col("__rn") <=
          lit(capPerSource) - coalesce(col("__got"), lit(0L)))
        .withColumn("rk", col("__rn") + coalesce(col("__got"), lit(0L)))
        .select(col("source"), col("doc_id"), col("rk"))
        // one evaluation feeds the output write AND the state fold
        .localCheckpoint(true)
      // batchId-keyed subdir: a replayed batch overwrites itself
      // with the identical set (exactly-once), never appends
      admitted.write.mode("overwrite").parquet(s"$outPath/batch-$batchId")
      // state fold AFTER the output committed: a crash between the
      // two replays into the not-applied branch above and rewrites
      // the same rows before folding
      Upsert.mergeParquet(spark, statePath,
        admitted.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("admitted"))
          .withColumn("p_cap", lit(capPerSource)),
        Some(batchId))(
        // p_cap rides as a grouping key: after the fail-fast above every
        // row carries the same value, so the grouping is a no-op that
        // persists the parameter with the counts it governs
        Upsert.additiveMerge(_, _, Seq("source", "p_cap"), Seq("admitted")))
    }
  }

  /** Run a bounded landing stream to completion, admitting per-source
    * heads until each source's running count reaches `capPerSource`.
    * Returns the admitted rows (`source`, `doc_id`, `rk`) across all
    * batches of THIS run (stale higher-id batch subdirs from a prior,
    * longer run are swept, mirroring [[AdmissionStream.runAdmission]]). */
  def runQuotaAdmission(spark: SparkSession, landingDir: String,
      statePath: String, outPath: String, capPerSource: Long,
      maxFilesPerTrigger: Option[Int] = None,
      schemaFallback: Option[StructType] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    require(capPerSource > 0, "capPerSource must be positive")
    val ckpt = checkpointDir.map(java.nio.file.Paths.get(_))
      .getOrElse(EventStreams.scratchDir("graft_quota_ckpt_"))
    val landingSchema =
      scala.util.Try(spark.read.parquet(landingDir).schema).toOption
        .orElse(schemaFallback).getOrElse(defaultLandingSchema)
    val reader = spark.readStream.schema(landingSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    var lastBatchId = -1L
    val q = reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lastBatchId = math.max(lastBatchId, batchId)
        quotaFold(spark, statePath, outPath, capPerSource)(batch, batchId)
        ()
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    AdmissionStream.pruneStaleBatches(spark, outPath, lastBatchId)
    if (checkpointDir.isEmpty)
      graft.operators.Maintenance.rmTree(ckpt.toFile)
    val outP = new org.apache.hadoop.fs.Path(outPath)
    if (outP.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(outP))
      spark.read.option("recursiveFileLookup", "true").parquet(outPath)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("source", StringType),
          StructField("doc_id", LongType), StructField("rk", LongType))))
  }
}
