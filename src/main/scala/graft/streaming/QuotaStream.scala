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

  /** The SESSION-scoped quota fold — [[runQuotaAdmission]]'s loop body,
    * exposed as a factory so it also plugs straight into
    * [[AdmissionStream.runAdmission]]'s `onBatchAdmitted` observer seam
    * (the dedup → quota composition of a continuous ingest: only
    * near-dup-admitted rows reach the quota, q160). Idempotent per
    * batchId: the state's applied markers gate the WHOLE fold, so a
    * replayed batch neither recomputes against post-fold counts nor
    * double-counts.
    *
    * Construction resolves the standing state ONCE — crash recovery,
    * the embedded-budget fail-fast, the applied set, and the
    * |sources|-row counts (pinned with an eager localCheckpoint) — and
    * each batch then carries the counts forward IN MEMORY: the fold
    * already computes the post-batch counts, so re-reading the state
    * parquet it just wrote (plus its p_cap distinct and applied marker)
    * every micro-batch was pure per-batch fixed cost, the dominant term
    * of the composed-ingest benches (the q116 per-batch-FS-cost lesson).
    * State WRITES keep the full mergeParquet staged-swap + applied-marker
    * discipline, now with replace semantics (the in-memory counts are
    * the whole table). Sound under the single-writer contract every
    * artifact mutation here assumes: within a session nothing else
    * mutates the state, and a crash restarts the session, which re-reads
    * the table (markers included) from disk. */
  def quotaFold(spark: SparkSession, statePath: String, outPath: String,
      capPerSource: Long): (DataFrame, Long) => Unit = {
    Upsert.recoverStagedSwap(statePath)
    val state =
      if (Fs.exists(statePath)) Some(spark.read.parquet(statePath))
      else None
    // embedded-parameter fail-fast (the index p_* discipline): counts
    // accumulated under one budget are not comparable under another — a
    // cap change needs a fresh state table. Checked at session start,
    // BEFORE any applied gate, so a replayed batch under a changed cap
    // fails loudly instead of silently serving the old budget's output.
    // p_cap is an RLE'd constant; the distinct is |sources|-bounded. An
    // empty distinct set is a ZERO-ROW state table (a legacy empty-batch
    // merge) — no evidence of a budget, treated as absent.
    state.foreach { st =>
      val caps = st.select(col("p_cap")).distinct()
        .collect().map(_.getLong(0)).toSet
      require(caps.isEmpty || caps == Set(capPerSource),
        s"quota state at $statePath was built with capPerSource=" +
          s"${caps.mkString(",")}; refusing to fold with " +
          s"$capPerSource — start a new state table for a new budget")
    }
    var applied = Upsert.appliedBatches(statePath)
    var counts = state
      .map(_.select(col("source"), col("admitted")))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("source", StringType),
          StructField("admitted", LongType)))))
      .localCheckpoint(true)

    (batch: DataFrame, batchId: Long) =>
      // the applied-set gates the WHOLE batch: recomputing a replayed
      // batch against the post-merge counts would admit a smaller
      // (wrong) set — the original attempt's subdir stands
      if (!applied.contains(batchId)) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id").asc)
        val admitted = batch.select(col("doc_id"), col("source"))
          .withColumn("__rn", row_number().over(w).cast("long"))
          .join(broadcast(counts.select(col("source"),
            col("admitted").as("__got"))), Seq("source"), "left")
          .filter(col("__rn") <=
            lit(capPerSource) - coalesce(col("__got"), lit(0L)))
          .withColumn("rk", col("__rn") + coalesce(col("__got"), lit(0L)))
          .select(col("source"), col("doc_id"), col("rk"))
          // one evaluation feeds the output write AND the state fold
          .localCheckpoint(true)
        // batchId-keyed subdir: a replayed batch overwrites itself
        // with the identical set (exactly-once), never appends
        admitted.write.mode("overwrite").parquet(s"$outPath/batch-$batchId")
        // a batch that admits NOTHING (empty landing file, or every
        // source already at cap) folds nothing — merging it would just
        // create a zero-row state table on a first batch. Skipping the
        // marker is safe: a replay recomputes against the same pre-batch
        // counts (later batches only run after this one committed its
        // checkpoint) and reaches the same empty set
        if (!admitted.isEmpty) {
          // post-batch counts, carried to the next batch in memory; the
          // merge work is |sources|-sized and disk is never re-read
          val next = Upsert.additiveMerge(counts,
              admitted.groupBy(col("source"))
                .agg(count(lit(1)).cast("long").as("admitted")),
              keys = Seq("source"), metrics = Seq("admitted"))
            .localCheckpoint(true)
          // state fold AFTER the output committed: a crash between the
          // two replays into the not-applied branch above and rewrites
          // the same rows before folding. Replace semantics — `next` IS
          // the table — under the same staged-swap + applied-marker
          // exactly-once discipline as the additive form it supersedes.
          Upsert.mergeParquet(spark, statePath,
            next.withColumn("p_cap", lit(capPerSource)),
            Some(batchId))((_, updates) => updates)
          counts = next
          applied += batchId
        }
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
    // cross-session guard (ModelStream/GramianStream's contract): against
    // standing state with applied-batch markers, a SCRATCH checkpoint
    // restarts batch ids at 0 — a colliding id whose batch now contains
    // NEW landing files would be skipped by the marker, silently dropping
    // that data from the quota output
    Upsert.recoverStagedSwap(statePath)
    require(checkpointDir.nonEmpty
        || Upsert.appliedBatches(statePath).isEmpty,
      s"standing quota state at $statePath already carries applied-batch " +
        "markers and no durable checkpointDir was supplied — a scratch " +
        "checkpoint restarts batch ids at 0, which would collide with " +
        "the applied set and silently skip this session's data; pass " +
        "the prior session's checkpointDir (or start a fresh statePath)")
    val ckpt = checkpointDir.map(java.nio.file.Paths.get(_))
      .getOrElse(EventStreams.scratchDir("graft_quota_ckpt_"))
    val landingSchema =
      scala.util.Try(spark.read.parquet(landingDir).schema).toOption
        .orElse(schemaFallback).getOrElse(defaultLandingSchema)
    val reader = spark.readStream.schema(landingSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    var lastBatchId = -1L
    // ONE session fold: standing counts + applied set resolved here,
    // carried across batches in memory
    val fold = quotaFold(spark, statePath, outPath, capPerSource)
    val q = reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lastBatchId = math.max(lastBatchId, batchId)
        fold(batch, batchId)
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
