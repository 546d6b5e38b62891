package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Similarity

/** STREAMING ANN PROBE — the serving side of the index lifecycle, and
  * the missing half of [[AnnIngest]]'s symmetry: query vectors land in
  * micro-batches and each batch retrieves its top-k from the STANDING
  * IVF-flat artifact ([[Similarity.ivfFlatProbe]] — partition-pruned to
  * the probed cells, tombstone-masked, streamed-appends visible). The
  * continuous form of a retrieval service's request loop: index builds
  * are rare and batch; probes arrive forever.
  *
  * Engineering shape: probing is STATELESS — each query's answer is a
  * pure function of (query vector, standing index) — so the loop needs
  * no state store, no watermark, and no standing-table rewrite. Each
  * micro-batch writes its results to `outDir/batch=<id>/` with
  * deterministic overwrite: a replayed batch rewrites the same bytes
  * into the same directory, so the sink is exactly-once by idempotence
  * (the per-batch-directory idiom; [[AdmissionStream]] pays
  * [[graft.operators.Upsert.mergeParquet]]'s batchId-keyed standing
  * rewrite only because admission must FOLD state — results here are
  * append-only, and rewriting a standing results table per batch would
  * be O(all results so far) per batch at serving scale). Readers see
  * the union via partition discovery over `outDir` (the `batch` column
  * is the directory key); read AFTER the run completes, or tolerate an
  * in-flight batch directory being rewritten.
  *
  * Scale: per batch the probe collects ≤ nLists probed cell ids and
  * scans only those cells' partitions — batch cost ∝ queries·cells
  * touched, never corpus size, the same bound the batch probe proves in
  * BENCH_SCALE. */
object ProbeStream {

  /** Run a bounded query-vector stream to completion against the
    * standing index at `indexPath`, landing per-batch top-k results
    * under `outDir/batch=<id>/` as (query_id, neighbor_id, rnk).
    * `landingDir` files must carry (vec_id, embedding) — the
    * embeddings shape ([[AnnIngest.defaultLandingSchema]]). */
  def runProbes(spark: SparkSession, landingDir: String, indexPath: String,
      outDir: String, k: Int, nProbe: Int = 2,
      maxFilesPerTrigger: Option[Int] = None,
      schemaFallback: Option[StructType] = None,
      checkpointDir: Option[String] = None): Unit = {
    require(Similarity.readCentroids(spark, indexPath).nonEmpty,
      s"no centroid table under $indexPath — not a writeIvfFlatIndex artifact")
    val landingSchema =
      scala.util.Try(spark.read.parquet(landingDir).schema).toOption
        .orElse(schemaFallback).getOrElse(AnnIngest.defaultLandingSchema)
    val ckpt = checkpointDir.map(java.nio.file.Paths.get(_))
      .getOrElse(EventStreams.scratchDir("graft_probe_ckpt_"))
    val reader = spark.readStream.schema(landingSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    val q = reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.ivfFlatProbe(
            batch.select("vec_id", "embedding"), indexPath, k, nProbe)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/batch=$batchId")
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    if (checkpointDir.isEmpty)
      graft.operators.Maintenance.rmTree(ckpt.toFile)
  }
}
