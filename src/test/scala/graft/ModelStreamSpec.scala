package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Selection
import graft.streaming.ModelStream

/** Streaming DSIR model maintenance ≡ the one-pass batch fit: hashed
  * n-gram counts are additive over disjoint micro-batches, so the
  * folded artifact must equal [[Selection.writeNgramModel]] over the
  * batches' union EXACTLY (integer counts — no tolerance). */
class ModelStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def land(landing: java.nio.file.Path,
      df: org.apache.spark.sql.DataFrame, name: String, mod: Long): Unit = {
    val stage = Files.createTempDirectory("graft_model_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, landing.resolve(name))
    landing.resolve(name).toFile.setLastModified(mod)
    ()
  }

  test("streamed model fold equals the one-pass batch fit, cell for cell") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft_model_spec_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    land(landing, docs.filter(col("doc_id") % 2 === 0), "a.parquet", 1000000L)
    land(landing, docs.filter(col("doc_id") % 2 =!= 0), "b.parquet", 2000000L)
    val streamed = root.resolve("streamed").toString
    val batch = root.resolve("batch").toString
    try {
      ModelStream.runModelStream(spark, landing.toString, streamed,
        nBuckets = 256, maxFilesPerTrigger = Some(1))
      Selection.writeNgramModel(docs, col("text"), 256, batch)
      val s = spark.read.parquet(streamed)
        .select(col("s"), col("b"), col("c"), col("p_nbuckets"))
        .orderBy(col("s"), col("b"))
        .collect().toSeq
      val b = spark.read.parquet(batch)
        .select(col("s"), col("b"), col("c"), col("p_nbuckets"))
        .orderBy(col("s"), col("b"))
        .collect().toSeq
      s shouldBe b
      // and the reloaded models agree (readNgramModel accepts both)
      Selection.readNgramModel(spark, streamed, Some(256)) shouldBe
        Selection.readNgramModel(spark, batch, Some(256))
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }

  test("hash-width mismatch and scratch-checkpoint re-run fail fast; mergeParquet markers make replays no-ops") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_model_guard_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    land(landing, docs, "a.parquet", 1000000L)
    val target = root.resolve("model").toString
    try {
      ModelStream.runModelStream(spark, landing.toString, target,
        nBuckets = 64)
      // wrong hash width against standing state: refused before any fold
      an[IllegalArgumentException] should be thrownBy
        ModelStream.runModelStream(spark, landing.toString, target,
          nBuckets = 128)
      // standing applied-batch markers + scratch checkpoint: refused
      // (a restarted id sequence would silently skip this session)
      an[IllegalArgumentException] should be thrownBy
        ModelStream.runModelStream(spark, landing.toString, target,
          nBuckets = 64)
      // a DURABLE checkpoint continues safely: re-running over the same
      // committed files folds nothing twice (source-level dedup) and
      // the state is unchanged
      val ckpt = root.resolve("ckpt").toString
      val fresh = root.resolve("model2").toString
      ModelStream.runModelStream(spark, landing.toString, fresh,
        nBuckets = 64, checkpointDir = Some(ckpt))
      val before = spark.read.parquet(fresh)
        .orderBy(col("s"), col("b")).collect().toSeq
      ModelStream.runModelStream(spark, landing.toString, fresh,
        nBuckets = 64, checkpointDir = Some(ckpt))
      spark.read.parquet(fresh)
        .orderBy(col("s"), col("b")).collect().toSeq shouldBe before
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }
}
