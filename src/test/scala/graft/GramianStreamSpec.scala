package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Pca, Upsert}
import graft.streaming.GramianStream

/** Streaming PCA moment maintenance ≡ the one-pass batch moment
  * computation; parameter guards; replay idempotence. */
class GramianStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def embeddings =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def land(df: org.apache.spark.sql.DataFrame,
      landing: java.nio.file.Path, name: String, mod: Long): Unit = {
    val stage = Files.createTempDirectory("graft_gram_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, landing.resolve(name))
    landing.resolve(name).toFile.setLastModified(mod)
    ()
  }

  test("streamed moment fold equals the one-pass batch computation, cell for cell — fit included") {
    val root = Files.createTempDirectory("graft_gram_eq_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    val state = root.resolve("moments").toString
    try {
      land(embeddings.filter(col("vec_id") % 2 === 0), landing, "a.parquet", 1000000L)
      land(embeddings.filter(col("vec_id") % 2 =!= 0), landing, "b.parquet", 2000000L)
      GramianStream.runGramianStream(spark, landing.toString, state,
        maxFilesPerTrigger = Some(1))
      val streamed = spark.read.parquet(state)
        .select(col("i"), col("j"), col("q"))
        .as[(Int, Int, Long)].collect().toMap2
      val batch = Pca.momentRows(embeddings, col("embedding"), 1e6)
        .filter(col("i") >= -1) // width markers carry partition counts
        .as[(Int, Int, Long)].collect().toMap2
      assert(streamed === batch)
      // and the artifact-served model is bit-identical to a direct fit
      assert(Pca.fitFromArtifact(spark, state, k = 4) ===
        Pca.fit(embeddings, col("embedding"), k = 4))
    } finally graft.operators.Maintenance.rmTree(root.toFile)
  }

  test("scale and dim mismatches fail fast; replays under a durable checkpoint fold nothing twice") {
    val root = Files.createTempDirectory("graft_gram_guard_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    val state = root.resolve("moments").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      land(embeddings.filter(col("vec_id") % 2 === 0), landing, "a.parquet", 1000000L)
      GramianStream.runGramianStream(spark, landing.toString, state,
        checkpointDir = Some(ckpt))
      val afterOne = spark.read.parquet(state)
        .select(col("i"), col("j"), col("q"))
        .as[(Int, Int, Long)].collect().toMap2
      // same session again: committed landing files are not re-folded
      GramianStream.runGramianStream(spark, landing.toString, state,
        checkpointDir = Some(ckpt))
      val afterReplay = spark.read.parquet(state)
        .select(col("i"), col("j"), col("q"))
        .as[(Int, Int, Long)].collect().toMap2
      assert(afterReplay === afterOne)
      // scale mismatch against standing state
      val exScale = intercept[IllegalArgumentException] {
        GramianStream.runGramianStream(spark, landing.toString, state,
          scale = 1e4, checkpointDir = Some(ckpt))
      }
      assert(exScale.getMessage.contains("scale"))
      // dim mismatch: a dim-3 batch against the dim-64 standing state
      land(Seq((9000001L, Seq(1.0f, 2.0f, 3.0f)))
        .toDF("vec_id", "embedding"), landing, "c.parquet", 3000000L)
      val exDim = intercept[Exception] {
        GramianStream.runGramianStream(spark, landing.toString, state,
          checkpointDir = Some(ckpt))
      }
      def mentionsDim(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("dim-3")) ||
          mentionsDim(t.getCause))
      assert(mentionsDim(exDim))
      // scratch re-run against marked standing state is refused
      val exScratch = intercept[IllegalArgumentException] {
        GramianStream.runGramianStream(spark, landing.toString, state)
      }
      assert(exScratch.getMessage.contains("applied-batch"))
    } finally graft.operators.Maintenance.rmTree(root.toFile)
  }

  test("mixed embedding widths inside ONE micro-batch fail fast — width markers") {
    // two landing files of different dims arrive in the same trigger:
    // each file's partitions are internally consistent, so only the
    // per-partition (-2, d) markers can see the mismatch (max(i)+1
    // would just report the widest and silently fold the narrower file)
    val root = Files.createTempDirectory("graft_gram_mixed_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    val state = root.resolve("moments").toString
    try {
      land(Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"),
        landing, "a.parquet", 1000000L)
      land(Seq((2L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding"),
        landing, "b.parquet", 2000000L)
      def mentionsMixed(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("mixed widths")) ||
          mentionsMixed(t.getCause))
      assert(mentionsMixed(intercept[Exception] {
        GramianStream.runGramianStream(spark, landing.toString, state)
      }))
      // nothing was folded: the guard fired before the merge
      assert(!graft.operators.Fs.exists(state))
    } finally graft.operators.Maintenance.rmTree(root.toFile)
  }

  test("an empty-only durable first session flushes markers without dim " +
      "evidence; the data continuation folds cleanly") {
    val root = Files.createTempDirectory("graft_gram_empty1_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    val state = root.resolve("state").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      // session 1: one zero-row landing file — the batch folds nothing,
      // but the primed table (StateFold.primeMarkerEvidence) means the
      // session-end flush records the applied marker instead of either
      // skipping (the old poison) or demanding dim evidence (the old
      // flush crash)
      land(embeddings.filter(lit(false)), landing, "a.parquet", 1000000L)
      GramianStream.runGramianStream(spark, landing.toString, state,
        checkpointDir = Some(ckpt))
      Upsert.appliedBatches(state) shouldBe Set(0L)
      spark.read.parquet(state).count() shouldBe 0L
      // session 2: real data continues against the primed state — the
      // zero-row table carries no p_scale/p_dim evidence, so any scale
      // is accepted and the fold lands
      land(embeddings, landing, "b.parquet", 2000000L)
      GramianStream.runGramianStream(spark, landing.toString, state,
        checkpointDir = Some(ckpt))
      val streamed = spark.read.parquet(state)
        .select(col("i"), col("j"), col("q"))
        .as[(Int, Int, Long)].collect().toMap2
      val direct = Pca.momentRows(embeddings, col("embedding"), 1e6)
        .filter(col("i") >= -1)
        .select(col("i"), col("j"), col("q"))
        .as[(Int, Int, Long)].collect().toMap2
      streamed shouldBe direct
    } finally graft.operators.Maintenance.rmTree(root.toFile)
  }

  private implicit class Tup3Ops(rows: Array[(Int, Int, Long)]) {
    def toMap2: Map[(Int, Int), Long] =
      rows.map { case (i, j, q) => ((i, j), q) }.toMap
  }
}
