package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.TopNStream

/** Streaming top-N with replacement ≡ the global per-source top-N;
  * later batches displace standing entries; replay is a bit-identical
  * no-op; the board size is an embedded parameter. */
class TopNStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def land(landing: java.nio.file.Path)(
      df: org.apache.spark.sql.DataFrame, name: String, mod: Long): Unit = {
    val stage = Files.createTempDirectory("graft_topn_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, landing.resolve(name))
    landing.resolve(name).toFile.setLastModified(mod)
    ()
  }

  test("later batches displace smaller scores; replay is a no-op; a changed board size fails fast") {
    val batchA = Seq(
      (1L, "s1", 10L), (2L, "s1", 30L), (3L, "s1", 20L),
      (4L, "s2", 5L)
    ).toDF("doc_id", "source", "n_chars")
    val batchB = Seq(
      (5L, "s1", 25L),  // displaces doc 3 (20) from s1's top-2
      (6L, "s2", 50L),  // joins s2's board alongside 4
      (7L, "s3", 1L)    // new source
    ).toDF("doc_id", "source", "n_chars")
    val root = Files.createTempDirectory("graft_topn_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    land(landing)(batchA, "a.parquet", 1000000L)
    land(landing)(batchB, "b.parquet", 2000000L)
    val ckpt = root.resolve("ckpt").toString
    try {
      def run(n: Int): Set[(String, Long, Long)] =
        TopNStream.runTopN(spark, landing.toString,
            root.resolve("state").toString, n = n, scoreCol = "n_chars",
            maxFilesPerTrigger = Some(1), checkpointDir = Some(ckpt))
          .as[(String, Long, Long)].collect().toSet
      val first = run(2)
      first shouldBe Set(
        ("s1", 2L, 30L), ("s1", 5L, 25L),
        ("s2", 6L, 50L), ("s2", 4L, 5L),
        ("s3", 7L, 1L))
      // same durable checkpoint: committed files not re-folded, same board
      run(2) shouldBe first
      // a SCRATCH re-run against the marked standing state is refused —
      // restarted batch ids would collide with the applied set and a
      // colliding id's NEW landing data would be silently skipped
      val eScratch = intercept[IllegalArgumentException] {
        TopNStream.runTopN(spark, landing.toString,
          root.resolve("state").toString, n = 2, scoreCol = "n_chars",
          maxFilesPerTrigger = Some(1))
      }
      eScratch.getMessage should include("applied-batch")
      // ties on score break to the LOWER doc_id: a tying late arrival
      // with a higher id does not displace
      land(landing)(Seq((8L, "s1", 25L)).toDF("doc_id", "source", "n_chars"),
        "c.parquet", 3000000L)
      run(2) shouldBe first
      // board size is embedded — the next NEW batch's fold at another n
      // must fail fast (walk the stream wrapper's cause chain)
      land(landing)(Seq((9L, "s2", 100L)).toDF("doc_id", "source", "n_chars"),
        "d.parquet", 4000000L)
      val e = intercept[Exception] { run(3) }
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
        include("n=2")
      // continuation at the original n: the late high score displaces
      // s2's smallest standing entry
      run(2) shouldBe first - (("s2", 4L, 5L)) + (("s2", 9L, 100L))
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }

  test("an empty first micro-batch folds nothing and poisons nothing") {
    // a zero-row landing file used to stage-swap a ZERO-ROW state table
    // whose empty p_n distinct set failed every later batch's size check
    val root = Files.createTempDirectory("graft_topn_empty_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    land(landing)(Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "source", "n_chars"), "a.parquet", 1000000L)
    land(landing)(Seq((1L, "s1", 10L), (2L, "s1", 20L), (3L, "s1", 30L))
      .toDF("doc_id", "source", "n_chars"), "b.parquet", 2000000L)
    try {
      TopNStream.runTopN(spark, landing.toString,
          root.resolve("state").toString, n = 2, scoreCol = "n_chars",
          maxFilesPerTrigger = Some(1))
        .as[(String, Long, Long)].collect().toSet shouldBe
        Set(("s1", 3L, 30L), ("s1", 2L, 20L))
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }
}
