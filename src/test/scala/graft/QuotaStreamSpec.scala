package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.QuotaStream

/** Streaming per-domain quota ≡ the global per-source head over the
  * batch-ordered corpus; full-replay idempotence (no double count, no
  * different set) and cross-session continuation against the standing
  * counts. */
class QuotaStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def land(landing: java.nio.file.Path)(
      df: org.apache.spark.sql.DataFrame, name: String, mod: Long): Unit = {
    val stage = Files.createTempDirectory("graft_quota_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, landing.resolve(name))
    landing.resolve(name).toFile.setLastModified(mod)
    ()
  }

  test("two-batch quota equals the global per-source head; durable-checkpoint re-runs fold nothing twice; a later batch fills only remaining quota") {
    val docs = Seq(
      // s1: batch a (even ids) has 2, 4; batch b has 1, 3 — cap 3 drops 3
      (1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s1"),
      // s2: batch a has 6; batch b has 5, 7, 9 — cap 3 drops 9
      (5L, "s2"), (6L, "s2"), (7L, "s2"), (9L, "s2"),
      // s3: batch b only — under quota
      (11L, "s3")
    ).toDF("doc_id", "source")
    val root = Files.createTempDirectory("graft_quota_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    land(landing)(docs.filter(col("doc_id") % 2 === 0), "a.parquet", 1000000L)
    land(landing)(docs.filter(col("doc_id") % 2 =!= 0), "b.parquet", 2000000L)
    val ckpt = root.resolve("ckpt").toString
    try {
      def run(cap: Long = 3L): Set[(String, Long, Long)] =
        QuotaStream.runQuotaAdmission(spark, landing.toString,
            root.resolve("state").toString, root.resolve("out").toString,
            capPerSource = cap, maxFilesPerTrigger = Some(1),
            checkpointDir = Some(ckpt))
          .select("source", "doc_id", "rk")
          .as[(String, Long, Long)].collect().toSet
      val first = run()
      first shouldBe Set(
        ("s1", 2L, 1L), ("s1", 4L, 2L), ("s1", 1L, 3L),
        ("s2", 6L, 1L), ("s2", 5L, 2L), ("s2", 7L, 3L),
        ("s3", 11L, 1L))
      // same durable checkpoint again: committed landing files are not
      // re-processed — same set, counts unchanged
      run() shouldBe first
      spark.read.parquet(root.resolve("state").toString)
        .select("source", "admitted")
        .as[(String, Long)].collect().toMap shouldBe
        Map("s1" -> 3L, "s2" -> 3L, "s3" -> 1L)
      // a SCRATCH re-run against the marked standing state is refused:
      // restarted batch ids would collide with the applied set, and a
      // colliding id carrying NEW landing files would be silently skipped
      val eScratch = intercept[IllegalArgumentException] {
        QuotaStream.runQuotaAdmission(spark, landing.toString,
          root.resolve("state").toString, root.resolve("out").toString,
          capPerSource = 3L, maxFilesPerTrigger = Some(1))
      }
      eScratch.getMessage should include("applied-batch")
      // a later session lands a third batch: counts under one budget are
      // not comparable under another — the new batch's fold must fail
      // fast on a cap change (the stream wraps the cause, walk the chain)
      land(landing)(
        Seq((12L, "s3"), (13L, "s3"), (14L, "s3"), (8L, "s1"))
          .toDF("doc_id", "source"),
        "c.parquet", 3000000L)
      val e = intercept[Exception] { run(cap = 5L) }
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
        include("capPerSource=3")
      // continuation at the original cap: full sources admit nothing,
      // s3 fills its remaining 2 slots in doc_id order
      run() shouldBe first ++ Set(("s3", 12L, 2L), ("s3", 13L, 3L))
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }

  test("an empty first micro-batch folds nothing and poisons nothing") {
    // a zero-row landing file used to merge a ZERO-ROW state table whose
    // empty p_cap distinct set failed every later batch's budget check
    val root = Files.createTempDirectory("graft_quota_empty_")
    val landing = root.resolve("landing"); Files.createDirectory(landing)
    land(landing)(Seq.empty[(Long, String)].toDF("doc_id", "source"),
      "a.parquet", 1000000L)
    land(landing)(Seq((1L, "s1"), (2L, "s1"), (3L, "s2"))
      .toDF("doc_id", "source"), "b.parquet", 2000000L)
    try {
      QuotaStream.runQuotaAdmission(spark, landing.toString,
          root.resolve("state").toString, root.resolve("out").toString,
          capPerSource = 2L, maxFilesPerTrigger = Some(1))
        .select("source", "doc_id", "rk")
        .as[(String, Long, Long)].collect().toSet shouldBe
        Set(("s1", 1L, 1L), ("s1", 2L, 2L), ("s2", 3L, 1L))
      spark.read.parquet(root.resolve("state").toString)
        .select("source", "admitted")
        .as[(String, Long)].collect().toMap shouldBe
        Map("s1" -> 2L, "s2" -> 1L)
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }
}
