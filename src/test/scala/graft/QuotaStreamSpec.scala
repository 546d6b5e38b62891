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

  test("two-batch quota equals the global per-source head; replay admits the identical set without double-counting; a later batch fills only remaining quota") {
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
    try {
      def run(): Set[(String, Long, Long)] =
        QuotaStream.runQuotaAdmission(spark, landing.toString,
            root.resolve("state").toString, root.resolve("out").toString,
            capPerSource = 3L, maxFilesPerTrigger = Some(1))
          .select("source", "doc_id", "rk")
          .as[(String, Long, Long)].collect().toSet
      val first = run()
      first shouldBe Set(
        ("s1", 2L, 1L), ("s1", 4L, 2L), ("s1", 1L, 3L),
        ("s2", 6L, 1L), ("s2", 5L, 2L), ("s2", 7L, 3L),
        ("s3", 11L, 1L))
      // full replay (scratch checkpoint restarts batch ids at 0): the
      // applied markers skip both folds — same set, counts unchanged
      run() shouldBe first
      spark.read.parquet(root.resolve("state").toString)
        .select("source", "admitted")
        .as[(String, Long)].collect().toMap shouldBe
        Map("s1" -> 3L, "s2" -> 3L, "s3" -> 1L)
      // counts under one budget are not comparable under another —
      // folding the standing state with a different cap must fail fast
      // even on replayed batches (the check precedes the applied gate);
      // the stream wraps the cause, so walk the chain
      val e = intercept[Exception] {
        QuotaStream.runQuotaAdmission(spark, landing.toString,
          root.resolve("state").toString, root.resolve("out").toString,
          capPerSource = 5L, maxFilesPerTrigger = Some(1))
      }
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n") should
        include("capPerSource=3")
      // a later session lands a third batch: full sources admit nothing,
      // s3 fills its remaining 2 slots in doc_id order
      land(landing)(
        Seq((12L, "s3"), (13L, "s3"), (14L, "s3"), (8L, "s1"))
          .toDF("doc_id", "source"),
        "c.parquet", 3000000L)
      run() shouldBe first ++ Set(("s3", 12L, 2L), ("s3", 13L, 3L))
    } finally {
      graft.operators.Maintenance.rmTree(root.toFile)
      spark.catalog.clearCache()
    }
  }
}
