package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** S8 upsert semantics + the bucketing answer to the reference's
  * secondary indexes (SURVEY §4): bucketed tables co-locate join keys so
  * the join plans without a shuffle exchange. */
class UpsertAndBucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("upsert: updates win, unmatched current rows survive") {
    val current = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "name", "v")
    val updates = Seq((2L, "B2", 99), (4L, "d", 40)).toDF("id", "name", "v")
    val out = Upsert.upsert(current, updates, Seq("id"))
      .orderBy("id").as[(Long, String, Int)].collect().toSeq
    out shouldBe Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30), (4L, "d", 40))
  }

  test("upsert: duplicate keys within the updates batch collapse to one row") {
    val current = Seq((1L, 10)).toDF("id", "v")
    val dupes = Seq((1L, 11), (1L, 12), (2L, 21), (2L, 22)).toDF("id", "v")
    // ON CONFLICT (pk) DO UPDATE contract: the merged table stays
    // key-unique even when the batch itself repeats a key
    val merged = Upsert.upsert(current, dupes, Seq("id"))
    merged.groupBy("id").count().filter(col("count") > 1).count() shouldBe 0L
    // deterministic last-wins when a version column orders the batch
    val versioned = Upsert.upsert(current, dupes, Seq("id"), version = Some(col("v")))
      .orderBy("id").as[(Long, Int)].collect().toSeq
    versioned shouldBe Seq((1L, 12), (2L, 22))
  }

  test("upsertParquet: staged write-swap round-trips and is idempotent") {
    val dir = Files.createTempDirectory("graft_upsert_").toString
    val path = s"$dir/t"
    Upsert.upsertParquet(spark, path,
      Seq((1L, 10), (2L, 20)).toDF("id", "v"), Seq("id"))
    Upsert.upsertParquet(spark, path,
      Seq((2L, 99), (3L, 30)).toDF("id", "v"), Seq("id"))
    // applying the same update twice changes nothing
    Upsert.upsertParquet(spark, path,
      Seq((2L, 99), (3L, 30)).toDF("id", "v"), Seq("id"))
    spark.read.parquet(path).orderBy("id").as[(Long, Int)].collect().toSeq shouldBe
      Seq((1L, 10), (2L, 99), (3L, 30))
  }

  test("upsertParquet recovers a table stranded mid-swap (crash window)") {
    val dir = Files.createTempDirectory("graft_upsert_crash_").toString
    val path = s"$dir/t"
    Upsert.upsertParquet(spark, path, Seq((1L, 10), (2L, 20)).toDF("id", "v"), Seq("id"))
    // simulate a crash between the two swap renames: target moved to
    // __old, replacement never landed
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    Upsert.upsertParquet(spark, path, Seq((3L, 30)).toDF("id", "v"), Seq("id"))
    // the old rows were recovered before merging — not lost
    spark.read.parquet(path).orderBy("id").as[(Long, Int)].collect().toSeq shouldBe
      Seq((1L, 10), (2L, 20), (3L, 30))
  }

  test("mergeParquet batchId: replays skip, new batches add, marker survives merges") {
    val dir = Files.createTempDirectory("graft_batchid_").toString
    val path = s"$dir/rollup"
    def merge(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      Upsert.mergeParquet(spark, path, df, batchId = Some(id))(
        Upsert.additiveMerge(_, _, keys = Seq("k"), metrics = Seq("n")))
    def snapshot(): Seq[(String, Long)] =
      spark.read.parquet(path).orderBy("k").as[(String, Long)].collect().toSeq

    merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), 0L)
    snapshot() shouldBe Seq(("a", 1L), ("b", 2L))
    // replayed batch id: additive merge must NOT double-count
    merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), 0L)
    snapshot() shouldBe Seq(("a", 1L), ("b", 2L))
    // new batch id: adds
    merge(Seq(("a", 10L)).toDF("k", "n"), 1L)
    snapshot() shouldBe Seq(("a", 11L), ("b", 2L))
    // the applied-set survived the SaveMode.Overwrite rewrite + swap of
    // batch 1's merge: replaying batch 0 is STILL a no-op
    Upsert.appliedBatches(path) shouldBe Set(0L, 1L)
    merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), 0L)
    snapshot() shouldBe Seq(("a", 11L), ("b", 2L))
  }

  test("mergeParquet batchId marker survives the crash-recovery rename") {
    val dir = Files.createTempDirectory("graft_batchid_crash_").toString
    val path = s"$dir/rollup"
    def merge(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      Upsert.mergeParquet(spark, path, df, batchId = Some(id))(
        Upsert.additiveMerge(_, _, keys = Seq("k"), metrics = Seq("n")))
    merge(Seq(("a", 1L)).toDF("k", "n"), 7L)
    // crash between the two swap renames: table stranded at __old
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    // recovery restores the table AND its applied-set (the marker moved
    // with the directory), so the replay of batch 7 below is skipped
    merge(Seq(("b", 5L)).toDF("k", "n"), 8L)
    Upsert.appliedBatches(path) shouldBe Set(7L, 8L)
    merge(Seq(("a", 1L)).toDF("k", "n"), 7L)
    spark.read.parquet(path).orderBy("k").as[(String, Long)].collect().toSeq shouldBe
      Seq(("a", 1L), ("b", 5L))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val o = (1L to 1000L).map(i => (i, i % 100, i * 10.0)).toDF("o_id", "custkey", "price")
    val c = (0L until 100L).map(i => (i, s"cust$i")).toDF("custkey", "name")
    o.write.bucketBy(8, "custkey").sortBy("custkey").saveAsTable("b_orders")
    c.write.bucketBy(8, "custkey").saveAsTable("b_customer")
    val joined = spark.table("b_orders").join(spark.table("b_customer"), "custkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: SortMergeJoin directly over the bucketed scans — the
    // exchange that a plain parquet join needs is gone (disable the
    // broadcast fallback so the bucket path is what's planned)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = spark.table("b_orders").join(spark.table("b_customer"), "custkey")
        .queryExecution.executedPlan.toString
      p should not include "Exchange hashpartitioning"
    }
    joined.count() shouldBe 1000L
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
