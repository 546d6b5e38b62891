package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedCountDistinct equals plain countDistinct on skewed data") {
    val rnd = new Random(3)
    // one hot key with many values, many cold keys with few
    val rows = (1 to 5000).map(_ => ("hot", rnd.nextInt(2000).toLong)) ++
      (1 to 500).map(i => (s"cold${i % 50}", rnd.nextInt(10).toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedCountDistinct(df, Seq("k"), col("v"), buckets = 16)
    val plain = df.groupBy("k").agg(countDistinct(col("v")).as("distinct_count"))
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  test("AQE splits a skewed shuffle-join partition at runtime (no salting needed)") {
    // the documented when-NOT-to-salt case (Skew scaladoc): AQE's skew
    // handler splits oversized partitions of a sort-merge join on its
    // own — assert the runtime plan actually took that path on a
    // deliberately skewed key, with thresholds lowered so fixture-scale
    // data triggers the handler
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val payload = "x" * 64
      val left = ((1 to 40000).map(_ => ("hot", payload)) ++
        (1 to 400).map(i => (s"k${i % 40}", payload))).toDF("key", "pl")
      val right = (Seq("hot") ++ (0 until 40).map(i => s"k$i"))
        .map(k => (k, k.length)).toDF("key", "rv")
      val joined = left.join(right, "key")
      // collect() executes THIS frame's queryExecution (count() would plan
      // a separate query and leave this one un-executed / isFinalPlan=false)
      joined.collect().length shouldBe 40000 + 400
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(30).mkString("\n")) {
        plan should include("skew=true")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain inner join, including hot-key multiplicity") {
    val rnd = new Random(9)
    val left = ((1 to 3000).map(_ => ("hot", rnd.nextInt(100))) ++
      (1 to 300).map(i => (s"k${i % 30}", i))).toDF("key", "lv")
    val right = (Seq("hot" -> 1, "hot" -> 2) ++
      (0 until 30).map(i => s"k$i" -> i)).toDF("key", "rv")
    val salted = Skew.saltedJoin(left, right, "key", salt = 4)
      .select("key", "lv", "rv")
    val plain = left.join(right, "key").select("key", "lv", "rv")
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }
}
