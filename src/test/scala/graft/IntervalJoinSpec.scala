package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Bucket-blocked interval join: inclusive boundaries, cross-bucket
  * matches, and equivalence with the naive inequality join. */
class IntervalJoinSpec extends SparkSpecBase {

  test("followWithin: inclusive [t, t+w] window, cross-bucket pairs found") {
    import spark.implicits._
    // w = 100; left at t=95 (bucket 0) must see right at 130 (bucket 100)
    val left = Seq((1L, 95L, "v1"), (1L, 0L, "v2"), (2L, 10L, "v3"))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 95L, "same-instant"), (1L, 130L, "next-bucket"),
      (1L, 195L, "at-upper-edge"), (1L, 196L, "past-window"),
      (1L, 94L, "before"), (2L, 200L, "other-key-late"))
      .toDF("k", "t", "rid")
    val got = IntervalJoin.followWithin(left, right,
        col("k"), col("t"), col("k"), col("t"), 100L)
      .select(col("lid"), col("matched.rid").as("rid"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set(
      "v1" -> "same-instant",   // rt == lt
      "v1" -> "next-bucket",    // match across the bucket boundary
      "v1" -> "at-upper-edge",  // rt == lt + w (inclusive)
      "v2" -> "same-instant", "v2" -> "before")
  }

  test("followWithin plans an equi-join, never a nested-loop/cartesian") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 20L)).toDF("k", "t")
    val plan = IntervalJoin.followWithin(left, right,
        col("k"), col("t"), col("k"), col("t"), 100L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("followWithin equals the naive inequality join") {
    import spark.implicits._
    val left = (0 until 300).map(i => ((i % 7).toLong, (i * 37 % 1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (0 until 300).map(i => ((i % 7).toLong, (i * 53 % 1000).toLong, (1000 + i).toLong))
      .toDF("k", "t", "rid")
    val w = 120L
    val fast = IntervalJoin.followWithin(left, right,
        col("k"), col("t"), col("k"), col("t"), w)
      .select(col("lid"), col("matched.rid").as("rid"))
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("r.t") >= col("l.t") && col("r.t") <= col("l.t") + w)
      .select(col("l.lid"), col("r.rid"))
    fast.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(fast).count() shouldBe 0L
  }
}
