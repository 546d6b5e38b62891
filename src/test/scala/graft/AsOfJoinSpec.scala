package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Backward as-of join semantics on tiny frames: inclusive boundary,
  * latest-at-or-before selection, and left-outer null for keys/times with
  * no prior right row. */
class AsOfJoinSpec extends SparkSpecBase {

  test("backward picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "x"), (3L, 7L, "y"))
      .toDF("k", "t", "eid")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 60L, "r60"))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.backward(left, right,
        col("k"), col("t"), col("k"), col("t"))
      .select(col("eid"), col("asof.rv").as("rv"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    out shouldBe Map(
      "e1" -> Some("r10"), // equal time matches (inclusive)
      "e2" -> Some("r15"), // latest at-or-before, not first
      "e0" -> None,        // before any right row
      "x" -> None,         // right row exists but only after
      "y" -> None)         // key absent from right
  }

  test("backward with tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 100L, "fresh"), (1L, 500L, "stale"), (2L, 50L, "none"))
      .toDF("k", "t", "eid")
    val right = Seq((1L, 90L, "r90")).toDF("k", "t", "rv")
    val out = AsOfJoin.backward(left, right,
        col("k"), col("t"), col("k"), col("t"), tolerance = Some(50L))
      .select(col("eid"), col("asof.rv").as("rv"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    out shouldBe Map(
      "fresh" -> Some("r90"), // 10 units old, within tolerance 50
      "stale" -> None,        // 410 units old — nulled, not carried
      "none" -> None)
  }

  test("backward plans union + one window — no join operator at all") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L)).toDF("k", "t")
    val plan = AsOfJoin.backward(left, right,
        col("k"), col("t"), col("k"), col("t"))
      .queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "Join"
  }

  test("backward equals the naive join-filter-max formulation") {
    import spark.implicits._
    // deterministic pseudo-random frames (no Math.random in specs)
    val left = (0 until 200).map(i => ((i * 7) % 5).toLong -> (i * 13 % 97).toLong)
      .zipWithIndex.map { case ((k, t), id) => (k, t, id.toLong) }
      .toDF("k", "t", "id")
    val right = (0 until 50).map(i => ((i * 3) % 5).toLong -> (i * 11 % 90).toLong)
      .distinct.map { case (k, t) => (k, t, s"v$k-$t") }
      .toDF("k", "t", "rv")
    val fast = AsOfJoin.backward(left, right,
        col("k"), col("t"), col("k"), col("t"))
      .select(col("id"), col("asof.t").as("mt"), col("asof.rv").as("rv"))
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("id"))
      .agg(max(struct(col("r.t"), col("r.rv"))).as("m"))
      .select(col("id"), col("m.t").as("mt"), col("m.rv").as("rv"))
    fast.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(fast).count() shouldBe 0L
  }
}
