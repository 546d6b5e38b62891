package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, Upsert}

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("summarize: null/distinct accounting per column from one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")), (None, Some("b"))
    ).toDF("x", "y")
    val out = Profile.summarize(df, Seq("x", "y"))
      .as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("x", 3L, 1L, 2L), ("y", 3L, 1L, 2L))
  }

  test("snapshotDiff: added/removed/changed classified, unchanged dropped, nulls compare null-safe") {
    val oldV = Seq(
      (1L, Some("a"), 10.0), (2L, None, 20.0), (3L, Some("c"), 30.0),
      (4L, Some("d"), 40.0)
    ).toDF("k", "s", "v")
    val newV = Seq(
      (1L, Some("a"), 10.0),      // unchanged — dropped
      (2L, None, 20.0),           // unchanged with a null column — null-safe equal
      (3L, Some("c"), 31.0),      // changed
      (5L, Some("e"), 50.0)       // added
    ).toDF("k", "s", "v")         // 4 removed
    val out = Upsert.snapshotDiff(oldV, newV, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    out shouldBe Seq((3L, "changed"), (4L, "removed"), (5L, "added"))
  }

  test("snapshotDiff: NULL-keyed rows classify by side presence, not key nullness") {
    // null keys never satisfy the equi-join, so each side's null-key row
    // surfaces one-sided; classifying on key nullness would mislabel the
    // OLD-side row "added" (its o.k is null for a different reason)
    val oldV = Seq((Some(1L), "a"), (None, "old-null")).toDF("k", "v")
    val newV = Seq((Some(1L), "a"), (None, "new-null")).toDF("k", "v")
    val out = Upsert.snapshotDiff(oldV, newV, Seq("k"))
      .filter(col("k").isNull)
      .select("change_type").as[String].collect().toSeq.sorted
    out shouldBe Seq("added", "removed")
  }

  test("snapshotDiff: one-sided columns are ignored, keys-only tables classify by presence") {
    val oldV = Seq((1L, "x"), (2L, "y")).toDF("k", "only_old")
    val newV = Seq((2L, 9), (3L, 7)).toDF("k", "only_new")
    val out = Upsert.snapshotDiff(oldV, newV, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    // no shared non-key columns → nothing can be 'changed'
    out shouldBe Seq((1L, "removed"), (3L, "added"))
  }

  test("datasetChecksum: order/partition-independent, drift-sensitive, null-safe") {
    import spark.implicits._
    import graft.operators.Profile
    val df = Seq((1L, "a", "x"), (2L, null, "x"), (3L, "c", "y"))
      .toDF("id", "v", "src")
    def sums(d: org.apache.spark.sql.DataFrame) =
      Profile.datasetChecksum(d, col("src"), Seq("id", "v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = sums(df)
    base.map(_._1) shouldBe Set("x", "y")
    // row order and partitioning never matter (commutative sum)
    sums(df.orderBy(col("id").desc).repartition(7)) shouldBe base
    // a single-row change shifts the group checksum but not the count
    val drifted = sums(Seq((1L, "a", "x"), (2L, "B", "x"), (3L, "c", "y"))
      .toDF("id", "v", "src"))
    drifted.find(_._1 == "y") shouldBe base.find(_._1 == "y")
    val (bx, dx) = (base.find(_._1 == "x").get, drifted.find(_._1 == "x").get)
    dx._2 shouldBe bx._2
    dx._3 should not be bx._3
    // null is distinguished from empty string (the sentinel is outside
    // the data alphabet)
    val withEmpty = sums(Seq((1L, "a", "x"), (2L, "", "x"), (3L, "c", "y"))
      .toDF("id", "v", "src"))
    withEmpty.find(_._1 == "x").get._3 should not be bx._3
  }
}
