package graft

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Event analytics (EventAnalytics): debounce chain semantics, the
  * single-shuffle funnel fold vs the conditional-min definition,
  * retention triangle arithmetic. */
class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private val S = 1000000L // one second in micros

  test("debounce: compares to the previous KEPT-OR-NOT event (chain)") {
    // events at 0s, 5s, 12s with a 10s gap: 5s is dropped (5-0 <= 10),
    // and 12s is ALSO dropped because its predecessor is the 5s event
    // (12-5 <= 10) — lag-chain, not kept-chain, semantics
    val df = Seq(("u", "e", 0L * S, 1L), ("u", "e", 5L * S, 2L),
      ("u", "e", 12L * S, 3L), ("u", "e", 23L * S, 4L))
      .toDF("k", "kind", "tus", "id")
    val kept = EventAnalytics.debounce(df, col("k"), col("kind"),
      col("tus"), col("id"), gapSeconds = 10L)
      .collect().map(_.getAs[Long]("id")).sorted
    kept shouldBe Array(1L, 4L)
    // different kinds debounce independently
    val mixed = Seq(("u", "a", 0L, 1L), ("u", "b", 1L, 2L))
      .toDF("k", "kind", "tus", "id")
    EventAnalytics.debounce(mixed, col("k"), col("kind"), col("tus"),
      col("id"), 10L).count() shouldBe 2L
  }

  test("funnel: greedy fold matches the conditional-min chain") {
    // u1 completes all 3 in order; u2 clicks BEFORE signup (not counted)
    // then never again; u3 signup only; u4's purchase ties signup's ts
    // exactly (strict > → not counted); noise kinds ignored
    val df = Seq(
      ("u1", "signup", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      ("u2", "click", 5L), ("u2", "signup", 10L),
      ("u3", "signup", 1L), ("u3", "noise", 2L),
      ("u4", "signup", 7L), ("u4", "click", 8L), ("u4", "purchase", 8L))
      .toDF("k", "kind", "tus")
    val out = EventAnalytics.funnel(df, col("k"), col("kind"), col("tus"),
      Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getAs[Int]("stage"), r.getAs[String]("kind"),
        r.getAs[Long]("n_keys"))).sortBy(_._1)
    // signup: u1,u2,u3,u4; click after signup: u1,u4; purchase after: u1
    out shouldBe Array((1, "signup", 4L), (2, "click", 2L),
      (3, "purchase", 1L))
  }

  test("funnel: repeated stage kinds, empty input, null keys") {
    // stages = (click, click): needs two clicks at distinct times
    val df = Seq(("a", "click", 1L), ("a", "click", 2L),
      ("b", "click", 5L), ("b", "click", 5L), (null, "click", 1L))
      .toDF("k", "kind", "tus")
    val out = EventAnalytics.funnel(df, col("k"), col("kind"), col("tus"),
      Seq("click", "click"))
      .collect().map(r => (r.getAs[Int]("stage"), r.getAs[Long]("n_keys")))
      .sortBy(_._1)
    out shouldBe Array((1, 2L), (2, 1L)) // b's equal-ts second click fails >
    // empty input still yields one zero row per stage
    val empty = EventAnalytics.funnel(
      Seq.empty[(String, String, Long)].toDF("k", "kind", "tus"),
      col("k"), col("kind"), col("tus"), Seq("x", "y"))
      .collect().map(r => (r.getAs[Int]("stage"), r.getAs[Long]("n_keys")))
      .sortBy(_._1)
    empty shouldBe Array((1, 0L), (2, 0L))
  }

  test("retention: cohort = first period, offsets count return periods") {
    val day = 86400L * S
    // u1 active day0 and day2; u2 active day0 only; u3 active day1,2
    val df = Seq(("u1", 0L), ("u1", 2 * day), ("u1", 2 * day + 5),
      ("u2", day / 2), ("u3", day), ("u3", 2 * day))
      .toDF("k", "tus")
    val out = EventAnalytics.retention(df, col("k"), col("tus"), 86400L)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset"),
        r.getAs[Long]("n_keys"))).sorted
    out shouldBe Array((0L, 0L, 2L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L))
  }
}
