package graft

import org.apache.spark.sql.functions._
import graft.operators.Anomaly

/** Exact integer k·σ outlier gate (Anomaly.flagOutliers): flagging
  * semantics, zero-variance groups, and the ENFORCED overflow bound —
  * a group whose n·max|v| exceeds the safe range must raise instead of
  * silently wrapping Long and flagging garbage. */
class AnomalySpec extends SparkSpecBase {
  import spark.implicits._

  test("flags the far point, leaves the bulk, zero-variance flags nothing") {
    // 20×10 plus one 1000: the outlier clears 3σ even with itself
    // included in the stats; every 10 stays inside
    val rows = ((1 to 20).map(i => ("a", i.toLong, 10L)) :+ ("a", 21L, 1000L)) ++
      (1 to 5).map(i => ("b", i.toLong, 7L)) // zero variance
    val out = Anomaly.flagOutliers(rows.toDF("g", "rid", "v"),
      col("g"), col("rid"), col("v"), k = 3).collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      Array(("a", 21L, 1000L))
    out.head.getAs[Long]("n") shouldBe 21L
    out.head.getAs[Long]("s") shouldBe 1200L
  }

  test("groups at the bound's safe side run exactly; over the bound raise") {
    val bound = Anomaly.nmBound(3) // √MaxLong/3 ≈ 1.0123e9
    // n=2, |v| = b each side → n·max|v| = 2b. RHS = 9·(q·n − s²) = 36·b²
    // sits just under MaxLong at the largest safe b — the worst case the
    // derivation promises to survive.
    val safeB = bound / 2
    val safe = Seq(("g", 1L, safeB), ("g", 2L, -safeB)).toDF("g", "rid", "v")
    Anomaly.flagOutliers(safe, col("g"), col("rid"), col("v"), k = 3)
      .collect() shouldBe empty // symmetric pair: nothing clears 3σ

    val overB = bound / 2 + bound / 16 // pushes n·max|v| past the bound
    val over = Seq(("g", 1L, overB), ("g", 2L, -overB)).toDF("g", "rid", "v")
    val e = intercept[Exception] {
      Anomaly.flagOutliers(over, col("g"), col("rid"), col("v"), k = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds the exact-test range")),
      s"expected the overflow guard to fire, got: $e")
  }

  test("onOverflow=float: over-range groups flag via the portable double test") {
    val bound = Anomaly.nmBound(3)
    // base magnitude pushes n·max|v| past the exact bound; the far point
    // must still be flagged and the bulk left alone — semantics survive
    // the fallback, they just run in doubles
    // m stays under the stats-wrap bound (n·m² ≤ 9e18 at n=21 needs
    // m ≤ ~6.5e8) while n·m clears the exact bound
    val b = bound / 4
    val rows = (1 to 20).map(i => ("g", i.toLong, b + i)) :+ (("g", 21L, 2L * b))
    val out = Anomaly.flagOutliers(rows.toDF("g", "rid", "v"),
      col("g"), col("rid"), col("v"), k = 3, onOverflow = "float")
      .collect()
    out.map(r => (r.getString(0), r.getLong(1))) shouldBe Array(("g", 21L))

    // under the bound, "float" leaves the exact path untouched: same
    // flags as the default mode on the exact-range fixture
    val small = ((1 to 20).map(i => ("a", i.toLong, 10L)) :+ ("a", 21L, 1000L))
      .toDF("g", "rid", "v")
    val exact = Anomaly.flagOutliers(small, col("g"), col("rid"), col("v"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaFloat = Anomaly.flagOutliers(small, col("g"), col("rid"), col("v"),
      k = 3, onOverflow = "float")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    viaFloat shouldBe exact
  }

  test("stats-wrap range fails loudly, even with onOverflow=float") {
    // n·max|v|² past ~9e18: q = Σv² wraps, no fallback has correct
    // inputs. 2 rows at 2.2e9 → n·m² ≈ 9.7e18. Under ANSI mode (the
    // Spark 4 default) the Σv² aggregate itself throws
    // ARITHMETIC_OVERFLOW before our filter-side guard evaluates; in
    // non-ANSI sessions the sum wraps silently and the guard raises.
    // Either way the contract holds: LOUD failure, never garbage flags.
    val big = 2200000000L
    val df = Seq(("g", 1L, big), ("g", 2L, -big)).toDF("g", "rid", "v")
    val e = intercept[Exception] {
      Anomaly.flagOutliers(df, col("g"), col("rid"), col("v"), k = 3,
        onOverflow = "float").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("exceeds the exact-stats range")
        || m.contains("ARITHMETIC_OVERFLOW")),
      s"expected a loud stats-range failure, got: $e")
  }
}
