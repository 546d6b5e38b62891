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
}
