package graft

import org.apache.spark.sql.SparkSession

/** Channel-calibration probes recorded in every bench artifact.
  *
  * r18 finding: the driver's bench session ran the same HEAD uniformly
  * ~1.33x slower than the builder's idle-box run, so a real 0.727x
  * improvement read as 1.003x and a per-query seconds bar was
  * unreadable across channels. Two pinned CPU-bound probes let the
  * next reader normalize cross-channel seconds (divide a query's time
  * by the channel's calib time — `spin1` for driver-latency-bound
  * streaming loops, `scan32` for scan-bound queries):
  *
  *  - `spin1`: a single-thread fixed-instruction-count LCG loop (min
  *    of 3 reps — the first rep absorbs JIT) — pure scalar throughput,
  *    no I/O, no Spark.
  *  - `scan32`: one full count+sum aggregate over the bench dir's
  *    lineitem parquet (min of 2, page-cached by the caller's warmup) —
  *    the many-core + memory-bandwidth + parquet-decode profile the
  *    actual queries pay.
  */
object Calib {

  def spin1(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 400000000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x ^= (x >>> 33)
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    dt
  }

  def scanAll(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("count(*)", "sum(l_quantity)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** The `"calib_sec"` JSON fragment: both probes, min over reps.
    * Locale.ROOT formatting — the default-locale `f` interpolator
    * renders comma decimals on e.g. de_DE, corrupting the artifact. */
  def json(spark: SparkSession, sfDir: String): String = {
    val spin = (1 to 3).map(_ => spin1()).min
    val scan = (1 to 2).map(_ => scanAll(spark, sfDir)).min
    String.format(java.util.Locale.ROOT,
      """{"spin1":%.3f,"scan32":%.3f}""",
      Double.box(spin), Double.box(scan))
  }
}
