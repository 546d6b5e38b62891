package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group statistical outlier detection — the data-quality gate a
  * metrics/training pipeline runs before trusting an upstream feed
  * (corrupted exports and unit regressions show up as points far outside
  * their group's distribution long before they show up in totals).
  *
  * Flags rows with |x − μ| > k·σ against their group's own mean and
  * population deviation, but evaluates the test in EXACT integer
  * arithmetic: with s = Σx, q = Σx², the condition
  *   (x − s/n)² > k²·(q·n − s²)/n²
  * multiplies through by n² to
  *   (n·x − s)² > k²·(q·n − s²)
  * — integers end to end, no division, no float comparison anywhere, so
  * the flagged set is bit-stable across engines (the same
  * integers-before-floats discipline as [[Sampling]]'s ppm thresholds).
  * Inputs must be integral (quantize currency/measurements upstream —
  * cents, micros — the same floor(x·10^d) move the driver queries use).
  *
  * Scale shape: ONE groupBy on the key computes (n, s, q) with map-side
  * combine; the stats frame is GROUP-cardinality-sized, so the join back
  * is a broadcast — the fact stream is never shuffled, and the flag
  * predicate fuses into its scan.
  *
  * Overflow bound for the exact test, ENFORCED at runtime: every term is
  * bounded by n·max|v| — |n·x − s| ≤ 2·n·max|v| (square must fit int64:
  * n·max|v| ≤ √MaxLong/2) and k²·(q·n − s²) ≤ k²·(n·max|v|)² (fit:
  * n·max|v| ≤ √MaxLong/k) — so each group must keep
  * n·max|v| ≤ √MaxLong / max(2, k) (~1.0e9 at k=3). A group beyond that
  * would silently wrap Long and flag garbage, so the filter carries a
  * per-group guard that RAISES instead (the stats row already holds
  * max|v|, so the check costs one comparison per row, fused into the
  * same scan). Over-range data: coarsen the unit (cents → whole units)
  * or pre-aggregate — the test is scale-free, so quantization only moves
  * the decision boundary by the quantum. */
object Anomaly {

  /** Largest safe n·max|v| for the exact test at multiplier `k` — see
    * the object scaladoc's derivation. */
  def nmBound(k: Int): Long =
    (math.sqrt(Long.MaxValue.toDouble) / math.max(2, k)).toLong

  /** Outlier rows: (grp, row_id, v) for every row failing the k·σ test,
    * plus the group context (n, s) that convicted it. Groups with zero
    * variance flag nothing (q·n == s² makes the RHS 0 and the LHS 0 for
    * every member). `value` must be an integral column. Raises (lazily,
    * at execution) if any group exceeds [[nmBound]]. */
  def flagOutliers(df: DataFrame, key: Column, id: Column, value: Column,
      k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val rows = df.select(key.as("grp"), id.as("row_id"),
      value.cast("long").as("v"))
    val stats = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("q"), max(abs(col("v"))).as("m"))
    val dev = col("n") * col("v") - col("s")
    // the guard compares in double — approximate is fine for a safety
    // margin, and it cannot itself overflow
    val overRange = col("n").cast("double") * col("m").cast("double") >
      lit(nmBound(k).toDouble)
    val test = dev * dev > lit(k.toLong * k) * (col("q") * col("n") - col("s") * col("s"))
    rows.join(broadcast(stats), Seq("grp"))
      .filter(when(overRange, raise_error(concat(
          lit("Anomaly.flagOutliers: group "), col("grp").cast("string"),
          lit(s" exceeds the exact-test range (n*max|v| > ${nmBound(k)});"
            + " coarsen the value unit or pre-aggregate")))
        .cast("boolean")).otherwise(test))
      .select(col("grp"), col("row_id"), col("v"), col("n"), col("s"))
  }
}
