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
  * per-group guard (the stats row already holds max|v|, so the check
  * costs one comparison per row, fused into the same scan). What the
  * guard DOES is the `onOverflow` choice:
  *   - "raise" (default): fail loudly — the strict bit-stability
  *     contract; callers coarsen the unit (cents → whole units) or
  *     pre-aggregate (the test is scale-free, so quantization only
  *     moves the decision boundary by the quantum).
  *   - "float": evaluate over-range groups' test in IEEE doubles with a
  *     FIXED expression tree — (n·v−s)·(n·v−s) > k²·(q·n−s·s), every
  *     operand cast from the exact Long stats. Deterministic and
  *     engine-portable (both engines run the identical round-to-nearest
  *     op sequence), so the flagged set still hash-checks; only groups
  *     past the exact bound pay the (bounded, quantified) double
  *     rounding in their decision boundary. This is the 100 TB path:
  *     group size grows with the corpus, and n·max|v| crosses √MaxLong/k
  *     around 10⁷ cents-valued rows per group.
  * The STATS themselves stay exact far beyond the comparison bound
  * (q = Σv² wraps only past n·max|v|² > 2⁶³) — that second bound is
  * always enforced with a raise, because past it no fallback has
  * correct inputs. */
object Anomaly {

  /** Largest safe n·max|v| for the exact test at multiplier `k` — see
    * the object scaladoc's derivation. */
  def nmBound(k: Int): Long =
    (math.sqrt(Long.MaxValue.toDouble) / math.max(2, k)).toLong

  /** Outlier rows: (grp, row_id, v) for every row failing the k·σ test,
    * plus the group context (n, s) that convicted it. Groups with zero
    * variance flag nothing (q·n == s² makes the RHS 0 and the LHS 0 for
    * every member). `value` must be an integral column. Groups past
    * [[nmBound]] raise (lazily, at execution) or take the portable
    * double-arithmetic test, per `onOverflow` (object scaladoc); groups
    * whose STATS would wrap (n·max|v|² past Long range) always raise. */
  def flagOutliers(df: DataFrame, key: Column, id: Column, value: Column,
      k: Int = 3, onOverflow: String = "raise"): DataFrame = {
    require(k > 0, "k must be positive")
    require(onOverflow == "raise" || onOverflow == "float",
      s"onOverflow must be 'raise' or 'float', got '$onOverflow'")
    val rows = df.select(key.as("grp"), id.as("row_id"),
      value.cast("long").as("v"))
    val stats = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("q"), max(abs(col("v"))).as("m"))
    val dev = col("n") * col("v") - col("s")
    // over-range guard in EXACT integer arithmetic: n·m > bound ⟺
    // m > bound div n for integral m — no products, so the guard itself
    // cannot wrap, and there is no 1-ulp band where a double compare
    // could admit a group whose exact test then overflows (the exact
    // test's derivation is margin-free AT the bound)
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val overRange = col("m") > expr(s"${nmBound(k)}L div n")
    // the stats-wrap guard stays double: 9.0e18 sits 2.4% under 2⁶³−1,
    // a real safety margin (not ulp-thin), and n·m² has no division-free
    // exact form that cannot itself overflow
    val statsWrap = nD * mD * mD > lit(9.0e18)
    val test = dev * dev > lit(k.toLong * k) * (col("q") * col("n") - col("s") * col("s"))
    // the float fallback: identical IEEE expression tree on both engines
    // (the oracle mirrors it literally), operands cast from exact stats
    val devD = nD * col("v").cast("double") - col("s").cast("double")
    val floatTest = devD * devD > lit((k.toLong * k).toDouble) *
      (col("q").cast("double") * nD - col("s").cast("double") * col("s").cast("double"))
    def raise(what: String, hint: String): Column = raise_error(concat(
      lit(s"Anomaly.flagOutliers: group "), col("grp").cast("string"),
      lit(s" $what; $hint"))).cast("boolean")
    val overflowBranch =
      if (onOverflow == "float") floatTest
      else raise(s"exceeds the exact-test range (n*max|v| > ${nmBound(k)})",
        "coarsen the value unit, pre-aggregate, or pass onOverflow=\"float\"")
    rows.join(broadcast(stats), Seq("grp"))
      .filter(when(statsWrap,
          raise("exceeds the exact-stats range (n*max|v|^2 > 9e18)",
            "coarsen the value unit or pre-aggregate"))
        .when(overRange, overflowBranch)
        .otherwise(test))
      .select(col("grp"), col("row_id"), col("v"), col("n"), col("s"))
  }
}
