package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward (most-recent-value) as-of join — the time-series lookup the
  * reference's warehouse never needs but any event-over-dimension pipeline
  * does: for each left row, the right row with the greatest time ≤ the
  * left row's time within the same key.
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (equi-join on key + time filter + max-per-left-row) explodes to
  * |left| × |right rows per key| intermediate rows before re-aggregating.
  * This operator uses the union + ordered-window formulation instead:
  * tag both inputs, union them, and carry the last right payload forward
  * with `last(ignoreNulls) over (partition by key order by time rows
  * unbounded preceding)`. Cost is ONE shuffle of |left| + |right| rows on
  * the key and a per-key sort — no row explosion at any scale, skew
  * governed only by the key distribution (salt upstream for pathological
  * hot keys). This is the standard scale-out as-of shape (native engines
  * like DuckDB expose it as ASOF JOIN — which is exactly what the oracle
  * uses to cross-check q39).
  */
object AsOfJoin {

  /** Left-outer backward as-of join, inclusive (`rightTime <= leftTime`
    * matches; at equality the right row wins because right rows sort
    * before left rows at the same instant).
    *
    * Returns every `left` row (its columns flattened) plus an `asof`
    * struct holding the matched `right` row, or NULL when the key has no
    * right row at-or-before the left time. With `tolerance` set, a match
    * older than `leftTime - tolerance` is nulled out instead of carried —
    * bounded staleness, the guard a feature-lookup pipeline needs so a
    * years-old dimension row doesn't silently serve as "current".
    *
    * Determinism: `right` must be unique per (key, time) — pre-aggregate
    * it otherwise (two right rows at the same instant would make the
    * carried payload order-dependent). Times are compared with the column
    * ordering of `leftTime`/`rightTime` (use the same unit/type on both
    * sides, e.g. epoch micros; `tolerance` is in those same units).
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: Column, leftTime: Column,
      rightKey: Column, rightTime: Column,
      tolerance: Option[Long] = None): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lSide = left.select(leftKey.as("__asof_k"), leftTime.as("__asof_t"),
      lit(1).as("__asof_side"),
      struct(left.columns.map(col).toSeq: _*).as("__asof_l"),
      lit(null).cast(rType).as("__asof_r"))
    val rSide = right.select(rightKey.as("__asof_k"), rightTime.as("__asof_t"),
      lit(0).as("__asof_side"),
      lit(null).cast(lType).as("__asof_l"),
      struct(right.columns.map(col).toSeq: _*).as("__asof_r"))
    // right (side=0) sorts before left (side=1) at equal time → inclusive;
    // the match time rides along in the carried struct so tolerance can
    // compare against it after the window
    val w = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = struct(col("__asof_t").as("t"), col("__asof_r").as("r"))
    val matched = lSide.unionByName(rSide)
      .withColumn("__asof_m",
        last(when(col("__asof_side") === 0, carried), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    val m = tolerance match {
      case Some(tol) =>
        when(col("__asof_t") - col("__asof_m.t") <= tol, col("__asof_m.r"))
      case None => col("__asof_m.r")
    }
    matched.select(left.columns.map(c => col(s"__asof_l.$c").as(c)).toSeq
      :+ m.as("asof"): _*)
  }
}
