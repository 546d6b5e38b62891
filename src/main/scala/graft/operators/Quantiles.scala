package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles — the percentile family the reference's
  * count/sum-only aggregate surface lacks (SURVEY §2.4 notes "no
  * median/percentile").
  *
  * Nearest-rank definition: the p-quantile of n ordered values is the
  * value at rank `ceil(p*n)` — an actual data value, no interpolation.
  * That makes it exact AND engine-portable (interpolating definitions
  * differ subtly between engines; `percentile_approx` is
  * sketch-nondeterministic), which is why the DuckDB oracle can
  * cross-check it bit-for-bit.
  *
  * Cost: one shuffle on the group keys + a per-key sort (the window),
  * then a partial-aggregable groupBy. Exactness requires the sort — at
  * extreme scale switch to `approx_percentile` (t-digest, no sort) and
  * accept sketch error; this operator is the exact, oracle-checkable
  * form and the accuracy baseline for that trade.
  */
object Quantiles {

  /** Per-`keys` nearest-rank quantiles of `value`: one output row per key
    * group with a column per requested quantile (label → p) plus `n`.
    * Rows tying on `value` share the value at any affected rank, so the
    * result is deterministic without a tie-break column. */
  def nearestRank(df: DataFrame, keys: Seq[String], value: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(value.asc)
    val wAll = Window.partitionBy(keyCols: _*)
    val ranked = df
      .withColumn("__q_v", value)
      .withColumn("__q_rn", row_number().over(w))
      .withColumn("__q_n", count(lit(1)).over(wAll))
    val aggs = ps.map { case (label, p) =>
      max(when(col("__q_rn") === ceil(lit(p) * col("__q_n")).cast("long"),
        col("__q_v"))).as(label)
    } :+ count(lit(1)).as("n")
    ranked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
