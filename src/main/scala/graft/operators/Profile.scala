package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality audit a pipeline runs
  * before trusting a new table drop: per-column null and distinct counts
  * from a SINGLE aggregation over the data.
  *
  * All requested columns aggregate in one `agg(...)` call: Spark plans
  * the multiple exact count-distincts with one Expand (each input row is
  * replicated once per distinct-aggregate) feeding one shuffle — M
  * columns cost one pass and an M-fold map-side expansion, never M scans
  * of a 100 TB table. The wide single-row result is then unpivoted with
  * `stack` into (col_name, non_nulls, nulls, distincts) rows. Exact
  * distincts are the audit-grade choice; swap `approx_count_distinct`
  * into the same shape when estimates suffice (one pass, no Expand).
  */
object Profile {

  /** Profile `cols` of `df` → one row per column:
    * (col_name, non_nulls, nulls, distincts). Ordered by col_name. */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"nn_$i"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"nu_$i"),
        countDistinct(col(c)).as(s"nd_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"'$c', nn_$i, nu_$i, nd_$i" }
      .mkString(", ")
    wide.selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, non_nulls, nulls, distincts)")
      .orderBy(col("col_name"))
  }
}
