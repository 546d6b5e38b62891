package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Order-independent dataset fingerprint, per `group`: (grp, n_rows,
    * checksum) — the dataset-versioning primitive that detects drift
    * between reloads, engines, or pipeline versions without comparing
    * rows. Each row hashes to md5 over its columns (null marked by a
    * -sentinel, columns joined by  — both outside any data
    * alphabet), folds to a [0, 10⁶) integer bucket, and the group
    * checksum is the SUM — commutative, so partitioning and row order
    * never matter, and a Long holds it to ~9·10¹² rows. A 10⁶-bucket
    * sum is a DRIFT DETECTOR (any single-row change shifts it with
    * probability 1 − 10⁻⁶), not a cryptographic digest.
    *
    * Engine-portable BY CONSTRUCTION over string/integer columns (the
    * caller casts or quantizes floats first — float-to-string formatting
    * is the one cast engines disagree on): the DuckDB replay is
    * `('0x' || substr(md5(expr), 1, 15))::UBIGINT % 1000000`, the same
    * idiom as [[Sampling.ppmBucket]].
    *
    * Scale: pure scan-fused projection + one map-side-combined groupBy
    * on `group` — no joins, no windows; the cheapest full-table audit
    * the engine offers. */
  def datasetChecksum(df: DataFrame, group: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum requires at least one column")
    val rowStr = concat_ws("",
      cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val bucket = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long") % lit(1000000L)
    df.select(group.as("grp"), bucket.as("__b"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__b")).as("checksum"))
  }
}
