package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension construction — turn an event/change
  * feed into versioned dimension history: one row per (entity, attribute
  * run) with [effective_from, effective_to) validity, open-ended for the
  * current version. The warehouse counterpart of [[Upsert.snapshotDiff]]
  * (which diffs two snapshots; this builds the full history in one pass
  * from the raw feed).
  *
  * Shape: everything happens inside ONE window partitioned by the entity
  * key — lag() finds run boundaries (value ≠ previous value), a running
  * sum numbers the runs, and the run groupBy + lead() close each
  * version's interval. Three window passes + one aggregate, all on the
  * SAME (entity) partitioning: Catalyst plans a single shuffle and sorts
  * once; per-entity history is never large (it's bounded by change
  * count, not event count, after the run collapse), so no skew term.
  * Determinism requires a total per-entity order — pass a tiebreak
  * column (e.g. the event id) for feeds with equal timestamps. */
object Scd {

  /** Build the type-2 history of `attr` per `key` ordered by (`time`,
    * `tie`): returns (key, attr, ver, effective_from, effective_to,
    * n_events) — `ver` 1-based per entity, `effective_to` NULL for the
    * open current version, `n_events` the number of feed rows collapsed
    * into the run. Time columns are carried as-is (use integral epochs
    * for engine-portable artifacts). */
  def type2(df: DataFrame, key: Column, time: Column, tie: Column,
      attr: Column): DataFrame = {
    val rows = df.select(key.as("k"), time.as("t"), tie.as("tb"),
      attr.as("attr"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
    val run = Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy(col("k")).orderBy(col("ver"))
    rows
      // null-safe boundary test (<=>) + explicit first-row guard: a NULL
      // attribute value is a legal version and must open a run even when
      // lag() is also NULL
      .withColumn("chg",
        when(row_number().over(w) === 1 ||
          !(lag(col("attr"), 1).over(w) <=> col("attr")), 1).otherwise(0))
      .withColumn("ver", sum(col("chg")).over(run))
      .groupBy(col("k"), col("ver"))
      .agg(min(col("attr")).as("attr"),
        min(col("t")).as("effective_from"),
        count(lit(1)).as("n_events"))
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wVer))
      .select(col("k"), col("attr"), col("ver"), col("effective_from"),
        col("effective_to"), col("n_events"))
  }
}
