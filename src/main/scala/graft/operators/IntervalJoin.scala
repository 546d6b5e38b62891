package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Interval (range) join: pair left rows with right rows of the same key
  * whose time falls in `[leftTime, leftTime + windowUs]` — "which clicks
  * followed this view within 10 minutes". The reference has no range
  * joins (SURVEY §2.3); any event-correlation pipeline needs one.
  *
  * Spark plans `l.key == r.key AND r.t BETWEEN l.t AND l.t + w` as a
  * sort-merge join on the key alone with the range as a post-join filter
  * — a full per-key cross product before filtering, which detonates on
  * hot keys (a key with 1M events builds 10¹² candidates). This operator
  * blocks on TIME BUCKETS of width `windowUs` instead: a right row lands
  * in bucket `t - t mod w`; a matching left row's bucket is either the
  * same or the previous one, so the left side probes exactly two buckets
  * and the join becomes an equi-join on (key, bucket). Candidates per
  * pair appear exactly once (the right row's bucket is unique), and
  * within-key work drops from |L|·|R| to Σ per-bucket products — bounded
  * by time locality, not key popularity. Bucket starts are computed with
  * `pmod` on longs (exact; double division would wobble at epoch-micros
  * magnitudes near bucket edges).
  */
object IntervalJoin {

  /** One row per (left, right) pair with `rightTime` in
    * `[leftTime, leftTime + windowUs]`; left columns flattened, the
    * matched right row as a `matched` struct. Time columns must be
    * integral (e.g. epoch micros) and non-null. */
  def followWithin(left: DataFrame, right: DataFrame,
      leftKey: Column, leftTime: Column,
      rightKey: Column, rightTime: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val rType = StructType(right.schema.fields)
    val lb = left.select(leftKey.as("__ij_k"), leftTime.as("__ij_lt"),
        struct(left.columns.map(col).toSeq: _*).as("__ij_l"))
      .withColumn("__ij_b0", col("__ij_lt") - pmod(col("__ij_lt"), lit(windowUs)))
      .withColumn("__ij_b", explode(array(col("__ij_b0"), col("__ij_b0") + windowUs)))
      .drop("__ij_b0")
    val rb = right.select(rightKey.as("__ij_k"), rightTime.as("__ij_rt"),
        struct(right.columns.map(col).toSeq: _*).cast(rType).as("__ij_r"))
      .withColumn("__ij_b", col("__ij_rt") - pmod(col("__ij_rt"), lit(windowUs)))
    lb.join(rb, Seq("__ij_k", "__ij_b"))
      .filter(col("__ij_rt") >= col("__ij_lt") &&
        col("__ij_rt") <= col("__ij_lt") + windowUs)
      .select(left.columns.map(c => col(s"__ij_l.$c").as(c)).toSeq
        :+ col("__ij_r").as("matched"): _*)
  }
}
