package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys (the "Hybrid" problem: the
  * classifier's fallback label can absorb a large share of observations —
  * cf. the reference's unknown-ratio guard, validate_snapshot.py:116-145).
  *
  * When NOT to salt: plain count/sum group-bys — HashAggregate already
  * partial-aggregates map-side, so each partition sends one row per key
  * and the hot key's reduce is O(partitions). Salting pays off where the
  * per-key state is heavy (exact distinct counts, collect_*) or where a
  * join replicates a hot key's rows into one task. AQE's skew-join
  * handling covers sort-merge joins at runtime; [[saltedJoin]] is the
  * explicit form for when the optimizer can't see the skew (e.g. a
  * broadcast-ineligible dimension with one hot key).
  */
object Skew {

  /** Exact distinct count per key, skew-proof: `values` are hash-bucketed
    * into `buckets` sub-groups first, so no single task ever holds a hot
    * key's full distinct set. Buckets partition the value space, so the
    * per-bucket distinct counts sum exactly (no double counting). */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ pmod(hash(value), lit(buckets)).as("__bucket"): _*)
      .agg(count_distinct(value).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).cast("long").as("distinct_count"))
  }

  /** Equi-join where `right` has hot keys but is too large to broadcast:
    * each right row is replicated `salt` times, each left row picks one
    * deterministic salt (hash of its whole row), so a hot key's rows
    * spread over `salt` tasks instead of one. Inner joins only — the
    * replication factor must not change row multiplicity semantics. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    val leftSalted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val rightSalted = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    leftSalted.join(rightSalted, Seq(key, "__salt")).drop("__salt")
  }
}
