package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * training-data operations `df.sample()` cannot give you: `sample` is
  * seed- and partitioning-dependent, so reruns, engine changes, or a
  * repartition silently change the sample. Hashing the row KEY instead
  * makes membership a pure function of the data: stable across runs,
  * engines, partitionings, and incremental reloads (a document keeps its
  * split forever — the property train/test hygiene actually needs).
  *
  * The bucket is the first 4 hex chars of md5(key) — uniform over 65,536
  * buckets, and hex strings compare lexicographically exactly like the
  * numbers they encode, so plain string comparison against a 4-hex-digit
  * bound expresses any fraction at 1/65,536 granularity in ANY engine
  * (the DuckDB oracle uses the same `substr(md5(..))` predicate).
  * Pure per-row projection: fuses into the scan, no shuffle, no state.
  */
object Sampling {

  /** Uniform hash bucket of `key` as a 4-hex-char string ("0000".."ffff"). */
  def hexBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Keep rows with `hexBucket(key) < hexBound`; e.g. "4000" keeps ~25%,
    * "8000" ~50%. Deterministic in the key — the same key is always in or
    * always out. */
  def deterministicSample(df: DataFrame, key: Column, hexBound: String): DataFrame =
    df.filter(hexBucket(key) < lit(hexBound))

  /** Stable train/val/test split label for `key`: "train" below
    * `trainBound`, "val" below `valBound`, else "test". Defaults give
    * 80/10/10 over the full hash range. */
  def splitLabel(key: Column, trainBound: String = "cccc",
      valBound: String = "e666"): Column = {
    val h = hexBucket(key)
    when(h < trainBound, "train").when(h < valBound, "val").otherwise("test")
  }

  /** Stratified deterministic sample: a different keep-fraction per value
    * of `stratum` (hex bound per stratum; `defaultBound` for unlisted
    * strata, "0000" = drop them). The standard corpus-rebalancing move —
    * e.g. downsample the dominant language while keeping the tail whole.
    * Still a pure per-row predicate: the bounds map compiles into a
    * literal CASE chain, so there is no join, no shuffle, and membership
    * stays a pure function of (key, stratum) — stable under reloads and
    * engine changes like [[deterministicSample]]. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      bounds: Map[String, String], defaultBound: String = "0000"): DataFrame = {
    val bound = bounds.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBound)) { case (acc, (s, b)) =>
        when(stratum === s, lit(b)).otherwise(acc)
      }
    df.filter(hexBucket(key) < bound)
  }
}
