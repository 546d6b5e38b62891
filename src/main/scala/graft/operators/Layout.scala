package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — multi-dimensional data clustering for
  * scan pruning. Sorting a table by the bit-interleaved key of two
  * columns places rows close in BOTH dimensions into the same files, so
  * min/max file statistics prune selective predicates on EITHER column
  * — the standard lakehouse layout move for 100 TB fact tables queried
  * along more than one axis (a single-column sort prunes only its own
  * column; Z-order splits the benefit across dimensions at a √ cost
  * each). Reference behavior: the reference's warehouse is
  * single-column-indexed; layout optimization is engine extension
  * surface (SURVEY.md §2.12).
  *
  * Everything is integer bit arithmetic (shifts, masks, one fold over
  * bit positions) — deterministic, engine-portable, scan-fused: the key
  * is a pure projection, and the sort that USES it is the one shuffle
  * any re-layout pays. Inputs must already be non-negative integers of
  * at most `bits` bits (bucketize/quantize upstream — rank, div, or
  * the [[Sampling]] ppm idioms); out-of-range inputs raise at execution
  * rather than silently interleaving truncated values.
  */
object Layout {

  /** The Morton key of `x` and `y` at `bits` bits each: bit i of x lands
    * at position 2i, bit i of y at 2i+1 — a 2·bits-bit key. */
  def zKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val bound = 1L << bits
    val guard = (v: Column) => when(
      v.isNull || v < 0 || v >= bound,
      raise_error(concat(lit(s"Layout.zKey: input "), v.cast("string"),
        lit(s" outside [0, $bound)"))).cast("long")).otherwise(v.cast("long"))
    val gx = guard(x)
    val gy = guard(y)
    // unrolled fold over bit positions (shift distances are literals):
    // Σ ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1) — one flat codegen'd
    // expression, Catalyst CSE shares the guarded inputs across terms
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Per-bucket clustering report for a Z-ordered layout: each
    * dimension is first QUANTIZED to the full `bits` range by its own
    * min/max ((v − lo)·2^bits div (hi − lo + 1) — the range scaling
    * every Z-order writer performs, else a narrow dimension wastes its
    * interleaved bit positions and the key degenerates toward a
    * single-column sort), rows are keyed by the Morton key of the
    * quantized values, bucketed into `buckets` equal key ranges (the
    * stand-in for "files written in z-order"), and summarized as
    * (bucket, n, min_x, max_x, min_y, max_y) — the min/max statistics
    * a reader's pruning consults. The quality claim made checkable:
    * each bucket spans ~1/√buckets of EACH dimension's range, so a
    * predicate on either column prunes ~√buckets of the files.
    *
    * The min/max pass is one scan-fused 1-row aggregate broadcast back
    * (the [[Similarity]] dim-stats pattern). Caller contract:
    * (hi − lo + 1)·2^bits must fit int64 — ranges to 2^46 at the
    * default 16 bits. */
  def zOrderStats(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val keyBits = 2 * bits
    val base = df.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
    val stats = base.agg(
      min(col("__x")).as("__xlo"), max(col("__x")).as("__xhi"),
      min(col("__y")).as("__ylo"), max(col("__y")).as("__yhi"))
    base.crossJoin(broadcast(stats))
      .withColumn("__qx",
        expr(s"((__x - __xlo) * ${1L << bits}L) div (__xhi - __xlo + 1)"))
      .withColumn("__qy",
        expr(s"((__y - __ylo) * ${1L << bits}L) div (__yhi - __ylo + 1)"))
      .withColumn("__z", zKey(col("__qx"), col("__qy"), bits))
      .withColumn("bucket",
        expr(s"(__z * ${buckets}L) div ${1L << keyBits}L").cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }
}
