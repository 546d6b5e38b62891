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

  /** The d-dimensional Morton key: bit i of dimension j lands at key
    * position i·d + j — a d·bits-bit key interleaving ALL dimensions.
    * Bit budget is 63 div d (d·bits ≤ 63 keeps the key a positive
    * long): 31 bits each for 2-D, 21 for 3-D, 15 for 4-D — the
    * resolution/dimensionality trade every multi-dim layout pays. */
  def zKeyN(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d >= 2, s"need at least 2 dimensions, got $d")
    require(bits >= 1 && d * bits <= 63,
      s"d*bits must fit a positive long: d=$d, bits=$bits (budget ${63 / d} bits/dim)")
    val bound = 1L << bits
    val guard = (v: Column) => when(
      v.isNull || v < 0 || v >= bound,
      raise_error(concat(lit(s"Layout.zKey: input "), v.cast("string"),
        lit(s" outside [0, $bound)"))).cast("long")).otherwise(v.cast("long"))
    val gs = dims.map(guard)
    // unrolled fold over bit positions (shift distances are literals):
    // Σ_i Σ_j ((v_j>>i)&1)<<(i·d+j) — one flat codegen'd expression,
    // Catalyst CSE shares the guarded inputs across terms
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      gs.zipWithIndex.foldLeft(acc) { case (a, (g, j)) =>
        a + shiftleft(shiftright(g, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }
  }

  /** The 2-D Morton key — [[zKeyN]] of (x, y): bit i of x lands at
    * position 2i, bit i of y at 2i+1. */
  def zKey(x: Column, y: Column, bits: Int = 16): Column =
    zKeyN(Seq(x, y), bits)

  /** Append the self-quantized d-dim Morton key to a frame, preserving
    * every input column: each dimension is scaled to the full `bits`
    * range by its OWN min/max (one scan-fused 1-row aggregate broadcast
    * back — the [[zOrderStatsN]] quantize pass), and `keyCol` holds
    * [[zKeyN]] of the quantized values. This is the WRITE-path form: a
    * compaction sorts by `keyCol` and drops it, turning the per-bucket
    * bounds [[zOrderStatsN]] reports into actual parquet min/max file
    * stats ([[Maintenance.compact]]'s `zOrderBy`). Caller contract
    * matches [[zOrderStatsN]]: integer dims, (hi − lo + 1)·2^bits per
    * dimension within int64. */
  def withZKey(df: DataFrame, dims: Seq[Column], bits: Int = 16,
      keyCol: String = "__z"): DataFrame = {
    val vCols = dims.zipWithIndex.map { case (c, j) => c.cast("long").as(s"__v$j") }
    val base = df.select(col("*") +: vCols: _*)
    val statAggs = dims.indices.flatMap(j => Seq(
      min(col(s"__v$j")).as(s"__lo$j"), max(col(s"__v$j")).as(s"__hi$j")))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val quantized = dims.indices.foldLeft(base.crossJoin(broadcast(stats))) {
      (acc, j) => acc.withColumn(s"__q$j",
        expr(s"((__v$j - __lo$j) * ${1L << bits}L) div (__hi$j - __lo$j + 1)"))
    }
    quantized
      .withColumn(keyCol, zKeyN(dims.indices.map(j => col(s"__q$j")), bits))
      .drop(dims.indices.flatMap(j =>
        Seq(s"__v$j", s"__lo$j", s"__hi$j", s"__q$j")): _*)
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
      buckets: Int = 64): DataFrame =
    zOrderStatsN(df, Seq("x" -> x, "y" -> y), bits, buckets)

  /** d-dimensional [[zOrderStats]]: dims are (name, column) pairs; the
    * report carries min_<name>/max_<name> per dimension. Each dimension
    * quantizes by its own min/max to the full `bits` range, rows key by
    * the d-dim Morton key, bucket into `buckets` equal key ranges.
    * Caller contract: (hi − lo + 1)·2^bits per dimension and
    * 2^(d·bits)·buckets must both fit int64. */
  def zOrderStatsN(df: DataFrame, dims: Seq[(String, Column)],
      bits: Int = 16, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val d = dims.size
    val keyBits = d * bits
    require(keyBits <= 62 && (BigInt(1) << keyBits) * buckets <= Long.MaxValue,
      s"2^(d*bits)*buckets must fit int64 (d=$d, bits=$bits, buckets=$buckets)")
    val base = df.select(dims.zipWithIndex.map {
      case ((_, c), j) => c.cast("long").as(s"__v$j")
    }: _*)
    val statAggs = dims.indices.flatMap(j => Seq(
      min(col(s"__v$j")).as(s"__lo$j"), max(col(s"__v$j")).as(s"__hi$j")))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val quantized = dims.indices.foldLeft(base.crossJoin(broadcast(stats))) {
      (acc, j) => acc.withColumn(s"__q$j",
        expr(s"((__v$j - __lo$j) * ${1L << bits}L) div (__hi$j - __lo$j + 1)"))
    }
    val dimAggs = dims.zipWithIndex.flatMap { case ((name, _), j) => Seq(
      min(col(s"__v$j")).as(s"min_$name"), max(col(s"__v$j")).as(s"max_$name"))
    }
    quantized
      .withColumn("__z", zKeyN(dims.indices.map(j => col(s"__q$j")), bits))
      .withColumn("bucket",
        expr(s"(__z * ${buckets}L) div ${1L << keyBits}L").cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dimAggs: _*)
  }
}
