package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dense-vector dot product.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — ~20× slower than generated code on dim-64
  * embeddings (measured: brute-force knn 88s → ~4s at sf0.1). This
  * expression emits a tight primitive loop inside whole-stage codegen:
  * no lambda dispatch, no boxing, no intermediate arrays.
  *
  * Semantics: Σ aᵢ·bᵢ as a sequential left fold in double precision. On
  * well-formed inputs (equal lengths, no null elements — every embedding
  * column here) the result is bit-identical to the HOF formulation
  * (`aggregate(zip_with(...))`) and to DuckDB's `list_inner_product`, so
  * oracle comparisons hold. On malformed inputs the two DELIBERATELY
  * diverge: the HOF version returns NULL (null absorbs through the fold —
  * zip_with pads the shorter array with nulls), while VecDot stays total —
  * null elements contribute 0 and the fold stops at the shorter array —
  * because a 100 TB scoring pass should skip a corrupt row, not poison a
  * partition with NULL scores. Covered explicitly in
  * VectorAndSimilaritySpec ("VecDot vs HOF on malformed input").
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  // element types are fixed per plan — resolve once, not per row
  @transient private lazy val lf = elemType(left).contains(FloatType)
  @transient private lazy val rf = elemType(right).contains(FloatType)

  // a dot of two literal arrays is a constant: let ConstantFolding
  // evaluate it ONCE at optimization time through this same eval (so the
  // folded value is bit-identical to the per-row result) — PQ/IVF
  // distance expressions carry codeword-norm terms ip(c,c) over literals
  // that would otherwise re-evaluate per row
  override def foldable: Boolean = left.foldable && right.foldable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, e: Expression, i: String): String =
        if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${get(a, left, i)} * ${get(b, right, i)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API wrapper: codegen'd Σ aᵢ·bᵢ over array<float|double>. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API wrapper: codegen'd 32-bit SimHash sign-mix. */
  def simhashMix(tokenHashes: Column): Column =
    ColumnBridge.column(SimHashMix(ColumnBridge.expression(tokenHashes)))

  /** Column-API wrapper: codegen'd k-wide MinHash signature. */
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))

  /** Column-API wrapper: codegen'd portable per-token 32-bit md5 hash. */
  def md5Hash32(tokens: Column): Column =
    ColumnBridge.column(Md5Hash32(ColumnBridge.expression(tokens)))
}

/** 32-bit SimHash sign-mix over per-token hashes: each bit position
  * accumulates +1 when the token hash has the bit set, −1 otherwise; the
  * sign vector becomes the fingerprint (non-negative, < 2^32).
  *
  * The higher-order-function formulation needed a per-element lambda over
  * 32 bit positions per token — and because the token hash was itself a
  * subexpression, the md5 underneath re-evaluated once per bit (32× per
  * token; ~350 s for 5k docs at sf0.1). This expression takes the hash
  * array (one md5 per token) and runs the bit loop natively (~100×
  * faster, same values).
  */
case class SimHashMix(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_mix requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashMix.mixJava(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimHashMix.mixJava($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMix =
    copy(child = newChild)
}

/** k-wide MinHash signature over a shingle set in ONE native pass.
  *
  * Byte-identical to the HOF formulation
  * `array((0 until k).map(seed => array_min(transform(shingles, s =>
  * md5(concat(lit(seed + ":"), s))))))` — same seed-prefixed md5, same
  * lexicographic-hex minimum — but evaluated as a single generated call:
  * the HOF version dispatches k interpreted lambdas per document, each
  * allocating a MessageDigest, a concat buffer, and a 32-char hex string
  * PER SHINGLE, then materializes k transformed arrays just to take their
  * minima. Here one reused digest streams (prefix, shingle) pairs, minima
  * are tracked as 16-byte digests compared unsigned (== hex order), and
  * only the k winners are hex-encoded. Engine-portable like the original:
  * the DuckDB oracles reproduce it with `MIN(md5(seed || ':' || shingle))`.
  */
case class MinHashSig(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> and k > 0, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sigJava(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashSig.sigJava($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = hexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** a < b over equal-length byte arrays compared unsigned — identical to
    * comparing their lowercase-hex renderings lexicographically. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def sigJava(arr: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(seed =>
      (seed.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var seed = 0
        while (seed < k) {
          md.reset()
          md.update(prefixes(seed))
          md.update(bytes)
          val d = md.digest()
          if (mins(seed) == null || unsignedLess(d, mins(seed))) mins(seed) = d
          seed += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(d => if (d == null) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(hex(d))))
  }
}

/** Per-token 32-bit hash for SimHash: the first 4 bytes of md5(token) as
  * an unsigned big-endian int — chosen over Spark's internal Murmur3
  * because it is ENGINE-PORTABLE: any SQL engine reproduces it as
  * `('0x' || substr(md5(t), 1, 8))::UBIGINT`, which is what upgraded q24
  * from a rows-only check to a full DuckDB hash compare. One reused
  * digest per call, no hex-string round-trip (the interpreted
  * md5+conv+substring column chain this replaces allocated three strings
  * and a MessageDigest per token). */
case class Md5Hash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash32 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hashJava(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5Hash32.hashJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

object Md5Hash32 {
  def hashJava(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object SimHashMix {
  /** Static helper the generated code calls — the loop itself is JIT-hot
    * and branch-simple; keeping it here avoids inlining 64 lines of
    * codegen per call site. */
  def mixJava(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
