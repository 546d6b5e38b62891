package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._

/** Wires the engine's native expressions into the SQL function registry,
  * so `spark.sql("SELECT vec_dot(a, b)")` plans the codegen'd [[VecDot]]
  * directly.
  *
  * Two entry points sharing one function table:
  *  - `.withExtensions(new GraftExtensions)` / `spark.sql.extensions`
  *    config at session build time (the cluster deployment path);
  *  - [[GraftExtensions.register]] on a live session (notebooks, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(implClass: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(implClass.getCanonicalName, null, name, usage, "")

  private def binary(name: String)(build: (Expression, Expression) => Expression)
      : FunctionRegistry.FunctionBuilder = {
    case Seq(a, b) => build(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.length}")
  }

  private def unary(name: String)(build: Expression => Expression)
      : FunctionRegistry.FunctionBuilder = {
    case Seq(a) => build(a)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info(classOf[VecDot], "vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      binary("vec_dot")(VecDot(_, _))),
    (FunctionIdentifier("vec_cosine"),
      info(classOf[GraftExtensions], "vec_cosine",
        "vec_cosine(a, b) - cosine similarity of two float/double arrays (composed from vec_dot)"),
      binary("vec_cosine") { (a, b) =>
        // composed from VecDot so SQL and the Column API share one
        // arithmetic definition (bit-identical results)
        val denom = Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b)))
        CaseWhen(Seq((EqualTo(denom, Literal(0.0)), Literal(0.0))),
          Some(Divide(VecDot(a, b), denom)))
      }),
    (FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig",
        "minhash_sig(shingles, k) - k-wide MinHash signature (array of min seed-salted md5 hex) over an array<string>"),
      binary("minhash_sig") { (shingles, k) =>
        k match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
            MinHashSig(shingles, v)
          case other => throw new IllegalArgumentException(
            s"minhash_sig: k must be an integer literal, got $other")
        }
      }),
    (FunctionIdentifier("token_shingles"),
      info(classOf[TokenShingles], "token_shingles",
        "token_shingles(tokens, n) - distinct space-joined n-token shingles over an array<string>, first-occurrence order"),
      binary("token_shingles") { (toks, n) =>
        n match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
            TokenShingles(toks, v)
          case other => throw new IllegalArgumentException(
            s"token_shingles: n must be an integer literal, got $other")
        }
      }),
    (FunctionIdentifier("md5_hash32"),
      info(classOf[Md5Hash32], "md5_hash32",
        "md5_hash32(tokens) - first-4-md5-bytes 32-bit hash per element of an array<string> (engine-portable)"),
      unary("md5_hash32")(Md5Hash32(_))),
    (FunctionIdentifier("simhash_mix"),
      info(classOf[SimHashMix], "simhash_mix",
        "simhash_mix(hashes) - 32-bit SimHash sign-mix over an array<bigint> of token hashes"),
      unary("simhash_mix")(SimHashMix(_))),
    (FunctionIdentifier("nfc_normalize"),
      info(classOf[NfcNormalize], "nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonicalization (same semantics as DuckDB's nfc_normalize)"),
      unary("nfc_normalize")(NfcNormalize(_)))
  )

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
