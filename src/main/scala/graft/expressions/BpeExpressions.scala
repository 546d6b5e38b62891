package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE encoding of one word under a FIXED ordered merge-rule
  * table, as a native expression — the production inference path for
  * REAL tokenizer sizes.
  *
  * [[graft.operators.Bpe.applyMerges]] composes one Catalyst `aggregate`
  * fold per rule: correct, oracle-replayable, and exactly right for the
  * trainer's one-rule-per-round loop — but the PLAN grows linearly with
  * the rule table, so a production tokenizer (tens of thousands of
  * merges) would compile tens of thousands of chained folds and re-scan
  * every word once per rule. This expression holds the whole table as
  * expression STATE (one plan node at any table size) and applies the
  * rules in order inside one JVM loop per word — O(rules × word length)
  * with no per-rule plan or pass. Semantics are EXACTLY the fold's:
  * each rule is one left-to-right non-overlapping adjacent-pair replace
  * over the symbol sequence (a merged symbol never cascades within its
  * own rule's pass) — byte-equality against [[Bpe.applyMerges]] is
  * spec-pinned on fixture and randomized words. Input is one WORD
  * (split to codepoint symbols here, matching `substr`'s character
  * semantics); output is the space-joined symbol encoding. */
case class BpeEncode(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${other.simpleString}")
  }

  @transient private lazy val ruleArr: Array[Array[String]] =
    rules.map(p => Array(p._1, p._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encodeJava(input.asInstanceOf[UTF8String], ruleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("bpeRules", ruleArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BpeEncode.encodeJava($c, $rulesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def apply(word: Column, rules: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word), rules))

  def encodeJava(word: UTF8String, rules: Array[Array[String]]): UTF8String = {
    val w = word.toString
    // codepoint symbols — `substr(i, 1)` counts characters, not UTF-16
    // units, so surrogate-pair codepoints must stay whole here too
    var syms: Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        out += w.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    var ri = 0
    while (ri < rules.length) {
      val l = rules(ri)(0)
      val r = rules(ri)(1)
      val n = syms.length
      val out = new scala.collection.mutable.ArrayBuffer[String](n)
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == l && syms(j + 1) == r) {
          out += l + r
          j += 2
        } else {
          out += syms(j)
          j += 1
        }
      }
      syms = out.toArray
      ri += 1
    }
    UTF8String.fromString(syms.mkString(" "))
  }
}
