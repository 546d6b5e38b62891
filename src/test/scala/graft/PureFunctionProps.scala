package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.BattlelogFetch

/** ScalaCheck properties for the engine's pure (non-Spark) functions —
  * the JSON array splitter that feeds distributed extraction, and the
  * top-k comparator contract. */
object PureFunctionProps extends Properties("graft.pure") {

  // generator for JSON objects with nasty content: nested arrays/objects,
  // strings containing braces, brackets, escaped quotes
  private val jsonString: Gen[String] = for {
    s <- Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('{', '}', '[', ']', ',', ' ')))
  } yield "\"" + s.mkString.replace("\\", "").replace("\"", "\\\"") + "\""

  private val jsonValue: Gen[String] = Gen.frequency(
    3 -> Gen.choose(0, 999).map(_.toString),
    3 -> jsonString,
    1 -> Gen.listOfN(2, Gen.choose(0, 9)).map(_.mkString("[", ",", "]")),
    1 -> jsonString.map(s => s"""{"inner":$s}""")
  )

  private val jsonObject: Gen[String] = for {
    n <- Gen.choose(1, 4)
    kvs <- Gen.listOfN(n, Gen.zip(Gen.identifier.map(_.take(5)), jsonValue))
  } yield kvs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  property("splitTopLevelArray returns exactly the array's elements") =
    forAll(Gen.listOf(jsonObject)) { objs =>
      val body = objs.mkString("[", ",", "]")
      val out = BattlelogFetch.splitTopLevelArray(body).toList
      Prop(out == objs) :| s"body=$body out=$out"
    }

  property("splitTopLevelArray never throws on arbitrary garbage") =
    forAll { (s: String) =>
      BattlelogFetch.splitTopLevelArray(s).length >= 0
    }

  property("TopK ordering is a lawful total order (score desc, id asc)") = {
    import graft.operators.TopK.Scored
    val scored = Gen.zip(Gen.choose(0L, 50L), Gen.choose(-5.0, 5.0)).map(Scored.tupled)
    forAll(Gen.listOf(scored)) { xs =>
      val ord = Ordering.by((s: Scored) => (-s.score, s.id))
      val sorted = xs.sorted(ord)
      Prop(sorted.sliding(2).forall {
        case Seq(a, b) => a.score > b.score || (a.score == b.score && a.id <= b.id) ||
          (a.score.isNaN || b.score.isNaN)
        case _ => true
      })
    }
  }
}
