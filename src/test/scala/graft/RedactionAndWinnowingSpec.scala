package graft

import org.apache.spark.sql.functions._
import graft.operators.{Redaction, Winnowing}

/** PII redaction (Redaction): rule coverage, fold order, idempotence,
  * counts. Winnowing fingerprints (Winnowing): the shared-run guarantee,
  * determinism, docfreq ceiling. */
class RedactionAndWinnowingSpec extends SparkSpecBase {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(Redaction.scrub(col("t")).as("c"))
      .collect().head.getAs[String]("c")

  test("scrub: every rule fires on its shape; non-PII text unchanged") {
    scrubOne("mail bob.smith+x@host.co end") shouldBe "mail <EMAIL> end"
    scrubOne("ssn 123-45-6789.") shouldBe "ssn <SSN>."
    scrubOne("card 4111 1111 1111 1111!") shouldBe "card <CARD>!"
    scrubOne("call 555-123-4567 now") shouldBe "call <PHONE> now"
    scrubOne("host 192.168.0.1 up") shouldBe "host <IP> up"
    scrubOne("no pii here, just words and 42") shouldBe
      "no pii here, just words and 42"
    // \b guards: digit runs inside longer numbers do not match
    scrubOne("id 91234567890123 ok") shouldBe "id 91234567890123 ok"
  }

  test("scrub: fixed fold order and idempotence") {
    // SSN wins over PHONE on the 3-2-4 shape (applied first); the
    // replacement tags contain no digits so a second pass is identity
    val once = scrubOne("a 987-65-4320 b 555-123-4567 c")
    once shouldBe "a <SSN> b <PHONE> c"
    scrubOne(once) shouldBe once
  }

  test("scrubWithCounts: per-rule counts measured on the raw text") {
    val df = Seq((1L, "x@y.zz and w@v.qq ip 1.2.3.4"), (2L, "clean")).toDF("id", "text")
    val out = Redaction.scrubWithCounts(df, col("text"))
      .orderBy(col("id")).collect()
    out(0).getAs[Long]("n_email") shouldBe 2L
    out(0).getAs[Long]("n_ip") shouldBe 1L
    out(0).getAs[String]("text") shouldBe "<EMAIL> and <EMAIL> ip <IP>"
    out(1).getAs[Long]("n_email") shouldBe 0L
    out(1).getAs[String]("text") shouldBe "clean"
  }

  test("winnowing: shared k+w-1 run guarantees a shared fingerprint") {
    // doc 1 and 2 share a 6-token run (k=3, w=4 -> k+w-1=6): the
    // winnowing guarantee says they MUST share at least one fingerprint
    val run = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $run three"),
      (2L, s"$run nine ten eleven"),
      (3L, "totally different words only here")).toDF("id", "text")
    val fps = Winnowing.fingerprints(df, col("id"), col("text"))
    val byDoc = fps.collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fp")).toSet).toMap
    (byDoc(1L) intersect byDoc(2L)) should not be empty
    // pairs surface it; the unrelated doc pairs with nobody at minShared=1
    val pairs = Winnowing.sharedFingerprintPairs(df, col("id"), col("text"),
      minShared = 1L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    pairs should contain((1L, 2L))
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 3L
  }

  test("winnowing: deterministic under repartitioning; short docs empty") {
    val df = (1L to 40L).map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w${i % 5} w${i % 3}"))
      .toDF("id", "text")
    val a = Winnowing.fingerprints(df, col("id"), col("text"))
      .orderBy("doc_id", "fp").collect().map(_.toSeq).toSeq
    val b = Winnowing.fingerprints(df.repartition(13), col("id"), col("text"))
      .orderBy("doc_id", "fp").collect().map(_.toSeq).toSeq
    b shouldBe a
    Winnowing.fingerprints(Seq((1L, "just two")).toDF("id", "text"),
      col("id"), col("text")).count() shouldBe 0L
  }

  test("winnowing: maxDf ceiling drops boilerplate fingerprints") {
    // every doc shares the same 6-token run -> its fingerprints appear in
    // all 10 docs; maxDf=5 kills them, so no pairs survive
    val df = (1L to 10L).map(i => (i, s"a b c d e f uniq$i tail$i"))
      .toDF("id", "text")
    Winnowing.sharedFingerprintPairs(df, col("id"), col("text"),
      minShared = 1L, maxDf = 5L).count() shouldBe 0L
    Winnowing.sharedFingerprintPairs(df, col("id"), col("text"),
      minShared = 1L, maxDf = 100L).count() should be > 0L
  }
}
