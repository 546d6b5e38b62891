package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

class QualityModelSpec extends SparkSpecBase {
  import spark.implicits._

  // the operator's own bucket arithmetic, replayed in plain Scala
  private def bucket(salt: Int, gram: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$gram".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % n).toInt
  }

  test("score: unigram bag counts instances, bigrams count distinct windows") {
    val w = QualityModel.hashWeights(64, 3L)
    // "a b a b" -> unigrams a,b,a,b (bag: a twice, b twice);
    // bigrams windows "a b","b a","a b" -> distinct {"a b","b a"}
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = QualityModel.score(docs, col("doc_id"), col("text"), w)
      .collect().head
    val uni = 2 * w(bucket(0, "a", 64)) + 2 * w(bucket(0, "b", 64))
    val bi = w(bucket(1, "a b", 64)) + w(bucket(1, "b a", 64))
    out.getAs[Long]("score_micros") shouldBe (uni + bi)
    out.getAs[Long]("n_feats") shouldBe 6L // 4 tokens + 2 distinct bigrams
    out.getAs[Boolean]("kept") shouldBe (uni + bi >= 0)
  }

  test("score: empty/null docs score the bias alone; single token is its own bigram") {
    val w = QualityModel.hashWeights(64, 3L)
    val docs = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
      (4L, "solo")).toDF("doc_id", "text")
    val out = QualityModel.score(docs, col("doc_id"), col("text"), w, bias = 5L)
      .orderBy("doc_id").collect()
    out.take(3).foreach { r =>
      r.getAs[Long]("n_feats") shouldBe 0L
      r.getAs[Long]("score_micros") shouldBe 5L
      r.getAs[Boolean]("kept") shouldBe true
    }
    // a 1-token doc yields the whole doc as its one "bigram" window
    out(3).getAs[Long]("score_micros") shouldBe
      (5L + w(bucket(0, "solo", 64)) + w(bucket(1, "solo", 64)))
    out(3).getAs[Long]("n_feats") shouldBe 2L
  }

  test("hashWeights: deterministic, bounded, mixed-sign") {
    val w = QualityModel.hashWeights(1024, 7L)
    w shouldBe QualityModel.hashWeights(1024, 7L)
    w.foreach { x => x should (be >= -1000000L and be < 1000000L) }
    w.count(_ < 0) should be > 100
    w.count(_ >= 0) should be > 100
  }
}
