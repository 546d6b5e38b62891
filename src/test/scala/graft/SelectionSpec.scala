package graft

import org.apache.spark.sql.functions._
import graft.operators.Selection

/** DSIR importance resampling: fit/score/select semantics. */
class SelectionSpec extends SparkSpecBase {
  import spark.implicits._

  // the operator's bucket arithmetic replayed in plain Scala
  private def bucket(salt: Int, gram: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$gram".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % n).toInt
  }

  test("hashedNgramCounts: unigram BAG + distinct-bigram counts land in the md5 buckets") {
    val docs = Seq((1L, "a b a"), (2L, "")).toDF("doc_id", "text")
    val m = 32
    val mdl = Selection.hashedNgramCounts(docs, col("text"), m)
    // unigrams: bag a,b,a ; bigrams: windows "a b","b a" (distinct)
    val expUni = Array.fill(m)(0L)
    expUni(bucket(0, "a", m)) += 2; expUni(bucket(0, "b", m)) += 1
    val expBi = Array.fill(m)(0L)
    expBi(bucket(1, "a b", m)) += 1; expBi(bucket(1, "b a", m)) += 1
    mdl.uni shouldBe expUni.toSeq
    mdl.bi shouldBe expBi.toSeq
    mdl.uniTotal shouldBe 3L
    mdl.biTotal shouldBe 2L
  }

  test("importanceLambdas: add-one smoothing gives zero-count buckets a finite negative-or-positive lambda, and a target-only gram a positive one") {
    val m = 16
    val t = Array.fill(m)(0L); val r = Array.fill(m)(0L)
    t(3) = 10L // gram seen ONLY in target
    r(5) = 10L // gram seen ONLY in raw
    val lam = Selection.importanceLambdas(t.toSeq, r.toSeq)
    lam should have size m
    // identical totals, so the empty-bucket lambda is exactly ln(1)=0
    lam(0) shouldBe 0L
    lam(3) should be > 0L
    lam(5) should be < 0L
    // plain-Scala replay of one bucket
    val ratio = ((t(3) + 1.0) * (r.sum + m)) / ((r(3) + 1.0) * (t.sum + m))
    lam(3) shouldBe math.floor(1e6 * math.log(ratio) + 0.5).toLong
  }

  test("importanceScore: weight is the exact long sum of per-feature lambdas (bag unigrams, distinct bigrams)") {
    val m = 32
    val lamU = (0 until m).map(i => (i * 13 - 100).toLong)
    val lamB = (0 until m).map(i => (7 - i * 3).toLong)
    val docs = Seq((1L, "x y x y"), (2L, "")).toDF("doc_id", "text")
    val out = Selection.importanceScore(docs, col("doc_id"), col("text"),
      lamU, lamB).collect().map(r =>
        r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_feats"),
          r.getAs[Long]("weight_micros"))).toMap
    val exp = 2 * lamU(bucket(0, "x", m)) + 2 * lamU(bucket(0, "y", m)) +
      lamB(bucket(1, "x y", m)) + lamB(bucket(1, "y x", m))
    out(1L) shouldBe ((6L, exp))
    out(2L) shouldBe ((0L, 0L))
  }

  test("dsirSelect: top-k by Gumbel-perturbed key, deterministic under the seed, keys = weight + seeded noise") {
    val scored = (1L to 50L).map(i => (i, 1L, i * 1000L))
      .toDF("doc_id", "n_feats", "weight_micros")
    val a = Selection.dsirSelect(scored, 10, seed = 7L).collect()
    val b = Selection.dsirSelect(scored, 10, seed = 7L).collect()
    a.map(_.toSeq).toSeq shouldBe b.map(_.toSeq).toSeq
    a should have size 10
    // replay one row's key in plain Scala
    val row = a.head
    val id = row.getAs[Long]("doc_id")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"7:$id".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.take(12), 16).toDouble
    val u = (h + 0.5) / math.pow(2.0, 48)
    val g = math.floor(1e6 * -math.log(-math.log(u)) + 0.5).toLong
    row.getAs[Long]("key_micros") shouldBe (id * 1000L + g)
    // keys strictly ordered in the output
    val keys = a.map(_.getAs[Long]("key_micros")).toSeq
    keys shouldBe keys.sorted(Ordering[Long].reverse)
  }

  test("dsir end-to-end: selection leans toward target-like documents") {
    // target: docs over vocab {alpha..delta}; raw: half target-like,
    // half from a disjoint vocab — selection must overwhelmingly pick
    // the target-like half
    val tgtWords = Seq("alpha", "beta", "gamma", "delta")
    val offWords = Seq("omega", "sigma", "kappa", "theta")
    def doc(words: Seq[String], i: Long): String =
      (0 until 12).map(j => words(((i + j) % words.size).toInt)).mkString(" ")
    val target = (1L to 20L).map(i => (1000L + i, doc(tgtWords, i)))
      .toDF("doc_id", "text")
    val raw = ((1L to 30L).map(i => (i, doc(tgtWords, i))) ++
      (31L to 60L).map(i => (i, doc(offWords, i))))
      .toDF("doc_id", "text")
    val picked = Selection.dsir(raw, target, col("doc_id"), col("text"),
      nBuckets = 256, k = 20, seed = 3L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    picked.count(_ <= 30L) should be >= 18
  }
}
