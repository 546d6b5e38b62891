package graft

import org.apache.spark.sql.functions.{size => asize, _}
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(Tuple1(text)).toDF("t").select(c.as("v")).head().getAs[T]("v")

  test("tokens: null/empty/whitespace-only → empty array") {
    val df = Seq(Tuple1(null: String), Tuple1(""), Tuple1("  "), Tuple1("a b  c"))
      .toDF("t").select(asize(TF.tokens(col("t"))).as("n"))
    df.as[Int].collect().toSeq shouldBe Seq(0, 0, 0, 3)
  }

  test("regexTokenCount: words + single symbols") {
    one[Int](TF.regexTokenCount(col("t")), "hi, world!") shouldBe 4 // hi , world !
  }

  test("punctRatio and stopwordRatio") {
    one[Double](TF.punctRatio(col("t")), "ab!!") shouldBe 0.5
    one[Double](TF.punctRatio(col("t")), "") shouldBe 0.0
    one[Double](TF.stopwordRatio(col("t"), Seq("the", "a")), "the big a cat") shouldBe 0.5
  }

  test("shingles: n-token windows, distinct, short docs → whole doc") {
    one[Seq[String]](TF.shingles(col("t"), 3), "a b c d") shouldBe Seq("a b c", "b c d")
    one[Seq[String]](TF.shingles(col("t"), 3), "a b") shouldBe Seq("a b")
    one[Seq[String]](TF.shingles(col("t"), 3), "") shouldBe Seq.empty
  }

  test("native TokenShingles ≡ HOF reference form, including edge shapes") {
    // repeated windows (dedupe keeps first occurrence), short docs, n=1,
    // empty arrays, and a null token (array_join skips it + delimiter)
    val rows = Seq(
      Seq("a", "b", "a", "b", "a"), Seq("x"), Seq.empty[String],
      Seq("a", null, "b", "c"), Seq("t1", "t2", "t3", "t1", "t2", "t3"))
    val df = rows.map(Tuple1(_)).toDF("toks")
    for (n <- Seq(1, 2, 3, 8)) {
      val got = df.select(TF.tokenShingles(col("toks"), n).as("v"))
        .collect().map(_.getAs[scala.collection.Seq[String]]("v")).toSeq
      val ref = df.select(TF.tokenShinglesHof(col("toks"), n).as("v"))
        .collect().map(_.getAs[scala.collection.Seq[String]]("v")).toSeq
      withClue(s"n=$n") { got shouldBe ref }
    }
  }

  test("token_shingles is callable from SQL via GraftExtensions") {
    graft.expressions.GraftExtensions.register(spark)
    spark.sql("SELECT token_shingles(array('a','b','c'), 2) AS s")
      .head().getAs[scala.collection.Seq[String]]("s") shouldBe Seq("a b", "b c")
  }

  test("minhash signature: k wide, deterministic, order-insensitive on shingle sets") {
    val sig1 = one[scala.collection.Seq[String]](TF.minhashSignature(TF.shingles(col("t"), 2), 4), "x y z w")
    val sig2 = one[scala.collection.Seq[String]](TF.minhashSignature(TF.shingles(col("t"), 2), 4), "x y z w")
    sig1.length shouldBe 4
    sig1 shouldBe sig2
  }

  test("bandKeys: bands of r rows; short signature → zero bands") {
    val df = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("sig")
    df.select(asize(TF.bandKeys(col("sig"), 2)).as("n")).head().getInt(0) shouldBe 2
    df.select(asize(TF.bandKeys(col("sig"), 8)).as("n")).head().getInt(0) shouldBe 0
  }

  test("simhash: deterministic, 32-bit range, identical docs → distance 0") {
    val h1 = one[Long](TF.simhash(col("t")), "the quick brown fox")
    val h2 = one[Long](TF.simhash(col("t")), "the quick brown fox")
    h1 shouldBe h2
    h1 should be >= 0L
    h1 should be < (1L << 32)
    val df = Seq(("the quick brown fox", "the quick brown fox")).toDF("a", "b")
    df.select(TF.hammingDistance(TF.simhash(col("a")), TF.simhash(col("b"))).as("d"))
      .head().getAs[Number]("d").intValue() shouldBe 0
  }

  test("langId: stopword-hit majority, no hits → und") {
    val markers = TF.DefaultLangMarkers
    one[String](TF.langId(col("t"), markers), "the cat is in the house") shouldBe "en"
    one[String](TF.langId(col("t"), markers), "das ist nicht ein hund und") shouldBe "de"
    one[String](TF.langId(col("t"), markers), "zzz qqq") shouldBe "und"
  }

  test("qualityScore stays in [0,1]") {
    val scores = Seq("", "the of and to a in is it", "!!!!....;;;;", "plain words only here")
      .map(t => one[Double](TF.qualityScore(col("t"), TF.DefaultLangMarkers("en")), t))
    all(scores) should (be >= 0.0 and be <= 1.0)
  }

  test("topTokenFraction: max token share, case-folded, empty → 0") {
    one[Double](TF.topTokenFraction(col("t")), "a a a b") shouldBe 0.75
    one[Double](TF.topTokenFraction(col("t")), "The the THE b") shouldBe 0.75
    one[Double](TF.topTokenFraction(col("t")), "a b c d") shouldBe 0.25
    one[Double](TF.topTokenFraction(col("t")), "") shouldBe 0.0
    one[Double](TF.topTokenFraction(col("t")), null) shouldBe 0.0
  }

  test("dupNgramFraction: repeated-occurrence share over raw n-grams") {
    // "a b a b a" bigrams: [a b, b a, a b, b a] → 4 total, 2 distinct
    one[Double](TF.dupNgramFraction(col("t"), 2), "a b a b a") shouldBe 0.5
    one[Double](TF.dupNgramFraction(col("t"), 2), "a b c") shouldBe 0.0
    // shorter than n → whole doc is the one n-gram → no duplicates
    one[Double](TF.dupNgramFraction(col("t"), 3), "a b") shouldBe 0.0
    one[Double](TF.dupNgramFraction(col("t"), 2), "") shouldBe 0.0
  }

  test("redactPii: emails, IPv4, phones, long digit runs") {
    one[String](TF.redactPii(col("t")),
      "mail bob.smith+x@corp.example.com now") shouldBe "mail <EMAIL> now"
    one[String](TF.redactPii(col("t")),
      "host 192.168.001.1 up") shouldBe "host <IP> up"
    one[String](TF.redactPii(col("t")),
      "call (415) 555-0173 or 415-555-0173") shouldBe "call <PHONE> or <PHONE>"
    one[String](TF.redactPii(col("t")),
      "card 4111111111111111 ok") shouldBe "card <NUMBER> ok"
    // email wins over its embedded digit run; short digit runs survive
    one[String](TF.redactPii(col("t")),
      "a1234567890123@x.io and pin 1234") shouldBe "<EMAIL> and pin 1234"
    one[String](TF.redactPii(col("t")), null) shouldBe ""
  }

  test("linkDensity: url-token share, case-folded, empty → 0") {
    one[Double](TF.linkDensity(col("t")),
      "see https://a.example and http://b.example plus WWW.c.example") shouldBe 0.5
    one[Double](TF.linkDensity(col("t")), "plain prose only here") shouldBe 0.0
    one[Double](TF.linkDensity(col("t")), "") shouldBe 0.0
    one[Double](TF.linkDensity(col("t")), null) shouldBe 0.0
  }

  test("nfcNormalize: combining marks compose, ASCII passes through, dedup hashes align") {
    val decomposed = "cafe\u0301" // e + COMBINING ACUTE ACCENT
    val precomposed = "caf\u00e9" // precomposed LATIN SMALL LETTER E WITH ACUTE
    one[String](TF.nfcNormalize(col("t")), decomposed) shouldBe precomposed
    one[String](TF.nfcNormalize(col("t")), precomposed) shouldBe precomposed
    one[String](TF.nfcNormalize(col("t")), "plain ascii") shouldBe "plain ascii"
    one[String](TF.nfcNormalize(col("t")), null) shouldBe null
    // the reason the scrub exists: equal visible text, equal content hash
    // ONLY after normalization
    import spark.implicits._
    val hashes = Seq(decomposed, precomposed).toDF("t")
      .select(graft.functions.Hashing.contentHash(TF.nfcNormalize(col("t"))).as("h"))
      .as[String].collect().toSet
    hashes.size shouldBe 1
    val rawHashes = Seq(decomposed, precomposed).toDF("t")
      .select(graft.functions.Hashing.contentHash(col("t")).as("h"))
      .as[String].collect().toSet
    rawHashes.size shouldBe 2
  }
}
