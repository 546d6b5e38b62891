package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Keywords}

class ContaminationAndKeywordsSpec extends SparkSpecBase {
  import spark.implicits._

  test("ngramOverlap: contained, disjoint, and partial candidates") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),          // shares all 2 trigrams w/ bench
      (2L, "zz yy xx ww vv"),                  // disjoint
      (3L, "alpha beta gamma nine ten eleven") // 1 of 4 trigrams
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")

    val out = Contamination.ngramOverlap(docs, bench, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    out shouldBe Seq(
      (1L, 2L, 2L, true),
      (2L, 0L, 3L, false),
      (3L, 1L, 4L, false))
  }

  test("ngramOverlap: empty/whitespace docs are never contaminated (0 of 0 grams)") {
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
      (4L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(docs, bench, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // a doc with no grams shares NOTHING with the benchmark — the integer
    // threshold must not pass vacuously on 0·f >= 0
    out shouldBe Seq(
      (1L, 0L, 0L, false), (2L, 0L, 0L, false), (3L, 0L, 0L, false),
      (4L, 1L, 1L, true))
  }

  test("ngramOverlap: benchmark gram set joins as a broadcast hash probe") {
    val docs = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val plan = Contamination.ngramOverlap(docs, docs.limit(1), col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("bloom: no false negatives — every exact match bloom-matches; superset per doc") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zz yy xx ww vv"),
      (3L, "alpha beta gamma nine ten eleven")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val bits = Contamination.bloomBits(bench, col("text"), n = 3, m = 2048, k = 3)
    bits.size shouldBe 2048
    val bloom = Contamination.bloomNgramOverlap(docs, bits, col("doc_id"),
        col("text"), n = 3, k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val exact = Contamination.ngramOverlap(docs, bench, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    bloom.zip(exact).foreach { case ((id, bm, tot), (eid, em, etot, _)) =>
      id shouldBe eid
      tot shouldBe etot
      bm should be >= em // one-sided: false positives only ever ADD
    }
    // at m=2048 with 4 benchmark trigrams, doc 1's 2 exact matches and
    // doc 2's 0 must come back exactly (no collision in a near-empty filter
    // under the fixed md5 hash — deterministic)
    bloom.map(t => (t._1, t._2)) shouldBe Seq((1L, 2L), (2L, 0L), (3L, 1L))
  }

  test("bloom: a saturated tiny filter over-matches but never under-matches") {
    val docs = Seq((1L, "one two three four"), (2L, "p q r s t")).toDF("doc_id", "text")
    val bench = Seq((100L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 b1 b2 b3 b4 b5 b6 b7 b8 b9"))
      .toDF("doc_id", "text")
    // m=8 with 16 benchmark trigrams × 2 hashes: essentially all bits set,
    // so disjoint docs still "match" — the false-positive side made visible
    val bits = Contamination.bloomBits(bench, col("text"), n = 3, m = 8, k = 2)
    val out = Contamination.bloomNgramOverlap(docs, bits, col("doc_id"),
        col("text"), n = 3, k = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val exactMatched = Contamination.ngramOverlap(docs, bench, col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().map(_._2)
    out.map(_._2).zip(exactMatched).foreach { case (bm, em) => bm should be >= em }
    out.map(_._2).sum should be > 0L // saturation produced false positives
  }

  test("bloom property: no false negatives over randomized corpora (seeded trials)") {
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 30).map(i => s"w$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (m <- Seq(64, 512)) {
      val bench = (100L until 104L).map(i => (i, doc(8 + rnd.nextInt(12)))).toDF("doc_id", "text")
      val docs = (1L until 13L).map(i => (i, doc(5 + rnd.nextInt(20)))).toDF("doc_id", "text")
      val bits = Contamination.bloomBits(bench, col("text"), n = 3, m = m, k = 3)
      val bloom = Contamination.bloomNgramOverlap(docs, bits, col("doc_id"),
          col("text"), n = 3, k = 3)
        .orderBy("doc_id").collect().map(_.getAs[Long]("bloom_matched"))
      val exact = Contamination.ngramOverlap(docs, bench, col("doc_id"), col("text"))
        .orderBy("doc_id").collect().map(_.getAs[Long]("matched"))
      bloom.zip(exact).foreach { case (bm, em) => bm should be >= em }
    }
  }

  test("unigramSurprisal: whole-bit self-information, exact on known freqs") {
    import spark.implicits._
    import graft.operators.Keywords
    // freqs: a=5, b=2, c=1; N=8 -> bitlen(N)=4; bits(a)=1, bits(b)=2,
    // bits(c)=3
    val docs = Seq((1L, "a a a b"), (2L, "a a b c")).toDF("id", "text")
    val out = Keywords.unigramSurprisal(docs, col("id"), col("text"))
      .orderBy("doc_id").collect()
    out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
      r.getAs[Long]("bits"), r.getAs[Long]("bits_per_tok_x100"))) shouldBe
      Array((1L, 4L, 5L, 125L), (2L, 4L, 7L, 175L))
    // rarer tokens -> strictly higher per-token surprisal
    out(1).getAs[Long]("bits") should be > out(0).getAs[Long]("bits")
    spark.catalog.clearCache()
  }

  test("topTerms: tf-first ranking with df and term tie-breaks, k bound") {
    val docs = Seq(
      (1L, "cat cat cat dog dog fish"),
      (2L, "dog dog bird bird fish")
    ).toDF("doc_id", "text")
    val out = Keywords.topTerms(docs, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id", "rnk")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // doc 1: cat tf=3 (df=1) then dog tf=2 (df=2)
    // doc 2: dog tf=2 and bird tf=2 tie → rarer term first (bird df=1 < dog df=2)
    out shouldBe Seq(
      (1L, "cat", 3L, 1L, 1L),
      (1L, "dog", 2L, 2L, 2L),
      (2L, "bird", 2L, 1L, 1L),
      (2L, "dog", 2L, 2L, 2L))
  }

  test("topTerms: equal tf and df breaks to term ascending; case folds") {
    val docs = Seq((1L, "B b A a")).toDF("doc_id", "text")
    val out = Keywords.topTerms(docs, col("doc_id"), col("text"), k = 3)
      .orderBy("rnk").as[(Long, String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq((1L, "a", 2L, 1L, 1L), (1L, "b", 2L, 1L, 2L))
  }

  test("bm25TopK: idf favors rare terms, tf saturates, k bounds, deterministic") {
    // "rare" appears in one doc, "common" in all — under any idf weighting
    // the rare-term doc must outrank same-tf common-term docs
    val docs = Seq(
      (1L, "rare common filler filler"),
      (2L, "common common filler filler"),
      (3L, "common filler filler filler"),
      (4L, "filler filler filler filler")
    ).toDF("doc_id", "text")
    val out = Keywords.bm25TopK(docs, col("doc_id"), col("text"),
      Seq(7 -> Seq("rare", "common")), k = 3)
      .orderBy("rnk").as[(Int, Long, Int)].collect().toSeq
    out.map(_._1).distinct shouldBe Seq(7)
    out.size shouldBe 3                       // k bound
    out.head._2 shouldBe 1L                   // rare+common beats common-only
    out(1)._2 shouldBe 2L                     // tf=2 common beats tf=1
    out(2)._2 shouldBe 3L                     // zero-hit doc 4 never surfaces
    // deterministic: a rebuilt plan yields identical rows
    Keywords.bm25TopK(docs, col("doc_id"), col("text"),
      Seq(7 -> Seq("rare", "common")), k = 3)
      .orderBy("rnk").as[(Int, Long, Int)].collect().toSeq shouldBe out
  }

  test("reciprocalRank: agreement wins, one-sided entries contribute one term, ties by id") {
    import graft.operators.Fusion
    // doc 10 ranks 1st in both lists; doc 20 only lexical(2); doc 30 only
    // vector(2); doc 40 ranks 3rd in both — 40's two weak terms must beat
    // the single-term docs (1/63+1/63 > 1/62)
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 40L, 3)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 10L, 1), (1L, 30L, 2), (1L, 40L, 3)).toDF("query_id", "doc_id", "rnk")
    val out = Fusion.reciprocalRank(a, b, k = 4)
      .orderBy("rnk").as[(Long, Long, Int)].collect().toSeq
    out.map(_._2) shouldBe Seq(10L, 40L, 20L, 30L)
    // 20 and 30 have identical single-term scores (both rank 2) → id order
    out.map(_._3) shouldBe Seq(1, 2, 3, 4)
  }

  test("bm25TopK: longer docs penalized at equal tf; multi-query batch ranks independently") {
    val docs = Seq(
      (1L, "term pad"),
      (2L, "term pad pad pad pad pad pad pad"),
      (3L, "other other other")
    ).toDF("doc_id", "text")
    val out = Keywords.bm25TopK(docs, col("doc_id"), col("text"),
      Seq(1 -> Seq("term"), 2 -> Seq("other")), k = 2)
      .orderBy("query_id", "rnk").as[(Int, Long, Int)].collect().toSeq
    // q1: same tf=1, shorter doc wins the length normalization
    out.take(2) shouldBe Seq((1, 1L, 1), (1, 2L, 2))
    // q2: only doc 3 matches "other"; zero-scored docs fill by id
    out(2) shouldBe ((2, 3L, 1))
  }

  test("crossSplitNearDups: labels are the id hash, leak iff splits differ") {
    import spark.implicits._
    def label(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 4)
      if (h < "cccc") "train" else if (h < "e666") "val" else "test"
    }
    // identical texts → jaccard 1.0 pairs; a third unrelated doc
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different content here now yes")).toDF("doc_id", "text")
    val out = operators.Contamination.crossSplitNearDups(
      docs, col("doc_id"), col("text")).collect()
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    val row = out.head
    row.getAs[Double]("jaccard") shouldBe 1.0
    row.getAs[String]("split_a") shouldBe label(1L)
    row.getAs[String]("split_b") shouldBe label(2L)
    row.getAs[Boolean]("leak") shouldBe (label(1L) != label(2L))
    spark.catalog.clearCache()
  }
}
