package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** One BPE merge round (Bpe): per-position weighted pair counts,
  * deterministic best-pair tie-break, greedy left-to-right merge
  * semantics (no re-merge within a round), and the end-to-end per-doc
  * rollup on both join paths. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pair counts are per-position and frequency-weighted") {
    val words = Seq(("aaa", 2L), ("ab", 5L)).toDF("word", "freq")
    val counts = Bpe.pairCounts(words).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    counts shouldBe Map(("a", "a") -> 4L, ("a", "b") -> 5L) // "aaa": 2 positions × freq 2
  }

  test("best pair breaks count ties lexicographically") {
    val pairs = Seq(("b", "a", 7L), ("a", "c", 7L), ("a", "b", 7L), ("z", "z", 9L))
      .toDF("l", "r", "cnt")
    val best = Bpe.bestPair(pairs).collect()
    best.map(r => (r.getString(0), r.getString(1), r.getLong(2))) shouldBe
      Array(("z", "z", 9L))
    val tied = Bpe.bestPair(pairs.filter(col("cnt") === 7L)).collect()
    tied.map(r => (r.getString(0), r.getString(1))) shouldBe Array(("a", "b"))
  }

  test("greedy left-to-right merge: no re-merge, runs pair up evenly") {
    val words = Seq(("aaaa", 1L), ("aaa", 1L), ("abab", 1L), ("aba", 1L),
      ("xyz", 1L), ("a", 1L)).toDF("word", "freq")
    val best = Seq(("a", "a", 99L)).toDF("l", "r", "cnt")
    val enc = Bpe.encodeWords(words, best).collect()
      .map(r => r.getString(0) -> (r.getAs[String]("enc"), r.getAs[Long]("n_sym"))).toMap
    enc("aaaa") shouldBe ("aa aa", 2L)
    enc("aaa") shouldBe ("aa a", 2L)
    enc("abab") shouldBe ("a b a b", 4L) // rule is (a,a); (a,b) untouched
    enc("aba") shouldBe ("a b a", 3L)
    enc("xyz") shouldBe ("x y z", 3L)
    enc("a") shouldBe ("a", 1L)

    val bestAb = Seq(("a", "b", 99L)).toDF("l", "r", "cnt")
    val encAb = Bpe.encodeWords(words, bestAb).collect()
      .map(r => r.getString(0) -> r.getAs[String]("enc")).toMap
    encAb("abab") shouldBe "ab ab"
    encAb("aba") shouldBe "ab a"
    encAb("aaaa") shouldBe "a a a a"
  }

  test("train: iterated rounds compose merges; multi-char symbols merge") {
    // corpus "abab" ×3, "aba" ×2: round 1 counts (a,b)=3·2+2·1... per
    // occurrence: abab has (a,b)@1,(b,a)@2,(a,b)@3; aba has (a,b),(b,a).
    // freq-weighted: (a,b)=3·2+2·1=8, (b,a)=3·1+2·1=5 -> rule1 (a,b).
    // round 2 over {abab->"ab ab" f3, aba->"ab a" f2}: (ab,ab)=3,
    // (ab,a)=2 -> rule2 (ab,ab) -> abab->"abab", aba unchanged.
    val words = Seq(("abab", 3L), ("aba", 2L)).toDF("word", "freq")
    val (merges, enc) = Bpe.train(words, rounds = 2)
    merges shouldBe Seq(("a", "b", 8L), ("ab", "ab", 3L))
    enc.collect().map(r => r.getAs[String]("word") -> r.getAs[String]("enc"))
      .toMap shouldBe Map("abab" -> "abab", "aba" -> "ab a")
  }

  test("train stops early when no pair repeats") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    // every pair has cnt 1 -> round 1 learns nothing, table is empty
    val (merges, enc) = Bpe.train(words, rounds = 3)
    merges shouldBe empty
    enc.collect().map(_.getAs[String]("enc")).sorted shouldBe Array("a b", "c d")
  }

  test("trainRounds raises loudly when the corpus saturates early") {
    // two docs of unique singleton words: no pair ever reaches cnt 2,
    // so a 2-round training must fail, not return a short merge table
    // (the q84 oracle replays exactly `rounds` merges)
    val df = Seq((1L, "ab"), (2L, "cd")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Bpe.trainRounds(df, col("doc_id"), col("text"), rounds = 2).collect()
    }
    e.getMessage should include("saturated after 0 of 2")
  }

  test("trainRounds(1) enc checksums agree with mergeRound") {
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val viaTrain = Bpe.trainRounds(docs, col("doc_id"), col("text"), rounds = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val viaRound = Bpe.mergeRound(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    viaTrain shouldBe viaRound
    spark.catalog.clearCache()
  }

  test("encodeCorpus under the trained rules reproduces trainRounds") {
    // inference with the table the trainer learned must yield the same
    // per-doc checksums as training itself (train-once-encode-many)
    val docs = Seq((1L, "ab ab abc cd cd"), (2L, "ab abc"), (3L, "cd ab"))
      .toDF("doc_id", "text")
    val trained = Bpe.trainRounds(docs, col("doc_id"), col("text"), rounds = 2)
      .orderBy("doc_id").collect()
    val rules = trained.head.getAs[String]("rules").split(",").toSeq
      .map { s => val Array(pair, _) = s.split(":");
        (pair.substring(0, pair.indexOf('+')), pair.substring(pair.indexOf('+') + 1)) }
    val inferred = Bpe.encodeCorpus(docs, col("doc_id"), col("text"), rules)
      .orderBy("doc_id").collect()
    inferred.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
      r.getAs[Long]("n_sym"), r.getAs[String]("enc_md5"))).toSeq shouldBe
      trained.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("n_sym"), r.getAs[String]("enc_md5"))).toSeq
    // an empty rule table is the identity encoding (chars, space-joined)
    Bpe.encodeCorpus(Seq((1L, "ab")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), Seq.empty)
      .collect().head.getAs[Long]("n_sym") shouldBe 2L
    spark.catalog.clearCache()
  }

  test("tokenizer artifact roundtrip: write → load ≡ trained merges; encode under the loaded table ≡ trainRounds") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_tok_spec_")
    try {
      val tok = dir.resolve("tok").toString
      Bpe.writeTokenizer(docs, col("doc_id"), col("text"), rounds = 3, tok)
      // the loaded ordered rules are exactly the trainer's
      val loaded = Bpe.loadTokenizer(spark, tok)
      loaded.size shouldBe 3
      val direct = Bpe.trainRounds(docs, col("doc_id"), col("text"), rounds = 3)
      val viaArtifact = Bpe.encodeCorpusWith(docs, col("doc_id"), col("text"), tok)
      viaArtifact.orderBy("doc_id")
        .select("doc_id", "n_tok", "n_sym", "enc_md5")
        .collect().toSeq shouldBe
        direct.orderBy("doc_id")
          .select("doc_id", "n_tok", "n_sym", "enc_md5")
          .collect().toSeq
      // a parameter-less parquet dir is not a tokenizer artifact
      spark.range(1).selectExpr("1 as rank", "'a' as l", "'b' as r")
        .write.mode("overwrite").parquet(dir.resolve("legacy").toString)
      val e = intercept[IllegalArgumentException] {
        Bpe.loadTokenizer(spark, dir.resolve("legacy").toString)
      }
      e.getMessage should include("p_rounds")
      // a caller pinned to another generation fails loudly instead of
      // silently encoding under the wrong merge table
      val e2 = intercept[IllegalArgumentException] {
        Bpe.loadTokenizer(spark, tok, expectedRounds = Some(5))
      }
      e2.getMessage should include("generation")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("applyMergesNative is byte-identical to the fold, including cascading rule tables") {
    val words = Seq(
      ("aaaa", 3L), ("abab", 2L), ("banana", 1L), ("a", 5L),
      ("aabb", 1L), ("bbbb", 1L), ("abcabc", 2L)
    ).toDF("word", "freq")
    // rules deliberately cascade: later rules consume earlier merges
    val tables = Seq(
      Seq(("a", "a")),
      Seq(("a", "a"), ("aa", "aa")),
      Seq(("a", "b"), ("ab", "ab"), ("abab", "c")),
      Seq(("b", "a"), ("n", "a"), ("ba", "na")))
    // supplementary-plane left symbol: 1 codepoint, 2 UTF-16 units —
    // the fold must strip it by codepoint count (the applyMerge fix)
    val astral = "𝛂" // 𝛂
    val astralWords = Seq((s"a${astral}b${astral}b", 1L)).toDF("word", "freq")
    val astralRules = Seq((astral, "b"))
    Bpe.applyMergesNative(astralWords, astralRules).orderBy("word")
      .collect().map(_.toSeq).toSeq shouldBe
      Bpe.applyMerges(astralWords, astralRules).orderBy("word")
        .collect().map(_.toSeq).toSeq
    tables.foreach { rules =>
      val fold = Bpe.applyMerges(words, rules)
        .orderBy("word").collect().map(_.toSeq).toSeq
      val native = Bpe.applyMergesNative(words, rules)
        .orderBy("word").collect().map(_.toSeq).toSeq
      native shouldBe fold
    }
    // randomized words over a small alphabet: the two paths must agree
    // on every (word, rule-table) combination
    val rnd = new scala.util.Random(17)
    val randWords = (0 until 60)
      .map(i => (Seq.fill(1 + rnd.nextInt(10))(('a' + rnd.nextInt(3)).toChar).mkString, 1L))
      .distinct.toDF("word", "freq")
    val rules = Seq(("a", "b"), ("b", "c"), ("ab", "c"), ("a", "a"), ("aa", "bc"))
    Bpe.applyMergesNative(randWords, rules).orderBy("word")
      .collect().map(_.toSeq).toSeq shouldBe
      Bpe.applyMerges(randWords, rules).orderBy("word")
        .collect().map(_.toSeq).toSeq
  }

  test("applyMergesNative handles a production-sized rule table in one plan node") {
    // 2000 rules — the fold form would build 2000 chained aggregates;
    // the native expression is one node and one pass per rule in-JVM
    val words = Seq(("abcabcabc", 1L), ("aaabbbccc", 1L)).toDF("word", "freq")
    val bigRules = (0 until 2000).map(i => (s"x$i", s"y$i")) ++ Seq(("a", "b"))
    val out = Bpe.applyMergesNative(words, bigRules)
      .orderBy("word").collect().map(r => r.getString(2)).toSeq
    // only the one applicable rule fires
    out shouldBe Seq("a a ab b b c c c", "ab c ab c ab c")
  }

  test("mergeRound end to end; broadcast path ≡ shuffle path") {
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    // words: ab freq 3, cd freq 1 -> pairs (a,b) 3, (c,d) 1 -> rule (a,b)
    // encodings: ab -> "ab" (1 sym), cd -> "c d" (2 syms)
    val out = Bpe.mergeRound(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getString(5), r.getLong(6)))
    out shouldBe Array(
      (1L, 3L, 4L, md5Hex("ab ab c d"), "a", "b", 3L),
      (2L, 1L, 1L, md5Hex("ab"), "a", "b", 3L))
    val bcast = Bpe.mergeRound(docs, col("doc_id"), col("text"),
      broadcastWords = true).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getString(5), r.getLong(6)))
    bcast shouldBe out
    spark.catalog.clearCache()
  }
}
