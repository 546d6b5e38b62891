package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPipeline

/** Stage invariants of the corpus-cleaning composition on a corpus built
  * to trip every stage. */
class CorpusPipelineSpec extends SparkSpecBase {

  test("clean drops low-quality, exact-dup, and near-dup docs; keeps cluster minima") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and it is a fine day in town you know that"
    val nearDup = good + " indeed"
    val unrelated = "completely different prose about catalyst plans and shuffle exchanges in the engine it is"
    val docs = Seq(
      (1L, "en", good),            // cluster min — survives
      (2L, "en", good),            // exact dup of 1 — dropped at stage 2
      (3L, "en", nearDup),         // near-dup of 1 — dropped at stage 3
      (4L, "en", unrelated),       // distinct — survives
      (5L, "en", "#$%! @@ ^^ &*")  // punctuation junk — dropped at stage 1
    ).map { case (id, l, t) => (id, l, t, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    val out = CorpusPipeline.clean(docs,
        stopwords = graft.functions.TextFunctions.DefaultLangMarkers("en"),
        qualityThreshold = 0.5, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    out shouldBe Set(1L, 4L)
  }

  test("cleanWith: winnowing and minhash policies disagree on a shared contiguous quote") {
    import spark.implicits._
    // docs 1 and 2 share a 12-token contiguous quote inside otherwise
    // disjoint prose: winnowing (contiguous overlap, any shared k+w−1=6
    // token run ⇒ shared fingerprint) pairs them; MinHash verified
    // Jaccard over 3-shingles stays well under 0.5 (≈10 shared shingles
    // of ≈30 union) and keeps both
    val quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, "en", "one two three four five six seven eight nine ten " + quote),
      (2L, "en", "uno dos tres cuatro cinco seis siete ocho nueve diez " + quote))
      .map { case (id, l, t) => (id, l, t, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    def run(policy: CorpusPipeline.PairPolicy): Set[Long] =
      CorpusPipeline.cleanWith(docs,
          stopwords = graft.functions.TextFunctions.DefaultLangMarkers("en"),
          qualityThreshold = 0.0, policy)
        .select("doc_id").as[Long].collect().toSet
    run(CorpusPipeline.winnowingPolicy(minShared = 1L)) shouldBe Set(1L)
    run(CorpusPipeline.minhashPolicy()) shouldBe Set(1L, 2L)
    spark.catalog.clearCache()
  }

  test("clean ≡ cleanWith(minhashPolicy) — the default is the refactor's fixed point") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and it is a fine day in town you know that"
    val docs = Seq((1L, "en", base), (2L, "en", base + " indeed"),
      (3L, "en", "completely different prose about catalyst plans and shuffle exchanges it is"))
      .map { case (id, l, t) => (id, l, t, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    val sw = graft.functions.TextFunctions.DefaultLangMarkers("en")
    val viaClean = CorpusPipeline.clean(docs, sw, qualityThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val viaWith = CorpusPipeline.cleanWith(docs, sw, qualityThreshold = 0.5,
        CorpusPipeline.minhashPolicy())
      .select("doc_id").as[Long].collect().toSet
    viaWith shouldBe viaClean
    spark.catalog.clearCache()
  }

  test("clean(keepBestByQuality): each near-dup cluster keeps its cleanest member") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and it is a fine day in town you know that"
    // doc 2 is doc 1 plus junk punctuation → lower quality, same shingle
    // cluster; min-id policy would keep 1, keep-best must also keep 1;
    // flip the ids so the policies DISAGREE and the test discriminates
    val noisy = good + " !!!! ;;;; @@@@"
    val docs = Seq(
      (1L, "en", noisy),  // cluster min id but NOISY
      (2L, "en", good),   // higher quality — keep-best's pick
      (3L, "en", "completely different prose about catalyst plans and shuffle exchanges in the engine it is")
    ).map { case (id, l, t) => (id, l, t, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    val sw = graft.functions.TextFunctions.DefaultLangMarkers("en")
    val minId = CorpusPipeline.clean(docs, sw, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val best = CorpusPipeline.clean(docs, sw, jaccardThreshold = 0.5,
        keepBestByQuality = true)
      .select("doc_id").as[Long].collect().toSet
    minId shouldBe Set(1L, 3L)
    best shouldBe Set(2L, 3L)
  }

  test("cleanIncremental ≡ full re-clean on an append-only bridge-free batch") {
    import spark.implicits._
    val sw = graft.functions.TextFunctions.DefaultLangMarkers("en")
    val all = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .filter(col("doc_id") < 200)
    val a = all.filter(col("doc_id") < 100)
    val b = all.filter(col("doc_id") >= 100)
    def full = CorpusPipeline.clean(all, sw, jaccardThreshold = 0.5, rowsPerBand = 1)
    val inc = CorpusPipeline.cleanIncremental(
      CorpusPipeline.clean(a, sw, jaccardThreshold = 0.5, rowsPerBand = 1),
      b, sw, jaccardThreshold = 0.5, rowsPerBand = 1)
    inc.exceptAll(full).count() shouldBe 0L
    full.exceptAll(inc).count() shouldBe 0L
  }

  test("cleanIncremental: a content-replay batch under fresh ids adds nothing") {
    import spark.implicits._
    val sw = graft.functions.TextFunctions.DefaultLangMarkers("en")
    val a = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .filter(col("doc_id") < 100)
    val cleaned = CorpusPipeline.clean(a, sw)
    // same payloads arriving again under new (higher) ids — the exact
    // hash semi-join must reject every one before any near-dup work
    val replay = a.withColumn("doc_id", col("doc_id") + 100000L)
    val after = CorpusPipeline.cleanIncremental(cleaned, replay, sw)
    after.exceptAll(cleaned).count() shouldBe 0L
    cleaned.exceptAll(after).count() shouldBe 0L
  }

  test("cleanDecontaminatedScoped ≡ screen-the-raw-corpus-first + " +
      "cleanWith(scoped policy) — the screen commutes past gate and " +
      "exact dedup") {
    // the r19 q164 shape (screen first, second full tokenize pass) vs
    // the fused chain (gate → dedup → one shared shingle frame →
    // screen → banding). The screen is a pure function of text, so the
    // two must select identical survivors — including the exact-dup
    // group case (a contaminated group drops WHOLE, so the surviving
    // groups' min-id representatives are unchanged).
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"), col("text"))
    val sw = graft.functions.TextFunctions.DefaultLangMarkers("en")
    val isBench = col("doc_id") % 97 === 0
    val nonEmpty = trim(coalesce(col("text"), lit(""))) =!= ""
    val bench = docs.filter(isBench && nonEmpty)
    val cand = docs.filter(!isBench)
    // legacy shape, inlined from the r19 q164
    val bits = graft.operators.Contamination.bloomBits(bench, col("text"),
      n = 3, m = 2048, k = 3)
    val probed = cand.filter(nonEmpty)
    val suspects = graft.operators.Contamination.bloomNgramOverlap(
        probed, bits, col("doc_id"), col("text"), n = 3, k = 3)
      .filter(col("bloom_matched") > 0).select(col("doc_id"))
    val contaminated = graft.operators.Contamination.ngramOverlap(
        probed.join(suspects, Seq("doc_id"), "left_semi"),
        bench, col("doc_id"), col("text"), n = 3, denomFactor = 2)
      .filter(col("contaminated")).select(col("doc_id"))
    val scoped: CorpusPipeline.PairPolicy = (df, id, text) =>
      graft.operators.Dedup.scopedMinhashNearDupPairs(df, id, text,
        col("source"), shingleN = 3, k = 8, rowsPerBand = 1,
        threshold = 0.4, maxBandDf = Some(30L))
        .select(col("id_a"), col("id_b"))
    val legacy = CorpusPipeline.cleanWith(
        cand.join(contaminated, Seq("doc_id"), "left_anti"), sw,
        qualityThreshold = 0.5, pairPolicy = scoped)
      .select(col("doc_id"), col("source"))
    val fused = CorpusPipeline.cleanDecontaminatedScoped(
        cand, bench, sw, qualityThreshold = 0.5, scope = col("source"),
        shingleN = 3, minhashK = 8, rowsPerBand = 1,
        jaccardThreshold = 0.4, maxBandDf = Some(30L))
      .select(col("doc_id"), col("source"))
    fused.exceptAll(legacy).count() shouldBe 0L
    legacy.exceptAll(fused).count() shouldBe 0L
    fused.count() should be > 0L
    spark.catalog.clearCache()
  }
}
