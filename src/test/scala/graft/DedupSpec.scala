package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("exactByContent: one row per distinct content, lowest id kept") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactByContent(df, col("text"), col("doc_id"))
      .orderBy("keep_id").select("keep_id", "copies").as[(Long, Long)].collect().toSeq
    out shouldBe Seq((1L, 2L), (2L, 1L))
  }

  test("minhashNearDupPairs: exact duplicates pair with jaccard 1.0; distinct docs don't") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words about spark catalyst execution plans"
    val df = Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(df, col("doc_id"), col("text"))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    pairs shouldBe Seq((1L, 2L, 1.0))
  }

  test("admitNewDocs: index dups rejected, within-batch dups collapse, uniques admitted") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "catalyst plans whole stage codegen for declarative dataframe queries"
    val c = "entirely novel content about nothing previously indexed at all"
    // index keeps doc 1 (= text a); new batch: 10 duplicates a (reject),
    // 11 and 12 duplicate each other (keep 11 only), 13 is unique (keep)
    val index = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fresh = Seq((10L, a), (11L, c), (12L, c), (13L, "unrelated fresh words beyond any shingle overlap threshold"))
      .toDF("doc_id", "text")
    val admitted = Dedup.admitNewDocs(fresh, index, col("doc_id"), col("text"))
      .orderBy("doc_id").as[Long].collect().toSeq
    admitted shouldBe Seq(11L, 13L)
    // invariant: admitted ∪ index = the full-rebuild kept set
    spark.catalog.clearCache()
  }

  test("minhashNearDupPairs: jaccard threshold filters weak overlaps") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 zz yy"   // high overlap
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // rowsPerBand=1 → candidate if ANY of the k minhashes agree, so the
    // LSH recall probability doesn't decide the test; the exact jaccard
    // verification is what's under test
    val loose = Dedup.minhashNearDupPairs(df, col("doc_id"), col("text"),
      rowsPerBand = 1, threshold = 0.3)
    val strict = Dedup.minhashNearDupPairs(df, col("doc_id"), col("text"),
      rowsPerBand = 1, threshold = 0.99)
    loose.count() shouldBe 1L
    strict.count() shouldBe 0L
  }

  test("bandedNgramJaccardPairs ⊆ all-pairs baseline with identical jaccard, recall ≥ 0.8") {
    // real corpus slice: the banded composition (q37's driver shape) must
    // only ever drop pairs relative to the exact all-pairs measure — same
    // ids, same jaccard values — and at rowsPerBand=1 it should keep
    // nearly all of them
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .filter(trim(col("text")) =!= "")
    val allPairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 2, threshold = 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val banded = Dedup.bandedNgramJaccardPairs(docs, col("doc_id"), col("text"),
      candShingleN = 3, k = 8, rowsPerBand = 1, n = 2, threshold = 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    allPairs.size should be >= 5
    banded.subsetOf(allPairs) shouldBe true
    banded.size.toDouble / allPairs.size.toDouble should be >= 0.8
  }

  test("sharedNgramStats: per-doc shared counts, unique docs at zero, short docs = whole-doc gram") {
    val df = Seq(
      (1L, "a b c d"),   // trigrams {a b c, b c d} — shares "a b c" with doc 2
      (2L, "a b c x"),   // trigrams {a b c, b c x}
      (3L, "z z z z"),   // distinct trigrams collapse to {z z z} — unique
      (4L, "q")          // shorter than n → whole doc as one gram — unique
    ).toDF("doc_id", "text")
    val out = Dedup.sharedNgramStats(df, col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id")
      .select("doc_id", "shared", "total", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    out shouldBe Seq(
      (1L, 1L, 2L, 0.5), (2L, 1L, 2L, 0.5), (3L, 0L, 1L, 0.0), (4L, 0L, 1L, 0.0))
  }

  test("sharedNgramStats dfCeiling: Zipf-head grams excluded from both counts") {
    val df = Seq(
      (1L, "x y z a"),  // grams {x y z, y z a}: "x y z" in all 3 docs (over ceiling)
      (2L, "x y z b"),  // "y z a"/"y z b"/"y z c" are unique
      (3L, "x y z c"),
      (4L, "q")         // its only gram is under the ceiling and unique
    ).toDF("doc_id", "text")
    val out = Dedup.sharedNgramStats(df, col("doc_id"), col("text"),
        n = 3, dfCeiling = 2L)
      .orderBy("doc_id")
      .select("doc_id", "shared", "total", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // "x y z" (df=3) is dropped from shared AND total — each of docs 1-3
    // keeps one signal gram, none shared; without the ceiling all three
    // would report shared=1
    out shouldBe Seq(
      (1L, 0L, 1L, 0.0), (2L, 0L, 1L, 0.0), (3L, 0L, 1L, 0.0), (4L, 0L, 1L, 0.0))
    val noCeiling = Dedup.sharedNgramStats(df, col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id").select("shared").as[Long].collect().toSeq
    noCeiling shouldBe Seq(1L, 1L, 1L, 0L)
  }

  test("sharedNgramStats salted gram join ≡ plain join on a Zipf fixture") {
    // Zipf-shaped gram frequencies: one boilerplate phrase shared by ALL
    // docs (the hot key whose postings a plain shuffle join lands in one
    // task), a mid-frequency phrase on a third of them, plus a unique
    // tail gram per doc
    val df = (1L to 90L).map { i =>
      val mid = if (i % 3 == 0) " common middle phrase" else ""
      (i, s"hot head gram$mid unique tail token$i")
    }.toDF("doc_id", "text")
    val plain = Dedup.sharedNgramStats(df, col("doc_id"), col("text"), n = 3)
    val salted = Dedup.sharedNgramStats(df, col("doc_id"), col("text"), n = 3,
      saltBuckets = 8)
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
    // and with the ceiling engaged on both paths
    val plainC = Dedup.sharedNgramStats(df, col("doc_id"), col("text"), n = 3,
      dfCeiling = 40L)
    val saltedC = Dedup.sharedNgramStats(df, col("doc_id"), col("text"), n = 3,
      dfCeiling = 40L, saltBuckets = 8)
    saltedC.exceptAll(plainC).count() shouldBe 0L
    plainC.exceptAll(saltedC).count() shouldBe 0L
  }

  test("bestRepresentative: argmax score per cluster, ties to the lower id, singletons excluded") {
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L), (99L, 100L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.bestRepresentative(docs, pairs, col("doc_id"), col("n_chars"))
      .orderBy("comp").as[(Long, Long, Long)].collect().toSeq
    // cluster {1,2,3}: longest is 2; cluster {10,11}: tie → lower id 10;
    // 99 never paired → trivially its own representative, not emitted
    out shouldBe Seq((1L, 2L, 9L), (10L, 10L, 4L))
  }

  test("simhashNearDupPairs: identical docs at hamming 0; unrelated docs filtered") {
    val text = "spark sql catalyst tungsten codegen shuffle partition broadcast"
    val other = "entirely unrelated tokens q w e r t y u i"
    val df = Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, col("doc_id"), col("text"), maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    pairs shouldBe Seq((1L, 2L))
  }

  test("connectedComponents: chain, isolated pair, and triangle collapse to min ids") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // triangle 20-21-22 — labels resolve to each component's min id
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    out shouldBe Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  test("connectedComponents: empty pair list yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Dedup.connectedComponents(empty, col("id_a"), col("id_b")).count() shouldBe 0L
  }

  test("connectedComponentsStar: matches direct labels on chain/pair/triangle") {
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponentsStar(pairs, col("id_a"), col("id_b"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    out shouldBe Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  test("connectedComponentsStar: 200-node chain converges within the round cap") {
    // the adversarial case for label propagation: one path component of
    // diameter 199 (direct min-label needs ~199 rounds; star contraction
    // halves the path from both ends each round → O(log n)). maxIter=12
    // would NOT suffice for propagation, proving this is the star path.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponentsStar(chain, col("id_a"), col("id_b"),
      maxIter = 12).as[(Long, Long)].collect().toSeq
    out.size shouldBe 200
    out.forall(_._2 == 0L) shouldBe true
  }

  test("connectedComponentsStar ≡ connectedComponents on a random graph (randomized)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs, col("id_a"), col("id_b"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val direct = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    star shouldBe direct
  }

  test("connectedComponentsStar: empty pair list yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Dedup.connectedComponentsStar(empty, col("id_a"), col("id_b")).count() shouldBe 0L
  }

  test("minhashFuzzyJoin links cross-table near-dups; disjoint texts and same-side dups don't pair") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "catalyst plans whole stage codegen for declarative dataframe queries"
    val left = Seq((1L, a), (2L, b), (3L, b)).toDF("doc_id", "text")
    val right = Seq((10L, a + " indeed"), (11L, "entirely unrelated words about nothing at all"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashFuzzyJoin(left, right,
        col("doc_id"), col("text"), col("doc_id"), col("text"),
        shingleN = 3, k = 8, rowsPerBand = 2, threshold = 0.4)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // 1↔10 near-dup across tables; 2 and 3 duplicate each other but that
    // is a LEFT-side pair — a fuzzy JOIN must never emit same-side pairs
    out shouldBe Set((1L, 10L))
    spark.catalog.clearCache()
  }

  test("minhashFuzzyJoin maxBandDf drops boilerplate bands, keeps distinct-band links") {
    val tmpl = "standard legal boilerplate disclaimer text repeated across every single document"
    val real = "the quick brown fox jumps over the lazy dog again and again"
    // 4 boilerplate copies a side (band df 4) + one real cross-table pair
    val left = (Seq((1L, real)) ++ (20L to 23L).map(i => (i, tmpl))).toDF("doc_id", "text")
    val right = (Seq((10L, real + " indeed")) ++ (30L to 33L).map(i => (i, tmpl)))
      .toDF("doc_id", "text")
    def run(cap: Option[Long]) = Dedup.minhashFuzzyJoin(left, right,
        col("doc_id"), col("text"), col("doc_id"), col("text"),
        shingleN = 3, k = 8, rowsPerBand = 2, threshold = 0.4, maxBandDf = cap)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val uncapped = run(None)
    uncapped should contain((1L, 10L))
    uncapped.count { case (l, _) => l >= 20L } shouldBe 16 // 4×4 boilerplate links
    val capped = run(Some(2L))
    capped shouldBe Set((1L, 10L)) // ceiling kills the quadratic band, keeps the real link
    spark.catalog.clearCache()
  }

  test("maxBandDf boundary: a bucket of exactly cap pairs fully; cap−1 drops it whole") {
    // five identical docs → every band bucket holds exactly these five
    // ids; cap = 5 must keep the COMPLETE bucket (all 10 pairs — the
    // bounded collector may never truncate a within-cap bucket), cap = 4
    // must drop it whole (zero pairs)
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (1L to 5L).map((_, text)).toDF("doc_id", "text")
    Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.4,
      maxBandDf = Some(5L)).count() shouldBe 10L
    Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.4,
      maxBandDf = Some(4L)).count() shouldBe 0L
    spark.catalog.clearCache()
  }

  test("minhashNearDupPairs maxBandDf drops boilerplate bands, keeps small-band pairs") {
    val tmpl = "standard legal boilerplate disclaimer text repeated across every single document"
    val real = "the quick brown fox jumps over the lazy dog again and again"
    // 6 boilerplate copies (every band df 6) + one real near-dup pair
    val docs = (Seq((1L, real), (2L, real + " indeed")) ++
      (20L to 25L).map(i => (i, tmpl))).toDF("doc_id", "text")
    def run(cap: Option[Long]) = Dedup.minhashNearDupPairs(docs,
        col("doc_id"), col("text"), shingleN = 3, k = 8, rowsPerBand = 1,
        threshold = 0.4, maxBandDf = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = run(None)
    uncapped should contain((1L, 2L))
    uncapped.count { case (a, _) => a >= 20L } shouldBe 15 // C(6,2) boilerplate pairs
    val capped = run(Some(3L))
    capped shouldBe Set((1L, 2L)) // ceiling kills the quadratic band, keeps the real pair
    spark.catalog.clearCache()
  }

  test("minhashFuzzyJoin ceiling bounds STRING-keyed ids too (BoundedIds beyond long)") {
    val tmpl = "standard legal boilerplate disclaimer text repeated across every single document"
    val real = "the quick brown fox jumps over the lazy dog again and again"
    val left = (Seq(("L1", real)) ++ (1 to 6).map(i => (s"LT$i", tmpl)))
      .toDF("lid", "text")
    val right = (Seq(("R1", real + " indeed")) ++ (1 to 6).map(i => (s"RT$i", tmpl)))
      .toDF("rid", "text")
    def run(cap: Option[Long]) = Dedup.minhashFuzzyJoin(left, right,
        col("lid"), col("text"), col("rid"), col("text"),
        shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.4, maxBandDf = cap)
      .select("left_id", "right_id").as[(String, String)].collect().toSet
    val uncapped = run(None)
    uncapped should contain(("L1", "R1"))
    uncapped.count(_._1.startsWith("LT")) shouldBe 36 // 6×6 boilerplate pairs
    // the bounded aggregator (not a post-hoc filter) holds the ceiling
    // for string ids: oversized template bands drop whole, real pair kept
    run(Some(3L)) shouldBe Set(("L1", "R1"))
    spark.catalog.clearCache()
  }

  test("admitNewDocsWithIndex over a parquet-roundtripped nearDupIndex ≡ admitNewDocs") {
    // the cross-job ingest contract: computing the index once, writing it
    // to parquet, reloading it, and probing with the same parameters must
    // admit EXACTLY what the all-in-one text path admits
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val isNew = substring(md5(col("doc_id").cast("string")), 1, 4) >= "cccc"
    val (fresh, standing) = (docs.filter(isNew), docs.filter(!isNew))

    val dir = java.nio.file.Files.createTempDirectory("graft_ixspec_")
    try {
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(dir.resolve("ix").toString)
      val reloaded = spark.read.parquet(dir.resolve("ix").toString)

      val viaIndex = Dedup.admitNewDocsWithIndex(fresh, reloaded,
          col("doc_id"), col("text"), shingleN = 3, k = 8, rowsPerBand = 2,
          threshold = 0.4)
        .orderBy("doc_id").as[Long].collect().toSeq
      val viaText = Dedup.admitNewDocs(fresh, standing,
          col("doc_id"), col("text"), shingleN = 3, k = 8, rowsPerBand = 2,
          threshold = 0.4)
        .orderBy("doc_id").as[Long].collect().toSeq

      viaIndex shouldBe viaText
      viaIndex.nonEmpty shouldBe true
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("admitNewDocsWithIndex fails fast when probe parameters differ from the artifact's") {
    val standing = Seq((1L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val fresh = Seq((2L, "entirely novel content about nothing previously indexed"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ixspec_param_")
    try {
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(dir.resolve("ix").toString)
      val reloaded = spark.read.parquet(dir.resolve("ix").toString)
      val e = intercept[IllegalArgumentException] {
        Dedup.admitNewDocsWithIndex(fresh, reloaded,
          col("doc_id"), col("text"), shingleN = 3, k = 16, rowsPerBand = 4)
      }
      e.getMessage should include("rowsPerBand=2")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("path overload derives probe params from the artifact and matches the frame path") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val isNew = substring(md5(col("doc_id").cast("string")), 1, 4) >= "cccc"
    val (fresh, standing) = (docs.filter(isNew), docs.filter(!isNew))
    val dir = java.nio.file.Files.createTempDirectory("graft_ixspec_path_")
    try {
      val ixPath = dir.resolve("ix").toString
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(ixPath)
      // no (shingleN, k, rowsPerBand) supplied — the artifact's own
      // embedded parameters drive the probe
      val viaPath = Dedup.admitNewDocsWithIndex(fresh, ixPath,
          col("doc_id"), col("text"), 0.4)
        .orderBy("doc_id").as[Long].collect().toSeq
      val viaFrame = Dedup.admitNewDocsWithIndex(fresh,
          spark.read.parquet(ixPath), col("doc_id"), col("text"), 3, 8, 2, 0.4)
        .orderBy("doc_id").as[Long].collect().toSeq
      viaPath shouldBe viaFrame
      viaPath.nonEmpty shouldBe true

      // a legacy artifact (no p_* columns) cannot drive the path form
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"), 3, 8, 2)
        .drop("p_shingle_n", "p_k", "p_rows_per_band")
        .write.mode("overwrite").parquet(dir.resolve("legacy").toString)
      val e = intercept[IllegalArgumentException] {
        Dedup.admitNewDocsWithIndex(fresh, dir.resolve("legacy").toString,
          col("doc_id"), col("text"), 0.4)
      }
      e.getMessage should include("legacy artifact")

      // a mixed-generation dir is ambiguous — refuse rather than guess
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"), 3, 8, 2)
        .write.mode("overwrite").parquet(dir.resolve("mixed").resolve("a").toString)
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"), 3, 16, 4)
        .write.mode("overwrite").parquet(dir.resolve("mixed").resolve("b").toString)
      val e2 = intercept[IllegalArgumentException] {
        Dedup.admitNewDocsWithIndex(fresh, dir.resolve("mixed").toString,
          col("doc_id"), col("text"), 0.4)
      }
      e2.getMessage should include("parameter")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("rebuildNearDupIndex: mixed-generation tree → single probe-ready generation; partial source refused") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val isNew = substring(md5(col("doc_id").cast("string")), 1, 4) >= "cccc"
    val (fresh, standing) = (docs.filter(isNew), docs.filter(!isNew))
    val splitA = pmod(col("doc_id"), lit(2)) === 0
    val dir = java.nio.file.Files.createTempDirectory("graft_rebuild_spec_")
    try {
      val ixPath = dir.resolve("ix").toString
      // two parameter generations side by side — the 100 TB dead end the
      // path overload refuses
      Dedup.nearDupIndex(standing.filter(splitA), col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(s"$ixPath/seed")
      Dedup.nearDupIndex(standing.filter(!splitA), col("doc_id"), col("text"),
          shingleN = 3, k = 16, rowsPerBand = 4)
        .write.mode("overwrite").parquet(s"$ixPath/batch-0")
      intercept[IllegalArgumentException] {
        Dedup.admitNewDocsWithIndex(fresh, ixPath, col("doc_id"), col("text"), 0.4)
      }
      // rebuild from the documents table under one parameterization
      Dedup.rebuildNearDupIndex(docs, ixPath, col("doc_id"), col("text"),
        shingleN = 3, k = 8, rowsPerBand = 2)
      // single generation: the path probe works again, and admissions
      // equal the direct batch admission over the same kept set
      val viaPath = Dedup.admitNewDocsWithIndex(fresh, ixPath,
          col("doc_id"), col("text"), 0.4)
        .orderBy("doc_id").as[Long].collect().toSeq
      val direct = Dedup.admitNewDocs(fresh, standing,
          col("doc_id"), col("text"), 3, 8, 2, 0.4)
        .orderBy("doc_id").as[Long].collect().toSeq
      viaPath shouldBe direct
      viaPath.nonEmpty shouldBe true
      // the swapped tree is flat files — also a compaction
      new java.io.File(ixPath).listFiles().count(_.isDirectory) shouldBe 0
      // a text source that misses kept ids must refuse, not silently drop
      val e = intercept[IllegalArgumentException] {
        Dedup.rebuildNearDupIndex(docs.filter(splitA), ixPath,
          col("doc_id"), col("text"), 3, 8, 2)
      }
      e.getMessage should include("covers")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("deleteFromNearDupIndex: masked probe admits docs matching only deleted; compaction and rebuild fold physically") {
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely unrelated content about distributed query engines"
    val standing = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    // near-dup of textA only — admission hinges entirely on doc 1
    val fresh = Seq((10L, textA + " indeed")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ndtomb_")
    try {
      val ixPath = dir.resolve("ix").toString
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(s"$ixPath/seed")
      def admit() = Dedup.admitNewDocsWithIndex(fresh, ixPath,
          col("doc_id"), col("text"), 0.4)
        .as[Long].collect().toSeq
      admit() shouldBe empty // rejected: near-dups doc 1

      val del = Seq(1L).toDF("doc_id")
      Dedup.deleteFromNearDupIndex(del, ixPath)
      Dedup.deleteFromNearDupIndex(del, ixPath) // replayed delete
      admit() shouldBe Seq(10L) // its only match is deleted

      // physical fold: tombstones gone, doc 1's signatures gone, probe
      // unchanged, flat compacted tree
      Dedup.compactNearDupIndex(spark, ixPath)
      new java.io.File(s"$ixPath/_tombstones").exists() shouldBe false
      spark.read.option("recursiveFileLookup", "true").parquet(ixPath)
        .select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
      admit() shouldBe Seq(10L)
      // idempotent: nothing left to fold
      Dedup.compactNearDupIndex(spark, ixPath)
      admit() shouldBe Seq(10L)

      // rebuild is ALSO a delete fold: tombstoned ids neither demand
      // source text nor survive into the rebuilt tree
      val ix2 = dir.resolve("ix2").toString
      Dedup.nearDupIndex(standing, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(s"$ix2/seed")
      Dedup.deleteFromNearDupIndex(del, ix2)
      // source covers ONLY doc 2 — fine, doc 1 is being deleted
      Dedup.rebuildNearDupIndex(standing.filter(col("doc_id") === 2L), ix2,
        col("doc_id"), col("text"), shingleN = 3, k = 8, rowsPerBand = 2)
      new java.io.File(s"$ix2/_tombstones").exists() shouldBe false
      spark.read.option("recursiveFileLookup", "true").parquet(ix2)
        .select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
    } finally {
      graft.operators.Maintenance.rmTree(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("rebuildNearDupIndex refuses a source with duplicate doc_id rows") {
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val dir = java.nio.file.Files.createTempDirectory("graft_nddup_")
    try {
      val ixPath = dir.resolve("ix").toString
      Dedup.nearDupIndex(Seq((1L, textA)).toDF("doc_id", "text"),
          col("doc_id"), col("text"), 3, 8, 2)
        .write.mode("overwrite").parquet(s"$ixPath/seed")
      val dupes = Seq((1L, textA), (1L, textA + " copy")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        Dedup.rebuildNearDupIndex(dupes, ixPath, col("doc_id"), col("text"),
          3, 8, 2)
      }
      e.getMessage should include("duplicate")
    } finally {
      graft.operators.Maintenance.rmTree(dir.toFile)
      spark.catalog.clearCache()
    }
  }

  test("param fail-fast tolerates legacy null-param rows in a mixed-schema index") {
    // a mixed dir (legacy parameter-less artifact + new batches — what a
    // seeded AdmissionStream index looks like) surfaces the legacy rows
    // with null p_* under the merged schema: no evidence → skipped, and
    // the NON-null rows still carry the fail-fast
    val standing = Seq((1L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val fresh = Seq((2L, "entirely novel content about nothing previously indexed"))
      .toDF("doc_id", "text")
    val ix = Dedup.nearDupIndex(standing, col("doc_id"), col("text"),
      shingleN = 3, k = 8, rowsPerBand = 2)
    val legacyRows = ix.select(col("doc_id"), col("sh"), col("bands"),
      lit(null).cast("int").as("p_shingle_n"),
      lit(null).cast("int").as("p_k"),
      lit(null).cast("int").as("p_rows_per_band"))
    val mixed = ix.unionByName(legacyRows)
    // matching params: the null rows must not NPE and must not block
    noException should be thrownBy
      Dedup.admitNewDocsWithIndex(fresh, mixed,
        col("doc_id"), col("text"), 3, 8, 2, 0.4).collect()
    // mismatching params: the non-null generation still fails fast
    val e = intercept[IllegalArgumentException] {
      Dedup.admitNewDocsWithIndex(fresh, mixed,
        col("doc_id"), col("text"), 3, 16, 4)
    }
    e.getMessage should include("rowsPerBand=2")
    spark.catalog.clearCache()
  }

  test("bandedRecallReport: verified banding can only miss; ceiling-induced misses are counted") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five"),
      (4L, "one two three four five"),
      (5L, "p q r s t u"),
      (6L, "x y z w v u")
    ).toDF("doc_id", "text")
    // identical docs share every band — full recall without a ceiling
    val full = Dedup.bandedRecallReport(docs, col("doc_id"), col("text"),
      shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.4).collect().head
    full.getAs[Long]("truth_pairs") shouldBe 2L
    full.getAs[Long]("banded_pairs") shouldBe 2L
    full.getAs[Long]("missed") shouldBe 0L
    // a band-df ceiling of 1 drops every shared band (each has df 2), so
    // the banding misses both true pairs — the report surfaces exactly that
    val capped = Dedup.bandedRecallReport(docs, col("doc_id"), col("text"),
      shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.4,
      maxBandDf = Some(1L)).collect().head
    capped.getAs[Long]("truth_pairs") shouldBe 2L
    capped.getAs[Long]("banded_pairs") shouldBe 0L
    capped.getAs[Long]("missed") shouldBe 2L
    spark.catalog.clearCache()
  }

  test("semanticNearDupPairs: nCells=1 equals the exact all-pairs cosine threshold") {
    // 2-d toy embeddings: two near-parallel pairs and an orthogonal loner
    val e = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.99f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.05f, 0.98f)),
      (5L, Seq(-1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticNearDupPairs(e, nCells = 1, threshold = 0.9)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSeq
    got shouldBe Seq((1L, 2L), (3L, 4L))
  }

  test("semanticNearDupPairs: cell blocking compares within cells only") {
    // 40 vectors in two tight antipodal clusters: with 2 centroids every
    // cross-cluster pair is blocked, and within-cluster cosines pass
    val e = (0L until 40L).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i, Seq(sign * 1.0f, sign * (0.9f + (i % 5) * 0.02f)))
    }.toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDupPairs(e, nCells = 2, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    pairs should not be empty
    // no pair straddles the parity split (opposite-sign vectors have
    // cosine ~ -1 anyway, but the BLOCKING must keep them from pairing:
    // assert via cell purity — every pair shares its endpoints' parity)
    pairs.foreach { case (a, b, cos) =>
      (a % 2) shouldBe (b % 2)
      cos should be >= 0.9
    }
    // the exact all-pairs answer at the same threshold is identical here
    // (clusters are antipodal, so blocking loses nothing)
    val exact = Dedup.semanticNearDupPairs(e, nCells = 1, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    pairs.sorted shouldBe exact
  }

  test("scopedMinhashNearDupPairs ≡ unscoped pairs restricted to a shared scope (no ceiling)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(trim(col("text")) =!= "")
    val scoped = Dedup.scopedMinhashNearDupPairs(docs, col("doc_id"),
        col("text"), col("source"), shingleN = 3, k = 8, rowsPerBand = 1,
        threshold = 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSeq.sorted
    val src = docs.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val unscopedSameSource = Dedup.minhashNearDupPairs(docs, col("doc_id"),
        col("text"), shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSeq
      .filter { case (a, b, _) => src(a) == src(b) }.sorted
    scoped shouldBe unscopedSameSource
    assert(scoped.nonEmpty, "fixture should contain same-source near-dups")
  }

  test("scoped band ceiling applies PER SCOPE: a bucket over the global cap survives once split") {
    // six IDENTICAL docs across two sources: every band bucket has df 6
    // > cap 4 globally (dropped whole), but df 3 per source (kept)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = (0 until 6).map { i =>
      (i.toLong, base, if (i < 3) "sA" else "sB")
    }.toDF("doc_id", "text", "source")
    val cap = Some(4L)
    val unscoped = Dedup.minhashNearDupPairs(df, col("doc_id"), col("text"),
      shingleN = 3, k = 8, rowsPerBand = 1, threshold = 0.3, maxBandDf = cap)
    val scoped = Dedup.scopedMinhashNearDupPairs(df, col("doc_id"),
      col("text"), col("source"), shingleN = 3, k = 8, rowsPerBand = 1,
      threshold = 0.3, maxBandDf = cap)
      .select("source", "id_a", "id_b").as[(String, Long, Long)]
      .collect().toSeq.sorted
    assert(scoped.map(p => (p._2, p._3)).toSet ===
      Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
    assert(scoped.forall { case (s, a, b) =>
      (a < 3) == (s == "sA") && (b < 3) == (s == "sA") })
    assert(unscoped.count() === 0L,
      "identical bands: the global ceiling drops every df-6 bucket whole")
  }
}
