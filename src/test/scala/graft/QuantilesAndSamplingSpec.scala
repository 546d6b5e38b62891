package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantiles, Sampling}

/** Nearest-rank quantile values on known data; hash-sampling determinism
  * and split-label partitioning. */
class QuantilesAndSamplingSpec extends SparkSpecBase {

  test("nearestRank returns the rank-ceil(p*n) value per group") {
    import spark.implicits._
    val df = ((1 to 10).map(v => ("a", v.toDouble)) :+ ("b", 42.0))
      .toDF("g", "v")
    val out = Quantiles.nearestRank(df, Seq("g"), col("v"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    // n=10: ranks ceil(2.5)=3, ceil(5)=5, ceil(7.5)=8, ceil(9)=9
    out("a") shouldBe ((3.0, 5.0, 8.0, 9.0, 10L))
    out("b") shouldBe ((42.0, 42.0, 42.0, 42.0, 1L))
  }

  test("deterministicSample is stable and splitLabel partitions the sample") {
    import spark.implicits._
    val keys = (0L until 10000L).toDF("k")
    val once = Sampling.deterministicSample(keys, col("k"), "8000")
    val twice = Sampling.deterministicSample(keys, col("k"), "8000")
    once.exceptAll(twice).count() shouldBe 0L
    val n = once.count()
    // md5 buckets are uniform: "8000"/"10000" of 10k keys ± a loose band
    n should be > 4600L
    n should be < 5400L
    // bounds must lie inside the sampled hash range (h < "8000" here) —
    // the full-range defaults would label the whole sample "train"
    val labeled = once.withColumn("s", Sampling.splitLabel(col("k"), "4ccc", "6666"))
    labeled.groupBy("s").count().count() shouldBe 3L // all three labels present
    labeled.filter(!col("s").isin("train", "val", "test")).count() shouldBe 0L
    labeled.count() shouldBe n // labeling never drops or duplicates rows
  }

  test("sketch aggregates track exact values (the no-sort monitoring path)") {
    // exact distinct counts and quantiles need a shuffle-wide sort or
    // distinct-expand; HLL / t-digest sketches are the 100 TB
    // monitoring-grade alternative — assert their error stays in band on
    // real data so the trade is quantified, not assumed
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val row = docs.agg(
      countDistinct(col("doc_id")).as("exact_d"),
      approx_count_distinct(col("doc_id"), 0.02).as("approx_d"),
      expr("percentile(n_chars, 0.5)").as("exact_p50"),
      expr("approx_percentile(n_chars, 0.5, 1000)").as("approx_p50")).head
    val (exactD, approxD) = (row.getLong(0), row.getLong(1))
    math.abs(approxD - exactD).toDouble / exactD should be < 0.05
    val (exactP, approxP) = (row.getDouble(2), row.getLong(3).toDouble)
    math.abs(approxP - exactP) / math.max(exactP, 1.0) should be < 0.1
  }

  test("stratifiedSample applies per-stratum rates and the default bound") {
    import spark.implicits._
    val df = (0L until 3000L).map(k => (k, Seq("big", "mid", "odd")((k % 3).toInt)))
      .toDF("k", "s")
    val out = Sampling.stratifiedSample(df, col("k"), col("s"),
      Map("big" -> "1000", "mid" -> "8000")) // default "0000" drops "odd"
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.contains("odd") shouldBe false
    // "1000"/0x10000 = 6.25% of 1000 keys; "8000" = 50% — loose bands
    counts("big").toDouble should (be > 30.0 and be < 100.0)
    counts("mid").toDouble should (be > 420.0 and be < 580.0)
    // sampling is per-(key, stratum) deterministic: rerun is identical
    val again = Sampling.stratifiedSample(df, col("k"), col("s"),
      Map("big" -> "1000", "mid" -> "8000"))
    out.exceptAll(again).count() shouldBe 0L
  }

  test("mixtureSample hits per-stratum unit targets, caps at 1, drops unlisted strata") {
    import spark.implicits._
    // three sources of 10-unit docs: "big" 2000 docs (20000 units),
    // "small" 100 docs (1000 units), "junk" unlisted
    val df = ((0L until 2000L).map(k => (k, "big", 10L)) ++
      (10000L until 10100L).map(k => (k, "small", 10L)) ++
      (20000L until 20100L).map(k => (k, "junk", 10L)))
      .toDF("k", "s", "u")
    // budget 4000 @ big=0.5, small=0.5 → big targets 2000 units (10% of
    // its 20000), small targets 2000 > its 1000 → rate caps at 1
    val out = Sampling.mixtureSample(df, col("k"), col("s"), col("u"),
      Map("big" -> 0.5, "small" -> 0.5), budget = 4000L)
    val units = out.groupBy("s").agg(sum("u").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    units.contains("junk") shouldBe false
    units("small") shouldBe 1000L                       // capped: keeps all
    units("big").toDouble should (be > 1400.0 and be < 2600.0) // ~2000 target
    // reproducible: membership is a pure function of (key, stratum)
    val again = Sampling.mixtureSample(df, col("k"), col("s"), col("u"),
      Map("big" -> 0.5, "small" -> 0.5), budget = 4000L)
    out.exceptAll(again).count() shouldBe 0L
  }

  test("temperatureMixture: sqrt-weights rebalance toward the tail, integer thresholds") {
    import spark.implicits._
    // "big" 64000 units / "small" 1000 units: proportional shares
    // 98.5%/1.5%; floor-sqrt weights 252/31 → 89%/11% of budget
    val df = ((0L until 6400L).map(k => (k, "big", 10L)) ++
      (100000L until 100100L).map(k => (k, "small", 10L)))
      .toDF("k", "s", "u")
    val out = Sampling.temperatureMixture(df, col("k"), col("s"), col("u"),
      budget = 4500L)
    val units = out.groupBy("s").agg(sum("u").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small's target 4500·(31/283)≈493 units (rate ~0.49); big's
    // 4500·(252/283)≈4007 of 64000 (rate ~0.063). Plain proportional
    // allocation would give small only ~69 units — α=1/2 lifts the
    // tail ~7× at the dominant stratum's expense.
    units("small").toDouble should (be > 350.0 and be < 650.0)
    units("big").toDouble should (be > 3300.0 and be < 4700.0)
    // reproducible: pure function of (key, stratum)
    val again = Sampling.temperatureMixture(df, col("k"), col("s"), col("u"),
      budget = 4500L)
    out.exceptAll(again).count() shouldBe 0L
    // a stratum smaller than its target keeps everything (threshold caps
    // at 10⁶) and zero-total strata drop
    val capped = Sampling.temperatureMixture(
      df.unionByName(Seq((200000L, "empty", 0L)).toDF("k", "s", "u")),
      col("k"), col("s"), col("u"), budget = 1000000L)
    capped.filter(col("s") === "small").count() shouldBe 100L
    capped.filter(col("s") === "empty").count() shouldBe 0L
  }

  test("keepTopFraction: exact integer cut per stratum, deterministic ties, edge ppm") {
    import spark.implicits._
    // stratum a: 8 rows scores 1..8; stratum b: 3 rows with tied scores
    val df = ((1L to 8L).map(i => (i, "a", i)) ++
      Seq((11L, "b", 5L), (12L, "b", 5L), (13L, "b", 5L))).toDF("id", "s", "sc")
    val keep25 = Sampling.keepTopFraction(df, col("s"), col("sc"), col("id"),
      keepPpm = 250000L)
    // floor(8*0.25)=2 best of a (scores 8,7); floor(3*0.25)=0 of b
    keep25.orderBy("id").as[(Long, String, Long)].collect().toSeq shouldBe
      Seq((7L, "a", 7L), (8L, "a", 8L))
    // tied scores cut by id ascending: keep 2 of b's 3 equal rows → lowest ids
    Sampling.keepTopFraction(df.filter(col("s") === "b"), col("s"), col("sc"),
        col("id"), keepPpm = 700000L)
      .orderBy("id").as[(Long, String, Long)].collect().map(_._1).toSeq shouldBe
      Seq(11L, 12L)
    // edges: 0 keeps nothing, 1e6 keeps everything
    Sampling.keepTopFraction(df, col("s"), col("sc"), col("id"), 0L)
      .count() shouldBe 0L
    Sampling.keepTopFraction(df, col("s"), col("sc"), col("id"), 1000000L)
      .count() shouldBe 11L
  }

  test("mixtureSample accepts fractional unit columns and non-string strata") {
    import spark.implicits._
    // double-typed unit (a score) and an int-typed stratum — the
    // documented 'any additive numeric per-row column' contract; reading
    // the sum as Long threw ClassCastException here before
    val df = (0L until 1000L).map(k => (k, 7, 1.5)).toDF("k", "s", "u")
    val out = Sampling.mixtureSample(df, col("k"), col("s"), col("u"),
      Map("7" -> 1.0), budget = 300L)
    // 1500 units total, budget 300 → keep-rate 0.2 → ~200 rows
    out.count().toDouble should (be > 100.0 and be < 300.0)
  }

  test("exactNPerStratum: exact quota, short strata keep all, prefilter ≡ exact") {
    import spark.implicits._
    val df = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 405).map(i => (i.toLong, "tiny"))).toDF("id", "s")
    val exact = Sampling.exactNPerStratum(df, col("id"), col("s"), n = 10)
    val bySt = exact.collect().groupBy(_.getAs[String]("s"))
    bySt("big").length shouldBe 10
    bySt("tiny").length shouldBe 5 // min(n, total)
    bySt("big").map(_.getAs[Long]("__rank")).sorted shouldBe (1L to 10L).toArray
    // membership = the n smallest md5 ranks, verified independently
    val expectBig = (1 to 400).map(_.toLong)
      .sortBy(i => md5Of(i.toString)).take(10).toSet
    bySt("big").map(_.getAs[Long]("id")).toSet shouldBe expectBig

    // a generous prefilter keeps a hash-prefix superset of the quota →
    // identical rows, cheaper plan. (Strata near or below the quota must
    // run ungated — the guard below fires for them — so the equality
    // fixture uses quota-safe strata only.)
    val large = ((1 to 400).map(i => (i.toLong, "big")) ++
      (1001 to 1200).map(i => (i.toLong, "mid"))).toDF("id", "s")
    val gated = Sampling.exactNPerStratum(large, col("id"), col("s"), n = 10,
      prefilterHexBound = "6666") // ~40% of the hash range
    val ungated = Sampling.exactNPerStratum(large, col("id"), col("s"), n = 10)
    gated.select("s", "id", "__rank").orderBy("s", "__rank").collect() shouldBe
      ungated.select("s", "id", "__rank").orderBy("s", "__rank").collect()
  }

  test("exactNPerStratum rejects inputs carrying reserved working columns") {
    import spark.implicits._
    val df = Seq((1L, "a", "x")).toDF("id", "s", "__rank")
    val e = intercept[IllegalArgumentException] {
      Sampling.exactNPerStratum(df, col("id"), col("s"), n = 1)
    }
    e.getMessage should include("__rank")
  }

  test("exactNPerStratum raises when the prefilter under-provisions a stratum") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, "only")).toDF("id", "s")
    // ~1.5% gate over 100 rows cannot yield 50 survivors
    val e = intercept[Exception] {
      Sampling.exactNPerStratum(df, col("id"), col("s"), n = 50,
        prefilterHexBound = "0400").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("fewer than min(n, total)")),
      s"expected the under-provision guard, got: $e")
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
