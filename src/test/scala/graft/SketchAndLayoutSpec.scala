package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Sketch}

/** KMV distinct sketch (Sketch): exact short-circuit, estimator
  * accuracy, duplicate collapse, partitioning invariance. Z-order
  * layout (Layout): Morton key arithmetic, range guard, bucket
  * clustering bounds. */
class SketchAndLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmv: below k the sketch is the value set and the estimate exact") {
    val df = (1L to 40L).map(i => ("g", i % 10)).toDF("grp", "v")
    val out = Sketch.distinctEstimate(df, col("grp"), col("v"), k = 64)
      .collect().head
    out.getAs[Long]("n_kept") shouldBe 10L
    out.getAs[Long]("est_distinct") shouldBe 10L
  }

  test("kmv: estimator lands near the true cardinality past k") {
    // 2000 distinct values, heavy duplication; k=64 -> expect within ~25%
    // (1/sqrt(k) ~ 12.5% standard error; the fixed hash makes the exact
    // value deterministic, the bound just documents the ballpark)
    val df = (1L to 6000L).map(i => ("g", i % 2000)).toDF("grp", "v")
    val out = Sketch.distinctEstimate(df, col("grp"), col("v"), k = 64)
      .collect().head
    out.getAs[Long]("n_kept") shouldBe 64L
    val est = out.getAs[Long]("est_distinct")
    est.toDouble shouldBe 2000.0 +- 500.0
  }

  test("kmv: sketch is partitioning-invariant (map-side merge is exact)") {
    val df = (1L to 5000L).map(i => (s"g${i % 3}", i % 700)).toDF("grp", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.distinctEstimate(d, col("grp"), col("v"), k = 32)
        .orderBy("grp").collect().map(_.toSeq).toSeq
    run(df.repartition(17)) shouldBe run(df.coalesce(1))
  }

  test("kmvMerge: merged shard sketches equal the union sketch (mergeability law)") {
    // 3 groups × 700 distinct values (> k), duplicated rows, sharded 5
    // ways — the merged rollup must be BIT-identical to the direct
    // single-pass sketch, including n_kept/kth_hash/est_distinct
    val df = (1L to 5000L).map(i => (s"g${i % 3}", i % 700)).toDF("grp", "v")
    val direct = Sketch.distinctEstimate(df, col("grp"), col("v"), k = 32)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    val merged = Sketch.shardedDistinctEstimate(df, col("grp"), col("v"),
        pmod(col("v"), lit(5)), k = 32)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    merged shouldBe direct
  }

  test("kmvMerge: shard-count invariant, including a below-k group and a 1-shard group") {
    // g0 holds 8 distinct values (< k: sketch IS the value set, estimate
    // exact through the merge); g1 spreads over many shards
    val df = ((1L to 200L).map(i => ("g0", i % 8)) ++
      (1L to 3000L).map(i => ("g1", i % 400))).toDF("grp", "v")
    def run(shards: Int) =
      Sketch.shardedDistinctEstimate(df, col("grp"), col("v"),
          pmod(col("v"), lit(shards)), k = 64)
        .orderBy("grp").collect().map(_.toSeq).toSeq
    val direct = Sketch.distinctEstimate(df, col("grp"), col("v"), k = 64)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    run(1) shouldBe direct
    run(7) shouldBe direct
    run(64) shouldBe direct
  }

  test("sketchOverlap: below-k pairs are exact; past-k estimates land near truth") {
    // g0 = {0..29}, g1 = {20..49}: union 50 (< k) -> exact short-circuit
    val small = ((0L until 30L).map(v => ("g0", v)) ++
      (0L until 30L).map(v => ("g1", v + 20L))).toDF("grp", "v")
    val ex = Sketch.sketchOverlap(small, col("grp"), col("v"), k = 64)
      .collect().head
    ex.getAs[Long]("est_union") shouldBe 50L
    ex.getAs[Long]("est_inter") shouldBe 10L
    // |A|=|B|=1200, |A∩B|=400, |A∪B|=2000 with k=64 — estimator within
    // ~35% (deterministic given the fixed hash; bound documents ballpark)
    val big = ((0L until 1200L).map(v => ("a", v)) ++
      (0L until 1200L).map(v => ("b", v + 800L))).toDF("grp", "v")
    val est = Sketch.sketchOverlap(big, col("grp"), col("v"), k = 64)
      .collect().head
    est.getAs[Long]("est_union").toDouble shouldBe 2000.0 +- 500.0
    est.getAs[Long]("est_inter").toDouble shouldBe 400.0 +- 200.0
  }

  test("cms: estimates are one-sided (est >= exact for every item) and bounded state") {
    // 200 distinct items into a 4x32 sketch — collisions certain; the
    // CMS guarantee is over-counting only, never under
    val df = (1L to 3000L).map(i => s"item${i % 200}").toDF("it")
    val cells = Sketch.cmsCells(df, col("it"), depth = 4, width = 32)
    cells.count() should be <= (4L * 32L)
    val exact = df.groupBy("it").count()
    val est = Sketch.cmsEstimate(cells, df, col("it"), depth = 4, width = 32)
    val joined = exact.join(est, col("it") === col("item")).collect()
    joined.length shouldBe 200
    joined.foreach { r =>
      r.getAs[Long]("est") should be >= r.getAs[Long]("count")
    }
  }

  test("cms: exact in a collision-free sketch; unseen items estimate 0") {
    val df = (1L to 900L).map(i => s"w${i % 9}").toDF("it")
    val cells = Sketch.cmsCells(df, col("it"), depth = 4, width = 4096)
    // 9 items in 4096 cells x 4 rows: at least one row collision-free is
    // overwhelmingly likely and, under the fixed md5 hash, deterministic
    val est = Sketch.cmsEstimate(cells, df, col("it"), depth = 4, width = 4096)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est")).toMap
    (0 until 9).foreach { i => est(s"w$i") shouldBe 100L }
    val unseen = Sketch.cmsEstimate(cells, Seq("ghost").toDF("it"), col("it"),
      depth = 4, width = 4096).collect()
    unseen.head.getAs[Long]("est") shouldBe 0L
  }

  test("cms: cell table is partitioning-invariant and additive (merge law)") {
    val all = (1L to 4000L).map(i => s"t${i % 300}").toDF("it")
    def cellSeq(d: org.apache.spark.sql.DataFrame) =
      Sketch.cmsCells(d, col("it"), depth = 3, width = 64)
        .orderBy("r", "c").collect().map(_.toSeq).toSeq
    cellSeq(all.repartition(13)) shouldBe cellSeq(all.coalesce(1))
    // additivity: shard the stream 3 ways, sketch each, cell-wise merge
    val shards = (0 until 3).map(s =>
      Sketch.cmsCells(all.filter(pmod(xxhash64(col("it")), lit(3)) === s),
        col("it"), depth = 3, width = 64))
    val merged = Sketch.cmsMerge(shards: _*)
      .orderBy("r", "c").collect().map(_.toSeq).toSeq
    merged shouldBe cellSeq(all)
  }

  test("cms property: one-sided and additive over randomized streams (seeded trials)") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 3) {
      val nItems = 50 + rnd.nextInt(250)
      val stream = Seq.fill(1500)(s"i${rnd.nextInt(nItems)}")
      val df = stream.toDF("it")
      val depth = 2 + rnd.nextInt(3)
      val width = 16 << rnd.nextInt(3)
      val cells = Sketch.cmsCells(df, col("it"), depth, width)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = Sketch.cmsEstimate(cells, df, col("it"), depth, width)
        .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est")).toMap
      exact.foreach { case (it, n) => est(it) should be >= n }
      // additivity against a random 2-way split of the same stream
      val (s1, s2) = stream.splitAt(1 + rnd.nextInt(stream.size - 1))
      val merged = Sketch.cmsMerge(
          Sketch.cmsCells(s1.toDF("it"), col("it"), depth, width),
          Sketch.cmsCells(s2.toDF("it"), col("it"), depth, width))
        .orderBy("r", "c").collect().map(_.toSeq).toSeq
      merged shouldBe cells.orderBy("r", "c").collect().map(_.toSeq).toSeq
    }
  }

  test("cms: weighted build over pre-aggregated counts equals the raw-stream sketch") {
    val raw = (1L to 2500L).map(i => s"k${i % 40}").toDF("it")
    val pre = raw.groupBy("it").agg(count(lit(1)).as("n"))
    val a = Sketch.cmsCells(raw, col("it"), depth = 4, width = 48)
      .orderBy("r", "c").collect().map(_.toSeq).toSeq
    val b = Sketch.cmsCells(pre, col("it"), depth = 4, width = 48,
        weight = col("n"))
      .orderBy("r", "c").collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("zKey interleaves bits; out-of-range raises") {
    def z(x: Long, y: Long): Long =
      Seq((x, y)).toDF("x", "y")
        .select(Layout.zKey(col("x"), col("y"), bits = 4).as("z"))
        .collect().head.getAs[Long]("z")
    z(0L, 0L) shouldBe 0L
    z(3L, 0L) shouldBe 5L   // x bits 0,1 -> positions 0,2
    z(0L, 3L) shouldBe 10L  // y bits 0,1 -> positions 1,3
    z(15L, 15L) shouldBe 255L
    val e = intercept[Exception] {
      Seq((16L, 0L)).toDF("x", "y")
        .select(Layout.zKey(col("x"), col("y"), bits = 4)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("outside [0, 16)")), s"got: $e")
  }

  test("zOrderStats: buckets partition rows and bound BOTH dimensions") {
    // uniform 64x64 grid; 16 equal key ranges = top 2 quantized bits of
    // each dimension -> every bucket spans at most a quarter of each
    // dimension's range (+1 for quantization rounding)
    val df = (0 until 4096).map(i => (i % 64, i / 64)).toDF("x", "y")
    val out = Layout.zOrderStats(df, col("x"), col("y"), bits = 6,
      buckets = 16).collect()
    out.map(_.getAs[Long]("n")).sum shouldBe 4096L
    out.length shouldBe 16
    out.foreach { r =>
      (r.getAs[Long]("max_x") - r.getAs[Long]("min_x")) should be <= 16L
      (r.getAs[Long]("max_y") - r.getAs[Long]("min_y")) should be <= 16L
    }
  }

  test("zKeyN: 3-dim interleave places bit i of dim j at position 3i+j; budget enforced") {
    def z3(a: Long, b: Long, c: Long): Long =
      Seq((a, b, c)).toDF("a", "b", "c")
        .select(Layout.zKeyN(Seq(col("a"), col("b"), col("c")), bits = 4).as("z"))
        .collect().head.getAs[Long]("z")
    z3(1, 0, 0) shouldBe 1L   // bit 0 of dim 0 -> position 0
    z3(0, 1, 0) shouldBe 2L   // bit 0 of dim 1 -> position 1
    z3(0, 0, 1) shouldBe 4L   // bit 0 of dim 2 -> position 2
    z3(2, 0, 0) shouldBe 8L   // bit 1 of dim 0 -> position 3
    z3(15, 15, 15) shouldBe 4095L
    // 2-D key is the d=2 specialization (backward compat)
    Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zKey(col("x"), col("y"), bits = 4).as("z"))
      .collect().head.getAs[Long]("z") shouldBe
      Seq((3L, 5L)).toDF("x", "y")
        .select(Layout.zKeyN(Seq(col("x"), col("y")), bits = 4).as("z"))
        .collect().head.getAs[Long]("z")
    an[IllegalArgumentException] should be thrownBy
      Layout.zKeyN(Seq(col("a"), col("b"), col("c")), bits = 22) // 66 > 63
    an[IllegalArgumentException] should be thrownBy
      Layout.zKeyN(Seq(col("a")), bits = 4) // < 2 dims
  }

  test("zKeyN is a bijection: extracting every d-th key bit recovers each dimension (randomized)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val keys = rows.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        Layout.zKeyN(Seq(col("x"), col("y"), col("w")), bits = 10).as("k"))
      .collect()
    def inv(k: Long, j: Int): Long =
      (0 until 10).map(i => ((k >> (i * 3 + j)) & 1L) << i).sum
    keys.foreach { r =>
      val k = r.getAs[Long]("k")
      inv(k, 0) shouldBe r.getAs[Long]("x")
      inv(k, 1) shouldBe r.getAs[Long]("y")
      inv(k, 2) shouldBe r.getAs[Long]("w")
    }
  }

  test("zOrderStatsN: 3-dim buckets bound ALL THREE dimensions") {
    // uniform 16x16x16 cube; 8 equal key ranges = top quantized bit of
    // each dimension -> every bucket spans at most half of each
    // dimension's range (+1 for quantization rounding)
    val df = (0 until 4096)
      .map(i => (i % 16, (i / 16) % 16, i / 256)).toDF("x", "y", "w")
    val out = Layout.zOrderStatsN(df,
      Seq("x" -> col("x"), "y" -> col("y"), "w" -> col("w")),
      bits = 4, buckets = 8).collect()
    out.map(_.getAs[Long]("n")).sum shouldBe 4096L
    out.length shouldBe 8
    out.foreach { r =>
      (r.getAs[Long]("max_x") - r.getAs[Long]("min_x")) should be <= 8L
      (r.getAs[Long]("max_y") - r.getAs[Long]("min_y")) should be <= 8L
      (r.getAs[Long]("max_w") - r.getAs[Long]("min_w")) should be <= 8L
    }
  }
}
