package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions => VF}
import graft.operators.{Dedup, Similarity, TopK}

class VectorAndSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vecDF(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("native dot is bit-identical to the HOF fold on random vectors") {
    val rnd = new Random(7)
    val vs = (0L until 50L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecDF(vs)
    val pairs = df.crossJoin(df.select(col("embedding").as("e2")).limit(10))
    pairs.select((VF.dot(col("embedding"), col("e2")) =!=
      VF.dotHof(col("embedding"), col("e2"))).as("neq"))
      .filter(col("neq")).count() shouldBe 0L
  }

  test("VecDot vs HOF on malformed input: VecDot stays total, HOF nulls") {
    // deliberate divergence, documented on VecDot: a corrupt row must not
    // poison a 100 TB scoring pass with NULLs.
    val uneven = Seq((Seq(1f, 2f, 3f), Seq(10f, 20f))).toDF("a", "b")
    uneven.select(VF.dot(col("a"), col("b")).as("d"))
      .as[Double].head() shouldBe 50.0 // fold stops at the shorter array
    uneven.select(VF.dotHof(col("a"), col("b")).as("d"))
      .select(col("d").isNull).as[Boolean].head() shouldBe true
    val withNull = Seq((Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](4f, 5f, 6f)))
      .toDF("a", "b")
    withNull.select(VF.dot(col("a"), col("b")).as("d"))
      .as[Double].head() shouldBe 22.0 // null element contributes 0
    withNull.select(VF.dotHof(col("a"), col("b")).as("d"))
      .select(col("d").isNull).as[Boolean].head() shouldBe true
  }

  test("dot/cosine/l2 basics") {
    val df = Seq(
      (1L, Seq(1f, 0f), Seq(1f, 0f)),
      (2L, Seq(1f, 0f), Seq(0f, 1f)),
      (3L, Seq(0f, 0f), Seq(1f, 1f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VF.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").as[(Long, Double)].collect().map(_._2)
    out(0) shouldBe 1.0 +- 1e-12
    out(1) shouldBe 0.0 +- 1e-12
    out(2) shouldBe 0.0 // zero-norm guard
  }

  test("normalize produces unit vectors; zero vector unchanged") {
    val df = Seq(Tuple1(Seq(3f, 4f)), Tuple1(Seq(0f, 0f))).toDF("v")
    val norms = df.select(VF.l2Norm(VF.normalize(col("v"))).as("n")).as[Double].collect()
    norms(0) shouldBe 1.0 +- 1e-12
    norms(1) shouldBe 0.0
  }

  test("srpBucket: deterministic, bounded, similar vectors collide") {
    val planes = VF.randomPlanes(6, 4, seed = 42L)
    val df = Seq(
      (1L, Seq(1f, 2f, 3f, 4f)),
      (2L, Seq(1.001f, 2.001f, 3.001f, 4.001f)),
      (3L, Seq(-1f, -2f, -3f, -4f))
    ).toDF("vec_id", "embedding")
    val buckets = df.select(col("vec_id"), VF.srpBucket(col("embedding"), planes).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect().map(_._2)
    all(buckets.toSeq) should (be >= 0L and be < 64L)
    buckets(0) shouldBe buckets(1)     // near-identical → same bucket
    buckets(0) should not be buckets(2) // opposite vector → all bits flip
  }

  test("srpBucketTable is bit-identical to the unrolled srpBucket at several plane counts") {
    val rnd = new Random(13)
    val df = vecDF((0L until 80L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1))))
    for (nBits <- Seq(1, 6, 24)) {
      val planes = VF.randomPlanes(nBits, 16, seed = 9L)
      df.select((VF.srpBucket(col("embedding"), planes) =!=
          VF.srpBucketTable(col("embedding"), planes)).as("neq"))
        .filter(col("neq")).count() shouldBe 0L
    }
  }

  test("bruteForceTopK matches window ranking exactly") {
    val rnd = new Random(11)
    val vs = (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val corpus = vecDF(vs)
    val queries = vecDF(vs.take(3))
    val agg = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "neighbor_id", "rnk")
    // independent window formulation
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val win = c.crossJoin(q).filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), VF.cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id", "rnk")
    agg.exceptAll(win).count() shouldBe 0L
    win.exceptAll(agg).count() shouldBe 0L
  }

  test("TopK aggregator: bounded, deterministic ties by id asc") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 1.0), (1L, 12L, 0.5), (1L, 13L, 2.0))
      .toDF("g", "id", "score")
    val top = df.groupBy("g").agg(TopK.topK(2)(col("id"), col("score")).as("t"))
      .select(explode(col("t")).as("s")).select("s.id").as[Long].collect().toSeq
    top shouldBe Seq(13L, 10L) // 2.0 first, then tie 1.0 broken by lower id
  }

  test("srpTopK recall on clustered data ≥ 0.6 and exact on same-bucket neighbors") {
    val rnd = new Random(5)
    // two tight clusters far apart — every true neighbor shares the query's cluster
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = vecDF(cluster(1f, 50, 0L) ++ cluster(-1f, 50, 100L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
    val approx = Similarity.srpTopK(queries, corpus, 5, nBits = 4, dim = 8)
    Similarity.recallAtK(exact, approx) should be >= 0.6
  }

  test("ivfFlatProbe over a written index ≡ ivfFlatTopK; scan prunes to probed cells") {
    val rnd = new Random(7)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = vecDF(cluster(1f, 40, 0L) ++ cluster(-1f, 40, 100L) ++ cluster(0.3f, 40, 200L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val dir = java.nio.file.Files.createTempDirectory("graft_annix_")
    dir.toFile.deleteOnExit()
    Similarity.writeIvfFlatIndex(corpus, nLists = 4, dir.toString)
    val probe = Similarity.ivfFlatProbe(queries, dir.toString, 5, nProbe = 2)
    val direct = Similarity.ivfFlatTopK(queries, corpus, 5,
      Similarity.hashCentroids(corpus, 4), nProbe = 2)
    probe.orderBy("query_id", "rnk").collect().toSeq shouldBe
      direct.orderBy("query_id", "rnk").collect().toSeq
    // partition pruning: a single query probing nProbe=2 cells must READ
    // at most 2 of the 4 cell directories — asserted on the executed
    // scan's partitions-read metric (inputFiles lists pre-pruning)
    val one = Similarity.ivfFlatProbe(
      queries.filter(col("vec_id") === 0L), dir.toString, 5, nProbe = 2)
    one.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
    }.flatten
    val cellScans = scans(one.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    cellScans should not be empty
    cellScans.map(_.metrics("numPartitions").value).sum should be <= 2L
    spark.catalog.clearCache()
  }

  test("ivfPqProbe over a written PQ index ≡ ivfPqTopKTable; scan prunes to probed cells") {
    val rnd = new Random(13)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = vecDF(cluster(1f, 40, 0L) ++ cluster(-1f, 40, 100L) ++ cluster(0.3f, 40, 200L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val dir = java.nio.file.Files.createTempDirectory("graft_pqix_")
    dir.toFile.deleteOnExit()
    Similarity.writeIvfPqIndex(corpus, nLists = 4, m = 4, codewords = 8, dir.toString)
    val probe = Similarity.ivfPqProbe(queries, dir.toString, 5, nProbe = 2)
    val direct = Similarity.ivfPqTopKTable(queries, corpus, 5,
      Similarity.hashCentroids(corpus, 4),
      Similarity.pqCodebooks(corpus, m = 4, codewords = 8), nProbe = 2)
    probe.orderBy("query_id", "rnk").collect().toSeq shouldBe
      direct.orderBy("query_id", "rnk").collect().toSeq
    probe.count() should be > 0L
    // partition pruning on the codes table: one query probing nProbe=2
    // cells reads at most 2 of the 4 cell directories
    val one = Similarity.ivfPqProbe(
      queries.filter(col("vec_id") === 0L), dir.toString, 5, nProbe = 2)
    one.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
    }.flatten
    val cellScans = scans(one.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    cellScans should not be empty
    cellScans.map(_.metrics("numPartitions").value).sum should be <= 2L
    spark.catalog.clearCache()
  }

  test("appendToIvfFlatIndex under frozen centroids ≡ direct retrieval over the union") {
    val rnd = new Random(11)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val standing = vecDF(cluster(1f, 30, 0L) ++ cluster(-1f, 30, 100L))
    val batch = vecDF(cluster(1f, 10, 300L) ++ cluster(-1f, 10, 400L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val dir = java.nio.file.Files.createTempDirectory("graft_annappend_")
    dir.toFile.deleteOnExit()
    Similarity.writeIvfFlatIndex(standing, nLists = 4, dir.toString)
    Similarity.appendToIvfFlatIndex(batch, dir.toString)
    val probe = Similarity.ivfFlatProbe(queries, dir.toString, 5, nProbe = 2)
    // the reference: retrieval over the UNION corpus under the STANDING
    // corpus's centroids — the exact contract append freezes
    val direct = Similarity.ivfFlatTopK(queries, standing.unionByName(batch), 5,
      Similarity.hashCentroids(standing, 4), nProbe = 2)
    probe.orderBy("query_id", "rnk").collect().toSeq shouldBe
      direct.orderBy("query_id", "rnk").collect().toSeq
    // appended vectors are retrievable (the batch's cluster members
    // outrank nothing here, but at least one 300-block id must appear
    // when probing its home cluster's cell)
    probe.filter(col("neighbor_id") >= 300L).count() should be > 0L
    spark.catalog.clearCache()
  }

  test("projectVecs: native dots match the HOF fold; exact neighbors survive reduction") {
    val rnd = new Random(9)
    val vs = (0L until 40L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecDF(vs)
    val planes = VF.randomPlanes(4, 16, 7L)
    val proj = Similarity.projectVecs(df, col("vec_id"), col("embedding"), planes)
    // each output dim is exactly the HOF-fold dot with the same plane
    val viaHof = df.select(col("vec_id"),
      array(planes.map(p => VF.dotHof(col("embedding"),
        array(p.map(lit): _*))): _*).as("embedding"))
    proj.orderBy("vec_id").collect().toSeq shouldBe
      viaHof.orderBy("vec_id").collect().toSeq
    // exact neighbors survive ANY projection: clones of the query are
    // cosine 1.0 in both spaces (projection preserves colinearity), so
    // the reduced-space top-5 recalls the full-space top-5 exactly —
    // while random distractors cannot reach 1.0 (measure-zero)
    val qa = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
    val qb = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
    val corpus = vecDF(
      (0L until 5L).map(i => (i, qa)) ++ (100L until 105L).map(i => (i, qb)) ++
        (500L until 530L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1))))
    val queries = vecDF(Seq((1000L, qa), (2000L, qb)))
    val ground = Similarity.bruteForceTopK(queries, corpus, 5)
    val redC = Similarity.projectVecs(corpus, col("vec_id"), col("embedding"), planes)
    val redQ = Similarity.projectVecs(queries, col("vec_id"), col("embedding"), planes)
    val approx = Similarity.bruteForceTopK(redQ, redC, 5)
    Similarity.recallAtK(ground, approx) shouldBe 1.0
  }

  test("recallReport: per-query integers, consistent with the scalar recallAtK") {
    val rnd = new Random(5)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = vecDF(cluster(1f, 50, 0L) ++ cluster(-1f, 50, 100L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
    val approx = Similarity.srpTopK(queries, corpus, 5, nBits = 4, dim = 8)
    val rep = Similarity.recallReport(exact, approx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rep.map(_._1).toSet shouldBe Set(0L, 100L)       // one row per query
    rep.foreach { case (_, truth, hits) =>
      truth shouldBe 5L                              // full top-k ground truth
      hits should be <= truth
      hits should be >= 0L
    }
    // the scalar recall is exactly the report's fold
    val folded = rep.map(_._3).sum.toDouble / rep.map(_._2).sum.toDouble
    Similarity.recallAtK(exact, approx) shouldBe folded
    // an approx frame missing one query entirely scores hits=0, not a
    // dropped row (the LEFT join + coalesce contract)
    val oneQuery = approx.filter(col("query_id") === 0L)
    val partial = Similarity.recallReport(exact, oneQuery)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    partial.keySet shouldBe Set(0L, 100L)
    partial(100L) shouldBe 0L
  }

  test("ivfTopK: KMeans-cell probing recovers cluster neighbors") {
    val rnd = new Random(13)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = vecDF(cluster(1f, 50, 0L) ++ cluster(-1f, 50, 100L) ++ cluster(0.3f, 50, 200L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
    // nProbe=2: KMeans may split a tight cluster across two cells
    // (observed with this seed) — probing the second-nearest cell is
    // exactly the IVF answer to that
    val approx = Similarity.ivfTopK(queries, corpus, 5, nLists = 4, nProbe = 2)
    Similarity.recallAtK(exact, approx) should be >= 0.8
  }

  test("embedding near-dup pairs: identical vectors found, opposites not") {
    val df = Seq(
      (1L, Seq.fill(8)(0.5f)), (2L, Seq.fill(8)(0.5f)), (3L, Seq.fill(8)(-0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.99, nBits = 4, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    pairs shouldBe Seq((1L, 2L))
  }

  test("embedding near-dup: SRP blocking recall ≥ 0.8 vs the exact crossJoin baseline") {
    // planted near-duplicates: 40 base vectors each with a jittered twin,
    // plus 200 unrelated vectors — the O(N²) crossJoin (the old q25 form,
    // demoted here per round-4 verdict) is the recall baseline the
    // SRP-blocked driver path is measured against
    val rnd = new Random(23)
    def vec() = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
    val bases = (0 until 40).map(i => (i.toLong * 2, vec()))
    val twins = bases.map { case (id, v) =>
      (id + 1, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)) }
    val noise = (1000 until 1200).map(i => (i.toLong, vec()))
    val df = vecDF(bases ++ twins ++ noise)
    def pairKeys(p: org.apache.spark.sql.DataFrame) =
      p.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = pairKeys(a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), VF.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= 0.99))
    val blocked = pairKeys(Dedup.embeddingNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.99, nBits = 8, dim = 16))
    exact.size should be >= 30 // the planted twins are really there
    blocked.subsetOf(exact) shouldBe true // blocking only drops, never invents
    blocked.size.toDouble / exact.size.toDouble should be >= 0.8
  }

  test("ivfFlatTopK: hash-chosen centroids give useful recall vs brute force") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, e, 10)
    val approx = Similarity.ivfFlatTopK(queries, e, 10,
      Similarity.hashCentroids(e, 8), nProbe = 2)
    Similarity.recallAtK(exact, approx) should be >= 0.3 // 2 of 8 cells probed
    // determinism: a second build+search returns the identical result
    val again = Similarity.ivfFlatTopK(queries, e, 10,
      Similarity.hashCentroids(e, 8), nProbe = 2)
    approx.exceptAll(again).count() shouldBe 0L
  }

  test("assignCellsTable is bit-identical to the struct-form assignment") {
    // the table-literal form exists because the struct form's generated
    // source grows with nCells × dim (the Janino cliff) — the contract
    // is identical cells, norms, and rows at ANY centroid count
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    for (n <- Seq(1, 8, 64)) {
      val ctr = Similarity.hashCentroids(e, n)
      val a = Similarity.assignCellsUnrolled(e, ctr).orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
      val b = Similarity.assignCellsTable(e, ctr).orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
      b shouldBe a
    }
  }

  test("lloydTrain: two clear clusters converge to their exact quantized means; deterministic") {
    val pts = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.1f, 0.1f)), (3L, Seq(0.9f, -0.1f)),
      (4L, Seq(-1.0f, 5.0f)), (5L, Seq(-1.1f, 5.1f)), (6L, Seq(-0.9f, 4.9f)))
    val e = pts.toDF("vec_id", "embedding")
    def run() = Similarity.lloydTrain(e, nCells = 2, rounds = 2)
      .orderBy("cell", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val out = run()
    out.size shouldBe 4 // 2 cells × 2 dims
    out.foreach { case (_, _, _, n) => n shouldBe 3L }
    // expected quantized means per cluster, via the operator's own
    // integer formula over the exact float values
    def q(x: Float) = math.floor(x.toDouble * 1e6).toLong
    def mean(xs: Seq[Float]) = math.floor(xs.map(q).sum.toDouble / xs.size).toLong
    val a = Seq(mean(Seq(1.0f, 1.1f, 0.9f)), mean(Seq(0.0f, 0.1f, -0.1f)))
    val b = Seq(mean(Seq(-1.0f, -1.1f, -0.9f)), mean(Seq(5.0f, 5.1f, 4.9f)))
    val byCell = out.groupBy(_._1).values.map(_.sortBy(_._2).map(_._3)).toSet
    byCell shouldBe Set(a, b)
    run() shouldBe out // deterministic end to end
  }

  test("lloydRefine: deterministic, moves non-empty cells, keeps empty-cell seeds") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = Similarity.hashCentroids(e, 8)
    val r1 = Similarity.lloydRefine(e, seeds)
    val r2 = Similarity.lloydRefine(e, seeds)
    r1 shouldBe r2 // integer-scaled means: bit-reproducible across builds
    r1 should not be seeds // at least one cell attracted vectors and moved
    // recall with the refined quantizer stays useful (q33's driver shape)
    val queries = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, e, 10)
    val approx = Similarity.ivfFlatTopK(queries, e, 10, r1, nProbe = 2)
    Similarity.recallAtK(exact, approx) should be >= 0.3
    // an unreachable centroid keeps its seed (no members → no mean)
    val tiny = vecDF(Seq((1L, Seq(1f, 1f)), (2L, Seq(1.1f, 0.9f))))
    val far = Seq(Seq(1.0, 1.0), Seq(1000.0, 1000.0))
    val refined = Similarity.lloydRefine(tiny, far)
    refined(1) shouldBe far(1)
    refined(0) should not be far(0)
  }

  test("quantizedCentroids: exact fixed-point means, floor on negatives, partition-invariant") {
    val df = Seq(
      (1, Seq(1.0f, -0.5f)), (1, Seq(2.0f, -1.5f)),   // means: 1.5, -1.0
      (2, Seq(0.00015f, 0.0f)),                        // floor(1.5)=1 at q-level
      (3, Seq(-0.0001f, 0.0f)), (3, Seq(-0.0002f, 0.0f)) // sum_q=-3, n=2 → floor(-1.5) = -2
    ).toDF("label", "embedding")
    val expected = Seq(
      (1, 1, 15000L), (1, 2, -10000L),
      (2, 1, 1L), (2, 2, 0L),
      (3, 1, -2L), (3, 2, 0L))
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.quantizedCentroids(d, col("label"), col("embedding"))
        .orderBy("label", "pos").as[(Int, Int, Long)].collect().toSeq
    run(df) shouldBe expected
    // integer sums are associative — any partitioning yields the identical
    // result (the property plain double means lack)
    run(df.repartition(7)) shouldBe expected
  }

  test("pqTopK: codes bounded, ADC deterministic, exact re-rank lifts recall") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val books = Similarity.pqCodebooks(e, m = 8, codewords = 16)
    books.size shouldBe 8
    books.head.size shouldBe 16
    books.head.head.size shouldBe 8
    val enc = Similarity.pqEncode(e, books)
    enc.filter(!forall(col("codes"), c => c >= 0 && c < 16)).count() shouldBe 0L
    enc.filter(org.apache.spark.sql.functions.size(col("codes")) =!= 8)
      .count() shouldBe 0L

    val q = e.filter(col("vec_id") < 5)
    val adc = Similarity.pqTopK(q, e, 10, books)
    // fully deterministic: a second plan build + run is row-identical
    adc.orderBy("query_id", "rnk").collect().toSeq shouldBe
      Similarity.pqTopK(q, e, 10, books).orderBy("query_id", "rnk").collect().toSeq

    // quantized scores cannot reproduce FINE ordering (codes collapse
    // near-identical vectors into score ties) — that is exactly what the
    // two-stage exact re-rank is for: widening the re-ranked candidate
    // pool must lift recall monotonically toward the exact baseline
    val exact = Similarity.bruteForceTopK(q, e, 10)
    val rAdc = Similarity.recallAtK(exact, adc)
    val r4 = Similarity.recallAtK(exact, Similarity.pqTopK(q, e, 10, books, refine = 4))
    val r8 = Similarity.recallAtK(exact, Similarity.pqTopK(q, e, 10, books, refine = 8))
    r4 should be > rAdc
    r8 should be >= r4
    r8 should be >= 0.5
  }

  test("pqTopK: ADC retrieval stays within the query's cluster") {
    import graft.operators.Similarity
    val rnd = new Random(5)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = vecDF(cluster(1f, 50, 0L) ++ cluster(-1f, 50, 100L))
    val queries = vecDF(Seq((0L, Seq.fill(8)(1.002f)), (100L, Seq.fill(8)(-1.002f))))
    val books = Similarity.pqCodebooks(corpus, m = 4, codewords = 8)
    // the property PQ guarantees WITHOUT re-rank: quantized distances
    // preserve coarse structure, so every retrieved neighbor comes from
    // the query's own cluster (cross-cluster ADC scores are far apart
    // even after quantization)
    val adc = Similarity.pqTopK(queries, corpus, 5, books)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    adc.length shouldBe 10
    adc.foreach { case (q, n) =>
      if (q == 0L) n should be < 100L else n should be >= 100L
    }
  }

  test("ivfPqTopK: deterministic, candidates within probed cells, refine lifts recall") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.hashCentroids(e, 8)
    val books = Similarity.pqCodebooks(e, m = 8, codewords = 16)
    val q = e.filter(col("vec_id") < 5)
    val a = Similarity.ivfPqTopK(q, e, 10, centroids, books, nProbe = 2)
    a.orderBy("query_id", "rnk").collect().toSeq shouldBe
      Similarity.ivfPqTopK(q, e, 10, centroids, books, nProbe = 2)
        .orderBy("query_id", "rnk").collect().toSeq
    // the IVF stage bounds candidates: every returned neighbor must also
    // be reachable by the flat cell probe (same centroids, same nProbe)
    val flatCand = Similarity.ivfFlatTopK(q, e, 1000, centroids, nProbe = 2)
      .select("query_id", "neighbor_id")
    a.select("query_id", "neighbor_id")
      .exceptAll(flatCand).count() shouldBe 0L
    // two-stage exact re-rank recovers ordering the codes collapse
    val exact = Similarity.bruteForceTopK(q, e, 10)
    val r0 = Similarity.recallAtK(exact,
      Similarity.ivfPqTopK(q, e, 10, centroids, books, nProbe = 2))
    val r4 = Similarity.recallAtK(exact,
      Similarity.ivfPqTopK(q, e, 10, centroids, books, nProbe = 2, refine = 4))
    r4 should be >= r0
  }

  test("broadcast-table PQ paths are bit-identical to the literal-forest paths") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.hashCentroids(e, 8)
    val books = Similarity.pqCodebooks(e, m = 8, codewords = 16)
    val q = e.filter(col("vec_id") < 5)
    // the encode pass: identical codes (argmin distance + tie rule match)
    Similarity.pqEncodeTable(e, books).exceptAll(Similarity.pqEncode(e, books))
      .count() shouldBe 0L
    // full ADC retrieval, including the DOUBLE cosine — bit equality, not
    // tolerance: the table path must reproduce the literal path's exact
    // IEEE op order or the oracle contract breaks at production codebook
    // sizes where only the table form compiles
    Similarity.pqTopKTable(q, e, 10, books).orderBy("query_id", "rnk")
      .collect().toSeq shouldBe
      Similarity.pqTopK(q, e, 10, books).orderBy("query_id", "rnk")
        .collect().toSeq
    // the composed IVF-PQ, with the refine ladder engaged on both sides
    Similarity.ivfPqTopKTable(q, e, 10, centroids, books, nProbe = 2, refine = 2)
      .orderBy("query_id", "rnk").collect().toSeq shouldBe
      Similarity.ivfPqTopK(q, e, 10, centroids, books, nProbe = 2, refine = 2)
        .orderBy("query_id", "rnk").collect().toSeq
  }

  test("native Md5Hash32 equals the portable conv(md5) formulation on real docs") {
    import graft.functions.{TextFunctions => TF}
    val toks = TF.tokens(lower(col("text")))
    val hof = transform(toks, t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val native = graft.expressions.VectorExpressions.md5Hash32(toks)
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    docs.filter(!(native <=> hof)).count() shouldBe 0L
  }

  test("native MinHashSig is byte-identical to the HOF formulation on real docs") {
    import graft.functions.{TextFunctions => TF}
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), TF.shingles(col("text"), 3).as("sh"))
    val k = 8
    val hof = array((0 until k).map(TF.minhash(col("sh"), _)): _*)
    val native = graft.expressions.VectorExpressions.minhashSig(col("sh"), k)
    docs.filter(!(native <=> hof)).count() shouldBe 0L
    // empty shingle set → k nulls, matching array_min-over-empty semantics
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("sh")
    val sig = empty.select(
        graft.expressions.VectorExpressions.minhashSig(col("sh"), 4).as("s"))
      .head.getSeq[String](0)
    sig shouldBe Seq(null, null, null, null)
  }

  test("sq8TopK: midpoint-decoded search tracks the exact ladder (recall floor)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def tops(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = tops(Similarity.bruteForceTopK(q, e, 10))
    val sq8 = tops(Similarity.sq8TopK(q, e, 10))
    // SQ8's distortion is per-dim range/256 — tiny for unit-ish dims; the
    // decoded ranking must track the exact one closely
    val recall = exact.keys.toSeq.map(k =>
      (exact(k) & sq8(k)).size.toDouble / exact(k).size).sum / exact.size
    recall should be >= 0.8
  }

  test("sq8Encode: per-dim range codes, max clamps to 255, degenerate dim codes 0") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.0f, 10.0f, 7.0f)),
      (2L, Seq(5.0f, 10.0f, 7.0f)),
      (3L, Seq(10.0f, 10.0f, 7.0f))).toDF("vec_id", "embedding")
    val out = Similarity.sq8Encode(vecs, col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // dim 0: lo 0, hi 10 → 0·25.5=0, floor(5·25.5)=127, 10→clamped 255
    out((1L, 0)) shouldBe 0L
    out((2L, 0)) shouldBe 127L
    out((3L, 0)) shouldBe 255L
    // dims 1 and 2 are constant → degenerate, code 0 everywhere
    Seq(1L, 2L, 3L).foreach { id =>
      out((id, 1)) shouldBe 0L
      out((id, 2)) shouldBe 0L
    }
  }
}
