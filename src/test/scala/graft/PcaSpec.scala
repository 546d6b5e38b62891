package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.operators.Similarity

/** Distributed PCA: the quantized co-moment pass, the driver-side
  * eigensolve, and the scan-fused projection. */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  private def embeddings =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("comomentGramian matches a local single-threaded replay exactly") {
    val vecs = embeddings.select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect()
    val dim = vecs.head.length
    val expected = Array.ofDim[Long](dim, dim)
    vecs.foreach { v =>
      for (i <- 0 until dim; j <- 0 until dim)
        expected(i)(j) += math.floor(v(i) * v(j) * 1e6).toLong
    }
    val got = Pca.comomentGramian(embeddings, col("embedding"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got.size === dim * dim)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(got((i, j)) === expected(i)(j), s"at ($i,$j)")
  }

  test("co-moment pass is ADDITIVE across disjoint corpus slices (the streaming-fold law)") {
    val a = embeddings.filter(col("vec_id") % 2 === 0)
    val b = embeddings.filter(col("vec_id") % 2 =!= 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      Pca.comomentGramian(df, col("embedding"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val whole = m(embeddings)
    val parts = (m(a).toSeq ++ m(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    assert(whole === parts)
  }

  test("fit is deterministic, components are orthonormal, eigenvalues descend") {
    val m1 = Pca.fit(embeddings, col("embedding"), k = 8)
    val m2 = Pca.fit(embeddings, col("embedding"), k = 8)
    assert(m1 === m2) // bit-identical across fits
    assert(m1.components.size === 8)
    for (a <- 0 until 8; b <- 0 until 8) {
      val dot = m1.components(a).lazyZip(m1.components(b)).map(_ * _).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"<w$a,w$b> = $dot")
    }
    m1.eigenvalues.sliding(2).foreach {
      case Seq(x, y) => assert(x >= y - 1e-9)
      case _ =>
    }
    assert(m1.eigenvalues.forall(_ >= -1e-9))
  }

  test("fit recovers a planted principal direction and its variance") {
    // synthetic: dim-6 points stretched along a known axis u with small
    // noise on the others — the top component must align with u
    val u = Seq(3.0, 0.0, 4.0, 0.0, 0.0, 0.0).map(_ / 5.0)
    val rows = (0 until 420).map { r =>
      val t = (r % 21 - 10).toDouble // mean-zero spread along u
      val noise = Seq.tabulate(6)(d => ((r * 31 + d * 7) % 11 - 5) * 0.01)
      (r.toLong, u.map(_ * t).lazyZip(noise).map(_ + _))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(rows, col("embedding"), k = 2)
    val align = math.abs(m.components.head.lazyZip(u).map(_ * _).sum)
    assert(align > 0.999, s"top component not aligned with planted axis: $align")
    val spread = (0 until 21).map(i => (i - 10).toDouble)
    val plantedVar = spread.map(t => t * t).sum / spread.size
    assert(math.abs(m.eigenvalues.head - plantedVar) / plantedVar < 0.01)
  }

  test("project equals the centered dot product per row and is shuffle-free") {
    val m = Pca.fit(embeddings, col("embedding"), k = 4)
    val projected = Pca.project(embeddings, col("vec_id"), col("embedding"), m)
    assert(!projected.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must be scan-fused — no shuffle")
    val byId = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    projected.as[(Long, Seq[Double])].collect().foreach { case (id, y) =>
      val v = byId(id)
      assert(y.size === 4)
      y.zipWithIndex.foreach { case (yj, j) =>
        val w = m.components(j)
        val want = v.lazyZip(w).map(_ * _).sum -
          m.means.lazyZip(w).map(_ * _).sum
        assert(math.abs(yj - want) < 1e-9, s"vec $id comp $j")
      }
    }
  }

  test("PCA-reduced ANN recall (64 -> 16) matches-or-beats the JL random projection") {
    // data-fit axes should lose no more recall than random planes at the
    // same reduced dim — the whole reason to train the projection
    val exact = Similarity.bruteForceTopK(
      embeddings.filter(col("vec_id") < 10), embeddings, k = 10)
      .persist()
    def recallOf(reduced: org.apache.spark.sql.DataFrame): Double = {
      val r = reduced.persist()
      val approx = Similarity.bruteForceTopK(
        r.filter(col("vec_id") < 10), r, k = 10)
      val rep = Similarity.recallReport(exact, approx)
        .agg(sum(col("truth")), sum(col("hits"))).as[(Long, Long)].head()
      r.unpersist()
      rep._2.toDouble / rep._1
    }
    val m = Pca.fit(embeddings, col("embedding"), k = 16)
    val pcaRecall = recallOf(
      Pca.project(embeddings, col("vec_id"), col("embedding"), m))
    val jlRecall = recallOf(Similarity.projectVecs(embeddings,
      col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.randomPlanes(16, m.dim)))
    exact.unpersist()
    assert(pcaRecall >= jlRecall - 0.05,
      s"PCA-16 recall $pcaRecall should not trail JL-16 recall $jlRecall")
    assert(pcaRecall >= 0.15, s"PCA-16 recall@10 too low: $pcaRecall")
  }

  test("whiten = project scaled by the literal 1/sqrt(eigenvalue) per component — bit-exact; non-positive eigenvalues fail fast") {
    val m = Pca.fit(embeddings, col("embedding"), k = 4)
    val inv = m.eigenvalues.map(ev => 1.0 / math.sqrt(ev))
    val proj = Pca.project(embeddings, col("vec_id"), col("embedding"), m)
      .as[(Long, Seq[Double])].collect().toMap
    val white = Pca.whiten(embeddings, col("vec_id"), col("embedding"), m)
      .as[(Long, Seq[Double])].collect().toMap
    white.keySet shouldBe proj.keySet
    white.foreach { case (id, w) =>
      // (dot - off) * inv with the identical (dot - off) subtree — the
      // scale is one IEEE multiply, so equality is exact, not approximate
      w shouldBe proj(id).lazyZip(inv).map(_ * _)
    }
    val degenerate = m.copy(eigenvalues = m.eigenvalues.updated(1, 0.0))
    val ex = intercept[IllegalArgumentException] {
      Pca.whiten(embeddings, col("vec_id"), col("embedding"), degenerate)
    }
    ex.getMessage should include("whiten")
  }

  test("ragged embeddings fail fast instead of averaging over a data bug") {
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      Pca.comomentGramian(bad, col("embedding")).collect()
    }
    assert(ex.getMessage.contains("ragged") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("ragged embeddings ACROSS partitions fail fast — width markers") {
    // each partition is internally consistent (the per-row require can't
    // see the mismatch); only the (-2, d) markers can
    def mentionsRagged(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("ragged")) ||
        mentionsRagged(t.getCause))
    val a = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding").coalesce(1)
    val b = Seq((2L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding").coalesce(1)
    val bad = a.unionByName(b)
    assert(mentionsRagged(intercept[Exception] {
      Pca.comomentGramian(bad, col("embedding")).collect()
    }))
    assert(mentionsRagged(intercept[Exception] {
      Pca.fit(bad, col("embedding"), k = 1)
    }))
    // the single-width frame still passes through the marker check
    val ok = a.unionByName(
      Seq((3L, Seq(4.0, 5.0))).toDF("vec_id", "embedding").coalesce(1))
    assert(Pca.comomentGramian(ok, col("embedding")).count() === 4L)
  }
}
