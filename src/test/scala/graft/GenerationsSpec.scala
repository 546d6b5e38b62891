package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Fs, Similarity}

/** Commit-by-pointer generations: the object-store-safe publication
  * protocol (immutable gen dirs + one-pointer flip) and its wiring into
  * the ANN artifact verbs. */
class GenerationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecDF(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("publishGeneration: numbered immutable dirs, pointer flips atomically, crash garbage is invisible and pruned") {
    val root = Files.createTempDirectory("graft_gen_").toString + "/tbl"
    Fs.currentGeneration(root) shouldBe None
    val g1 = Fs.publishGeneration(root)(p => Fs.writeText(s"$p/a.txt", "one"))
    g1 shouldBe s"$root/gen-1"
    Fs.currentGeneration(root) shouldBe Some(g1)
    val g2 = Fs.publishGeneration(root)(p => Fs.writeText(s"$p/a.txt", "two"))
    g2 shouldBe s"$root/gen-2"
    Fs.currentGeneration(root) shouldBe Some(g2)
    // the superseded generation is untouched (readers holding it are fine)
    Fs.readText(s"$g1/a.txt") shouldBe Some("one")
    // a publish that died before its flip: a half-written higher gen —
    // readers never see it, the pointer still names gen-2
    Fs.writeText(s"$root/gen-3/partial.txt", "half")
    Fs.currentGeneration(root) shouldBe Some(g2)
    // prune sweeps the dead higher gen AND old gens beyond the keep
    // window, never the current one
    Fs.pruneGenerations(root, keep = 0)
    Fs.listNames(root).filter(_.startsWith(Fs.GenPrefix)) shouldBe Seq("gen-2")
    Fs.currentGeneration(root) shouldBe Some(g2)
    // a writer that produces nothing fails loudly, pointer unmoved
    an[Exception] should be thrownBy Fs.publishGeneration(root)(_ => ())
    Fs.currentGeneration(root) shouldBe Some(g2)
  }

  test("the pointer flip has no no-pointer window: a reader hammering currentGeneration through repeated publishes always sees a generation") {
    val root = Files.createTempDirectory("graft_genflip_").toString + "/tbl"
    Fs.publishGeneration(root)(p => Fs.writeText(s"$p/a.txt", "gen"))
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        // the reader contract under concurrent publishes: ALWAYS a
        // generation — never the plain-layout fallback (None), which
        // would make a probe read gen-* dirs as data
        if (Fs.currentGeneration(root).isEmpty) misses.incrementAndGet()
        ()
      }
    })
    reader.start()
    try (2 to 60).foreach { i =>
      Fs.publishGeneration(root)(p => Fs.writeText(s"$p/a.txt", s"gen$i"))
    } finally {
      stop.set(true); reader.join()
    }
    misses.get() shouldBe 0
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-60")
  }

  test("currentGeneration fails loudly on a dangling or malformed pointer") {
    val root = Files.createTempDirectory("graft_genbad_").toString + "/tbl"
    Fs.writeText(s"$root/${Fs.PointerFile}", "gen-9")
    an[Exception] should be thrownBy Fs.currentGeneration(root)
    Fs.writeText(s"$root/${Fs.PointerFile}", "../evil")
    an[Exception] should be thrownBy Fs.currentGeneration(root)
  }

  test("ANN verbs accept a pointer root: probe resolves the current generation; deletes/appends land in it; a rebuild publish flips readers") {
    val rnd = new Random(5)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = cluster(1f, 20, 0L) ++ cluster(-1f, 20, 100L)
    val queries = vecDF(Seq((900L, Seq.fill(8)(1.002f)), (901L, Seq.fill(8)(-1.002f))))

    val root = Files.createTempDirectory("graft_genann_").toString + "/ix"
    val g1 = Fs.publishGeneration(root)(p =>
      Similarity.writeIvfFlatIndex(vecDF(corpus), nLists = 4, p))
    def rows(path: String) = Similarity.ivfFlatProbe(queries, path, 5, nProbe = 2)
      .select("query_id", "neighbor_id", "rnk")
      .orderBy("query_id", "rnk").collect().toSeq
    rows(root) shouldBe rows(g1) // pointer root ≡ concrete generation

    // tombstone-delete against the ROOT lands in the current generation
    // (a blind file append — object-store safe) and masks at probe time
    val dead = corpus.map(_._1).filter(_ % 5 == 0)
    Similarity.deleteFromAnnIndex(dead.toDF("vec_id"), root)
    Fs.exists(s"$g1/${Fs.TombstonesSubdir}") shouldBe true
    val masked = rows(root)
    masked.map(_.getLong(1)).toSet.intersect(dead.toSet) shouldBe Set.empty

    // the swap verb, object-store style: REBUILD without the deleted
    // rows as a new generation UNDER THE FROZEN QUANTIZER (compaction
    // semantics: same centroids, smaller corpus) — probes through the
    // root flip over, and the physically-compacted answer equals the
    // tombstone-masked one
    val kept = corpus.filterNot(c => dead.contains(c._1))
    val frozen = Similarity.readCentroids(spark, g1)
    Fs.publishGeneration(root)(p =>
      Similarity.writeIvfFlatIndex(vecDF(kept), frozen, p))
    rows(root) shouldBe masked
  }

  test("compactIvfFlatIndex on a pointer root publishes a NEW generation: tombstones folded physically, pointer flipped, history immutable") {
    val rnd = new Random(11)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = cluster(1f, 20, 0L) ++ cluster(-1f, 20, 100L)
    val queries = vecDF(Seq((900L, Seq.fill(8)(1.002f)), (901L, Seq.fill(8)(-1.002f))))
    val root = Files.createTempDirectory("graft_genfold_").toString + "/ix"
    val g1 = Fs.publishGeneration(root)(p =>
      Similarity.writeIvfFlatIndex(vecDF(corpus), nLists = 4, p))
    def rows(path: String) = Similarity.ivfFlatProbe(queries, path, 5, nProbe = 2)
      .select("query_id", "neighbor_id", "rnk")
      .orderBy("query_id", "rnk").collect().toSeq
    val dead = corpus.map(_._1).filter(_ % 5 == 0)
    Similarity.deleteFromAnnIndex(dead.toDF("vec_id"), root)
    val masked = rows(root)
    Similarity.compactIvfFlatIndex(spark, root)
    // the fold landed as gen-2 and the pointer flipped to it
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-2")
    // the delete is now PHYSICAL: no tombstone table in the new
    // generation, centroids carried over, answers unchanged
    Fs.exists(s"$root/gen-2/${Fs.TombstonesSubdir}") shouldBe false
    Fs.exists(s"$root/gen-2/centroids") shouldBe true
    rows(root) shouldBe masked
    // the superseded generation is untouched history (readers holding
    // it still see their consistent view, tombstones included)
    Fs.exists(s"$g1/${Fs.TombstonesSubdir}") shouldBe true
    rows(g1) shouldBe masked
    // partition pruning survives the pointer indirection + fold: one
    // query probing nProbe=2 cells reads at most 2 of the 4 cell
    // directories of the NEW generation (executed-scan metric, the
    // VectorAndSimilaritySpec assertion through a pointer root)
    val one = Similarity.ivfFlatProbe(
      queries.filter(col("vec_id") === 900L), root, 5, nProbe = 2)
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
  }

  test("compactIvfPqIndex on a pointer root publishes a new generation with codebooks carried") {
    val rnd = new Random(13)
    def cluster(base: Float, n: Int, off: Long) =
      (0 until n).map(i => (off + i, Seq.fill(8)(base + rnd.nextFloat() * 0.01f)))
    val corpus = cluster(1f, 24, 0L) ++ cluster(-1f, 24, 100L)
    val queries = vecDF(Seq((900L, Seq.fill(8)(1.002f))))
    val root = Files.createTempDirectory("graft_genpq_").toString + "/ix"
    Fs.publishGeneration(root)(p =>
      Similarity.writeIvfPqIndex(vecDF(corpus), nLists = 4, m = 4,
        codewords = 8, path = p))
    def rows(path: String) = Similarity.ivfPqProbe(queries, path, 5, nProbe = 2)
      .select("query_id", "neighbor_id", "rnk")
      .orderBy("query_id", "rnk").collect().toSeq
    val dead = corpus.map(_._1).filter(_ % 4 == 0)
    Similarity.deleteFromAnnIndex(dead.toDF("vec_id"), root)
    val masked = rows(root)
    Similarity.compactIvfPqIndex(spark, root)
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-2")
    Fs.exists(s"$root/gen-2/${Fs.TombstonesSubdir}") shouldBe false
    Fs.exists(s"$root/gen-2/codebooks") shouldBe true
    Fs.exists(s"$root/gen-2/centroids") shouldBe true
    rows(root) shouldBe masked
    // retention on the ANN verbs: a second fold with retain = Some(0)
    // reclaims every superseded generation in the same call — without
    // it each fold leaves a full index copy standing until an
    // out-of-band pruneGenerations
    Similarity.deleteFromAnnIndex(
      corpus.map(_._1).filter(_ % 4 == 1).toDF("vec_id"), root)
    val masked2 = rows(root)
    Similarity.compactIvfPqIndex(spark, root, retain = Some(0))
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-3")
    Fs.exists(s"$root/gen-1") shouldBe false
    Fs.exists(s"$root/gen-2") shouldBe false
    rows(root) shouldBe masked2
  }

  test("near-dup compact/rebuild on a pointer root publish new generations and fold deletes") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "red green blue cyan magenta yellow"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_genndc_").toString + "/ndx"
    val g1 = Fs.publishGeneration(root)(p =>
      graft.operators.Dedup.nearDupIndex(docs, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(p))
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // dup of doc 1
      (11L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    def admit(path: String) = graft.operators.Dedup
      .admitNewDocsWithIndex(incoming, path, col("doc_id"), col("text"),
        threshold = 0.4)
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    graft.operators.Dedup.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), root)
    admit(root) shouldBe Seq(10L, 11L) // masked via tombstone
    // COMPACT on the pointer root: new generation, delete folded
    graft.operators.Dedup.compactNearDupIndex(spark, root)
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-2")
    Fs.exists(s"$root/gen-2/${Fs.TombstonesSubdir}") shouldBe false
    admit(root) shouldBe Seq(10L, 11L)
    Fs.exists(s"$g1/${Fs.TombstonesSubdir}") shouldBe true // history intact
    // REBUILD (re-parameterize) on the pointer root: another generation
    graft.operators.Dedup.rebuildNearDupIndex(
      docs.filter(col("doc_id") =!= 1L), root, col("doc_id"), col("text"),
      shingleN = 3, k = 16, rowsPerBand = 4)
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-3")
    admit(root) shouldBe Seq(10L, 11L)
  }

  test("retain: a compaction's retention policy reclaims superseded generations in the same verb") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "red green blue cyan magenta yellow"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_genret_").toString + "/ndx"
    Fs.publishGeneration(root)(p =>
      graft.operators.Dedup.nearDupIndex(docs, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(p))
    graft.operators.Dedup.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), root)
    // retain = Some(0): the fold publishes gen-2 AND reclaims gen-1 —
    // no out-of-band pruneGenerations sweep needed
    graft.operators.Dedup.compactNearDupIndex(spark, root, retain = Some(0))
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-2")
    Fs.exists(s"$root/gen-1") shouldBe false
    // and the compacted index still answers probes
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    graft.operators.Dedup
      .admitNewDocsWithIndex(incoming, root, col("doc_id"), col("text"),
        threshold = 0.4)
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(10L, 11L)
    // retain = Some(1) keeps exactly one superseded generation around
    graft.operators.Dedup.deleteFromNearDupIndex(Seq(2L).toDF("doc_id"), root)
    graft.operators.Dedup.compactNearDupIndex(spark, root, retain = Some(1))
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-3")
    Fs.exists(s"$root/gen-2") shouldBe true
  }

  test("describeArtifact reads the lifecycle state from metadata only: generations, current flag, tombstone load, batch subdirs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "red green blue cyan magenta yellow"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_gendesc_").toString + "/ndx"
    Fs.publishGeneration(root)(p =>
      graft.operators.Dedup.nearDupIndex(docs, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(p))
    graft.operators.Dedup.deleteFromNearDupIndex(Seq(1L, 2L).toDF("doc_id"), root)
    val before = graft.operators.Maintenance.describeArtifact(spark, root)
      .orderBy("generation").collect()
    before.map(_.getString(0)).toSet shouldBe Set("pointer")
    before.map(r => (r.getString(1), r.getBoolean(2), r.getLong(5))).toSeq shouldBe
      Seq(("gen-1", true, 2L))
    // compact publishes gen-2 (tombstones folded) — describe shows both
    // generations, current flipped, pressure cleared
    graft.operators.Dedup.compactNearDupIndex(spark, root)
    val after = graft.operators.Maintenance.describeArtifact(spark, root)
      .orderBy("generation").collect()
    after.map(r => (r.getString(1), r.getBoolean(2), r.getLong(5))).toSeq shouldBe
      Seq(("gen-1", false, 2L), ("gen-2", true, 0L))
    after.foreach { r =>
      r.getLong(3) should be > 0L // data_bytes
      r.getLong(4) should be > 0L // data_files
    }
    // a plain (pointer-less) artifact describes as one row
    val plainRoot = Files.createTempDirectory("graft_gendescp_").toString + "/ix"
    graft.operators.Dedup.nearDupIndex(docs, col("doc_id"), col("text"),
        shingleN = 3, k = 8, rowsPerBand = 2)
      .write.mode("overwrite").parquet(s"$plainRoot/seed")
    docs.limit(1).select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$plainRoot/batch-0")
    val plain = graft.operators.Maintenance.describeArtifact(spark, plainRoot)
      .collect()
    plain.length shouldBe 1
    plain.head.getString(0) shouldBe "plain"
    plain.head.getLong(6) shouldBe 1L // batch_subdirs
  }

  test("near-dup admission accepts a pointer root: probe resolves the current generation, deletes land in it") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "red green blue cyan magenta yellow"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_genndx_").toString + "/ndx"
    val g1 = Fs.publishGeneration(root)(p =>
      graft.operators.Dedup.nearDupIndex(docs, col("doc_id"), col("text"),
          shingleN = 3, k = 8, rowsPerBand = 2)
        .write.mode("overwrite").parquet(p))
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // dup of doc 1
      (11L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    def admit(path: String) = graft.operators.Dedup
      .admitNewDocsWithIndex(incoming, path, col("doc_id"), col("text"),
        threshold = 0.4)
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    admit(root) shouldBe admit(g1) // pointer root ≡ concrete generation
    admit(root) shouldBe Seq(11L)  // the near-dup of doc 1 is refused
    // delete doc 1 through the ROOT: tombstones land in the current
    // generation and its near-dup now admits
    graft.operators.Dedup.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), root)
    Fs.exists(s"$g1/${Fs.TombstonesSubdir}") shouldBe true
    admit(root) shouldBe Seq(10L, 11L)
  }

  test("renameOverwrite on a FileContext-less scheme (the object-store fallback): one-PUT replace, src deleted, pointer protocol end to end; a failed post-PUT delete leaves dst committed") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.mock.impl", classOf[MockObjectStoreFs].getName)
    conf.set("fs.mockfail.impl", classOf[MockFailingDeleteFs].getName)
    try {
    // the scheme really has no AbstractFileSystem binding — the exact
    // condition s3a/gs present, driving the create-overwrite PUT branch
    intercept[org.apache.hadoop.fs.UnsupportedFileSystemException] {
      org.apache.hadoop.fs.FileContext.getFileContext(
        java.net.URI.create("mock:///"), conf)
    }
    val dir = Files.createTempDirectory("graft_mockfs_").toString
    // dst absent: created with src's content, src gone
    Fs.writeText(s"mock:$dir/src_a", "alpha")
    Fs.renameOverwrite(s"mock:$dir/src_a", s"mock:$dir/ptr")
    Fs.readText(s"mock:$dir/ptr") shouldBe Some("alpha")
    Fs.exists(s"mock:$dir/src_a") shouldBe false
    // dst present: REPLACED in one create-overwrite, src gone
    Fs.writeText(s"mock:$dir/src_b", "beta")
    Fs.renameOverwrite(s"mock:$dir/src_b", s"mock:$dir/ptr")
    Fs.readText(s"mock:$dir/ptr") shouldBe Some("beta")
    Fs.exists(s"mock:$dir/src_b") shouldBe false
    // the full generation protocol over the scheme: both publishes route
    // their pointer flip through the fallback (first = create, second =
    // overwrite), history immutable
    val root = s"mock:$dir/tbl"
    val g1 = Fs.publishGeneration(root)(p => Fs.writeText(s"$p/a.txt", "one"))
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-1")
    Fs.publishGeneration(root)(p => Fs.writeText(s"$p/a.txt", "two"))
    Fs.currentGeneration(root) shouldBe Some(s"$root/gen-2")
    Fs.readText(s"$g1/a.txt") shouldBe Some("one")
    Fs.readText(s"$root/gen-2/a.txt") shouldBe Some("two")
    // a delete failure AFTER the PUT: dst is already committed — the new
    // pointer is visible even though the call throws; the stranded tmp
    // file is harmless (the next publish rewrites it)
    val fdir = Files.createTempDirectory("graft_mockfailfs_").toString
    Fs.writeText(s"mockfail:$fdir/p__tmp", "gamma")
    intercept[java.io.IOException] {
      Fs.renameOverwrite(s"mockfail:$fdir/p__tmp", s"mockfail:$fdir/ptr")
    }
    Fs.readText(s"mockfail:$fdir/ptr") shouldBe Some("gamma")
    Fs.exists(s"mockfail:$fdir/p__tmp") shouldBe true
    } finally {
      // the shared session's Hadoop conf outlives this test — unset the
      // mock schemes and evict exactly their cached FileSystem instances
      // (close() removes a cache entry; closeAll would drop the live
      // local FS out from under the session), or the fake filesystems
      // leak into every later test in the JVM
      Seq("mock:///", "mockfail:///").foreach { u =>
        org.apache.hadoop.fs.FileSystem
          .get(java.net.URI.create(u), conf).close()
      }
      conf.unset("fs.mock.impl")
      conf.unset("fs.mockfail.impl")
    }
  }
}

/** A `mock:` scheme [[org.apache.hadoop.fs.FileSystem]] with NO
  * `AbstractFileSystem` binding — `FileContext.getFileContext` throws
  * `UnsupportedFileSystemException` for it, exactly the condition the
  * s3a/gs object-store connectors present, which drives
  * [[graft.operators.Fs.renameOverwrite]] into its create-overwrite PUT
  * fallback. Backed by local disk. Registered per test via
  * `fs.mock.impl`. */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

/** [[MockObjectStoreFs]] whose delete of a `__tmp` file throws — pins
  * that the PUT commit PRECEDES the source cleanup: a failed delete
  * must leave the destination already replaced. */
class MockFailingDeleteFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfail"
  override def getUri: java.net.URI = java.net.URI.create("mockfail:///")
  override def delete(p: org.apache.hadoop.fs.Path,
      recursive: Boolean): Boolean =
    if (p.getName.endsWith("__tmp"))
      throw new java.io.IOException(
        s"simulated object-store delete failure: $p")
    else super.delete(p, recursive)
}
