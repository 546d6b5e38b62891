package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.streaming.SemanticAdmission

class SemanticAdmissionSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming semantic admission ≡ sequential batch admission; replay idempotent") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isNew = substring(md5(col("vec_id").cast("string")), 1, 4) >= "cccc"
    val root = Files.createTempDirectory("graft_semadmit_spec_")
    val ix = root.resolve("ix").toString
    Similarity.writeIvfFlatIndex(e.filter(!isNew), nLists = 4, ix)

    val landing = root.resolve("landing")
    Files.createDirectory(landing)
    def land(df: org.apache.spark.sql.DataFrame, name: String, mod: Long): Unit = {
      val stage = root.resolve(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
      Files.move(part.toPath, landing.resolve(name))
      landing.resolve(name).toFile.setLastModified(mod)
      ()
    }
    val b1 = e.filter(isNew && col("vec_id") % 2 === 0).select("vec_id", "embedding")
    val b2 = e.filter(isNew && col("vec_id") % 2 =!= 0).select("vec_id", "embedding")
    land(b1, "a.parquet", 1000000L)
    land(b2, "b.parquet", 2000000L)

    val streamed = SemanticAdmission.runAdmission(spark, landing.toString, ix,
        root.resolve("out").toString, threshold = 0.35,
        maxFilesPerTrigger = Some(1))
      .select(col("vec_id")).as[Long].collect().toSeq.sorted

    // sequential batch replay: round 1 vs the seed, round 2 vs seed ∪
    // round-1 admissions — the invariant the fold-back maintains
    val centroids = Similarity.hashCentroids(e.filter(!isNew), 4)
    val seed = Similarity.assignCells(e.filter(!isNew), centroids)
    val adm1 = Dedup.admitNewVecs(b1, seed, centroids, 0.35)
      .as[Long].collect().toSeq
    val adm1Vecs = b1.filter(col("vec_id").isin(adm1: _*))
    val standing2 = seed.unionByName(Similarity.assignCells(adm1Vecs, centroids))
    val adm2 = Dedup.admitNewVecs(b2, standing2, centroids, 0.35)
      .as[Long].collect().toSeq
    streamed shouldBe (adm1 ++ adm2).sorted

    // a batch was actually gated (otherwise the fixture proves nothing)
    val newCount = e.filter(isNew).count()
    streamed.size.toLong should be < newCount

    // full re-run against the same dirs: fresh checkpoint restarts batch
    // ids at 0, the probe excludes each batch's own prior subdir, and
    // every batch-<id> write overwrites itself — admissions identical
    val again = SemanticAdmission.runAdmission(spark, landing.toString, ix,
        root.resolve("out").toString, threshold = 0.35,
        maxFilesPerTrigger = Some(1))
      .select(col("vec_id")).as[Long].collect().toSeq.sorted
    again shouldBe streamed
  }

  test("empty landing dir admits nothing and does not throw") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val root = Files.createTempDirectory("graft_semadmit_empty_")
    val ix = root.resolve("ix").toString
    Similarity.writeIvfFlatIndex(e.limit(50), nLists = 2, ix)
    val landing = root.resolve("landing")
    Files.createDirectory(landing)
    val out = SemanticAdmission.runAdmission(spark, landing.toString, ix,
      root.resolve("out").toString, threshold = 0.5)
    out.count() shouldBe 0L
  }
}
