package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.CardStream

/** The streaming dataset card ≡ the batch card (q132): every leg is
  * additive or KMV-mergeable, so the standing state after the bounded
  * replay must equal the one-shot computation bit for bit. */
class CardStreamSpec extends SparkSpecBase {

  test("streaming card equals the batch card; durable re-run is a no-op; scratch re-session fails fast") {
    val root = Files.createTempDirectory("graft_cardspec_")
    try {
      val landing = root.resolve("landing").toString
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
        .repartition(2).write.parquet(landing)
      val target = root.resolve("card").toString
      val ckpt = root.resolve("ckpt").toString

      CardStream.runCardStream(spark, landing, target, SparkEntry.q130Weights,
        k = 64, maxFilesPerTrigger = Some(1), checkpointDir = Some(ckpt))
      val streamed = CardStream.readCard(spark, target, k = 64)
        .orderBy("source").collect().toSeq
      val batch = SparkEntry.queries("q132_dataset_card")(
          spark, "/root/testdata/sf0.001")
        .orderBy("source").collect().toSeq
      streamed shouldBe batch
      streamed.nonEmpty shouldBe true

      // re-run under the SAME durable checkpoint: both files committed,
      // nothing processes, card unchanged — cross-session exactly-once
      CardStream.runCardStream(spark, landing, target, SparkEntry.q130Weights,
        k = 64, maxFilesPerTrigger = Some(1), checkpointDir = Some(ckpt))
      CardStream.readCard(spark, target, k = 64)
        .orderBy("source").collect().toSeq shouldBe streamed

      // a scratch-checkpoint session over the standing card would
      // restart batch ids and silently skip — must fail fast
      val ex = intercept[IllegalArgumentException] {
        CardStream.runCardStream(spark, landing, target,
          SparkEntry.q130Weights, k = 64, maxFilesPerTrigger = Some(1))
      }
      ex.getMessage should include("checkpointDir")

      // mismatched sketch size against the standing state fails fast on
      // both the ingest and the read path (the embedded p_k parameter)
      val ek = intercept[IllegalArgumentException] {
        CardStream.runCardStream(spark, landing, target,
          SparkEntry.q130Weights, k = 32, maxFilesPerTrigger = Some(1),
          checkpointDir = Some(ckpt))
      }
      ek.getMessage should include("k=64")
      val ek2 = intercept[IllegalArgumentException] {
        CardStream.readCard(spark, target, k = 32)
      }
      ek2.getMessage should include("k=64")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(root.toFile)
      spark.catalog.clearCache()
    }
  }

  test("card partials merge associatively: (a⊕b)⊕c ≡ one partial over the union") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
    val parts = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val merged = parts.map(CardStream.cardPartial(_, SparkEntry.q130Weights, 64))
      .reduce(CardStream.mergeCards(64))
    val direct = CardStream.cardPartial(docs, SparkEntry.q130Weights, 64)
    merged.orderBy("source").collect().toSeq shouldBe
      direct.orderBy("source").collect().toSeq
  }
}
