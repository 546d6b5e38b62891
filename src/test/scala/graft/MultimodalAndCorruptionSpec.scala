package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corruption, MultimodalOps}

/** Multimodal plumbing (MultimodalOps): blob wrapping, partition-batched
  * feature extraction, frame-sampling byte ranges. Span corruption
  * (Corruption): the deterministic masking rule against a pure-Scala
  * re-derivation. */
class MultimodalAndCorruptionSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  test("asBlobTable + extractFeatures: typed metadata, null-safe decode") {
    val df = Seq((1L, "abcd"), (2L, null: String)).toDF("id", "payload")
    val blobs = MultimodalOps.asBlobTable(df, "id", "payload", "text/plain")
    blobs.filter(col("id") === 1L).select("meta.n_bytes")
      .collect().head.getInt(0) shouldBe 4
    val feats = MultimodalOps.extractFeatures(blobs, "id", "payload")
      .orderBy("id").collect()
    feats(0).getAs[Long]("n_bytes") shouldBe 4L
    feats(0).getAs[Int]("header_byte") shouldBe 'a'.toInt
    feats(1).getAs[Long]("n_bytes") shouldBe 0L // null blob -> empty
  }

  test("sampleFrames: stride ranges, slice checksums, short-blob edges") {
    // 300 bytes, 64-byte frames -> 4 full frames (0..3); stride 2 -> 0, 2
    val payload = ("x" * 100) + ("y" * 100) + ("z" * 100)
    val df = Seq((1L, payload), (2L, "tiny"), (3L, null: String))
      .toDF("id", "t")
    val out = MultimodalOps.sampleFrames(df, col("id"), col("t"),
      frameBytes = 64, stride = 2).orderBy("id", "frame_idx").collect()
    out.map(r => (r.getAs[Long]("id"), r.getAs[Long]("frame_idx"),
      r.getAs[Long]("byte_from"), r.getAs[Long]("byte_to"))) shouldBe
      Array((1L, 0L, 0L, 64L), (1L, 2L, 128L, 192L))
    out.head.getAs[String]("frame_md5") shouldBe md5Hex("x" * 64)
    out(1).getAs[String]("frame_md5") shouldBe
      md5Hex(payload.substring(128, 192))
  }

  test("spanMask matches a pure-Scala re-derivation of the rule") {
    val words = (0 until 100).map(i => s"w$i")
    val df = Seq((7L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Corruption.spanMask(df, col("doc_id"), col("text"),
      stride = 16, spanLen = 3).collect().head
    // re-derive: position p masked iff (h + p) % 16 < 3; runs collapse
    val h = hash60("7")
    val mask = (0 until 100).map(p => (h + p) % 16 < 3)
    val expectedMasked = mask.count(identity)
    val expectedSpans = mask.zipWithIndex.count { case (m, p) =>
      m && (p == 0 || !mask(p - 1)) }
    val stream = (0 until 100).flatMap { p =>
      if (!mask(p)) Some(words(p))
      else if (p == 0 || !mask(p - 1)) Some("<extra_id>")
      else None
    }.mkString(" ")
    out.getAs[Long]("n_tok") shouldBe 100L
    out.getAs[Long]("n_masked") shouldBe expectedMasked.toLong
    out.getAs[Long]("n_spans") shouldBe expectedSpans.toLong
    out.getAs[String]("masked_md5") shouldBe md5Hex(stream)
    expectedMasked should be >= 1 // the rule actually fired
  }

  test("spanMask: partitioning-invariant, rejects degenerate spans") {
    val df = (1L to 30L).map(i => (i, (0 until 40).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Corruption.spanMask(df, col("doc_id"), col("text"), 8, 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Corruption.spanMask(df.repartition(7), col("doc_id"), col("text"), 8, 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    b shouldBe a
    intercept[IllegalArgumentException] {
      Corruption.spanMask(df, col("doc_id"), col("text"), 8, 8)
    }
  }
}
