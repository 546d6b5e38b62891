package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanRemoval

/** Duplicated-span removal (SpanRemoval.removeDuplicatedSpans): covered
  * intervals, adjacency-merge boundaries, full-removal md5, short-doc
  * immunity, and salted-join path equality. */
class SpanRemovalSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val docs = Seq(
    (1L, "a b c d e f"),        // "a b c" shared -> drop [1,3], keep "d e f"
    (2L, "x a b c y"),          // occurrence at 2 -> drop [2,4], keep "x y"
    (3L, "unique tokens only here"),
    (4L, "p q"),                // shorter than n: no grams, untouched
    (5L, "a b c z a b c"),      // [1,3] and [5,7]: gap at 4 -> TWO spans
    (6L, "a b c a b c x"),      // [1,3] and [4,6]: adjacent -> ONE span
    (7L, "a b c")               // fully removed -> md5('')
  ).toDF("doc_id", "text")

  private def run(salt: Int) =
    SpanRemoval.removeDuplicatedSpans(docs, col("doc_id"), col("text"),
        n = 3, minDocs = 2L, saltBuckets = salt)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  test("span cover, adjacency merge, gaps, full removal, short docs") {
    run(0) shouldBe Array(
      (1L, 6L, 3L, 1L, md5Hex("d e f")),
      (2L, 5L, 3L, 1L, md5Hex("x y")),
      (3L, 4L, 0L, 0L, md5Hex("unique tokens only here")),
      (4L, 2L, 0L, 0L, md5Hex("p q")),
      (5L, 7L, 6L, 2L, md5Hex("z")),
      (6L, 7L, 6L, 1L, md5Hex("x")),
      (7L, 3L, 3L, 1L, md5Hex("")))
    spark.catalog.clearCache()
  }

  test("salted gram join ≡ plain join") {
    val plain = run(0)
    val salted = run(4)
    salted shouldBe plain
    spark.catalog.clearCache()
  }
}
