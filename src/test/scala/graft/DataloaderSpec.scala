package graft

import org.apache.spark.sql.functions._
import graft.operators.Dataloader

/** Dataloader layout (Dataloader): proportional-interleave evenness and
  * determinism, length-bucket bounds and batch accounting. */
class DataloaderSpec extends SparkSpecBase {
  import spark.implicits._

  test("interleaveOrder: strata consumed evenly, order deterministic") {
    // 80 "big" + 20 "small": in any 10-row prefix of the interleave,
    // small should hold ~2 slots
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "small"))).toDF("id", "s")
    val out = Dataloader.interleaveOrder(df, col("id"), col("s"))
      .orderBy(col("okey"), col("stratum"), col("rank"))
      .collect()
    out.length shouldBe 100
    // evenness: after k rows of the global order, each stratum has been
    // consumed within 1 row of its proportional share
    val strata = Seq("big" -> 80, "small" -> 20).toMap
    out.zipWithIndex.foreach { case (_, k0) =>
      val prefix = out.take(k0 + 1)
      strata.foreach { case (s, size) =>
        val seen = prefix.count(_.getAs[String]("stratum") == s)
        val share = (k0 + 1).toDouble * size / 100
        math.abs(seen - share) should be <= 2.0
      }
    }
    // rank i of stratum s sits at okey = floor((2i-1)*1e9 / (2s))
    out.filter(_.getAs[String]("stratum") == "small").map(_.getAs[Long]("okey"))
      .take(2) shouldBe Array((1L * 1000000000L) / 40L, (3L * 1000000000L) / 40L)
    // determinism under repartitioning
    val again = Dataloader.interleaveOrder(df.repartition(7), col("id"), col("s"))
      .orderBy(col("okey"), col("stratum"), col("rank")).collect()
    again.map(_.getAs[Long]("id")).toSeq shouldBe out.map(_.getAs[Long]("id")).toSeq
  }

  test("lengthBucketBatches: 2x bucket spread, exact cuts, padding accounting") {
    // lengths spanning buckets: 3 (bucket 2), 4..7 (bucket 3), 70×10..70×13
    val rows = Seq((1L, 3L), (2L, 4L), (3L, 7L), (4L, 5L)) ++
      (10L to 79L).map(i => (i, 10L + i % 4)) // bucket 4 (8..15): 70 rows
    val out = Dataloader.lengthBucketBatches(rows.toDF("id", "n"),
      col("id"), col("n"), batchSize = 32).collect()
    val byBucket = out.groupBy(_.getAs[Int]("bucket"))
    byBucket.keySet shouldBe Set(2, 3, 4)
    byBucket(2).map(_.getAs[Long]("n_docs")).sum shouldBe 1L
    byBucket(3).map(_.getAs[Long]("n_docs")).sum shouldBe 3L
    // 70 rows at batchSize 32 → batches of 32, 32, 6
    byBucket(4).map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("n_docs")))
      .sortBy(_._1) shouldBe Array((0L, 32L), (1L, 32L), (2L, 6L))
    // padding identity holds on every batch
    out.foreach { r =>
      r.getAs[Long]("padding") shouldBe
        r.getAs[Long]("n_docs") * r.getAs[Long]("max_units") - r.getAs[Long]("sum_units")
      // bucket bound: max ≤ 2·min possible → max_units < 2^bucket
      r.getAs[Long]("max_units") should be < (1L << r.getAs[Int]("bucket"))
    }
    // zero/negative units dropped
    Dataloader.lengthBucketBatches(Seq((1L, 0L), (2L, -5L)).toDF("id", "n"),
      col("id"), col("n"), 4).count() shouldBe 0L
  }

  test("modularNegatives: exact offsets, no self-pairs, invariance") {
    // stratum of s=8 at k=3: offsets floor(j*8/4) = 2, 4, 6 around the
    // rank circle; every id gets exactly 3 distinct negatives
    val df = (1L to 8L).map(i => (i, "s")).toDF("id", "st")
    val out = Dataloader.modularNegatives(df, col("id"), col("st"), k = 3)
      .collect()
    out.length shouldBe 24
    out.foreach(r => r.getAs[Long]("neg_id") should not be r.getAs[Long]("id"))
    // reconstruct via the rank order and check one row's negatives
    val rankOrder = (1L to 8L).sortBy(i => (md5String(i.toString), i))
    val rankOf = rankOrder.zipWithIndex.map { case (id, i) => (id, i + 1) }.toMap
    val idAt = rankOrder.zipWithIndex.map { case (id, i) => (i + 1, id) }.toMap
    val someId = 3L
    val expected = Seq(2, 4, 6).map(off =>
      idAt(((rankOf(someId) - 1 + off) % 8) + 1))
    out.filter(_.getAs[Long]("id") == someId).sortBy(_.getAs[Long]("j"))
      .map(_.getAs[Long]("neg_id")).toSeq shouldBe expected
    // partitioning/shard invariance
    val again = Dataloader.modularNegatives(df.repartition(5), col("id"),
      col("st"), k = 3, shardDigits = 0).collect()
    again.map(_.toSeq).toSet shouldBe out.map(_.toSeq).toSet
    // tiny stratum (s <= k): self-pairs filtered, never emitted
    val tiny = Dataloader.modularNegatives(
      Seq((1L, "t"), (2L, "t")).toDF("id", "st"), col("id"), col("st"), k = 3)
      .collect()
    tiny.foreach(r => r.getAs[Long]("neg_id") should not be r.getAs[Long]("id"))
  }

  private def md5String(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sharded rank is partitioning- and shard-count-invariant") {
    // the layout is a pure function of the data: shardDigits=0 (one
    // window partition per group — the unsharded plan) must produce
    // bit-identical output to the default 256-way sharding, under any
    // input partitioning (PackingSpec's invariance contract)
    val df = ((1 to 120).map(i => (i.toLong, if (i % 3 == 0) "a" else "b")))
      .toDF("id", "s")
    def interleave(d: org.apache.spark.sql.DataFrame, digits: Int) =
      Dataloader.interleaveOrder(d, col("id"), col("s"), shardDigits = digits)
        .orderBy(col("okey"), col("stratum"), col("rank"))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("stratum"),
          r.getAs[Long]("rank"), r.getAs[Long]("okey"))).toSeq
    val base = interleave(df, 0)
    interleave(df, 2) shouldBe base
    interleave(df.repartition(11), 1) shouldBe base
    // ranks within each stratum are a dense 1..s permutation
    base.groupBy(_._2).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe (1L to rows.length.toLong)
    }

    val lens = (1L to 90L).map(i => (i, 5L + i % 11))
    def batches(d: org.apache.spark.sql.DataFrame, digits: Int) =
      Dataloader.lengthBucketBatches(d, col("id"), col("n"), 16,
        shardDigits = digits)
        .orderBy(col("bucket"), col("batch_id"))
        .collect().map(_.toSeq).toSeq
    val b0 = batches(lens.toDF("id", "n"), 0)
    batches(lens.toDF("id", "n"), 2) shouldBe b0
    batches(lens.toDF("id", "n").repartition(7), 3) shouldBe b0
  }
}
