package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Invariants of the sequence-packing layout (Packing.packSequences):
  * positions are the exact running token sums (no gaps, no overlaps),
  * offsets respect the budget, shard sequence-id ranges are disjoint,
  * and the assignment is a pure function of the data (partitioning- and
  * rerun-independent). */
class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture = (1 to 200)
    .map(i => (i.toLong, (i * 37 % 900 + 1).toLong))
    .toDF("doc_id", "n_tok")

  test("positions reconstruct the shard streams exactly") {
    val budget = 256L
    val out = Packing.packSequences(fixture, col("doc_id"), col("n_tok"),
      budget, shards = 4).collect()
    out.length shouldBe 200
    // Rebuild each shard's stream in layout order and check every row's
    // (seq_id, seq_off) is exactly the running sum — no gaps, no overlaps.
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    byShard.size shouldBe 4
    // Per-shard local bases: sequences never span shards and global ids
    // are dense, so shard bases must be the exclusive cumsum of ceil-div.
    val totals = byShard.view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    val nseq = totals.view.mapValues(t => (t + budget - 1) / budget).toMap
    val shardsSorted = byShard.keys.toSeq.sorted
    val bases = shardsSorted
      .map(s => s -> shardsSorted.takeWhile(_ < s).map(nseq).sum).toMap
    byShard.foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
        .foreach { r =>
          val seq = r.getAs[Long]("seq_id")
          val off = r.getAs[Long]("seq_off")
          off should be >= 0L
          off should be < budget
          (seq - bases(shard)) * budget + off shouldBe cum
          cum += r.getAs[Long]("n_tokens")
        }
      cum shouldBe totals(shard) // the whole stream was laid out
      // every START position stays inside the shard's ceil(total/budget)
      // sequence range (the last doc may span past its starting sequence,
      // so max can be below nseq-1, never at or above nseq)
      val localSeqs = rows.map(r => r.getAs[Long]("seq_id") - bases(shard))
      localSeqs.max should be < nseq(shard)
      localSeqs.min shouldBe 0L
    }
    // disjoint, consecutive global id ranges across shards
    val ranges = byShard.toSeq.sortBy(_._1).map { case (s, rows) =>
      (rows.map(_.getAs[Long]("seq_id")).min, rows.map(_.getAs[Long]("seq_id")).max)
    }
    ranges.sliding(2).foreach {
      case Seq((_, maxA), (minB, _)) => minB should be > maxA
      case _ =>
    }
  }

  test("assignment is partitioning-independent and drops empty docs") {
    val base = Packing.packSequences(fixture, col("doc_id"), col("n_tok"),
      budget = 128L, shards = 2).orderBy("id").collect()
    val repart = Packing.packSequences(fixture.repartition(7, col("n_tok")),
      col("doc_id"), col("n_tok"), budget = 128L, shards = 2)
      .orderBy("id").collect()
    base should contain theSameElementsInOrderAs repart

    val withEmpty = fixture.union(Seq((9999L, 0L), (10000L, -3L)).toDF)
    val packed = Packing.packSequences(withEmpty, col("doc_id"), col("n_tok"),
      budget = 128L, shards = 2)
    packed.filter(col("id") >= 9999L).count() shouldBe 0L
  }

  test("packedSlices: docs and sequences tile exactly, starts match packSequences") {
    val budget = 256L
    val slices = Packing.packedSlices(fixture, col("doc_id"), col("n_tok"),
      budget, shards = 4).collect()
    // per doc: slices tile [0, n_tokens) in seq order, contiguous
    slices.groupBy(_.getAs[Long]("id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("seq_id"))
      sorted.map(_.getAs[Long]("seq_id")).toSeq shouldBe
        (sorted.head.getAs[Long]("seq_id") to sorted.last.getAs[Long]("seq_id"))
      sorted.head.getAs[Long]("token_from") shouldBe 0L
      sorted.last.getAs[Long]("token_to") shouldBe sorted.last.getAs[Long]("n_tokens")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          b.getAs[Long]("token_from") shouldBe a.getAs[Long]("token_to")
          b.getAs[Long]("seq_from") shouldBe 0L // continuations start sequences
        case _ =>
      }
    }
    // per sequence: slices tile [0, budget) exactly; only each shard's
    // LAST sequence may end short
    val lastSeqOfShard = slices.groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("seq_id")).max).toMap
    slices.groupBy(_.getAs[Long]("seq_id")).foreach { case (seq, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("seq_from"))
      sorted.head.getAs[Long]("seq_from") shouldBe 0L
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          b.getAs[Long]("seq_from") shouldBe
            a.getAs[Long]("seq_from") + (a.getAs[Long]("token_to") - a.getAs[Long]("token_from"))
        case _ =>
      }
      val filled = sorted.map(r => r.getAs[Long]("token_to") - r.getAs[Long]("token_from")).sum
      val shard = sorted.head.getAs[Long]("shard")
      if (seq == lastSeqOfShard(shard)) filled should be <= budget
      else filled shouldBe budget
    }
    // first slice of every doc agrees with packSequences' assignment
    val starts = Packing.packSequences(fixture, col("doc_id"), col("n_tok"),
        budget, shards = 4).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
      .toMap
    slices.groupBy(_.getAs[Long]("id")).foreach { case (id, rows) =>
      val first = rows.minBy(_.getAs[Long]("seq_id"))
      (first.getAs[Long]("seq_id"), first.getAs[Long]("seq_from")) shouldBe starts(id)
    }
  }

  test("overlappingChunks: exact tiling, overlap, clamps, checksums") {
    import graft.operators.Chunking
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 10 tokens, width 4, stride 3 -> chunks [0,4) [3,7) [6,10): 3 chunks
    val words = (0 until 10).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Chunking.overlappingChunks(df, col("doc_id"), col("text"),
      width = 4, stride = 3).orderBy("doc_id", "chunk_id").collect()
    val ranges = out.filter(_.getAs[Long]("doc_id") == 1L)
      .map(r => (r.getAs[Long]("tok_from"), r.getAs[Long]("tok_to")))
    ranges shouldBe Array((0L, 4L), (3L, 7L), (6L, 10L))
    // every token covered; adjacent chunks overlap by width - stride = 1
    ranges.sliding(2).foreach { case Array((_, t1), (f2, _)) =>
      (t1 - f2) shouldBe 1L }
    out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[String]("chunk_md5") shouldBe
      md5Hex(words.take(4).mkString(" "))
    // short doc -> single clamped chunk; empty doc -> no rows
    val solo = out.filter(_.getAs[Long]("doc_id") == 2L)
    solo.map(r => (r.getAs[Long]("tok_from"), r.getAs[Long]("tok_to"))) shouldBe
      Array((0L, 1L))
    out.count(_.getAs[Long]("doc_id") == 3L) shouldBe 0
    // stride == width: disjoint exact tiling
    val tiled = Chunking.overlappingChunks(df.filter(col("doc_id") === 1L),
      col("doc_id"), col("text"), width = 5, stride = 5).collect()
    tiled.map(r => (r.getAs[Long]("tok_from"), r.getAs[Long]("tok_to")))
      .sorted shouldBe Array((0L, 5L), (5L, 10L))
    intercept[IllegalArgumentException] {
      Chunking.overlappingChunks(df, col("doc_id"), col("text"), 4, 5)
    }
  }

  test("single shard degenerates to one global stream") {
    val out = Packing.packSequences(fixture, col("doc_id"), col("n_tok"),
      budget = 512L, shards = 1).collect()
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    out.map(_.getAs[Long]("seq_id")).max should be < (total + 511) / 512
    out.map(_.getAs[Long]("shard")).distinct shouldBe Array(0L)
  }
}
