package graft

import org.apache.spark.sql.functions._
import graft.operators.{Maintenance, Upsert}

class MaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def partFiles(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("compact: small-file table rewritten to one file, rows and applied-marker intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val path = s"$dir/t"
    val df = (1L to 500L).map(i => (i, s"row_$i")).toDF("id", "payload")
    // seed through mergeParquet with a batchId so the applied-marker exists
    Upsert.mergeParquet(spark, path, df.repartition(10), batchId = Some(7L))((_, u) => u)
    partFiles(path).size shouldBe 10
    val before = spark.read.parquet(path).orderBy("id").collect().toSeq

    val n = Maintenance.compact(spark, path, targetFileBytes = 1L << 30)
    n shouldBe 1
    partFiles(path).size shouldBe 1
    spark.read.parquet(path).orderBy("id").collect().toSeq shouldBe before
    // the streaming-rollup idempotence marker must survive the rewrite
    Upsert.appliedBatches(path) shouldBe Set(7L)
  }

  test("compactTree carries hidden state dirs (pending tombstones) across the fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctree_hidden_").toString
    val path = s"$dir/ix"
    (1L to 50L).map(i => (i, s"a_$i")).toDF("doc_id", "payload")
      .write.parquet(s"$path/seed")
    (51L to 60L).map(i => (i, s"b_$i")).toDF("doc_id", "payload")
      .write.parquet(s"$path/batch-0")
    // a pending delete: hidden from the data read, but it is LIFECYCLE
    // state — the fold must not silently drop it with the old tree
    Seq(3L, 7L).toDF("doc_id")
      .write.parquet(s"$path/_tombstones")
    val n = Maintenance.compactTree(spark, path, targetFileBytes = 1L << 30)
    n shouldBe 1
    // folded data = seed ∪ batch (tombstones are NOT folded as data)
    spark.read.parquet(path).count() shouldBe 60L
    // and the tombstone table survived the swap intact
    spark.read.parquet(s"$path/_tombstones")
      .as[Long].collect().toSet shouldBe Set(3L, 7L)
  }

  test("a crash mid-carry never loses carried state: recovery un-carries journaled moves, restores tombstones intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctree_crash_").toString
    val path = s"$dir/ix"
    (1L to 50L).map(i => (i, s"a_$i")).toDF("doc_id", "payload")
      .write.parquet(s"$path/seed")
    Seq(3L, 7L).toDF("doc_id").write.parquet(s"$path/_tombstones")
    // simulate a fold that died BETWEEN the stage-out rename and the
    // final swap, mid-carry: `_tombstones` has already MOVED from __old
    // into __staged under the carry journal — restoring __old without
    // un-carrying would lose the takedowns to the next scratch-clear
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    (1L to 50L).map(i => (i, s"a_$i")).toDF("doc_id", "payload")
      .write.parquet(path + "__staged")
    graft.operators.Fs.writeText(path + "__carry", "_tombstones")
    new java.io.File(path + "__old/_tombstones")
      .renameTo(new java.io.File(path + "__staged/_tombstones")) shouldBe true
    // recovery moves the journaled entry back, restores the COMPLETE
    // old tree — takedowns intact...
    graft.operators.Fs.recoverStagedSwap(path)
    spark.read.parquet(s"$path/_tombstones")
      .as[Long].collect().toSet shouldBe Set(3L, 7L)
    new java.io.File(path + "__carry").exists() shouldBe false
    // ...and the next fold still carries them across its own swap
    Maintenance.compactTree(spark, path, targetFileBytes = 1L << 30) shouldBe 1
    spark.read.parquet(s"$path/_tombstones")
      .as[Long].collect().toSet shouldBe Set(3L, 7L)
    spark.read.parquet(path).count() shouldBe 50L
  }

  test("a crash before any carry move (journal written, entries still in __old) recovers the complete tree") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctree_crash0_").toString
    val path = s"$dir/ix"
    (1L to 50L).map(i => (i, s"a_$i")).toDF("doc_id", "payload")
      .write.parquet(s"$path/seed")
    Seq(3L, 7L).toDF("doc_id").write.parquet(s"$path/_tombstones")
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    (1L to 50L).map(i => (i, s"a_$i")).toDF("doc_id", "payload")
      .write.parquet(path + "__staged")
    graft.operators.Fs.writeText(path + "__carry", "_tombstones")
    graft.operators.Fs.recoverStagedSwap(path)
    spark.read.parquet(s"$path/_tombstones")
      .as[Long].collect().toSet shouldBe Set(3L, 7L)
    spark.read.parquet(s"$path/seed").count() shouldBe 50L
  }

  test("a crash after the final swap (stale __old + stale journal, target present) is pure garbage: recovery no-ops, the next fold clears it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctree_crash2_").toString
    val path = s"$dir/ix"
    (1L to 50L).map(i => (i, s"a_$i")).toDF("doc_id", "payload")
      .write.parquet(s"$path/seed")
    Seq(3L, 7L).toDF("doc_id").write.parquet(s"$path/_tombstones")
    // simulate: the swap committed (target present, carried entries in
    // it) but the crash hit before the __old/journal cleanup
    (1L to 40L).map(i => (i, s"stale_$i")).toDF("doc_id", "payload")
      .write.parquet(path + "__old")
    graft.operators.Fs.writeText(path + "__carry", "_tombstones")
    graft.operators.Fs.recoverStagedSwap(path) // target present → no-op
    spark.read.parquet(s"$path/_tombstones")
      .as[Long].collect().toSet shouldBe Set(3L, 7L)
    Maintenance.compactTree(spark, path, targetFileBytes = 1L << 30) shouldBe 1
    new java.io.File(path + "__old").exists() shouldBe false
    new java.io.File(path + "__carry").exists() shouldBe false
    spark.read.parquet(path).count() shouldBe 50L
    spark.read.parquet(s"$path/_tombstones")
      .as[Long].collect().toSet shouldBe Set(3L, 7L)
  }

  test("compact recovers a table stranded mid-swap before reading it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_crash_").toString
    val path = s"$dir/t"
    val df = (1L to 100L).map(i => (i, s"row_$i")).toDF("id", "payload")
    Upsert.mergeParquet(spark, path, df.repartition(4))((_, u) => u)
    // simulate a crash between the two swap renames of a PRIOR rewrite:
    // target moved to __old, replacement never landed — compact must
    // restore it before sizing/reading, or the read fails on a
    // recoverable table
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    val n = Maintenance.compact(spark, path, targetFileBytes = 1L << 30)
    n shouldBe 1
    spark.read.parquet(path).count() shouldBe 100L
  }

  test("compact(clusterBy): files own disjoint key ranges for min/max skipping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val path = s"$dir/t"
    // shuffled keys across many small files — the worst case for pruning
    (1L to 2000L).map(i => (i * 7919 % 2000, i)).toDF("k", "v")
      .repartition(16).write.parquet(path)
    partFiles(path).size shouldBe 16

    val bytes = Maintenance.tableBytes(path)
    val n = Maintenance.compact(spark, path,
      targetFileBytes = bytes / 4 + 1, clusterBy = Seq("k"))
    n should be >= 2
    partFiles(path).size shouldBe n
    // each output file covers a k-range disjoint from every other file —
    // exactly what lets parquet footer min/max stats skip whole files on
    // selective k predicates
    val ranges = partFiles(path).map { f =>
      val r = spark.read.parquet(f.getPath).agg(min("k"), max("k")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => lo should be > hi
      case _ => ()
    }
    spark.read.parquet(path).count() shouldBe 2000L
  }

  test("compact(zOrderBy): file min/max stats prune on the SECOND dimension too") {
    // a 64×64 (x, y) grid shuffled across small files: a single-column
    // cluster on x makes every file span y's FULL range (no pruning on
    // y); the Morton-key cluster bounds both, so a selective y predicate
    // skips most files by footer stats alone — the q113 bucket report
    // landed in an actual write path
    val grid = for { x <- 0L until 64L; y <- 0L until 64L }
      yield (x, y, x * 64 + y)
    def seed(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zcompact_").toString
      val path = s"$dir/t"
      grid.toDF("x", "y", "payload").orderBy(rand(7)) // kill any incidental order
        .repartition(16).write.parquet(path)
      path
    }
    // per-file [min,max] of a column; a file is PRUNED for predicate
    // col = v when v falls outside its range — what footer stats give
    def survivors(path: String, column: String, v: Long): Int =
      partFiles(path).count { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(column), max(column)).head
        r.getLong(0) <= v && v <= r.getLong(1)
      }

    val xOnly = seed()
    val bx = Maintenance.tableBytes(xOnly)
    Maintenance.compact(spark, xOnly, targetFileBytes = bx / 16 + 1,
      clusterBy = Seq("x")) should be >= 8
    val zOrdered = seed()
    val bz = Maintenance.tableBytes(zOrdered)
    val n = Maintenance.compact(spark, zOrdered, targetFileBytes = bz / 16 + 1,
      zOrderBy = Seq("x", "y"), zBits = 6)
    n should be >= 8

    val files = partFiles(zOrdered).size
    // single-column layout: y stats are useless — every file survives a
    // y predicate
    survivors(xOnly, "y", 17L) shouldBe partFiles(xOnly).size
    // z-order: BOTH dimensions prune by footer stats (≤ ~2/√files of
    // the tree survives a point predicate on either axis)
    survivors(zOrdered, "x", 17L) should be < files
    val ySurvivors = survivors(zOrdered, "y", 17L)
    ySurvivors should be < files
    ySurvivors should be <= (files / 2)
    // the rewrite is still the same table
    spark.read.parquet(zOrdered).orderBy("payload").collect() shouldBe
      grid.toDF("x", "y", "payload").orderBy("payload").collect()
  }

  test("compactTree refuses a pointer-committed root — the fold would union generations and drop the pointer file") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ctree_ptr_").toString + "/tbl"
    graft.operators.Fs.publishGeneration(root) { gen =>
      Seq((1L, "a")).toDF("id", "v").write.parquet(s"$gen/seed")
    }
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Maintenance.compactTree(spark, root)
    }
    ex.getMessage should include("pointer-committed")
    // untouched: pointer still names gen-1, data intact
    graft.operators.Fs.currentGeneration(root).get should endWith("gen-1")
    spark.read.parquet(s"$root/gen-1/seed").count() shouldBe 1L
  }
}
