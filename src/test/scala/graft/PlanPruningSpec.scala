package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Column-pruning plan assertions: a scan that reads columns the query
  * never references is wrong at any scale and fatal at 100 TB — parquet
  * is columnar, so pruning is the difference between reading 2 columns
  * and reading 10. These tests pin `requiredSchema` on the physical scan
  * node (no execution needed), so a regression that breaks pruning —
  * e.g. an opaque expression hiding column references from the optimizer
  * — fails loudly. */
class PlanPruningSpec extends SparkSpecBase {

  private def allScans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec => Seq(f)
      // persisted frames wrap their scan in an InMemoryRelation — the
      // pruning contract applies to the scan that FILLS the cache
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        allScans(m.relation.cachedPlan)
      // AQE wraps plans in a leaf node collect() will not enter
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      // an already-EXECUTED adaptive plan (an eager operator's cached
      // frame) wraps each stage in another collect()-opaque leaf
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
    }.flatten

  private def scanSchemasOf(
      df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
    allScans(df.queryExecution.sparkPlan).map { f =>
      val table = f.relation.location.rootPaths.head.getName
        .stripSuffix(".parquet")
      table -> f.requiredSchema.fieldNames.toSet
    }.toMap

  private def scanSchemas(name: String): Map[String, Set[String]] =
    scanSchemasOf(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))

  test("q26 language-ID reads only (text, lang) from documents") {
    scanSchemas("q26_language_id")("documents") shouldBe Set("text", "lang")
  }

  test("q55 cross-doc n-grams reads only (doc_id, text) from documents") {
    scanSchemas("q55_dup_ngrams")("documents") shouldBe Set("doc_id", "text")
  }

  test("q01 star join never reads unused fact or dim columns") {
    val schemas = scanSchemas("q01_top_deck_types")
    schemas("lineitem") shouldBe Set("l_partkey", "l_returnflag")
    schemas("part") shouldBe Set("p_partkey", "p_brand")
  }

  test("q71 sequence packing reads only (doc_id, text) from documents") {
    scanSchemas("q71_sequence_pack")("documents") shouldBe Set("doc_id", "text")
  }

  test("q73 BM25: every documents scan prunes to ⊆ (doc_id, text)") {
    // q73 scans documents twice (tf projection + corpus-stats aggregate);
    // the stats side needs only `text`, so assert per-scan subsets rather
    // than one merged schema — any wider read means the literal-term
    // filters leaked extra references
    val df = SparkEntry.queries("q73_bm25_search")(spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.head.getName
            .startsWith("documents") =>
        f.requiredSchema.fieldNames.toSet
    }
    scans should not be empty
    scans.foreach(s => s.subsetOf(Set("doc_id", "text")) shouldBe true)
    scans.exists(_.contains("doc_id")) shouldBe true
  }

  test("q164 decontaminated selection: every documents scan prunes to ⊆ (doc_id, source, text)") {
    // the screen + selection chain never touches lang or n_chars; the
    // final plan holds several documents scans (bench grams, candidate
    // screen, gated chain) — assert per-scan subsets (the q73 pattern)
    val df = SparkEntry.queries("q164_decontaminated_selection")(
      spark, "/root/testdata/sf0.001")
    val scans = allScans(df.queryExecution.sparkPlan).collect {
      case f if f.relation.location.rootPaths.head.getName
          .startsWith("documents") =>
        f.requiredSchema.fieldNames.toSet
    }
    scans should not be empty
    scans.foreach(s =>
      assert(s.subsetOf(Set("doc_id", "source", "text")), s.toString))
    scans.exists(_.contains("source")) shouldBe true
  }

  test("q76 top-fraction gate reads only (doc_id, lang, n_chars)") {
    scanSchemas("q76_top_fraction")("documents") shouldBe
      Set("doc_id", "lang", "n_chars")
  }

  test("q81 span removal reads only (doc_id, text) from documents") {
    scanSchemas("q81_span_removal")("documents") shouldBe Set("doc_id", "text")
  }

  test("q82 packed slices reads only (doc_id, text) from documents") {
    scanSchemas("q82_packed_slices")("documents") shouldBe Set("doc_id", "text")
  }

  test("q83 BPE merge reads only (doc_id, text) from documents") {
    scanSchemas("q83_bpe_merge")("documents") shouldBe Set("doc_id", "text")
  }

  test("q88 split leakage reads only (doc_id, text) from documents") {
    scanSchemas("q88_split_leakage")("documents") shouldBe Set("doc_id", "text")
  }

  test("q91 interleave reads only (doc_id, lang) from documents") {
    scanSchemas("q91_interleave_order")("documents") shouldBe Set("doc_id", "lang")
  }

  test("q92 length batches reads only (doc_id, text) from documents") {
    scanSchemas("q92_length_batches")("documents") shouldBe Set("doc_id", "text")
  }

  test("q96 PII redaction reads only (doc_id, text) from documents") {
    scanSchemas("q96_pii_redaction")("documents") shouldBe Set("doc_id", "text")
  }

  test("q97 winnowing reads only (doc_id, text) from documents") {
    scanSchemas("q97_winnowing_pairs")("documents") shouldBe Set("doc_id", "text")
  }

  test("q105 frame sampling reads only (doc_id, text) from documents") {
    scanSchemas("q105_frame_sample")("documents") shouldBe Set("doc_id", "text")
  }

  test("q106 span corruption reads only (doc_id, text) from documents") {
    scanSchemas("q106_span_corruption")("documents") shouldBe Set("doc_id", "text")
  }

  test("q107 surprisal reads only (doc_id, text) from documents") {
    scanSchemas("q107_unigram_surprisal")("documents") shouldBe Set("doc_id", "text")
  }

  test("q108 negatives reads only (doc_id, lang) from documents") {
    scanSchemas("q108_modular_negatives")("documents") shouldBe Set("doc_id", "lang")
  }

  /** q109's probe pipeline EXECUTES eagerly (admitCore localCheckpoints
    * the survivor frame), so the documents/index scans never appear in
    * the returned frame's plan — they ran already. Harvest the physical
    * scans from every execution instead: a QueryExecutionListener sees
    * each action's executedPlan, including the eager checkpoint's.
    * Listener delivery is async (the listener bus), hence the bounded
    * poll after the action completes. */
  private def executedScans(body: => Unit): Seq[FileSourceScanExec] = {
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[FileSourceScanExec]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        allScans(qe.executedPlan).foreach(captured.add)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      // wait for the async bus to QUIESCE, not merely for the first
      // event: a multi-action body (eager checkpoints + the final
      // collect) delivers several executions, and reading after the
      // first would race the later ones' scans
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      var stable = 0
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = captured.size
        if (n == last && n > 0) stable += 1 else stable = 0
        last = n
      }
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    captured.iterator().asScala.toSeq
  }

  test("q109 incremental admit reads only (doc_id, text) from documents") {
    val scans = executedScans {
      SparkEntry.queries("q109_incremental_admit")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }
    val docScans = scans.filter(
      _.relation.location.rootPaths.head.getName.startsWith("documents"))
      .map(_.requiredSchema.fieldNames.toSet)
    docScans should not be empty
    docScans.foreach(s => s.subsetOf(Set("doc_id", "text")) shouldBe true)
  }

  test("q110 chunking reads only (doc_id, text) from documents") {
    scanSchemas("q110_overlapping_chunks")("documents") shouldBe Set("doc_id", "text")
  }

  test("q118 temperature mix never reads the unused text column") {
    // the gate + final agg need (doc_id, source, n_chars) only — text
    // dragging along would make a scan-fused sampler corpus-bytes-bound
    scanSchemas("q118_temperature_mix")("documents") shouldBe
      Set("doc_id", "source", "n_chars")
  }

  test("ANN queries prune the unused label column from embeddings") {
    for (q <- Seq("q20_knn_bruteforce", "q28_ann_srp", "q119_ann_recall")) {
      val s = scanSchemas(q)("embeddings")
      s.subsetOf(Set("vec_id", "embedding")) shouldBe true
    }
  }

  test("q124 CMS heavy hitters reads only text from documents") {
    // eager entry (localCheckpoint + cache release) — harvest scans from
    // the execution listener
    val scans = executedScans {
      SparkEntry.queries("q124_cms_heavy_hitters")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }.filter(
      _.relation.location.rootPaths.head.getName.startsWith("documents"))
      .map(_.requiredSchema.fieldNames.toSet)
    scans should not be empty
    scans.foreach(_ shouldBe Set("text"))
  }

  test("q126 Bloom pre-screen reads only (doc_id, text) from documents") {
    scanSchemas("q126_bloom_contamination")("documents") shouldBe
      Set("doc_id", "text")
  }

  test("q127 semantic pair join prunes the unused label column from embeddings") {
    // the assignment stage is pinned eagerly inside semanticNearDupPairs
    // (localCheckpoint, so repeated invocations don't accumulate cache
    // entries) — its corpus scan surfaces through the execution listener
    val scans = executedScans {
      graft.operators.Dedup.semanticNearDupPairs(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        nCells = 4, threshold = 0.35).collect()
      ()
    }.filter(
      _.relation.location.rootPaths.head.getName.startsWith("embeddings"))
      .map(_.requiredSchema.fieldNames.toSet)
    scans should not be empty
    scans.foreach(s => s.subsetOf(Set("vec_id", "embedding")) shouldBe true)
  }

  test("q130 model gate reads only (doc_id, text) from documents") {
    scanSchemas("q130_model_quality_gate")("documents") shouldBe
      Set("doc_id", "text")
  }

  test("q131 recall audit: every documents scan prunes to ⊆ (doc_id, text)") {
    val df = SparkEntry.queries("q131_dedup_recall")(spark, "/root/testdata/sf0.001")
    val scans = allScans(df.queryExecution.sparkPlan).filter(
      _.relation.location.rootPaths.head.getName.startsWith("documents"))
    scans should not be empty
    scans.foreach(
      _.requiredSchema.fieldNames.toSet.subsetOf(Set("doc_id", "text")) shouldBe true)
  }

  test("q99 z-order reads only (l_partkey, l_suppkey) from lineitem") {
    scanSchemas("q99_zorder_layout")("lineitem") shouldBe
      Set("l_partkey", "l_suppkey")
  }

  test("q111 merged KMV reads only (event_type, user_id) from events") {
    scanSchemas("q111_kmv_merged_shards")("events") shouldBe
      Set("event_type", "user_id")
  }

  test("q113 3-dim z-order reads only its three lineitem columns") {
    scanSchemas("q113_zorder_3d")("lineitem") shouldBe
      Set("l_partkey", "l_suppkey", "l_quantity")
  }

  test("q115 fuzzy join reads only (doc_id, text, source) from documents") {
    scanSchemas("q115_fuzzy_join")("documents") shouldBe
      Set("doc_id", "text", "source")
  }

  /** Per-scan pruning over a multi-scan chain: every documents scan must
    * stay within the columns the chain consumes, and none may drag the
    * unused `source` column along — asserted per scan because different
    * stages rightly prune to different subsets (the shingle pass reads
    * (doc_id, text); the gate reads the metadata columns). */
  private def assertDocScansWithin(name: String, allowed: Set[String]): Unit = {
    // executedScans rather than the returned frame's plan: q112
    // materializes eagerly (localCheckpoint + cache release), so its
    // scans only surface through the execution listener; for the lazy
    // chains the collect's own execution carries the same scans
    val docScans = executedScans {
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").collect()
      ()
    }.filter {
      f => f.relation.location.rootPaths.head.getName.startsWith("documents")
    }.map(_.requiredSchema.fieldNames.toSet)
    docScans should not be empty
    docScans.foreach(s => s.subsetOf(allowed) shouldBe true)
    docScans.foreach(s => s should not contain "source")
  }

  test("q112 clean→pack→interleave never reads the unused source column") {
    assertDocScansWithin("q112_clean_pack_interleave",
      Set("doc_id", "lang", "text", "n_chars"))
  }

  test("q114 winnowing-policy clean never reads the unused source column") {
    assertDocScansWithin("q114_clean_winnowing",
      Set("doc_id", "lang", "text", "n_chars"))
  }

  test("q120/q121/q133 index probes: embeddings pruned to (vec_id, embedding); artifact scans to sketch columns") {
    // the probe's query side is pinned via eager localCheckpoint (the
    // cache-release discipline), so its embeddings scan only surfaces
    // through the execution listener
    for (q <- Seq("q120_ann_index_probe", "q121_ann_index_append",
        "q133_trained_index_probe")) {
      val scans = executedScans {
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").collect()
        ()
      }
      val emb = scans.filter(
        _.relation.location.rootPaths.head.getName.startsWith("embeddings"))
        .map(_.requiredSchema.fieldNames.toSet)
      emb should not be empty
      emb.foreach(s => s.subsetOf(Set("vec_id", "embedding")) shouldBe true)
      // cell is the partition column on the seed artifact (absent from
      // requiredSchema); streamed rows may carry it as data
      val asg = scans.filter(
        _.relation.location.rootPaths.head.getName.startsWith("assignments"))
        .map(_.requiredSchema.fieldNames.toSet)
      asg should not be empty
      asg.foreach(s =>
        s.subsetOf(Set("vec_id", "embedding", "c_norm", "cell")) shouldBe true)
    }
  }

  test("q123 reduced-dim recall prunes the unused label column from embeddings") {
    scanSchemas("q123_reduced_ann_recall")("embeddings")
      .subsetOf(Set("vec_id", "embedding")) shouldBe true
  }

  test("q129 k-means training scans read only (vec_id, embedding)") {
    // the trainer is eager (per-round localCheckpoint) — harvest every
    // round's scans from the execution listener
    val scans = executedScans {
      SparkEntry.queries("q129_kmeans_train")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }.filter(
      _.relation.location.rootPaths.head.getName.startsWith("embeddings"))
      .map(_.requiredSchema.fieldNames.toSet)
    scans should not be empty
    scans.foreach(s => s.subsetOf(Set("vec_id", "embedding")) shouldBe true)
    // and the projection the trainer scans through is itself pinned
    scanSchemasOf(graft.operators.Similarity.lloydVecs(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")))(
      "embeddings") shouldBe Set("vec_id", "embedding")
  }

  test("q132 dataset card: every documents scan prunes to the card's four columns") {
    val scans = executedScans {
      SparkEntry.queries("q132_dataset_card")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }.filter(
      _.relation.location.rootPaths.head.getName.startsWith("documents"))
      .map(_.requiredSchema.fieldNames.toSet)
    scans should not be empty
    scans.foreach(s =>
      s.subsetOf(Set("doc_id", "source", "n_chars", "text")) shouldBe true)
    scans.foreach(s => s should not contain "lang")
  }

  test("q125 streaming heavy hitters: every event-bearing scan prunes to user_id") {
    // landing scans (the micro-batch source) and the exact-top leg both
    // carry user_id; neither may drag ts/value/props along — the sketch
    // path's whole point is that only the item column crosses the scan
    val fullEventSchema =
      Set("event_id", "ts", "user_id", "event_type", "value", "props")
    val scans = executedScans {
      SparkEntry.queries("q125_streaming_heavy_hitters")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }.map(_.requiredSchema.fieldNames.toSet)
      .filter(_.contains("user_id"))
    // the once-per-JVM landing STAGING copy legitimately reads the whole
    // table (it writes the whole table); every other user_id-bearing scan
    // — the micro-batch source reads and the exact-top leg — must carry
    // user_id alone
    val pruned = scans.filterNot(_ == fullEventSchema)
    pruned should not be empty
    pruned.foreach(s => s.subsetOf(Set("user_id")) shouldBe true)
  }

  test("q128 streaming semantic admission: no scan reads label; vector scans prune to index columns") {
    val scans = executedScans {
      SparkEntry.queries("q128_streaming_semantic_admission")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }.map(_.requiredSchema.fieldNames.toSet)
    scans should not be empty
    scans.foreach(s => s should not contain "label")
    val vecScans = scans.filter(_.contains("embedding"))
    vecScans should not be empty
    vecScans.foreach(s =>
      s.subsetOf(Set("vec_id", "embedding", "c_norm", "cell")) shouldBe true)
  }

  test("q109 admission probe never rescans corpus text from the index artifact") {
    // the no-corpus-rescan shape (shared by q116's per-batch probe, which
    // runs this same operator against the same artifact layout): every
    // scan of the standing signature index must prune to sketch columns —
    // (doc_id, sh, bands) plus the embedded p_* params — and the corpus
    // TEXT may only ever be read for the new batch, from documents
    val scans = executedScans {
      SparkEntry.queries("q109_incremental_admit")(
        spark, "/root/testdata/sf0.001").collect()
      ()
    }
    val indexScans = scans.filter {
      f => !f.relation.location.rootPaths.head.getName.startsWith("documents")
    }
    indexScans should not be empty
    val sketchCols =
      Set("doc_id", "sh", "bands", "p_shingle_n", "p_k", "p_rows_per_band")
    indexScans.foreach { f =>
      f.requiredSchema.fieldNames.toSet.subsetOf(sketchCols) shouldBe true
      f.requiredSchema.fieldNames.toSet should not contain "text"
    }
  }
}
