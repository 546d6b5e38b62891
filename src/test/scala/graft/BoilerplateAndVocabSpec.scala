package graft

import org.apache.spark.sql.functions._

import graft.operators.{Boilerplate, Vocab}

/** Segment-level boilerplate removal semantics on a hand-built corpus;
  * vocabulary ranking determinism and encode round-trip. */
class BoilerplateAndVocabSpec extends SparkSpecBase {

  test("stripSharedSegments drops exactly the >maxDocs segments, in place") {
    import spark.implicits._
    // "x y" opens 3 docs (boilerplate at maxDocs=2); "a b"/"c d"/"e f"
    // are unique payloads; doc 4 is pure boilerplate
    val docs = Seq(
      (1L, "x y a b"),
      (2L, "x y c d"),
      (3L, "x y e f"),
      (4L, "x y")).toDF("doc_id", "text")
    val out = Boilerplate.cleaned(docs, col("doc_id"), col("text"),
        segTokens = 2, maxDocs = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out shouldBe Array(
      (1L, 2L, 1L, "a b"),
      (2L, 2L, 1L, "c d"),
      (3L, 2L, 1L, "e f"),
      (4L, 1L, 1L, ""))
    spark.catalog.clearCache()
  }

  test("stripSharedSegments keeps intra-doc repeats (docfreq is distinct docs)") {
    import spark.implicits._
    // "p q" repeats inside doc 1 but appears in only 2 docs → kept;
    // reassembly must preserve both copies in order
    val docs = Seq(
      (1L, "p q m n p q"),
      (2L, "p q z z")).toDF("doc_id", "text")
    val out = Boilerplate.cleaned(docs, col("doc_id"), col("text"),
        segTokens = 2, maxDocs = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    out shouldBe Array((1L, 0L, "p q m n p q"), (2L, 0L, "p q z z"))
    spark.catalog.clearCache()
  }

  test("stripSharedSegments clamps the final partial segment") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "q")).toDF("doc_id", "text")
    val out = Boilerplate.cleaned(docs, col("doc_id"), col("text"),
        segTokens = 3, maxDocs = 1L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // doc 1 → ["a b c", "d e"]; doc 2 → ["q"]; nothing shared
    out shouldBe Array((1L, 2L, "a b c d e"), (2L, 1L, "q"))
    spark.catalog.clearCache()
  }

  test("vocab ranks by count desc then token asc; maxSize caps; encode maps OOV to 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b rare")).toDF("doc_id", "text")
    val vocab = Vocab.build(docs, col("text"))
    // counts: b=4, a=3, c=1, rare=1 → ids b=1, a=2, c=3, rare=4
    vocab.orderBy("id").collect().map(r => (r.getString(0), r.getLong(2))) shouldBe
      Array(("b", 1L), ("a", 2L), ("c", 3L), ("rare", 4L))

    val capped = Vocab.build(docs, col("text"), maxSize = 2L)
    capped.count() shouldBe 2L
    val enc = Vocab.encoded(docs, col("doc_id"), col("text"), capped)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2 = "a b rare" → ids (2, 1, 0) at positions 1..3
    enc.filter(_._1 == 2L) shouldBe Array((2L, 1L, 2L), (2L, 2L, 1L), (2L, 3L, 0L))

    val stats = Vocab.encodeStats(docs, col("doc_id"), col("text"), capped)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2: n_tok 3, oov 1 (rare), enc_sum = 1*2 + 2*1 + 3*0 = 4
    stats(1) shouldBe ((2L, 3L, 1L, 4L))
    // doc 1 = b b b a a c → capped ids (1,1,1,2,2,0): sum pos*id =
    // 1+2+3 + 4*2+5*2 + 0 = 24, oov 1 (c)
    stats(0) shouldBe ((1L, 6L, 1L, 24L))
  }

  test("vocab build is shard-invariant: same global ids at every rankShards") {
    import spark.implicits._
    // mirror of DataloaderSpec's shard-invariance pin: the sharded rank
    // (range repartition on the sort key + per-shard row_number +
    // broadcast base offsets) must produce the EXACT single-window ids
    // regardless of shard count — including shards ≫ vocab (empty
    // shards) and shard boundaries landing mid-count-run
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val reference = Vocab.build(docs, col("text"), rankShards = 1)
      .orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    reference.length should be > 20 // fixture texts draw from a small word pool
    // ids are a 1..|V| permutation ordered by (cnt desc, token asc)
    reference.map(_._3) shouldBe (1L to reference.length.toLong).toArray
    reference.sliding(2).foreach { case Array((ta, ca, _), (tb, cb, _)) =>
      assert(ca > cb || (ca == cb && ta < tb))
    }
    for (shards <- Seq(3, 7, 1000)) {
      val sharded = Vocab.build(docs, col("text"), rankShards = shards)
        .orderBy("id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      sharded shouldBe reference
    }
    // the maxSize cap composes with the sharded rank
    val capped = Vocab.build(docs, col("text"), maxSize = 10L, rankShards = 7)
      .orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    capped shouldBe reference.take(10)
    spark.catalog.clearCache()
  }

  test("boilerplate removal: shuffle-join path ≡ forced-broadcast path") {
    import spark.implicits._
    // the broadcast hint is a pure physical-strategy knob (object
    // scaladoc point 2): at cleaning thresholds the boilerplate set is
    // corpus-scale and must NOT be force-broadcast, so the default
    // shuffle path has to be row-identical to the broadcast path
    val docs = (1L to 40L).map { i =>
      val payload = s"u$i v$i w$i"
      (i, if (i % 2 == 0) s"x y z $payload" else s"x y z $payload x y z")
    }.toDF("doc_id", "text")
    val plain = Boilerplate.stripSharedSegments(docs, col("doc_id"),
        col("text"), segTokens = 3, maxDocs = 2L, broadcastBoiler = false)
      .orderBy("doc_id").collect()
    val bcast = Boilerplate.stripSharedSegments(docs, col("doc_id"),
        col("text"), segTokens = 3, maxDocs = 2L, broadcastBoiler = true)
      .orderBy("doc_id").collect()
    plain should have length 40
    plain shouldBe bcast
    spark.catalog.clearCache()
  }

  test("vocab encode: shuffle-join path ≡ broadcast path") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"the quick tok$i fox tok$i"))
      .toDF("doc_id", "text")
    val vocab = Vocab.build(docs, col("text"), maxSize = 10L)
    val bcast = Vocab.encodeStats(docs, col("doc_id"), col("text"), vocab,
      broadcastVocab = true).orderBy("doc_id").collect()
    val plain = Vocab.encodeStats(docs, col("doc_id"), col("text"), vocab,
      broadcastVocab = false).orderBy("doc_id").collect()
    bcast should have length 30
    bcast shouldBe plain
  }

  test("vocab minCount excludes rare tokens from the vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val v = Vocab.build(docs, col("text"), minCount = 2L)
    v.collect().map(_.getString(0)) shouldBe Array("a")
  }
}
