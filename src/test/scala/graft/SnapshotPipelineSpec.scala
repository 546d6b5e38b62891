package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.SnapshotPipeline
import graft.sources.{CardMetadata, Tables}
import graft.sources.CardMetadata.Card

/** End-to-end flagship ETL over synthetic battle logs, asserting the
  * reference's post-load invariants (validate_snapshot.py, SURVEY §5):
  * 8 cards per deck, 0 ≤ wins ≤ uses everywhere, non-empty meta, player
  * count, the topn ≤ meta ≤ 2·topn observation invariant — plus match
  * dedup, override application, and the directional matchup grain. */
class SnapshotPipelineSpec extends SparkSpecBase {

  private val meta = CardMetadata.Meta(
    Card(1, "X-Bow", None, Some(6), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false) +:
      (2L to 16L).map(i => Card(i, s"C$i", None, Some(4),
        isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false)))

  private def part(tag: String, crowns: Int, cardIds: Seq[Long]): Row =
    Row(tag, crowns, cardIds.map(id =>
      Row(id, meta.nameById.getOrElse(id, ""), 0)))

  private val deckX: Seq[Long] = 1L to 8L   // contains X-Bow → Siege
  private val deckY: Seq[Long] = 9L to 16L  // → Hybrid
  private val deckZ: Seq[Long] = 2L to 9L   // → Hybrid

  private def battles: DataFrame = {
    val ranked = Row(72000006L, "Ranked1v1")
    val rows = Seq(
      // match1 from A's log and the SAME match from B's log (dup hash)
      Row("t1", "pathOfLegend", ranked, Seq(part("#A", 3, deckX)), Seq(part("#B", 1, deckY))),
      Row("t1", "pathOfLegend", ranked, Seq(part("#B", 1, deckY)), Seq(part("#A", 3, deckX))),
      // match2: draw between A and C
      Row("t2", "pathOfLegend", ranked, Seq(part("#A", 0, deckX)), Seq(part("#C", 0, deckZ))),
      // rejected: 2v2, wrong mode, 7-card deck
      Row("t3", "pathOfLegend", ranked,
        Seq(part("#A", 1, deckX), part("#D", 1, deckY)), Seq(part("#B", 0, deckZ))),
      Row("t4", "casual", Row(99L, "Casual"), Seq(part("#A", 1, deckX)), Seq(part("#B", 0, deckY))),
      Row("t5", "pathOfLegend", ranked, Seq(part("#B", 1, deckY.take(7))), Seq(part("#C", 0, deckZ)))
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Tables.battleSchema)
  }

  private def leaderboard: DataFrame = {
    import spark.implicits._
    Seq(("#A", "Alice", 1, 3300, 0), ("#B", "Bob", 2, 3200, 0),
      ("#C", "Cara", 3, 3100, 0)).toDF("tag", "name", "rank", "trophies", "eloRating")
  }

  private lazy val snap = SnapshotPipeline.build(spark, battles, leaderboard, meta, topN = 2)

  test("match dedup: duplicate battlelog entries collapse to one match") {
    // 2 valid matches × 2 sides = 4 observations
    snap.metaDeckTypes.agg(sum("uses")).head().getLong(0) shouldBe 4L
  }

  test("every deck has exactly 8 deck_cards rows (invariant 1)") {
    snap.deckCards.groupBy("deck_hash").count()
      .filter(col("count") =!= 8).count() shouldBe 0L
    snap.decks.count() shouldBe 3L
  }

  test("0 <= wins <= uses in every stats table (invariant 2)") {
    for (df <- Seq(snap.playerDecks, snap.metaDeckTypes, snap.metaTypeDeckIds,
        snap.metaTypeCards, snap.playerTypeCards, snap.metaTypeMatchups)) {
      df.filter(col("wins") < 0 || col("wins") > col("uses") || col("uses") < 0)
        .count() shouldBe 0L
    }
  }

  test("meta_deck_types non-empty with expected archetypes (invariant 3)") {
    val types = snap.metaDeckTypes.select("deck_type").collect().map(_.getString(0)).toSet
    types shouldBe Set("Siege", "Hybrid")
  }

  test("player count == topN (invariant 4)") {
    snap.players.count() shouldBe 2L
    snap.players.select("player_tag").collect().map(_.getString(0)).toSet shouldBe Set("#A", "#B")
  }

  test("topn_obs <= meta_obs <= 2*topn_obs (invariant 5)") {
    val topnObs = snap.playerDecks.agg(coalesce(sum("uses"), lit(0L))).head().getLong(0)
    val metaObs = snap.metaDeckTypes.agg(coalesce(sum("uses"), lit(0L))).head().getLong(0)
    topnObs shouldBe 3L // A×2 (match1, match2) + B×1; C excluded by topN
    assert(topnObs <= metaObs && metaObs <= 2 * topnObs)
  }

  test("directional matchup matrix: two rows per match, flipped win") {
    val m = snap.metaTypeMatchups.collect()
      .map(r => (r.getAs[String]("deck_type"), r.getAs[String]("opp_deck_type")) ->
        (r.getAs[Long]("uses"), r.getAs[Long]("wins"))).toMap
    m(("Siege", "Hybrid")) shouldBe ((2L, 1L)) // match1 won, match2 draw
    m(("Hybrid", "Siege")) shouldBe ((2L, 0L))
    m.values.map(_._1).sum shouldBe 4L
  }

  test("per-player facts: wins attributed to the winning side only") {
    val pd = snap.playerDecks.collect()
      .map(r => r.getAs[String]("player_tag") -> (r.getAs[Long]("uses"), r.getAs[Long]("wins"))).toMap
    pd("#A") shouldBe ((2L, 1L)) // won match1, drew match2
    pd("#B") shouldBe ((1L, 0L))
  }

  test("deck_type override replaces the classifier label") {
    val yHash = snap.decks.filter(col("deck_type") === "Hybrid")
      .join(snap.playerDecks.filter(col("player_tag") === "#B"), "deck_hash")
      .select("deck_hash").head().getString(0)
    val withOverride = SnapshotPipeline.build(spark, battles, leaderboard, meta,
      topN = 2, overrides = Map(yHash -> "Bait"))
    withOverride.decks.filter(col("deck_hash") === yHash)
      .select("deck_type").head().getString(0) shouldBe "Bait"
    withOverride.deckTypes.select("deck_type").collect().map(_.getString(0)).toSet should contain("Bait")
  }

  test("overrides from a scanned config TABLE match the literal-map path") {
    import spark.implicits._
    val yHash = snap.decks.filter(col("deck_type") === "Hybrid")
      .join(snap.playerDecks.filter(col("player_tag") === "#B"), "deck_hash")
      .select("deck_hash").head().getString(0)
    val fromMap = SnapshotPipeline.build(spark, battles, leaderboard, meta,
      topN = 2, overrides = Map(yHash -> "Bait"))
    // the table path: deck_type_overrides(deck_hash, deck_type) as the
    // reference re-reads from the warehouse each refresh (etl:150-159) —
    // plus a dirty duplicate row the groupBy-min must collapse
    val ovrTable = Seq((yHash, "Bait"), (yHash, "Bait"), ("no-such-hash", "Siege"))
      .toDF("deck_hash", "deck_type")
    val fromTable = SnapshotPipeline.buildWithOverridesTable(spark, battles,
      leaderboard, meta, topN = 2, overridesTable = ovrTable)
    fromTable.decks.filter(col("deck_hash") === yHash)
      .select("deck_type").head().getString(0) shouldBe "Bait"
    for ((name, df) <- fromTable.all) {
      val expected = fromMap.all(name)
      df.exceptAll(expected).count() shouldBe 0L
      expected.exceptAll(df).count() shouldBe 0L
    }
  }

  test("partitioned snapshot write prunes by deck_type and reads back equal") {
    val out = java.nio.file.Files.createTempDirectory("graft_snap_").toString
    snap.write(out, partitionFacts = true)
    // physical layout: one dir per archetype under the partitioned rollup
    val parts = new java.io.File(s"$out/meta_type_cards").listFiles()
      .filter(_.getName.startsWith("deck_type=")).map(_.getName).toSet
    parts shouldBe Set("deck_type=Siege", "deck_type=Hybrid")
    // contents survive the partitioned roundtrip
    val back = spark.read.parquet(s"$out/meta_type_cards")
      .select("deck_type", "card_id", "card_variant", "uses", "wins")
    back.exceptAll(snap.metaTypeCards
      .select("deck_type", "card_id", "card_variant", "uses", "wins")).count() shouldBe 0L
    // and a single-archetype filter prunes at the partition level (shows
    // up as PartitionFilters on the scan, not a data filter)
    val plan = back.filter(col("deck_type") === "Siege")
      .queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[.*deck_type.* = Siege"
  }

  test("cards dim covers every observed card id with a non-empty name") {
    val ids = snap.cards.select("card_id").collect().map(_.getLong(0)).toSet
    ids shouldBe (1L to 16L).toSet
    snap.cards.filter(col("card_name") === "").count() shouldBe 0L
  }

  test("player_type_cards fan-out: 8 cards per (player, deck) row") {
    // uses sum = 8 × player_decks uses sum (each observation fans to 8 cards)
    val ptcUses = snap.playerTypeCards.agg(sum("uses")).head().getLong(0)
    ptcUses shouldBe 8L * 3L
  }

  test("incremental refresh: additiveMerge of per-batch rollups equals full recompute") {
    // batch boundary chosen so match dedup stays WITHIN a batch (both
    // copies of match1 land in batch A) — additiveMerge's disjointness
    // precondition; a production incremental pipeline dedups new battles
    // against the persisted match-hash set before aggregating
    val all = battles.collect().toSeq
    def df(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), Tables.battleSchema)
    val batchA = df(all.take(2)) // match1 from both players' logs
    val batchB = df(all.drop(2)) // match2 + the rejected shapes
    val snapA = SnapshotPipeline.build(spark, batchA, leaderboard, meta, topN = 2)
    val snapB = SnapshotPipeline.build(spark, batchB, leaderboard, meta, topN = 2)
    val merged = graft.operators.Upsert.additiveMerge(
      snapA.metaDeckTypes, snapB.metaDeckTypes,
      keys = Seq("deck_type"), metrics = Seq("uses", "wins"))
    val full = snap.metaDeckTypes
    merged.exceptAll(full).count() shouldBe 0L
    full.exceptAll(merged).count() shouldBe 0L
  }
}
