package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.SnapshotPipeline
import graft.sources.{CardMetadata, Tables}
import graft.sources.CardMetadata.Card

/** Randomized invariant properties over generated battle sets (SURVEY §5
  * test plan): for ANY input the snapshot must satisfy the reference's
  * invariants, dedup must be idempotent, and the matchup grain must tie
  * out against the per-type rollup. Fixed seeds keep runs deterministic. */
class PipelinePropertiesSpec extends SparkSpecBase {

  private val meta = CardMetadata.Meta(
    (1L to 20L).map(i => Card(i, s"C$i", None, Some((i % 6 + 1).toInt),
      isBigTank = i == 20, isBaitPiece = i <= 3, isBridgeSpamPiece = i % 7 == 0)))

  private def genBattles(seed: Long, n: Int): DataFrame = {
    val rnd = new Random(seed)
    val tags = (1 to 6).map(i => s"#P$i")
    def deck(): Seq[Long] = rnd.shuffle((1L to 20L).toList).take(8)
    def part(tag: String, crowns: Int, ids: Seq[Long]): Row =
      Row(tag, crowns, ids.map(id => Row(id, s"C$id", rnd.nextInt(3))))
    val rows = (0 until n).flatMap { i =>
      val Seq(a, b) = rnd.shuffle(tags.toList).take(2)
      val (ca, cb) = (rnd.nextInt(4), rnd.nextInt(4))
      val (da, db) = (deck(), deck())
      val modeId = if (rnd.nextInt(10) == 0) 99L else 72000006L // some invalid
      val base = Row(s"t$i", "pathOfLegend", Row(modeId, "Ranked"),
        Seq(part(a, ca, da)), Seq(part(b, cb, db)))
      // ~half the matches also appear from the other player's perspective
      if (rnd.nextBoolean())
        Seq(base, Row(s"t$i", "pathOfLegend", Row(modeId, "Ranked"),
          Seq(part(b, cb, db)), Seq(part(a, ca, da))))
      else Seq(base)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Tables.battleSchema)
  }

  private def leaderboard: DataFrame = {
    import spark.implicits._
    (1 to 6).map(i => (s"#P$i", s"P$i", i, 4000 - i * 10, 0))
      .toDF("tag", "name", "rank", "trophies", "eloRating")
  }

  private def statsTables(s: SnapshotPipeline.Snapshot) = Seq(
    s.playerDecks, s.metaDeckTypes, s.metaTypeDeckIds,
    s.metaTypeCards, s.playerTypeCards, s.metaTypeMatchups)

  test("invariants hold for arbitrary generated battle sets") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val snap = SnapshotPipeline.build(spark, genBattles(seed, 40),
        leaderboard, meta, topN = 6)
      withClue(s"seed=$seed: ") {
        for (t <- statsTables(snap))
          t.filter(col("wins") < 0 || col("uses") < 0 || col("wins") > col("uses"))
            .count() shouldBe 0L
        snap.deckCards.groupBy("deck_hash").count()
          .filter(col("count") =!= 8).count() shouldBe 0L
        val topnObs = snap.playerDecks.agg(coalesce(sum("uses"), lit(0L))).head().getLong(0)
        val metaObs = snap.metaDeckTypes.agg(coalesce(sum("uses"), lit(0L))).head().getLong(0)
        assert(topnObs <= metaObs && metaObs <= 2 * topnObs,
          s"obs invariant: $topnObs vs $metaObs")
        // matchup matrix is the same observations keyed by (type, opp type)
        val matchupObs = snap.metaTypeMatchups.agg(coalesce(sum("uses"), lit(0L))).head().getLong(0)
        matchupObs shouldBe metaObs
        val matchupWins = snap.metaTypeMatchups.agg(coalesce(sum("wins"), lit(0L))).head().getLong(0)
        val metaWins = snap.metaDeckTypes.agg(coalesce(sum("wins"), lit(0L))).head().getLong(0)
        matchupWins shouldBe metaWins
      }
    }
  }

  test("dedup is idempotent: battles ∪ battles produces the identical snapshot") {
    val battles = genBattles(11L, 25)
    val once = SnapshotPipeline.build(spark, battles, leaderboard, meta, topN = 6)
    val twice = SnapshotPipeline.build(spark, battles.unionByName(battles),
      leaderboard, meta, topN = 6)
    for ((name, a) <- once.all) {
      val b = twice.all(name)
      withClue(s"table $name: ") {
        a.exceptAll(b).count() shouldBe 0L
        b.exceptAll(a).count() shouldBe 0L
      }
    }
  }
}
