package graft

import graft.sources.BattlelogFetch
import graft.sources.BattlelogFetch.Fetcher

case class StubFetcher(responses: Map[String, String]) extends BattlelogFetch.Fetcher {
  def fetch(tag: String): Option[String] = responses.get(tag)
}

class BattlelogFetchSpec extends SparkSpecBase {

  private def battle(team: String, opp: String, crowns: Int): String =
    s"""{"battleTime":"t1","type":"pathOfLegend","gameMode":{"id":72000006,"name":"Ranked"},
       |"team":[{"tag":"$team","crowns":$crowns,"cards":[]}],
       |"opponent":[{"tag":"$opp","crowns":0,"cards":[]}]}""".stripMargin.replace("\n", "")

  test("splitTopLevelArray: handles nesting, strings with braces, garbage") {
    val body = s"""[${battle("#A", "#B", 3)},${battle("#C", "#D", 1)}]"""
    BattlelogFetch.splitTopLevelArray(body).size shouldBe 2
    BattlelogFetch.splitTopLevelArray("""[{"x":"a } ] {","y":[1,2]}]""").toSeq shouldBe
      Seq("""{"x":"a } ] {","y":[1,2]}""")
    BattlelogFetch.splitTopLevelArray("not json").size shouldBe 0
    BattlelogFetch.splitTopLevelArray("[]").size shouldBe 0
  }

  test("fetchBattles fans out, drops failed fetches, parses with the explicit schema") {
    import spark.implicits._
    // standalone case class: the stub must not capture the (non-serializable)
    // suite instance — it ships to executor tasks
    val stub: Fetcher = StubFetcher(Map(
      "#OK1" -> s"""[${battle("#OK1", "#X", 3)},${battle("#OK1", "#Y", 0)}]""",
      "#OK2" -> s"""[${battle("#OK2", "#Z", 2)}]""",
      "#HUH" -> "oops not json"))              // #BAD absent → None → dropped
    val tags = Seq("#OK1", "#OK2", "#BAD", "#HUH").toDS()
    val battles = BattlelogFetch.fetchBattles(spark, tags, stub)
    battles.count() shouldBe 3L
    battles.schema shouldBe graft.sources.Tables.battleSchema
    // flows straight into the pipeline's row-level operators
    val normalized = graft.operators.BattleOps.filterAndNormalize(battles)
    normalized.count() shouldBe 3L
    normalized.select("result").collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("draw", "win", "win")
  }
}
