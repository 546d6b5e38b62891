package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Byte-compatibility with the reference's hashing (hash_utils.py):
  * the canonical signature string format, lexicographic string ordering of
  * card ids, and the compact sorted-key JSON fed to the match hash.
  */
class HashingSpec extends SparkSpecBase {
  import spark.implicits._

  private def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("canonical deck signature sorts (id-as-string, variant) pairs") {
    // "10001" < "9" lexicographically — the reference sorts STRING ids
    // (hash_utils.py:21), so 10001 must come first.
    val df = Seq(Tuple1(Seq(("9", "normal"), ("10001", "evo")))).toDF("pairs")
    val sig = df.select(Hashing.canonicalDeckSignature(col("pairs")).as("s"))
      .head().getString(0)
    sig shouldBe "10001:evo|9:normal"
  }

  test("variant breaks ties within equal ids") {
    val df = Seq(Tuple1(Seq(("5", "normal"), ("5", "evo")))).toDF("pairs")
    df.select(Hashing.canonicalDeckSignature(col("pairs")).as("s"))
      .head().getString(0) shouldBe "5:evo|5:normal"
  }

  test("deck hash = sha1 hex of the signature bytes") {
    val df = Seq(Tuple1(Seq(("26000021", "normal"), ("10001", "evo")))).toDF("pairs")
    val out = df.select(Hashing.deckHash(col("pairs")).as("h")).head().getString(0)
    out shouldBe sha1Hex("10001:evo|26000021:normal")
  }

  test("match hash reproduces Python json.dumps(sort_keys, compact) bytes") {
    val battles = Seq(
      ("20250101T103000.000Z", "pathOfLegend", 72000006L, "Ranked1v1",
        Seq(("#AAA", 3)), Seq(("#BBB", 0)))
    ).toDF("battleTime", "type", "modeId", "modeName", "teamRaw", "oppRaw")
      .withColumn("team", transform(col("teamRaw"),
        p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
      .withColumn("opponent", transform(col("oppRaw"),
        p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
    val h = battles.select(Hashing.matchHash(col("battleTime"), col("modeId"),
      col("modeName"), col("type"), col("team"), col("opponent")).as("h"))
      .head().getString(0)
    // exactly json.dumps({...}, sort_keys=True, separators=(",",":"))
    val expectedJson =
      """{"battleTime":"20250101T103000.000Z","mode":"72000006",""" +
        """"opponent":[{"crowns":0,"tag":"#BBB"}],"team":[{"crowns":3,"tag":"#AAA"}]}"""
    h shouldBe sha1Hex(expectedJson)
  }

  test("match hash escapes non-ASCII like Python ensure_ascii (byte vector)") {
    // Vector generated from the reference implementation
    // (src/clashdb/hash_utils.py match_hash) with CPython 3:
    //   battleTime "20240101T120000.000Z", gameMode {id:0, name:"Überfall-
    //   Modus 🗡"}, type "pathOfLegend", team [{tag:"#éÄ12", crowns:2}],
    //   opponent [{tag:"#BBB", crowns:null}]
    // json.dumps(ensure_ascii=True) renders
    //   "mode":"Überfall-Modus 🗡"  (lowercase hex, astral
    //   🗡 as a SURROGATE PAIR) and "tag":"#ÉÄ12" (upper-cased
    //   é→É before escaping) — sha1 of those ASCII bytes:
    val expected = "59b34409a1ac8511b86bbbdca76436cf00f37e7e"
    val battles = Seq(
      ("20240101T120000.000Z", "pathOfLegend", 0L, "Überfall-Modus 🗡",
        Seq(("#éÄ12", Some(2))), Seq(("#BBB", Option.empty[Int])))
    ).toDF("battleTime", "type", "modeId", "modeName", "teamRaw", "oppRaw")
      .withColumn("team", transform(col("teamRaw"),
        p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
      .withColumn("opponent", transform(col("oppRaw"),
        p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
    val h = battles.select(Hashing.matchHash(col("battleTime"), col("modeId"),
      col("modeName"), col("type"), col("team"), col("opponent")).as("h"))
      .head().getString(0)
    h shouldBe expected
  }

  test("AsciiEscape: ASCII passes through untouched, non-ASCII escapes lowercase") {
    val df = Seq(("plain ascii", "café € 🗡")).toDF("a", "b")
    val row = df.select(
      graft.expressions.AsciiEscape(col("a")).as("a"),
      graft.expressions.AsciiEscape(col("b")).as("b")).head()
    row.getString(0) shouldBe "plain ascii"
    row.getString(1) shouldBe "caf\\u00e9 \\u20ac \\ud83d\\udde1"
  }

  test("match hash is side-symmetric given pre-swapped sides and sorts participants by tag") {
    def hashOf(team: Seq[(String, Int)], opp: Seq[(String, Int)]): String = {
      val df = Seq(("t", "x", 0L, "m", team, opp))
        .toDF("battleTime", "type", "modeId", "modeName", "teamRaw", "oppRaw")
        .withColumn("team", transform(col("teamRaw"),
          p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
        .withColumn("opponent", transform(col("oppRaw"),
          p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
      df.select(Hashing.matchHash(col("battleTime"), col("modeId"),
        col("modeName"), col("type"), col("team"), col("opponent")).as("h"))
        .head().getString(0)
    }
    // participant order within a side must not matter (2v2-style list)
    hashOf(Seq(("#A", 1), ("#B", 2)), Seq(("#C", 0))) shouldBe
      hashOf(Seq(("#B", 2), ("#A", 1)), Seq(("#C", 0)))
    // mode fallback: id 0 → name; lowercase tags uppercased
    hashOf(Seq(("#a", 1)), Seq(("#b", 0))) shouldBe hashOf(Seq(("#A", 1)), Seq(("#B", 0)))
  }

  test("mode key fallback chain: id 0/null → name → type → empty") {
    def hashWith(id: java.lang.Long, name: String, tpe: String): String = {
      val df = Seq(("t", tpe, id, name, Seq(("#A", 1)), Seq(("#B", 0))))
        .toDF("battleTime", "type", "modeId", "modeName", "teamRaw", "oppRaw")
        .withColumn("team", transform(col("teamRaw"),
          p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
        .withColumn("opponent", transform(col("oppRaw"),
          p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
      df.select(Hashing.matchHash(col("battleTime"), col("modeId"),
        col("modeName"), col("type"), col("team"), col("opponent")).as("h"))
        .head().getString(0)
    }
    val sides = """"opponent":[{"crowns":0,"tag":"#B"}],"team":[{"crowns":1,"tag":"#A"}]"""
    hashWith(0L, "LadderName", "x") shouldBe
      sha1Hex(s"""{"battleTime":"t","mode":"LadderName",$sides}""")
    hashWith(0L, "", "TypeFallback") shouldBe
      sha1Hex(s"""{"battleTime":"t","mode":"TypeFallback",$sides}""")
    hashWith(72000006L, "ignored", "x") shouldBe
      sha1Hex(s"""{"battleTime":"t","mode":"72000006",$sides}""")
  }

  test("symmetricMatchHash: identical from either player's perspective") {
    def symHash(team: Seq[(String, Int)], opp: Seq[(String, Int)]): String = {
      val df = Seq(("t", "x", 72000006L, "m", team, opp))
        .toDF("battleTime", "type", "modeId", "modeName", "teamRaw", "oppRaw")
        .withColumn("team", transform(col("teamRaw"),
          p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
        .withColumn("opponent", transform(col("oppRaw"),
          p => struct(p.getField("_1").as("tag"), p.getField("_2").as("crowns"))))
      df.select(Hashing.symmetricMatchHash(col("battleTime"), col("modeId"),
        col("modeName"), col("type"), col("team"), col("opponent")).as("h"))
        .head().getString(0)
    }
    val fromA = symHash(Seq(("#A", 3)), Seq(("#B", 1)))
    val fromB = symHash(Seq(("#B", 1)), Seq(("#A", 3)))
    fromA shouldBe fromB
    // but a different crown count is a different match
    symHash(Seq(("#A", 2)), Seq(("#B", 1))) should not be fromA
  }

  test("deck hash is invariant under pair permutation (randomized)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 10) {
      val pairs = (1 to 8).map(_ =>
        (rnd.nextInt(30000).toString, Seq("normal", "evo", "hero")(rnd.nextInt(3))))
      val shuffled = rnd.shuffle(pairs)
      val df = Seq((pairs, shuffled)).toDF("a", "b")
      val Array(h1, h2) = df.select(
        Hashing.deckHash(col("a")).as("h1"), Hashing.deckHash(col("b")).as("h2"))
        .head().toSeq.map(_.asInstanceOf[String]).toArray
      h1 shouldBe h2
    }
  }

  test("content hash is md5 hex") {
    val df = Seq(Tuple1("hello")).toDF("c")
    df.select(Hashing.contentHash(col("c")).as("h")).head().getString(0) shouldBe
      "5d41402abc4b2a76b9719d911017c592"
  }
}
