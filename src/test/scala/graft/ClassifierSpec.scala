package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.sources.CardMetadata
import graft.sources.CardMetadata.Card

/** Rule-cascade boundaries per reference deck_type.py:85-152 (SURVEY §2.9):
  * priority order, the ÷8 avg-elixir quirk, 3.0/12.0 no-metadata defaults,
  * and exact rule thresholds (cycle ≤ 9, avg ≥ 3.5, bait ≥ 3, bridge ≥ 2).
  */
class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  // tiny synthetic metadata: names encode their role
  private val meta = CardMetadata.Meta(Seq(
    Card(1, "X-Bow", None, Some(6), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(2, "Mortar", None, Some(4), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(3, "BaitA", None, Some(2), isBigTank = false, isBaitPiece = true, isBridgeSpamPiece = false),
    Card(4, "BaitB", None, Some(2), isBigTank = false, isBaitPiece = true, isBridgeSpamPiece = false),
    Card(5, "BaitC", None, Some(2), isBigTank = false, isBaitPiece = true, isBridgeSpamPiece = false),
    Card(6, "BridgeA", None, Some(4), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = true),
    Card(7, "BridgeB", None, Some(4), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = true),
    Card(8, "Tank", None, Some(7), isBigTank = true, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(9, "Cheap1", None, Some(1), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(10, "Cheap2", None, Some(2), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(11, "Cheap3", None, Some(3), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(12, "Mid4", None, Some(4), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(13, "Heavy6", None, Some(6), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false),
    Card(14, "Heavy8", None, Some(8), isBigTank = false, isBaitPiece = false, isBridgeSpamPiece = false)
  ))

  private def classify(names: Seq[String]): String = {
    val df = Seq(Tuple1(names)).toDF("cards")
    df.select(Classifier.classifyDeck(col("cards"), meta).as("t"))
      .head().getString(0)
  }

  test("Siege wins over everything (priority 1)") {
    // also ≥3 bait pieces present — Siege must still win
    classify(Seq("X-Bow", "BaitA", "BaitB", "BaitC", "Mid4", "Heavy6", "Heavy8", "Tank")) shouldBe Classifier.Siege
    classify(Seq("Mortar", "Mid4", "Heavy6", "Heavy8", "Tank", "BridgeA", "BridgeB", "Cheap1")) shouldBe Classifier.Siege
  }

  test("Bait at exactly 3 pieces (priority 2)") {
    classify(Seq("BaitA", "BaitB", "BaitC", "Mid4", "Heavy6", "Heavy8", "Tank", "Heavy6")) shouldBe Classifier.Bait
    // only 2 bait pieces → not Bait (falls to Beatdown here: tank + avg ≥ 3.5)
    classify(Seq("BaitA", "BaitB", "Heavy6", "Heavy8", "Tank", "Heavy6", "Heavy8", "Mid4")) should not be Classifier.Bait
  }

  test("Cycle boundary: 4-cheapest sum ≤ 9 exactly") {
    // cheapest four = 1+2+3+3 = 9 → Cycle (uses sorted elixirs, incl dupes)
    classify(Seq("Cheap1", "Cheap2", "Cheap3", "Cheap3", "Heavy8", "Heavy8", "Heavy8", "Heavy8")) shouldBe Classifier.Cycle
    // cheapest four = 2+3+3+4 = 12 > 9 → not Cycle
    classify(Seq("Cheap2", "Cheap3", "Cheap3", "Mid4", "Heavy8", "Heavy8", "Heavy8", "Heavy8")) should not be Classifier.Cycle
  }

  test("Bridge Spam at exactly 2 pieces (priority 4)") {
    classify(Seq("BridgeA", "BridgeB", "Mid4", "Mid4", "Mid4", "Mid4", "Mid4", "Mid4")) shouldBe Classifier.BridgeSpam
  }

  test("Beatdown: big tank AND avg elixir ≥ 3.5 (the ÷8 quirk)") {
    // Tank + 7 × Heavy6: sum = 7+42 = 49, ÷8 = 6.125 ≥ 3.5 → Beatdown
    classify(Seq("Tank", "Heavy6", "Heavy6", "Heavy6", "Heavy6", "Heavy6", "Heavy6", "Heavy6")) shouldBe Classifier.Beatdown
    // Tank + cheap cards: sum = 7+1+2 = 10 with only 3 known cards, ÷8 =
    // 1.25 < 3.5 → falls through to Hybrid even though a tank is present
    // (missing metadata still divides by 8 — reference deck_type.py:51-62)
    classify(Seq("Tank", "Cheap1", "Cheap2", "Nope1", "Nope2", "Nope3", "Nope4", "Nope5")) shouldBe Classifier.Hybrid
  }

  test("no metadata at all → defaults avg=3.0, fourCycle=12 → Hybrid") {
    classify(Seq("U1", "U2", "U3", "U4", "U5", "U6", "U7", "U8")) shouldBe Classifier.Hybrid
  }

  test("empty deck → Hybrid") {
    classify(Seq.empty) shouldBe Classifier.Hybrid
  }

  test("generic cascade: first matching rule wins, fallback otherwise") {
    val df = Seq(1, 5, 50).toDF("x")
    val label = Classifier.cascade(Seq(
      (col("x") < 3, "small"), (col("x") < 10, "mid")), "big")
    df.select(label.as("l")).as[String].collect().toSeq shouldBe Seq("small", "mid", "big")
  }
}
