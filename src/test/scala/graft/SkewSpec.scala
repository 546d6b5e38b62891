package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedCountDistinct equals plain countDistinct on skewed data") {
    val rnd = new Random(3)
    // one hot key with many values, many cold keys with few
    val rows = (1 to 5000).map(_ => ("hot", rnd.nextInt(2000).toLong)) ++
      (1 to 500).map(i => (s"cold${i % 50}", rnd.nextInt(10).toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedCountDistinct(df, Seq("k"), col("v"), buckets = 16)
    val plain = df.groupBy("k").agg(countDistinct(col("v")).as("distinct_count"))
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  test("saltedJoin equals the plain inner join, including hot-key multiplicity") {
    val rnd = new Random(9)
    val left = ((1 to 3000).map(_ => ("hot", rnd.nextInt(100))) ++
      (1 to 300).map(i => (s"k${i % 30}", i))).toDF("key", "lv")
    val right = (Seq("hot" -> 1, "hot" -> 2) ++
      (0 until 30).map(i => s"k$i" -> i)).toDF("key", "rv")
    val salted = Skew.saltedJoin(left, right, "key", salt = 4)
      .select("key", "lv", "rv")
    val plain = left.join(right, "key").select("key", "lv", "rv")
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }
}
