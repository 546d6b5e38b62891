package graft

import graft.expressions.GraftExtensions

/** SQL surface of the native expressions (FunctionRegistry wiring). */
class GraftExtensionsSpec extends SparkSpecBase {

  test("vec_dot / vec_cosine callable from SQL and plan the native expression") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
    dot.head().getDouble(0) shouldBe 11.0
    // planned expression is VecDot, not a UDF
    dot.queryExecution.analyzed.toString should include("vecdot")
    spark.sql("SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0) shouldBe 1.0 +- 1e-12
    spark.sql("SELECT vec_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0) shouldBe 0.0
  }

  test("minhash_sig callable from SQL, identical to the Column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 4) AS s").head.getSeq[String](0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq(Tuple1(Seq("a b c", "b c d"))).toDF("sh")
      .select(graft.expressions.VectorExpressions.minhashSig(col("sh"), 4).as("s"))
      .head.getSeq[String](0)
    viaSql shouldBe viaCol
    viaSql.foreach(_ should fullyMatch regex "[0-9a-f]{32}")
  }

  test("md5_hash32, simhash_mix and nfc_normalize callable from SQL, identical to the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq("the quick brown fox", "café prose").toDF("t")
    df.createOrReplaceTempView("ge_txt")
    val viaSql = spark.sql(
      """SELECT simhash_mix(md5_hash32(split(lower(t), '\\s+'))) AS h,
        |       nfc_normalize(t) AS n FROM ge_txt""".stripMargin)
      .as[(Long, String)].collect().toSeq
    val viaCol = df.select(
        graft.expressions.VectorExpressions.simhashMix(
          graft.expressions.VectorExpressions.md5Hash32(
            split(lower(col("t")), "\\s+"))).as("h"),
        graft.functions.TextFunctions.nfcNormalize(col("t")).as("n"))
      .as[(Long, String)].collect().toSeq
    viaSql shouldBe viaCol
    viaSql.map(_._2) shouldBe Seq("the quick brown fox", "café prose")
    spark.catalog.dropTempView("ge_txt")
  }

  test("vec_dot arity error is informative") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    e.getMessage.toLowerCase should include("argument")
  }

  test("vec_dot rejects non-array inputs with a type-check error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(1.0D, 2.0D)").collect()
    }
    e.getMessage should include("vec_dot requires array")
  }
}
