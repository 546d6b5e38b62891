package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pairs-count decomposition for the plain banded family's 10× worst
  * movers (q23 MinHash pairs, q97 winnowing pairs): counts CANDIDATE
  * pairs (band/fingerprint blocking only) and VERIFIED pairs (after the
  * Jaccard / min-shared gate) at base vs `SPARK_GRAFT_SCALE`× on the
  * same salted corpus BENCH_SCALE runs, so a scale ratio above the
  * family band can be attributed: candidate growth ≈ replicas means the
  * operator is linear and the extra time is data-driven near-dup
  * density; candidate growth ≫ replicas means the blocking itself is
  * leaking cross-replica pairs.
  *
  * Candidates are counted through the SAME public entry points with the
  * verification gate opened (threshold 0 / minShared 1), so the counted
  * set is exactly the pair set the timed query verifies — no parallel
  * reimplementation to drift.
  *
  * Prints one JSON line; paste into SURVEY/BENCH_SCALE notes.
  */
object ScalePairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scaledRoot = java.nio.file.Files.createTempDirectory("graft_pairs_")
    BenchScale.stageScaledDocuments(spark, sfDir, replicas, scaledRoot,
      cpus.toInt)

    def q23Counts(dir: String): (Long, Long) = {
      val docs = sources.Tables.documents(spark, dir)
        .filter(trim(col("text")) =!= "")
      def pairs(threshold: Double) =
        operators.Dedup.minhashNearDupPairs(docs, col("doc_id"),
          col("text"), shingleN = 3, k = 8, rowsPerBand = 1,
          threshold = threshold, maxBandDf = Some(30L)).count()
      (pairs(0.0), pairs(0.4))
    }
    def q97Counts(dir: String): (Long, Long) = {
      val docs = sources.Tables.documents(spark, dir)
      def pairs(minShared: Long) =
        operators.Winnowing.sharedFingerprintPairs(docs, col("doc_id"),
          col("text"), k = 3, w = 4, minShared = minShared,
          maxDf = 100L).count()
      (pairs(1L), pairs(2L))
    }
    val (c23b, v23b) = q23Counts(sfDir)
    val (c23s, v23s) = q23Counts(scaledRoot.toString)
    val (c97b, v97b) = q97Counts(sfDir)
    val (c97s, v97s) = q97Counts(scaledRoot.toString)
    // Locale.ROOT + a null for a zero denominator: NaN and comma
    // decimals are both invalid JSON
    def r(a: Long, b: Long): String =
      if (b == 0) "null"
      else String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(a.toDouble / b))
    println(
      s"""{"metric":"pairs_decomposition","replicas":$replicas,"base":"$sfDir","q23":{"cand_base":$c23b,"cand_scaled":$c23s,"cand_ratio":${r(c23s, c23b)},"verified_base":$v23b,"verified_scaled":$v23s,"verified_ratio":${r(v23s, v23b)}},"q97":{"cand_base":$c97b,"cand_scaled":$c97s,"cand_ratio":${r(c97s, c97b)},"verified_base":$v97b,"verified_scaled":$v97s,"verified_ratio":${r(v97s, v97b)}}}""")
    graft.operators.Maintenance.rmTree(scaledRoot.toFile)
    spark.stop()
  }
}
