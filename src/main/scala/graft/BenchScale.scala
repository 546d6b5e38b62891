package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Superlinear-tail stress for the banded dedup family, past the sf0.1
  * fixture cap where a 2× bar cannot see quadratic terms.
  *
  * Synthesizes a `SPARK_GRAFT_SCALE`× (default 10×) documents blow-up:
  * replica 0 is the fixture verbatim (its true near-dup structure
  * intact); each further replica keeps every document's exact token
  * MULTISET but re-orders it by a per-replica hash
  * (array_sort by md5(token:replica)), so
  *   - token-level statistics (counts, stopword ratios, lengths) are
  *     unchanged — quality gates treat every replica like the base;
  *   - intra-replica near-dup structure survives (two docs sharing most
  *     tokens still share most of their hash-sorted sequence);
  *   - inter-replica shingle overlap is destroyed (different sort key
  *     per replica) — no replica pairs with another, so duplicate
  *     DENSITY per unit data is preserved.
  * The result is N independent copies of the original dedup problem: a
  * genuinely banded operator should grow ~linearly (ratio ≲ N·overhead),
  * while any hidden all-pairs term grows ~N².
  *
  * Runs each family query twice per scale (min, clearCache between) and
  * writes BENCH_SCALE.json: per-query base/scaled seconds + ratio. */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- synthesize the blown-up documents table ----
    val scaledRoot = java.nio.file.Files.createTempDirectory("graft_scale_")
    val docs = sources.Tables.documents(spark, sfDir)
    val maxId = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val permuted = concat_ws(" ",
      transform(
        array_sort(transform(split(col("text"), " "),
          tk => struct(
            md5(concat(tk, lit(":"), col("replica").cast("string"))).as("k"),
            tk.as("v")))),
        p => p.getField("v")))
    spark.range(replicas.toLong).select(col("id").as("replica"))
      .crossJoin(docs)
      .select(
        (col("doc_id") + col("replica") * maxId).as("doc_id"),
        when(col("replica") === 0L, col("text")).otherwise(permuted).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(cpus.toInt)
      .write.mode("overwrite")
      .parquet(scaledRoot.resolve("documents.parquet").toString)

    // ---- the banded family (documents-only inputs) ----
    val family = Seq(
      "q23_neardup_minhash", "q51_dedup_components_star", "q55_dup_ngrams",
      "q97_winnowing_pairs", "q114_clean_winnowing", "q115_fuzzy_join")

    // JIT/codegen warmup on the smallest sibling
    val warm = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warm.isDirectory) family.foreach { n =>
      try { SparkEntry.queries(n)(spark, warm.getPath).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[bench-scale warmup] $n: ${e.getMessage}") }
    }

    def timeAll(dir: String): Map[String, Double] =
      (1 to 2).map { _ =>
        spark.catalog.clearCache()
        family.map { n =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          n -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }.reduce((a, b) => a.map { case (k, v) => k -> math.min(v, b(k)) })

    val base = timeAll(sfDir)
    val scaled = timeAll(scaledRoot.toString)

    val qs = family.map { n =>
      val r = scaled(n) / base(n)
      f""""$n":{"base_sec":${base(n)}%.3f,"scaled_sec":${scaled(n)}%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"scale_stress","replicas":$replicas,"base":"$sfDir",""" +
        s""""salt":"md5-permuted token order per replica; replica 0 verbatim",""" +
        s""""queries":$qs}"""
    println(line)
    val artifact = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_SCALE.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact).toAbsolutePath,
      (line + "\n").getBytes("UTF-8"))
    def rm(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(scaledRoot.toFile)
    spark.stop()
  }
}
