package graft
import org.apache.spark.sql.SparkSession
// ad-hoc subset bench (delete before committing)
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.head.split(',').toSet
    val names = SparkEntry.queries.toSeq.sortBy(_._1).filter(n => only.contains(n._1))
    // warmup
    names.foreach { case (_, fn) => fn(spark, "/root/testdata/sf0.001").count() }
    names.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val passes = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (name, (System.nanoTime() - t0) / 1e9)
      }
    }
    passes.head.zip(passes.last).foreach { case ((k, v1), (_, v2)) =>
      println(f"PROBE $k%-32s ${math.min(v1, v2)}%.3f s")
    }
    spark.stop()
  }
}
