package graft
import org.apache.spark.sql.SparkSession
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.collect()
    println("PROBE PLAN START")
    println(df.queryExecution.executedPlan.toString.take(8000))
    println("PROBE PLAN END")
    spark.stop()
  }
}
