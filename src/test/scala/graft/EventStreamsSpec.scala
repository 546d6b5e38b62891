package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.EventStreams

/** Streaming semantics against the static fixtures: windowed aggregation
  * equals the batch plan (also oracle-checked as q29), and streaming
  * dedup drops replayed events. */
class EventStreamsSpec extends SparkSpecBase {

  test("streaming dedup drops a fully replayed input file") {
    // landing dir with the SAME events file twice → every event_id arrives twice
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    val landing = Files.createTempDirectory("graft_dedup_")
    Files.copy(src, landing.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, landing.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStreams.dedupedEvents(
        EventStreams.readEventStream(spark, landing.toString))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val total = spark.read.parquet(landing.toString).count()
    val deduped = spark.table("dedup_test").count()
    deduped shouldBe total / 2
  }

  test("hourlyTypeCounts run to completion equals the batch aggregation") {
    val streamed = EventStreams.runToCompletion(spark,
      "/root/testdata/sf0.001/events.parquet", "es_spec",
      EventStreams.hourlyTypeCounts)
    val batch = {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).cast("long").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("events"),
          sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("value_cents"))
    }
    streamed.exceptAll(batch).count() shouldBe 0L
    batch.exceptAll(streamed).count() shouldBe 0L
  }
}
