package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming/batch parity: the windowed aggregation produces identical
  * results through readStream (memory sink) and the batch path.
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg equals batch windowed agg on sf0.001 events") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val batchEvents = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val batch = EventStream.windowedAgg(batchEvents, "1 hour")
      .select("window_start", "event_type", "n_events")
      .collect().map(_.toSeq).toSet

    // stream the same parquet through readStream with the nanos→ts conversion
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out")
        .select("window_start", "event_type", "n_events")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
