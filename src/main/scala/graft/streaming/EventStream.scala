package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface over the event table.
  *
  * The reference is batch-only (SURVEY §2.8); this module is the scale path
  * for continuous ingestion: the same event-table transformations expressed
  * over `readStream`, with watermarked windowed aggregation for late data.
  * The batch and streaming aggregations share one column-expression
  * definition so results match by construction.
  */
object EventStream {

  /** Shared windowed-aggregation definition: tumbling window per event type. */
  def windowedAgg(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))

  /** Streaming variant: parquet-directory source, 10-minute watermark. */
  def streamingWindowedAgg(spark: SparkSession, dir: String, schema: StructType,
      windowLen: String = "1 hour"): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }
}
