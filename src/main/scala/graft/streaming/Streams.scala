package graft.streaming

import graft.sql.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming parity (SURVEY.md §2.5 #42): the reference's bidi
 * stream applies the same operator per message independently
 * ⟨ref: GeometryServer.java OperateBiStream; flow-control via
 * onReadyHandler⟩ — here the same Catalyst expressions run per streamed
 * row (backpressure = micro-batch admission control), and the watermarked
 * windowed aggregation covers the accumulate shape with event-time
 * semantics the reference never had.
 */
object Streams {

  /** Per-message operator application: stream of rows with lon/lat → cell/tile
    * enrichment, exactly the batch expressions (no rewrite needed). */
  def enrichGeo(stream: DataFrame, level: Int, zoom: Int): DataFrame = {
    GraftFunctions.install(stream.sparkSession)
    stream
      .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(level)))
      .withColumn("tx", call_function("st_tile_x", col("lon"), lit(zoom)))
      .withColumn("ty", call_function("st_tile_y", col("lat"), lit(zoom)))
  }

  /** Watermarked tumbling-window counts per event type (client-stream fold,
    * streaming flavor). */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     window_ : String = "5 minutes"): DataFrame =
    events
      .withColumn("ts_tz", col("ts").cast("timestamp"))
      .withWatermark("ts_tz", watermark)
      .groupBy(window(col("ts_tz"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** File-source stream over a parquet dir with explicit schema. */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}
