package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.A
  * streaming/temporal): windowed aggregation with watermarks and custom
  * per-key state via mapGroupsWithState.
  *
  * The reference's only streaming analogue is the ChangeTracker append log
  * (change_tracker.rs:22-25) with no late-data handling at all — the
  * watermark semantics here are defined by us on the driver's events
  * table. Batch and streaming share the same transformation code
  * (DataFrame in, DataFrame out), the core Structured Streaming design
  * promise; Temporal.scala applies the same ops in batch.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window counts/sums per event type with a watermark for late
    * data. Works identically on a batch or streaming input. */
  def windowedAggregates(events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      // exact decimal sum → identical result in batch, streaming, and any
      // engine, independent of aggregation order
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant. */
  def slidingAggregates(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  final case class UserEvent(event_id: Long,
      ts: java.sql.Timestamp, user_id: Long, event_type: String,
      value: Double)
  final case class UserSessionState(nEvents: Long, totalValue: Double,
      lastTs: Long)
  final case class UserSummary(user_id: Long, n_events: Long,
      total_value: Double)

  /** Custom per-key running state (KeyValueGroupedDataset
    * .mapGroupsWithState): running event count + value sum per user.
    * The streaming analogue of the reference's per-entity state in its
    * in-memory engine (graph.rs adjacency upkeep). */
  def userRunningState(events: DataFrame)(implicit spark: SparkSession)
      : DataFrame = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, UserSummary](
        GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[UserSessionState]) =>
          val prev = state.getOption.getOrElse(UserSessionState(0L, 0.0, 0L))
          var n = prev.nEvents
          var total = prev.totalValue
          var last = prev.lastTs
          evs.foreach { e =>
            n += 1
            total += e.value
            last = math.max(last, e.ts.getTime)
          }
          state.update(UserSessionState(n, total, last))
          UserSummary(uid, n, total)
      }.toDF()
  }

  /** Drive any of the above as a real streaming query from a parquet dir,
    * landing results in an in-memory table — used by tests and as the
    * template for production sinks (kafka/parquet/foreachBatch). */
  def runToMemory(spark: SparkSession, sourceDir: String, queryName: String,
      transform: DataFrame => DataFrame,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(StructType(eventSchema.map {
        case f if f.name == "ts" => StructField("ts", LongType)
        case f => f
      }))
      .parquet(sourceDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = transform(raw).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
