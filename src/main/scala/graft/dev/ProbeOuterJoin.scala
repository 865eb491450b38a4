package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway probe: pin Structured Streaming's LEFT OUTER stream-stream
  * interval-join eviction boundary empirically before writing the st19
  * oracle (same discipline as st17's watermark relations).
  *
  * Protocol: events split into two time-ordered halves, one
  * processAllAvailable per half (batch 1 advances the watermark), then
  * compare the emitted unmatched-click set against the closed-form
  * candidates wm1 = max(ts half1) - 1h and wm2 = max(ts all) - 1h under
  * strict/non-strict boundaries.
  */
object ProbeOuterJoin {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .appName("probe-outer-join").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try probe(spark, dir) finally spark.stop()
  }

  def probe(spark: SparkSession, dir: String): Unit = {
    val ev = graft.sources.Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .localCheckpoint()
    val mm = ev.agg(min(col("ts")).as("a"), max(col("ts")).as("b")).head()
    val (t0, t1) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val cut = new java.sql.Timestamp(t0 + (t1 - t0) * 2 / 3)

    val base = java.nio.file.Files.createTempDirectory("probe_oj")
    val stage = base.resolve("in")
    java.nio.file.Files.createDirectories(stage)
    def stageRange(pred: org.apache.spark.sql.Column, tag: String): Unit =
      graft.queries.Fixtures.landSingleFile(ev.filter(pred), base, stage, tag)
    stageRange(col("ts") < lit(cut), "a")

    val name = "probe_oj_out"
    val q = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING")
      .parquet(stage.toString)
      .transform(e => graft.streaming.EventStreams.clickViewJoinOuter(e, 3600))
      .writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()
    q.processAllAvailable()
    val afterB1 = spark.table(name).localCheckpoint().count()
    stageRange(col("ts") >= lit(cut), "b")
    q.processAllAvailable()
    val wmReported = Option(q.lastProgress)
      .map(_.eventTime.get("watermark")).orNull
    println(s"== reported final watermark: $wmReported")
    q.stop()
    val out = spark.table(name).localCheckpoint()

    // batch ground truths
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vuid"),
        col("ts").as("vts"))
    val inner = clicks.join(views,
      col("user_id") === col("vuid") &&
        col("vts") >= col("cts") - expr("INTERVAL 3600 SECONDS") &&
        col("vts") <= col("cts"))
    val matchedClicks = inner.select("click_id").distinct()
    val unmatchedAll = clicks.join(matchedClicks, Seq("click_id"),
      "left_anti").localCheckpoint()

    val maxA = ev.filter(col("ts") < lit(cut)).agg(max(col("ts"))).head()
      .getTimestamp(0).getTime
    val wm1 = maxA - 3600 * 1000L
    val wm2 = t1 - 3600 * 1000L
    println(s"== streamed rows total: ${out.count()} (after batch1: $afterB1)")
    println(s"== inner pairs batch: ${inner.count()}")
    val streamedUnmatched = out.filter(col("view_id").isNull)
      .localCheckpoint()
    println(s"== streamed unmatched clicks: ${streamedUnmatched.count()}")
    for ((nm, wm) <- Seq(("wm1", wm1), ("wm2", wm2));
         (op, pred) <- Seq(
           ("<", col("cts") < lit(new java.sql.Timestamp(wm))),
           ("<=", col("cts") <= lit(new java.sql.Timestamp(wm))))) {
      println(s"== batch unmatched with cts $op $nm: " +
        unmatchedAll.filter(pred).count())
    }
    // exact set compare against the closest candidate: cts < wm2
    val cand = unmatchedAll
      .filter(col("cts") < lit(new java.sql.Timestamp(wm2)))
      .select("click_id")
    val s1 = streamedUnmatched.select("click_id")
    println(s"== set diff streamed-minus-cand: ${s1.except(cand).count()}, " +
      s"cand-minus-streamed: ${cand.except(s1).count()}")
    println(s"== wm1=${new java.sql.Timestamp(wm1)} wm2=${new java.sql.Timestamp(wm2)} maxTs=${new java.sql.Timestamp(t1)}")
    cand.except(s1).join(unmatchedAll, Seq("click_id")).collect()
      .foreach(r => println(s"== cand-only row: $r"))
    s1.except(cand).join(unmatchedAll, Seq("click_id")).collect()
      .foreach(r => println(s"== streamed-only row: $r"))
    // streamed inner pairs must equal the batch inner join exactly
    val si = out.filter(col("view_id").isNotNull)
      .select("click_id", "view_id")
    val bi = inner.select("click_id", "view_id")
    println(s"== inner parity: streamed-minus-batch ${si.except(bi).count()}, " +
      s"batch-minus-streamed ${bi.except(si).count()}")
  }
}
