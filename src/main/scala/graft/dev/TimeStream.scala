package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of one Structured Streaming gate body (st05's
  * stream-stream interval join): where does a ~2 s streaming gate
  * actually spend its wall-clock — start() (plan + WAL init),
  * processAllAvailable() (the data batch + the watermark-advancing
  * no-data batch), or stop()? Drives the r13 decision of whether the
  * streaming family's fixed costs are worth attacking.
  *
  *   sbt "runMain graft.dev.TimeStream [sfDir] [reps]"
  */
object TimeStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stage = graft.queries.Fixtures.stageTable(dir, "events",
      "timestream_events")
    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000
    (1 to reps).foreach { i =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val name = s"ts_probe_$i"
        val raw = graft.sources.EventTs.readStream(spark, stage)
        val t0 = System.nanoTime()
        val q = graft.streaming.EventStreams.clickViewJoin(raw, 3600)
          .writeStream.format("memory").queryName(name)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .start()
        val tStart = ms(t0)
        val t1 = System.nanoTime()
        q.processAllAvailable()
        val tPaa = ms(t1)
        val t2 = System.nanoTime()
        q.stop()
        val tStop = ms(t2)
        val t3 = System.nanoTime()
        val n = spark.table(name).count()
        val tRead = ms(t3)
        val batches = Option(q.recentProgress).map(_.length).getOrElse(-1)
        println(s"[timestream] rep$i: start=${tStart}ms " +
          s"processAllAvailable=${tPaa}ms stop=${tStop}ms " +
          s"read=${tRead}ms rows=$n batches=$batches")
        Option(q.recentProgress).foreach(_.foreach { p =>
          val d = p.durationMs
          println(s"[timestream]   batch ${p.batchId}: " +
            s"triggerExecution=${d.get("triggerExecution")} " +
            s"queryPlanning=${d.get("queryPlanning")} " +
            s"getBatch=${d.get("getBatch")} " +
            s"addBatch=${d.get("addBatch")} " +
            s"walCommit=${d.get("walCommit")} " +
            s"commitOffsets=${d.get("commitOffsets")} " +
            s"latestOffset=${d.get("latestOffset")}")
        })
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
