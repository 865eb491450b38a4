package graft.dev

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for [[graft.engine.GraphXBridge.kTruss]] — the one
  * graph operator with no gate of its own at full-graph scale (gx14's
  * gate is one support pass; kTruss ITERATES that pass). Builds the
  * full co-purchase graph of the given sfDir and peels to the k-truss,
  * reporting wall, rounds, and total shuffle for the PLANS.md table.
  *
  *   sbt "runMain graft.dev.TimeKTruss /tmp/sf10 20"
  *
  * A high k makes the rehearsal honest AND bounded: round 1 pays the
  * full-graph support computation (the scale-critical step — at sf10
  * it inherits gx14's bucketed passes when the census demands), the
  * peel then converges in a few shrinking rounds.
  */
object TimeKTruss {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(graft.util.Dbg.ConfKey, "true")

    val shuffleBytes = new AtomicLong(0L)
    val nStages = new AtomicInteger(0)
    val taskMillis = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted)
          : Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        nStages.incrementAndGet()
        taskMillis.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })

    val l = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = l
      .join(l.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .select(col("l_partkey").cast("long").as("src"),
        col("p2").cast("long").as("dst"))
      .distinct()
    val t0 = System.nanoTime()
    val out = graft.engine.GraphXBridge.kTruss(edges, k)
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener drain
    println(f"[ktruss] k=$k dir=$dir: $secs%.2f s, $n surviving edges, " +
      f"shuffle ${shuffleBytes.get() / 1e6}%.1f MB, " +
      f"${nStages.get()} stages, ${taskMillis.get() / 1e3}%.1f s task time")
    spark.stop()
  }
}
