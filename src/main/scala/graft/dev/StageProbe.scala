package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-stage breakdown for one gate run: name, task count, task time,
  * shuffle read/write — to find WHICH stage dominates a slow query.
  *
  *   sbt "runMain graft.dev.StageProbe cy32_all_shortest_paths /root/testdata/sf0.1"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val m = sc.stageInfo.taskMetrics
          val wall = (for {
            sub <- sc.stageInfo.submissionTime
            fin <- sc.stageInfo.completionTime
          } yield (fin - sub) / 1e3).getOrElse(-1.0)
          lines.add(f"[stage ${sc.stageInfo.stageId}%4d] " +
            f"${sc.stageInfo.numTasks}%3d tasks " +
            f"wall $wall%5.2f s " +
            f"cpu ${m.executorRunTime / 1e3}%6.2f s " +
            f"sw ${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f MB " +
            f"sr ${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1f MB  " +
            sc.stageInfo.rddInfos.map(r => s"${r.name}#${r.id}")
              .mkString(",").take(160))
        }
    })

    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val g = graft.sources.TpchGraph(graft.sources.Tables(spark, dir))
    g.vertices.count(); g.edges.count()

    val q = SparkEntry.allQueries.find(_.name == name)
      .getOrElse(sys.error(s"no such gate: $name"))
    q.stage.foreach(f => f(spark, dir))
    q.run(spark, dir).count() // warm rep, unrecorded
    record = true
    val t0 = System.nanoTime()
    val n = q.run(spark, dir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    record = false
    Thread.sleep(400)
    lines.forEach(println(_))
    println(f"[probe] $name: $secs%.2f s, $n rows")
    spark.stop()
  }
}
