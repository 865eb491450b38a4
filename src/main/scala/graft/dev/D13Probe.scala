package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-instrumented timing probe for the containment-dedup operator
  * (sf1 rehearsal): prints per-stage executor/GC time so regressions
  * show up as CPU vs collector vs shuffle, not just wall-clock. */
object D13Probe {
  def main(args: Array[String]): Unit = {
    // flags are position-independent; positionals parse from the rest
    val pos = args.filterNot(_.startsWith("--"))
    val dir = pos.headOption.getOrElse("/tmp/sf1")
    val reps = pos.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("d13probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          val wall = (i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L)) / 1e3
          if (wall > 2.0)
            println(f"[stage] ${i.stageId}%4d ${i.numTasks}%5d tasks " +
              f"$wall%8.1f s exec ${m.executorRunTime / 1e3}%8.1f s  " +
              f"gc ${m.jvmGCTime / 1e3}%7.1f s  " +
              f"shW ${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB  " +
              f"spill ${m.diskBytesSpilled / 1e6}%8.1f MB")
        }
      })

    val df = spark.read.parquet(s"$dir/documents.parquet")
    if (args.contains("--cands")) {
      // candidate-volume census: how many pairs reach the verify join,
      // and how many serialized array-bytes they would drag through it
      val (docs, cand) = graft.functions.DedupOps
        .containmentDocsAndCands(df, "doc_id", "text", 3, 9000)
      val stats = docs.agg(count(lit(1)), avg(col("sz")),
        avg(size(col("gids")).cast("long") * 4L + 16L)).head()
      println(f"[probe] docs=${stats.getLong(0)} avg_shingles=" +
        f"${stats.getDouble(1)}%.1f avg_array_bytes=${stats.getDouble(2)}%.0f")
      val t0 = System.nanoTime()
      val c = cand.count()
      println(f"[probe] candidates=$c (${(System.nanoTime() - t0) / 1e9}%.1f s)" +
        f" verify-shuffle ≈ ${c * stats.getDouble(2) / 1e9}%.1f GB/side")
      spark.stop(); return
    }
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.functions.DedupOps
        .containmentPairs(df, "doc_id", "text", 3, 9000).count()
      println(f"[probe] rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"($n rows)")
    }
    spark.stop()
  }
}
