package graft.dev

import org.apache.spark.sql.SparkSession

/** Sweeps every gate query's physical plan for scale-hostile join
  * strategies (CartesianProduct / BroadcastNestedLoopJoin) — the
  * dev-loop behind ScaleSpec's repo-wide plan-discipline assert.
  *
  *   sbt "runMain graft.dev.PlanSweep [sfDir]"
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.allQueries.foreach { q =>
      try {
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (bad.nonEmpty)
          println(s"[plansweep] ${q.name}: ${bad.mkString(", ")}")
      } catch {
        case e: Throwable =>
          println(s"[plansweep] ${q.name} FAILED TO PLAN: ${e.getMessage}")
      }
    }
    println("[plansweep] done")
    spark.stop()
  }
}
