package graft.dev

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times one (or more) gate queries with the Bench session shape —
  * the per-query iteration loop without a full bench run.
  *
  *   sbt "runMain graft.dev.TimeQuery d05_cosine_near_dups /root/testdata/sf0.1 3"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up as Bench
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val g = graft.sources.TpchGraph(graft.sources.Tables(spark, dir))
    g.vertices.count(); g.edges.count()
    val q = SparkEntry.allQueries.find(_.name == name)
      .getOrElse(sys.error(s"no such gate: $name"))
    q.stage.foreach(f => f(spark, dir)) // fixture staging, untimed
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      println(f"[time] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
