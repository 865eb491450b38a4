package graft.dev

import org.apache.spark.sql.SparkSession

/** Times the wedge-enumeration operators on the FULL co-purchase graph
  * (no partkey pin) — the evidence that the gx13/gx14 gate subgraphs
  * bound bench cost only, not hide a scale bug. The gates' partkey<2000
  * slice IS the full graph at the driver's sf0.01 correctness scale;
  * this runner proves the operators also hold up on the ~10× denser
  * full sf0.1 graph.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.dev.TimeFullWedges /root/testdata/sf0.1 3"
  */
object TimeFullWedges {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.queries.GraphQueries.coPurchaseEdges(spark, dir)
    val m = edges.count()
    println(s"[full-wedges] $dir co-purchase edges: $m")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[full-wedges] $name rep$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    time("edgeTriangleSupport") {
      graft.engine.GraphXBridge.edgeTriangleSupport(edges)
    }
    time("linkPredictionScores") {
      graft.engine.GraphXBridge.linkPredictionScores(edges)
    }
    spark.stop()
  }
}
