package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for the gx06 components at a given SF. */
object TimeNeighborhood {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val full = graft.sources.TpchGraph(graft.sources.Tables(spark, dir))
    val g = graft.engine.GraphState(
      full.vertices.filter(
        col("label").isin("customer", "supplier", "nation", "region")),
      full.edges.filter(col("edge_type").isin("IN_NATION", "IN_REGION")))
    g.vertices.count(); g.edges.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    (1 to 2).foreach { rep =>
      t(s"exactSizes rep$rep") {
        graft.engine.Neighborhood.exactSizes(g, 2).count() }
      t(s"hyperBall rep$rep") {
        graft.engine.Neighborhood.hyperBall(g, 2).count() }
    }
    spark.stop()
  }
}
