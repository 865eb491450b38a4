package graft.app

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession
import graft.sources.{Tables, TpchGraph}

/** CLI driver entry (SURVEY.md §7.2.6, mirroring the reference CLI's
  * one-shot query mode, handlers_queries.rs:173-206):
  *
  *   runMain graft.app.Main --data /root/testdata/sf0.001 \
  *     --query "MATCH (n:customer) RETURN count(n) AS n"
  *
  * Routes Cypher to the graph engine over the TPC-H graph projection and
  * SQL to spark.sql with the testdata tables registered as temp views;
  * prints rows as JSON lines (the reference prints serde_json values).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val pairs = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toSeq
    val opts = pairs.toMap
    val dataDir = opts.getOrElse("data", "/root/testdata/sf0.001")
    val query = opts.getOrElse("query",
      "MATCH (n) RETURN count(n) AS total_vertices")
    // repeatable --param name=value; numerics/booleans are typed, the
    // rest stay strings (Cypher `$name` placeholders)
    val params: Map[String, Any] = pairs.collect {
      case ("param", kv) if kv.contains('=') =>
        val Array(k, v) = kv.split("=", 2)
        k -> (v match {
          case vv if vv.matches("-?\\d+")        => vv.toLong
          case vv if vv.matches("-?\\d*\\.\\d+") => vv.toDouble
          case "true"                            => true
          case "false"                           => false
          case vv                                => vv
        })
    }.toMap

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Tables(spark, dataDir)
    val session = GraftSession(spark, TpchGraph(tables))
    session.registerTables(tables)

    val out = session.execute(query, params)
    // streamed, not collect(): bounded driver memory on any result size
    out.toJSON.toLocalIterator().forEachRemaining(println(_))
    spark.stop()
  }
}
