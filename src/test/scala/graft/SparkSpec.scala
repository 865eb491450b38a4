package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraphState
import graft.model.GraphSchemas

/** Shared local SparkSession + tiny graph fixtures (FIXTURES.md F1-F3). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): String = s"/root/testdata/$name"

  def vertexDf(rows: (String, String, Map[String, String])*): DataFrame =
    df(GraphSchemas.vertexSchema,
      rows.map(r => Row(r._1, r._2, r._3)): _*)

  def edgeDf(rows: (String, String, String, String)*): DataFrame =
    df(GraphSchemas.edgeSchema,
      rows.map(r => Row(r._1, r._2, r._3, r._4, "",
        Map.empty[String, String])): _*)

  def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  /** F2: v1 -[test_edge_type]-> v2 plus a fan-out (F3-ish). */
  def pipeFixture: GraphState = GraphState(
    vertexDf(
      ("v1", "test_vertex_type", Map("name" -> "alice")),
      ("v2", "test_inbound_vertex_type", Map("name" -> "bob")),
      ("v3", "test_inbound_vertex_type", Map.empty),
      ("v4", "other_type", Map("flag" -> "true"))),
    edgeDf(
      ("e1", "v1", "v2", "test_edge_type"),
      ("e2", "v1", "v3", "test_edge_type"),
      ("e3", "v1", "v4", "other_edge_type"),
      ("e4", "v4", "v1", "test_edge_type")))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
