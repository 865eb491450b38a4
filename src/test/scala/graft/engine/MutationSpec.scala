package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mutation semantics (reference: CRUD trait storage_engine.rs:1248-1258,
  * cascading delete rdb/managers.rs:119-160, SET rdb/datastore.rs:342-362).
  */
class MutationSpec extends SparkSpec {

  private def vids(g: GraphState): Set[String] =
    g.vertices.select("id").collect().map(_.getString(0)).toSet
  private def eids(g: GraphState): Set[String] =
    g.edges.select("id").collect().map(_.getString(0)).toSet

  test("upsertVertices: insert new + last-write-wins on id") {
    val g = pipeFixture.upsertVertices(vertexDf(
      ("v1", "replaced", Map("k" -> "v")),
      ("v9", "new_type", Map.empty)))
    assert(vids(g) == Set("v1", "v2", "v3", "v4", "v9"))
    val v1 = g.vertices.filter(col("id") === "v1").collect().head
    assert(v1.getString(1) == "replaced")
  }

  test("detachDeleteVertices cascades to incident edges") {
    val victims = pipeFixture.vertices
      .filter(col("id") === "v1").select("id")
    val g = pipeFixture.detachDeleteVertices(victims)
    assert(vids(g) == Set("v2", "v3", "v4"))
    // every edge touched v1 in the fixture → all gone
    assert(eids(g) == Set.empty)
  }

  test("deleteEdges removes only matched triples") {
    val victims = pipeFixture.edges
      .filter(col("id") === "e1").select("src", "edge_type", "dst")
    val g = pipeFixture.deleteEdges(victims)
    assert(eids(g) == Set("e2", "e3", "e4"))
  }

  test("insertEdgesChecked validates both endpoints") {
    val staged = edgeDf(
      ("ok", "v1", "v2", "t"),
      ("dangling", "v1", "missing", "t"))
    val g = pipeFixture.insertEdgesChecked(staged)
    assert(eids(g).contains("ok") && !eids(g).contains("dangling"))
  }

  test("setVertexProperties merges and overwrites keys") {
    val m = pipeFixture.vertices.filter(col("id") === "v1").select("id")
    val g = pipeFixture.setVertexProperties(m,
      Map("name" -> "ALICE", "age" -> "30"))
    val props = g.vertices.filter(col("id") === "v1")
      .select("properties").collect().head.getMap[String, String](0)
    assert(props("name") == "ALICE" && props("age") == "30")
    // untouched rows keep their maps
    val v2 = g.vertices.filter(col("id") === "v2")
      .select("properties").collect().head.getMap[String, String](0)
    assert(v2("name") == "bob")
  }

  test("removeVertexProperty drops the key (Cypher REMOVE)") {
    val m = pipeFixture.vertices.filter(col("id") === "v1").select("id")
    val g = pipeFixture.removeVertexProperty(m, "name")
    val props = g.vertices.filter(col("id") === "v1")
      .select("properties").collect().head.getMap[String, String](0)
    assert(!props.contains("name"))
  }

  test("reversedEdges swaps endpoints (edges.rs:74-83)") {
    val rev = pipeFixture.reversedEdges
      .filter(col("id") === "e1").collect().head
    assert(rev.getString(1) == "v2" && rev.getString(2) == "v1")
  }
}
