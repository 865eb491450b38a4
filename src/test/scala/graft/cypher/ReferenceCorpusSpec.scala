package graft.cypher

import org.apache.spark.sql.{Row, SparkSession}

import graft.SparkSpec
import graft.engine.GraphState
import graft.model.GraphSchemas

/** Runs the reference's ENTIRE example-query corpus
  * (lib/src/storage_engine/queries_examples.txt — "a latent golden-query
  * suite, never automated" per SURVEY §5) verbatim, in order, as one
  * stateful script, asserting the inline expectations from the file's
  * own comments ("should return all 4 people", "should return 3
  * relationships", …).
  */
class ReferenceCorpusSpec extends SparkSpec {
  private implicit lazy val s: SparkSession = spark

  private def emptyGraph = GraphState(
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      GraphSchemas.vertexSchema),
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      GraphSchemas.edgeSchema))

  test("queries_examples.txt main script runs end-to-end with the " +
      "file's own expected shapes") {
    var g = emptyGraph
    def run(stmt: String): Option[org.apache.spark.sql.DataFrame] = {
      val r = Cypher.execute(g, stmt)
      g = GraphState(r.state.vertices.localCheckpoint(),
        r.state.edges.localCheckpoint())
      r.df
    }

    // -- 1. create people (QE "Basic" section, verbatim)
    run("""CREATE (:Person {id: "alice", name: "Alice", age: 30, active: true, score: 95.5})""")
    run("""CREATE (:Person {id: "bob", name: "Bob", age: 35, active: true, score: 87.2})""")
    run("""CREATE (:Person {id: "charlie", name: "Charlie", age: 28, active: false})""")
    val created = run(
      """CREATE (:Person {id: "diana", name: "Diana", age: 32})
        |RETURN "Diana created" AS result""".stripMargin)
    assert(created.get.collect().head.getString(0) == "Diana created")

    // -- 2. relationships
    run("""MATCH (a:Person {id: "alice"}), (b:Person {id: "bob"})
          |CREATE (a)-[:KNOWS {since: 2018, strength: 0.9}]->(b)""".stripMargin)
    run("""MATCH (a:Person {id: "alice"}), (c:Person {id: "charlie"})
          |CREATE (a)-[:KNOWS {since: 2020, strength: 0.6}]->(c)""".stripMargin)
    run("""MATCH (b:Person {id: "bob"}), (d:Person {id: "diana"})
          |CREATE (b)-[:WORKS_WITH {project: "GraphDB"}]->(d)""".stripMargin)

    // -- 3/4/5: lookups ("should return all 4 people", "3 relationships")
    assert(run("""MATCH (p:Person {id: "alice"}) RETURN p""").get.count() == 1)
    assert(run("MATCH (n) RETURN n").get.count() == 4)
    assert(run("MATCH ()-[r]->() RETURN r").get.count() == 3)

    // -- 6/7: traversals
    assert(run(
      """MATCH (alice:Person {id: "alice"})-[:KNOWS]->(friend)
        |RETURN friend.name AS friend_name, friend.age, friend.active"""
        .stripMargin).get.count() == 2)
    val ordered = run(
      """MATCH (alice:Person {id: "alice"})-[r:KNOWS]->(friend)
        |RETURN friend.name, r.since, r.strength
        |ORDER BY r.strength DESC""".stripMargin).get.collect()
    assert(ordered.map(_.getString(0)).toSeq == Seq("Bob", "Charlie"))

    // -- 9/10/11: predicates
    assert(run(
      """MATCH (p:Person) WHERE p.age > 30 RETURN p.id, p.name, p.age""")
      .get.count() == 2)
    assert(run(
      """MATCH (p:Person) WHERE p.age >= 30 AND p.active = true
        |RETURN p.name, p.age""".stripMargin).get.count() == 2)
    assert(run(
      """MATCH (p:Person) WHERE toLower(p.name) CONTAINS "ali" RETURN p""")
      .get.count() == 1)

    // -- 14/15: aggregation
    val deg = run(
      """MATCH (p:Person)-[r]->()
        |RETURN p.name AS person, count(r) AS outgoing_count
        |ORDER BY outgoing_count DESC""".stripMargin).get.collect()
    assert(deg.map(_.getLong(1)).toSeq == Seq(2L, 1L))
    assert(run(
      """MATCH (p:Person) WHERE p.active = true
        |RETURN avg(p.age) AS avg_active_age""".stripMargin)
      .get.collect().head.getDouble(0) == 32.5)

    // -- 16/17/18/19: mutations
    run("""MATCH (p:Person {id: "alice"})
          |SET p.age = 31, p.last_seen = timestamp()""".stripMargin)
    assert(run(
      """MATCH (p:Person {id: "alice"})
        |RETURN exists(p.last_seen) AS has_last_seen""".stripMargin)
      .get.collect().head.getBoolean(0))
    run("""MATCH (p:Person {id: "alice"}) SET p:Employee""")
    assert(run("""MATCH (p:Person {id: "alice"}) RETURN labels(p)""")
      .get.collect().head.getSeq[String](0) == Seq("Person", "Employee"))
    run("""MATCH (p:Person {id: "bob"}) REMOVE p.score""")
    run("""MATCH (:Person {id: "alice"})-[r:KNOWS]->(:Person {id: "bob"})
          |SET r.strength = 0.95, r.last_met = date()""".stripMargin)

    // -- 20/21: deletes
    run("""MATCH (:Person {id: "alice"})-[r:KNOWS]->(:Person {id: "charlie"})
          |DELETE r""".stripMargin)
    run("""MATCH (c:Person {id: "charlie"}) DETACH DELETE c""")
    assert(run("MATCH (n) RETURN n").get.count() == 3)

    // -- 22: optional match
    val om = run(
      """MATCH (p:Person {id: "diana"})
        |OPTIONAL MATCH (p)-[r:KNOWS]->(friend)
        |RETURN p.name, friend.name AS knows_someone""".stripMargin)
      .get.collect()
    assert(om.length == 1 && om.head.isNullAt(1))

    // -- 24/25/26/27: collect, unwind-create, regex, exists
    assert(run(
      """MATCH (p:Person) RETURN collect(p.name) AS all_names""")
      .get.collect().head.getSeq[String](0).toSet
      == Set("Alice", "Bob", "Diana"))
    run("""UNWIND [
          |  {id: "u100", name: "User100", age: 25},
          |  {id: "u101", name: "User101", age: 29},
          |  {id: "u102", name: "User102", age: 33}
          |] AS user
          |CREATE (:Person {id: user.id, name: user.name, age: user.age})"""
      .stripMargin)
    assert(run("MATCH (n:Person) RETURN n").get.count() == 6)
    assert(run(
      """MATCH (p:Person) WHERE p.name =~ "(?i)alice" RETURN p""")
      .get.count() == 1)

    // -- 28: clear everything
    run("MATCH (n) DETACH DELETE n")
    assert(run("MATCH (n) RETURN n").get.count() == 0)
  }
}
