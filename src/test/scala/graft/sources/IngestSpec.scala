package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.cypher.Cypher

class IngestSpec extends SparkSpec {
  private implicit lazy val s: SparkSession = spark
  import spark.implicits._

  test("CSV ingestion: rows become vertices with stringified props") {
    val dir = Files.createTempDirectory("csv_ingest")
    Files.writeString(dir.resolve("people.csv"),
      "pid,name,age\nc1,Ada,36\nc2,Alan,41\n")
    val v = Ingest.csvVertices(spark, dir.toString, "Person")
    assert(v.count() == 2)
    val g = graft.engine.GraphState(v, pipeFixture.edges.limit(0))
    val ada = Cypher.query(g,
      "MATCH (p:Person {name: 'Ada'}) RETURN p.age")
      .collect().head.getString(0)
    assert(ada == "36")
  }

  test("JSON-lines ingestion with null-field dropping") {
    val dir = Files.createTempDirectory("json_ingest")
    Files.writeString(dir.resolve("d.jsonl"),
      """{"id":"j1","name":"X","opt":null}
        |{"id":"j2","name":"Y","opt":"set"}""".stripMargin)
    val v = Ingest.jsonVertices(spark, dir.toString, "Doc", "id")
    val rows = v.orderBy("id").collect()
    assert(rows.length == 2)
    val p1 = rows(0).getMap[String, String](2)
    assert(p1 == Map("name" -> "X")) // null opt dropped, never null-valued
  }

  test("FHIR bundle: resources to vertices, references to edges") {
    val bundle =
      """{"resourceType":"Bundle","entry":[
        |{"resource":{"resourceType":"Patient","id":"p1","gender":"female"}},
        |{"resource":{"resourceType":"Observation","id":"o1",
        |  "subject":{"reference":"Patient/p1"}}}]}""".stripMargin
          .replace("\n", "")
    val df = spark.read.json(Seq(bundle).toDS())
    val g = Ingest.fhirBundle(spark, df)
    assert(g.vertices.count() == 2)
    val e = g.edges.collect()
    assert(e.length == 1)
    assert(e.head.getString(1) == "Observation/o1" &&
      e.head.getString(2) == "Patient/p1")
  }

  test("HL7v2-ish segments group into typed message vertices") {
    val lines = Seq(
      "MSH|^~\\&|SND|FAC|RCV|FAC2|202401010000||ADT^A01|123|P|2.5",
      "PID|1||12345||Doe^John",
      "MSH|^~\\&|SND|FAC|RCV|FAC2|202401020000||ORU^R01|124|P|2.5",
      "OBX|1|NM|GLU||105").toDF("value")
    val msgs = Ingest.hl7Messages(spark, lines).orderBy("id").collect()
    assert(msgs.length == 2)
    assert(msgs(0).getString(1) == "ADT^A01")
    assert(msgs(1).getString(1) == "ORU^R01")
    val props = msgs(0).getMap[String, String](2)
    assert(props.contains("PID"))
  }

  test("GraphStore save/load round-trips a snapshot") {
    val dir = Files.createTempDirectory("graph_store").toString
    GraphStore.save(pipeFixture, dir)
    val loaded = GraphStore.load(spark, dir)
    assert(loaded.vertices.count() == pipeFixture.vertices.count())
    assert(loaded.edges.count() == pipeFixture.edges.count())
    // mutate-and-persist cycle (the recovery path)
    val g2 = loaded.detachDeleteVertices(
      loaded.vertices.filter(org.apache.spark.sql.functions
        .col("id") === "v1").select("id"))
    GraphStore.save(g2, dir + "_2")
    assert(GraphStore.load(spark, dir + "_2").vertices.count() == 3)
  }
}
