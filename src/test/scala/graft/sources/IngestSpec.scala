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
      ("f1", 0, "MSH|^~\\&|SND|FAC|RCV|FAC2|202401010000||ADT^A01|123|P|2.5"),
      ("f1", 1, "PID|1||12345||Doe^John"),
      ("f1", 2, "MSH|^~\\&|SND|FAC|RCV|FAC2|202401020000||ORU^R01|124|P|2.5"),
      ("f1", 3, "OBX|1|NM|GLU||105"),
      ("f1", 4, "OBX|2|NM|HBA1C||5.4") // repeated segment: first wins
    ).toDF("file", "offset", "value")
    val msgs = Ingest.hl7Messages(spark, lines)
      .orderBy("id").collect()
    assert(msgs.length == 2)
    assert(msgs.map(_.getString(1)).toSet == Set("ADT^A01", "ORU^R01"))
    val byType = msgs.map(m => m.getString(1) ->
      m.getMap[String, String](2)).toMap
    assert(byType("ADT^A01").contains("PID"))
    assert(byType("ORU^R01")("OBX") == "OBX|1|NM|GLU||105")
  }

  test("HL7 file ingest windows per file — no single-partition exchange") {
    val dir = Files.createTempDirectory("hl7").toString
    Files.write(java.nio.file.Paths.get(dir, "a.hl7"),
      ("MSH|^~\\&|A|F|R|F2|t||ADT^A01|1|P|2.5\nPID|1||1||A^B\n")
        .getBytes)
    Files.write(java.nio.file.Paths.get(dir, "b.hl7"),
      ("MSH|^~\\&|B|F|R|F2|t||ORU^R01|2|P|2.5\nOBX|1|NM|GLU||99\n")
        .getBytes)
    val msgs = Ingest.hl7Files(spark, dir)
    val plan = msgs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"per-file window must not serialize the corpus:\n$plan")
    val rows = msgs.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet == Set("ADT^A01", "ORU^R01"))
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
