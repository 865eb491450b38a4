package graft.model

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cypher.Cypher
import graft.engine.GraphState

class MedicalSpec extends SparkSpec {
  private implicit lazy val s: SparkSession = spark
  import Medical._

  private def emptyGraph = GraphState(
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      GraphSchemas.vertexSchema),
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      GraphSchemas.edgeSchema))

  test("typed datasets project to stringified vertices, queryable in Cypher") {
    import spark.implicits._
    val patients = Seq(
      Patient("p1", "Ada", "Lovelace", "1815-12-10", "F"),
      Patient("p2", "Alan", "Turing", "1912-06-23", "M")).toDS()
    val dx = Seq(
      Diagnosis("d1", "I10", "Hypertension", "2024-01-01")).toDS()
    val links = Seq(("p1", "d1")).toDF("patient_id", "diagnosis_id")

    val g = insertPatientWithDiagnosis(emptyGraph, patients, dx, links)
    assert(g.vertices.count() == 3)
    // stringified properties (medical.rs:26-37 contract)
    val name = Cypher.query(g,
      """MATCH (p:Patient {first_name: 'Ada'}) RETURN p.last_name""")
      .collect().head.getString(0)
    assert(name == "Lovelace")
    // the convenience edge traverses
    val viaDx = Cypher.query(g,
      """MATCH (p:Patient)-[:HAS_DIAGNOSIS]->(d:Diagnosis {code: 'I10'})
        |RETURN p.first_name""".stripMargin)
      .collect().map(_.getString(0))
    assert(viaDx.toSeq == Seq("Ada"))
    // endpoint validation: dangling link is dropped
    val g2 = insertPatientWithDiagnosis(g, patients.limit(0), dx.limit(0),
      Seq(("ghost", "d1")).toDF("patient_id", "diagnosis_id"))
    assert(g2.edges.count() == 1)
  }
}
