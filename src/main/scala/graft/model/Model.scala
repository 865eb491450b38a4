package graft.model

import org.apache.spark.sql.types._

/** Core property-graph data model.
  *
  * Mirrors the reference's fundamental abstractions
  * (reference: models/src/vertices.rs:11-15, models/src/edges.rs:11-29,
  * models/src/properties.rs:43-51) re-expressed as Spark-friendly rows:
  *
  *  - ids are lowercase strings (UUIDs or deterministic surrogate keys);
  *    string ordering of canonical lowercase-hex UUIDs matches the
  *    reference's byte-order range scans (rdb/managers.rs:90-110).
  *  - labels are free-form identifiers (interned strings in the reference,
  *    models/src/identifiers.rs:130).
  *  - properties are an open MAP<STRING,STRING>: the reference's medical
  *    layer stringifies every property value anyway
  *    (lib/src/graph_engine/medical.rs:26-37), and the reference rejects
  *    null property values (cypher_parser.rs:809-819) — so absent keys
  *    model absence, never null values.
  *
  * At 100 TB scale both tables live as partitioned Parquet: vertices
  * hash-distributed by `id`, edges stored twice when inbound traversals are
  * hot (partitioned by `src` and by `dst`, mirroring the reference's
  * forward/reverse adjacency column families, rdb/datastore.rs:15-24).
  */
final case class Vertex(
    id: String,
    label: String,
    properties: Map[String, String])

/** Directed, typed edge. Identity is the (src, edgeType, dst) triple, as in
  * the reference (inmemory_storage.rs:16,163; proto/graphdb.proto:30-37 has
  * no edge id). `id` is a deterministic surrogate for convenience.
  */
final case class Edge(
    id: String,
    src: String,
    dst: String,
    edgeType: String,
    label: String,
    properties: Map[String, String])

object GraphSchemas {
  val vertexSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("properties",
      MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("edge_type", StringType, nullable = false),
    StructField("label", StringType, nullable = true),
    StructField("properties",
      MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  /** Identifier validation: non-empty, ≤255 bytes
    * (reference: models/src/identifiers.rs:144-150). */
  def validIdentifier(s: String): Boolean =
    s.nonEmpty && s.getBytes("UTF-8").length <= 255

  def requireIdentifier(s: String): String = {
    require(validIdentifier(s), s"invalid identifier: '$s'")
    s
  }
}
