package graft.engine

import graft.SparkSpec
import graft.ir._

/** Ports the reference's pipe/traversal unit inventory
  * (lib/src/tests/vertex.rs, edge.rs, properties.rs — via FIXTURES.md F1-F3)
  * against the DataFrame compiler.
  */
class QueryCompilerSpec extends SparkSpec {
  private def ids(q: GraphQuery): Set[String] =
    QueryCompiler(pipeFixture).compile(q)
      .select("id").collect().map(_.getString(0)).toSet

  test("AllVertex scans everything") {
    assert(ids(AllVertex) == Set("v1", "v2", "v3", "v4"))
  }

  test("RangeVertex: label filter + start id + limit, id-ordered") {
    assert(ids(RangeVertex(t = Some("test_inbound_vertex_type")))
      == Set("v2", "v3"))
    assert(ids(RangeVertex(startId = Some("v2"))) == Set("v3", "v4"))
    val limited = QueryCompiler(pipeFixture)
      .compile(RangeVertex(limit = Some(2)))
      .collect().map(_.getString(0))
    assert(limited.toSeq == Seq("v1", "v2")) // id order, like UUID scans
  }

  test("SpecificVertex point lookup") {
    assert(ids(SpecificVertex(Seq("v1", "v4", "missing"))) == Set("v1", "v4"))
  }

  test("property presence / value filters") {
    assert(ids(VertexWithPropertyPresence("name")) == Set("v1", "v2"))
    assert(ids(VertexWithPropertyValue("name", "alice")) == Set("v1"))
    assert(ids(VertexWithPropertyValue("name", "nobody")) == Set.empty)
  }

  test("outbound pipe: vertex -> edges -> vertices") {
    val q = SpecificVertex(Seq("v1")).outbound()
    assert(ids(q) == Set("e1", "e2", "e3"))
    assert(ids(q.outbound()) == Set("v2", "v3", "v4"))
  }

  test("outbound pipe with edge-type filter (proto PipeQuery.t)") {
    val q = SpecificVertex(Seq("v1")).outbound(t = Some("test_edge_type"))
    assert(ids(q) == Set("e1", "e2"))
    assert(ids(SpecificVertex(Seq("v1"))
      .outbound(t = Some("nope"))) == Set.empty)
  }

  test("inbound pipe follows reverse adjacency") {
    val q = SpecificVertex(Seq("v1")).inbound()
    assert(ids(q) == Set("e4"))
    assert(ids(q.inbound()) == Set("v4"))
  }

  test("pipe limit bounds the hop") {
    val q = SpecificVertex(Seq("v1")).outbound(limit = Some(1))
    assert(QueryCompiler(pipeFixture).compile(q).count() == 1)
    // zero limit returns empty (lib/src/tests/vertex.rs:33-38)
    val zero = SpecificVertex(Seq("v1")).outbound(limit = Some(0))
    assert(QueryCompiler(pipeFixture).compile(zero).count() == 0)
  }

  test("PipeWithPropertyValue equal / not-equal semantics") {
    val base = RangeVertex(t = Some("test_vertex_type"))
    assert(ids(base.withPropertyValue("name", "alice")) == Set("v1"))
    // != keeps only rows where the key exists and differs
    assert(ids(AllVertex.withPropertyValue("name", "alice", equal = false))
      == Set("v2"))
    assert(ids(AllVertex.withPropertyPresence("name", present = false))
      == Set("v3", "v4"))
  }

  test("Count is terminal and cannot be piped") {
    val c = QueryCompiler(pipeFixture).compile(AllVertex.count)
      .collect().head.getLong(0)
    assert(c == 4)
    intercept[IllegalArgumentException] { AllVertex.count.outbound() }
  }

  test("Include emits intermediate + final outputs") {
    val q = SpecificVertex(Seq("v1")).include.outbound()
    // output_len mirrors queries.rs:125-147
    assert(q.outputLen == 2)
    val outs = QueryCompiler(pipeFixture).compileAll(
      Include(SpecificVertex(Seq("v1"))))
    assert(outs.length == 2)
    // nested under a pipe: compileAll output count matches outputLen,
    // first output = the included frontier, last = the hop result
    val chained = QueryCompiler(pipeFixture).compileAll(q)
    assert(chained.length == q.outputLen)
    assert(chained.head.select("id").collect().map(_.getString(0)).toSet
      == Set("v1"))
    assert(chained.last.columns.contains("edge_type"))
  }

  test("PipeProperty explodes properties; named variant filters") {
    val all = QueryCompiler(pipeFixture)
      .compile(SpecificVertex(Seq("v1")).properties())
      .collect()
    assert(all.map(r => (r.getString(1), r.getString(2))).toSet
      == Set(("name", "alice")))
    val named = QueryCompiler(pipeFixture)
      .compile(AllVertex.properties(Some("flag"))).collect()
    assert(named.map(_.getString(0)).toSet == Set("v4"))
  }
}
