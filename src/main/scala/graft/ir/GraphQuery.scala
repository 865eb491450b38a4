package graft.ir

/** Query IR mirroring the reference's indradb `Query` enum
  * (reference: models/src/queries.rs:88-123) including the static
  * output-type discipline (queries.rs:152-174): pipes only compose on
  * element-producing queries, `Count` is terminal.
  *
  * This is a *logical* IR — the engine compiles it to DataFrame plans and
  * Catalyst does the physical planning (the reference has no optimizer at
  * all; see SURVEY.md §4).
  */
sealed trait OutputType
object OutputType {
  case object Vertices extends OutputType
  case object Edges extends OutputType
  case object VertexProperties extends OutputType
  case object EdgeProperties extends OutputType
  case object Counts extends OutputType
}

sealed trait Direction
object Direction {
  /** Follow edges whose `src` is in the current vertex frontier, or from an
    * edge frontier to the `dst` ("outbound") vertices. */
  case object Outbound extends Direction
  case object Inbound extends Direction
}

sealed trait GraphQuery {
  import OutputType._

  /** Static output-shape check, mirroring queries.rs:152-174. */
  def outputType: OutputType = this match {
    case AllVertex | _: RangeVertex | _: SpecificVertex |
        _: VertexWithPropertyPresence | _: VertexWithPropertyValue =>
      Vertices
    case AllEdge | _: SpecificEdge | _: EdgeWithPropertyPresence |
        _: EdgeWithPropertyValue =>
      Edges
    case p: Pipe => p.inner.outputType match {
      case Vertices => Edges
      case Edges    => Vertices
      case other    => throw new IllegalArgumentException(
        s"cannot pipe on $other output")
    }
    case p: PipeProperty => p.inner.outputType match {
      case Vertices => VertexProperties
      case Edges    => EdgeProperties
      case other    => throw new IllegalArgumentException(
        s"cannot project properties of $other output")
    }
    case p: PipeWithPropertyPresence => p.inner.outputType
    case p: PipeWithPropertyValue    => p.inner.outputType
    case i: Include                  => i.inner.outputType
    case _: Count                    => Counts
  }

  /** Number of output values this query tree emits
    * (reference: queries.rs:125-147 — `Include` adds intermediates).
    *
    * INTENTIONAL divergence from the reference's `output_len`
    * (queries.rs:139: `Count(_) => 1`): at RUNTIME the reference emits
    * every Include intermediate even under a terminal Count — its own
    * integration test asserts `include().outbound().include().count()`
    * produces THREE outputs (lib/src/tests/include_query.rs:7-31:
    * Vertices, Edges, Count(5)). `output_len` there is only a
    * `Vec::with_capacity` hint (queries.rs:126-128), so undercounting
    * is a missed reallocation, not a semantics statement. We follow the
    * test-asserted runtime behavior — `Count => inner.outputLen` — and
    * keep compileAll's recursion in lockstep (GraphEngine.scala); gate
    * g13_count_over_include pins the 3-output shape end-to-end. */
  def outputLen: Int = this match {
    case i: Include                  => i.inner.outputLen + 1
    case p: Pipe                     => p.inner.outputLen
    case p: PipeProperty             => p.inner.outputLen
    case p: PipeWithPropertyPresence => p.inner.outputLen
    case p: PipeWithPropertyValue    => p.inner.outputLen
    case c: Count                    => c.inner.outputLen
    case _                           => 1
  }

  // ---- builder API (mirrors queries.rs:178-240 pipe builders) ----
  private def requireElems(op: String): Unit = outputType match {
    case Vertices | Edges => ()
    case other => throw new IllegalArgumentException(s"cannot $op on $other")
  }
  def outbound(t: Option[String] = None, limit: Option[Int] = None): Pipe = {
    requireElems("pipe"); Pipe(this, Direction.Outbound, t, limit)
  }
  def inbound(t: Option[String] = None, limit: Option[Int] = None): Pipe = {
    requireElems("pipe"); Pipe(this, Direction.Inbound, t, limit)
  }
  def properties(name: Option[String] = None): PipeProperty = {
    requireElems("project properties"); PipeProperty(this, name)
  }
  def withPropertyPresence(name: String, present: Boolean = true)
      : PipeWithPropertyPresence = {
    requireElems("filter"); PipeWithPropertyPresence(this, name, present)
  }
  def withPropertyValue(name: String, value: String, equal: Boolean = true)
      : PipeWithPropertyValue = {
    requireElems("filter"); PipeWithPropertyValue(this, name, value, equal)
  }
  def count: Count = Count(this)
  def include: Include = { requireElems("include"); Include(this) }
}

/** Full vertex scan (queries.rs:252-264). */
case object AllVertex extends GraphQuery

/** Ordered id-range scan with optional label filter and limit
  * (queries.rs:267-332). */
final case class RangeVertex(
    startId: Option[String] = None,
    t: Option[String] = None,
    limit: Option[Int] = None) extends GraphQuery

/** Point lookups by id list (queries.rs:335-360). */
final case class SpecificVertex(ids: Seq[String]) extends GraphQuery

/** Property-presence filter over vertices (queries.rs:363-379). */
final case class VertexWithPropertyPresence(name: String) extends GraphQuery

/** Property == value filter over vertices (queries.rs:382-404). */
final case class VertexWithPropertyValue(name: String, value: String)
    extends GraphQuery

/** Full edge scan (queries.rs:407-419). */
case object AllEdge extends GraphQuery

/** Point lookups by (src, edgeType, dst) triples (queries.rs:422-446). */
final case class SpecificEdge(keys: Seq[(String, String, String)])
    extends GraphQuery

final case class EdgeWithPropertyPresence(name: String) extends GraphQuery
final case class EdgeWithPropertyValue(name: String, value: String)
    extends GraphQuery

/** THE traversal join (queries.rs:496-521; proto/graphdb.proto:142-151
  * adds the per-hop `limit` + edge-type filter `t`, which we adopt). */
final case class Pipe(
    inner: GraphQuery,
    direction: Direction,
    t: Option[String] = None,
    limit: Option[Int] = None) extends GraphQuery

/** Project entity → (entity, properties); optional single-property variant
  * (queries.rs:524-545; proto/graphdb.proto:153-159). */
final case class PipeProperty(inner: GraphQuery, name: Option[String] = None)
    extends GraphQuery

/** Filter upstream results by property presence/absence
  * (queries.rs:548-587). */
final case class PipeWithPropertyPresence(
    inner: GraphQuery, name: String, present: Boolean) extends GraphQuery

/** Filter upstream results by property ==/!= value (queries.rs:590-635). */
final case class PipeWithPropertyValue(
    inner: GraphQuery, name: String, value: String, equal: Boolean)
    extends GraphQuery

/** Emit an intermediate result in addition to the final one
  * (queries.rs:637-654). */
final case class Include(inner: GraphQuery) extends GraphQuery

/** Terminal count (queries.rs:656-675). */
final case class Count(inner: GraphQuery) extends GraphQuery
