package graft.ir

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean, throws}

/** Property tests for the IR's composition laws — the `output_type`
  * invariants of queries.rs:152-174 (SURVEY.md §5 plan item d). */
object IrPropertySpec extends Properties("GraphQueryIR") {
  import OutputType._

  private val leafGen: Gen[GraphQuery] = Gen.oneOf(
    Gen.const(AllVertex),
    Gen.const(AllEdge),
    Gen.listOfN(2, Gen.alphaStr).map(SpecificVertex(_)),
    Gen.alphaStr.map(VertexWithPropertyPresence),
    Gen.zip(Gen.alphaStr, Gen.alphaStr)
      .map { case (k, v) => VertexWithPropertyValue(k, v) },
    Gen.alphaStr.map(EdgeWithPropertyPresence))

  private def pipeGen(depth: Int): Gen[GraphQuery] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.lzy(pipeGen(depth - 1)).map(Pipe(_, Direction.Outbound)),
      2 -> Gen.lzy(pipeGen(depth - 1)).map(Pipe(_, Direction.Inbound)),
      1 -> Gen.lzy(pipeGen(depth - 1))
        .map(PipeWithPropertyPresence(_, "k", true)),
      1 -> Gen.lzy(pipeGen(depth - 1)).map(Include(_)))

  implicit val arbQuery: Arbitrary[GraphQuery] = Arbitrary(pipeGen(4))

  private def isElems(q: GraphQuery): Boolean =
    q.outputType == Vertices || q.outputType == Edges

  property("pipe flips Vertices<->Edges") = forAll { (q: GraphQuery) =>
    !isElems(q) || {
      val flipped = q.outbound().outputType
      (q.outputType == Vertices) == (flipped == Edges)
    }
  }

  property("filters preserve output type") = forAll { (q: GraphQuery) =>
    !isElems(q) ||
      (q.withPropertyPresence("x").outputType == q.outputType &&
        q.withPropertyValue("x", "y").outputType == q.outputType)
  }

  property("Count is terminal") = forAll { (q: GraphQuery) =>
    !isElems(q) || {
      val c = q.count
      c.outputType == Counts &&
        throws(classOf[IllegalArgumentException])(c.outbound()) &&
        throws(classOf[IllegalArgumentException])(c.properties()) &&
        throws(classOf[IllegalArgumentException])(c.include)
    }
  }

  property("Include increments outputLen; pipe/count preserve it") =
    forAll { (q: GraphQuery) =>
      !isElems(q) ||
        (Include(q).outputLen == q.outputLen + 1 &&
          q.outbound().outputLen == q.outputLen &&
          Count(q).outputLen == q.outputLen)
    }

  property("properties projection maps element kind to property kind") =
    forAll { (q: GraphQuery) =>
      q.outputType match {
        case Vertices => q.properties().outputType == VertexProperties
        case Edges    => q.properties().outputType == EdgeProperties
        case _        => true
      }
    }
}
