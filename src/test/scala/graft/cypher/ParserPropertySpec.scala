package graft.cypher

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Parser robustness: generated well-formed queries always parse to the
  * expected clause shapes; garbage never crashes with anything but
  * ParseException. */
object ParserPropertySpec extends Properties("CypherParser") {

  private def notKeyword(s: String): Boolean =
    s.nonEmpty && !Parser.tokenize(s).head.isInstanceOf[Parser.TKw]

  private val ident = Gen.identifier.map(_.take(8))
    .suchThat(notKeyword)

  property("MATCH-WHERE-RETURN round-trips structure") =
    forAll(ident, ident, ident, Gen.alphaNumStr.map(_.take(10)),
      Gen.choose(0L, 1000L)) { (v, label, prop, s, n) =>
      val q = s"""MATCH ($v:$label) WHERE $v.$prop > $n """ +
        s"""AND $v.$prop CONTAINS '$s' RETURN $v.$prop AS p """ +
        s"""ORDER BY p LIMIT 7"""
      val ast = Parser.parse(q)
      val m = ast.clauses.head.asInstanceOf[Ast.MatchClause]
      val r = ast.clauses.last.asInstanceOf[Ast.ReturnClause]
      ast.clauses.length == 2 &&
        m.patterns.head.head.labels == Seq(label) &&
        m.where.isDefined && r.limit.contains(7L)
    }

  property("relationship chains parse with right arity") =
    forAll(Gen.choose(1, 6), ident) { (hops, t) =>
      val chain = (1 to hops).map(i => s"-[:$t]->(n$i)").mkString
      val ast = Parser.parse(s"MATCH (n0)$chain RETURN n0")
      val m = ast.clauses.head.asInstanceOf[Ast.MatchClause]
      m.patterns.head.tail.length == hops
    }

  property("garbage never throws anything but ParseException") =
    forAll(Gen.asciiPrintableStr) { s =>
      try { Parser.parse(s); true }
      catch {
        case _: ParseException => true
        case _: Throwable      => false
      }
    }

  property("string literals round-trip through the lexer") =
    forAll(Gen.alphaNumStr, Gen.oneOf("'", "\"")) { (s, q) =>
      Parser.tokenize(s"RETURN $q$s$q").contains(Parser.TStr(s))
    }
}
