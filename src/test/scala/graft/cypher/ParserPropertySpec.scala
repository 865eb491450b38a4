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

  property("CASE parses with the declared number of WHEN branches") =
    forAll(Gen.choose(1, 5), ident, ident) { (branches, v, prop) =>
      val whens = (1 to branches)
        .map(i => s"WHEN $v.$prop = $i THEN 'b$i'").mkString(" ")
      val ast = Parser.parse(
        s"MATCH ($v) RETURN CASE $whens ELSE 'z' END AS c")
      val r = ast.clauses.last.asInstanceOf[Ast.ReturnClause]
      r.items.head.expr match {
        case Ast.ECase(None, ws, Some(_)) => ws.length == branches
        case _                            => false
      }
    }

  property("UNION chains split into the right number of parts") =
    forAll(Gen.choose(2, 5), ident, Gen.oneOf(true, false)) {
      (parts, v, all) =>
        val sep = if (all) " UNION ALL " else " UNION "
        val q = (1 to parts).map(_ => s"MATCH ($v) RETURN $v.x AS x")
          .mkString(sep)
        val (qs, isAll) = Parser.parseMulti(q)
        qs.length == parts && isAll == all
    }

  property("EXISTS/COUNT subqueries parse inside WHERE") =
    forAll(ident, ident, Gen.oneOf("EXISTS", "COUNT")) { (v, t, kind) =>
      val ast = Parser.parse(
        s"MATCH ($v) WHERE $kind { ($v)-[:$t]->() } RETURN $v.x")
      val m = ast.clauses.head.asInstanceOf[Ast.MatchClause]
      m.where.exists {
        case Ast.ESub(isCount, pats, None) =>
          isCount == (kind == "COUNT") && pats.nonEmpty
        case _ => false
      }
    }

  property("reduce() parses acc/var/source/projection") =
    forAll(ident, ident, ident) { (acc, x, xs) =>
      val ast = Parser.parse(
        s"MATCH (n) RETURN reduce($acc = 0, $x IN n.$xs | $acc + $x) AS r")
      val r = ast.clauses.last.asInstanceOf[Ast.ReturnClause]
      r.items.head.expr match {
        case Ast.EReduce(a, _, v, _, _) => a == acc && v == x
        case _                          => false
      }
    }
}
