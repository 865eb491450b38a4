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

  property("map projections parse items, aliases, and the star") =
    forAll(ident, Gen.choose(1, 4), Gen.oneOf(true, false)) {
      (v, nKeys, star) =>
        val keys = (1 to nKeys).map(i => s".k$i")
        val items = (keys :+ "extra: 1") ++ (if (star) Seq(".*") else Nil)
        val ast = Parser.parse(
          s"MATCH ($v) RETURN $v {${items.mkString(", ")}} AS m")
        val r = ast.clauses.last.asInstanceOf[Ast.ReturnClause]
        r.items.head.expr match {
          case Ast.EMapProj(pv, its, st) =>
            pv == v && st == star && its.length == nKeys + 1 &&
              its.take(nKeys).forall {
                case (k, Ast.EProp(`v`, pk)) => k == pk
                case _                       => false
              }
          case _ => false
        }
    }

  property("parameters substitute literals of every scalar shape") =
    forAll(ident, Gen.choose(-1000L, 1000L), Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(true, false)) { (v, n, s, b) =>
      val ast = Parser.parse(
        s"MATCH ($v) WHERE $v.a = $$pn AND $v.b = $$ps AND $v.c = $$pb " +
          s"RETURN $v.a",
        Map("pn" -> n, "ps" -> s, "pb" -> b))
      def lits(e: Ast.Expr): Seq[Ast.Lit] = e match {
        case Ast.EBin(_, l, r) => lits(l) ++ lits(r)
        case Ast.ELit(l)       => Seq(l)
        case _                 => Seq.empty
      }
      val found = ast.clauses.head.asInstanceOf[Ast.MatchClause]
        .where.toSeq.flatMap(lits)
      found.contains(Ast.LInt(n)) && found.contains(Ast.LStr(s)) &&
        found.contains(Ast.LBool(b))
    }

  property("MERGE ON CREATE/ON MATCH SET attach to the right branches") =
    forAll(ident, ident, Gen.oneOf(true, false)) { (v, k, createFirst) =>
      val onC = s"ON CREATE SET $v.$k = 'c'"
      val onM = s"ON MATCH SET $v.$k = 'm'"
      val tail = if (createFirst) s"$onC $onM" else s"$onM $onC"
      val ast = Parser.parse(s"MERGE ($v:L {id: 'x'}) $tail")
      ast.clauses.head match {
        case Ast.MergeClause(_, oc, om) =>
          oc.length == 1 && om.length == 1
        case _ => false
      }
    }

  property("SET = and SET += parse to SetAll with the right mode") =
    forAll(ident, Gen.oneOf(true, false)) { (v, additive) =>
      val op = if (additive) "+=" else "="
      val ast = Parser.parse(s"MATCH ($v) SET $v $op {a: '1'}")
      ast.clauses.last match {
        case Ast.SetClause(Seq(Ast.SetAll(pv, _, add))) =>
          pv == v && add == additive
        case _ => false
      }
    }

  property("quantifiers parse to EQuant with the declared kind") =
    forAll(Gen.oneOf("any", "all", "none", "single"), ident, ident) {
      (kind, v, xs) =>
        val ast = Parser.parse(
          s"MATCH (n) WHERE $kind($v IN n.$xs WHERE $v > 1) RETURN n")
        val w = ast.clauses.head.asInstanceOf[Ast.MatchClause].where.get
        w match {
          case Ast.EQuant(k, pv, _, _) => k == kind && pv == v
          case _ => false
        }
    }

  property("list comprehension WHERE/| combinations parse") =
    forAll(ident, Gen.oneOf(0, 1, 2)) { (v, form) =>
      val body = form match {
        case 0 => s"[$v IN [1,2] WHERE $v > 1]"
        case 1 => s"[$v IN [1,2] | $v]"
        case _ => s"[$v IN [1,2] WHERE $v > 1 | $v]"
      }
      val ast = Parser.parse(s"RETURN $body AS xs")
      ast.clauses.head.asInstanceOf[Ast.ReturnClause].items.head.expr match {
        case Ast.EListComp(pv, _, _, pred) =>
          pv == v && (pred.isDefined == (form != 1))
        case _ => false
      }
    }

  property("pattern comprehensions parse; literal lists still parse") =
    forAll(ident, ident, ident) { (a, t, b) =>
      val pc = Parser.parse(
        s"MATCH ($a) RETURN [($a)-[:$t]->($b) | $b.x] AS xs")
        .clauses.last.asInstanceOf[Ast.ReturnClause].items.head.expr
      val lit = Parser.parse("RETURN [1, 2] AS xs")
        .clauses.head.asInstanceOf[Ast.ReturnClause].items.head.expr
      pc.isInstanceOf[Ast.EPatComp] && (lit match {
        case Ast.ELit(Ast.LList(vs)) => vs.length == 2
        case _ => false
      })
    }

  property("FOREACH parses nested update clauses only") =
    forAll(ident, ident) { (v, k) =>
      val ok = Parser.parse(
        s"MATCH (n) FOREACH ($v IN [1] | SET n.$k = $v)")
        .clauses.last match {
        case Ast.ForeachClause(pv, _, Seq(_: Ast.SetClause)) => pv == v
        case _ => false
      }
      val rejected =
        try { Parser.parse(s"FOREACH ($v IN [1] | RETURN $v)"); false }
        catch { case _: ParseException => true }
      ok && rejected
    }

  property("pattern predicates need a relationship; (expr) stays expr") =
    forAll(ident, ident) { (a, t) =>
      val pat = Parser.parse(s"MATCH ($a) WHERE ($a)-[:$t]->() RETURN $a")
        .clauses.head.asInstanceOf[Ast.MatchClause].where.get
      val arith = Parser.parse(s"RETURN ($a.x + 1) - 2 AS y")
        .clauses.head.asInstanceOf[Ast.ReturnClause].items.head.expr
      pat.isInstanceOf[Ast.ESub] && !arith.isInstanceOf[Ast.ESub]
    }
}
