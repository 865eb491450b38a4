package graft.cypher

import scala.collection.mutable.ArrayBuffer

import Ast._

/** Hand-rolled recursive-descent parser for the §2.B Cypher subset (no
  * external parser deps resolve offline — SURVEY.md §7.2.4). Grammar
  * follows the reference's declared corpus (queries_examples.txt) rather
  * than its partial nom parser (cypher_parser.rs:532-641).
  */
final class ParseException(msg: String) extends RuntimeException(msg)

object Parser {

  // ---------- lexer ----------
  sealed trait Tok
  final case class TIdent(s: String) extends Tok    // bare identifier
  /** Keyword token: equality/matching use the CANONICAL uppercase form
    * `s`; `raw` preserves the source spelling so keyword-shaped
    * identifiers (a `:CONTAINS` relationship type, an `end` property)
    * keep their case when used as names. */
  final class TKw(val s: String, val raw: String) extends Tok {
    override def equals(o: Any): Boolean = o match {
      case k: TKw => k.s == s
      case _      => false
    }
    override def hashCode: Int = s.hashCode
    override def toString: String = s"TKw($s)"
  }
  object TKw {
    def apply(s: String): TKw = new TKw(s, s)
    def apply(s: String, raw: String): TKw = new TKw(s, raw)
    def unapply(t: TKw): Option[String] = Some(t.s)
  }
  final case class TStr(s: String) extends Tok
  final case class TNum(s: String) extends Tok
  final case class TSym(s: String) extends Tok
  case object TEnd extends Tok

  private val keywords = Set("MATCH", "OPTIONAL", "WHERE", "RETURN", "CREATE",
    "SET", "REMOVE", "DELETE", "DETACH", "ORDER", "BY", "LIMIT", "SKIP",
    "AND", "OR", "NOT", "XOR", "AS", "ASC", "DESC", "ASCENDING", "DESCENDING",
    "DISTINCT", "UNWIND", "WITH", "CONTAINS", "STARTS", "ENDS", "IN", "IS",
    "NULL", "TRUE", "FALSE", "MERGE", "CASE", "WHEN", "THEN", "ELSE", "END",
    "UNION", "ALL", "ON", "CALL", "FOREACH")

  private val symbols = Seq("<=", ">=", "<>", "!=", "=~", "->", "<-", "..",
    "+=", "(", ")", "[", "]", "{", "}", ":", ",", ".", "=", "<", ">", "+",
    "-", "*", "/", "|", "%", "&", "$", "^")

  def tokenize(q: String): Vector[Tok] = {
    val out = ArrayBuffer[Tok]()
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != quote) {
          if (q(i) == '\\' && i + 1 < n) { sb.append(q(i + 1)); i += 2 }
          else { sb.append(q(i)); i += 1 }
        }
        if (i >= n) throw new ParseException(s"unterminated string in: $q")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && q(i + 1).isDigit &&
            out.lastOption.exists(t => !t.isInstanceOf[TIdent]))) {
        val start = i
        while (i < n && (q(i).isDigit || q(i) == '.') &&
            !(q(i) == '.' && i + 1 < n && q(i + 1) == '.')) i += 1
        out += TNum(q.substring(start, i))
      } else if (c.isLetter || c == '_' || c == '`') {
        if (c == '`') {
          val end = q.indexOf('`', i + 1)
          if (end < 0) throw new ParseException("unterminated backtick")
          out += TIdent(q.substring(i + 1, end)); i = end + 1
        } else {
          val start = i
          while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
          val word = q.substring(start, i)
          if (keywords.contains(word.toUpperCase))
            out += TKw(word.toUpperCase, word)
          else out += TIdent(word)
        }
      } else {
        symbols.find(s => q.startsWith(s, i)) match {
          case Some(s) => out += TSym(s); i += s.length
          case None =>
            throw new ParseException(s"unexpected char '$c' at $i in: $q")
        }
      }
    }
    out += TEnd
    out.toVector
  }

  def parse(query: String, params: Map[String, Any] = Map.empty)
      : CypherQuery =
    new Parser(tokenize(query.trim.stripSuffix(";")), params).parseQuery()

  /** Top-level UNION [ALL] chain: (parts, isUnionAll). A single-part
    * query returns (Seq(q), false). Mixing UNION and UNION ALL in one
    * chain is rejected (Cypher parity). */
  def parseMulti(query: String, params: Map[String, Any] = Map.empty)
      : (Seq[CypherQuery], Boolean) =
    new Parser(tokenize(query.trim.stripSuffix(";")), params)
      .parseUnionChain()

  /** Parameter value → literal AST (applied at parse time: `$name` is
    * indistinguishable from an inline literal downstream, so every
    * expression position that takes a literal takes a parameter). */
  def toLit(v: Any): Lit = v match {
    case s: String  => LStr(s)
    case i: Int     => LInt(i.toLong)
    case l: Long    => LInt(l)
    case s: Short   => LInt(s.toLong)
    case d: Double  => LFloat(d)
    case f: Float   => LFloat(f.toDouble)
    case b: Boolean => LBool(b)
    case seq: Seq[_]  => LList(seq.map(toLit))
    case m: Map[_, _] =>
      LMap(m.map { case (k, mv) => k.toString -> toLit(mv) })
    case null => LStr(null)
    case other =>
      throw new ParseException(
        s"unsupported parameter type: ${other.getClass.getName}")
  }
}

final class Parser(toks: Vector[Parser.Tok],
    params: Map[String, Any] = Map.empty) {
  import Parser._
  import Ast._

  private var pos = 0
  private def paramLit(): Lit = {
    val name = ident()
    params.get(name) match {
      case Some(v) => Parser.toLit(v)
      case None => throw new ParseException(s"missing parameter: $$$name")
    }
  }
  private def peek: Tok = toks(pos)
  private def next(): Tok = { val t = toks(pos); pos += 1; t }
  private def fail(msg: String): Nothing =
    throw new ParseException(s"$msg (at token $pos: $peek)")

  private def isKw(s: String): Boolean = peek == TKw(s)
  private def eatKw(s: String): Unit =
    if (isKw(s)) pos += 1 else fail(s"expected $s")
  private def tryKw(s: String): Boolean =
    if (isKw(s)) { pos += 1; true } else false
  private def isSym(s: String): Boolean = peek == TSym(s)
  private def eatSym(s: String): Unit =
    if (isSym(s)) pos += 1 else fail(s"expected '$s'")
  private def trySym(s: String): Boolean =
    if (isSym(s)) { pos += 1; true } else false
  private def tokAt(i: Int): Tok = if (i < toks.length) toks(i) else TEnd

  private def quantKind(t: Tok): Option[String] = t match {
    case TIdent(s) if Set("any", "none", "single")(s.toLowerCase) =>
      Some(s.toLowerCase)
    case TKw("ALL") => Some("all")
    case _ => None
  }

  private def ident(): String = next() match {
    case TIdent(s) => s
    case k: TKw    => k.raw // keyword-shaped name: keep the source case
    case t         => fail(s"expected identifier, got $t")
  }

  def parseUnionChain(): (Seq[CypherQuery], Boolean) = {
    val parts = ArrayBuffer(parseQuery())
    var all: Option[Boolean] = None
    while (tryKw("UNION")) {
      val thisAll = tryKw("ALL")
      if (all.exists(_ != thisAll))
        fail("cannot mix UNION and UNION ALL in one query")
      all = Some(thisAll)
      parts += parseQuery()
    }
    if (peek != TEnd) fail("unexpected trailing input")
    (parts.toSeq, all.getOrElse(false))
  }

  def parseQuery(): CypherQuery = parseQueryInner(stopAtBrace = false)

  private def parseQueryInner(stopAtBrace: Boolean,
      stopAtParen: Boolean = false): CypherQuery = {
    val clauses = ArrayBuffer[Clause]()
    while (peek != TEnd && !isKw("UNION") &&
        !(stopAtBrace && isSym("}")) && !(stopAtParen && isSym(")"))) {
      peek match {
        case TKw("MATCH")    => clauses += parseMatch(optional = false)
        case TKw("OPTIONAL") =>
          eatKw("OPTIONAL"); clauses += parseMatch(optional = true)
        case TKw("UNWIND") =>
          eatKw("UNWIND")
          val list = parseExpr()
          eatKw("AS")
          clauses += UnwindClause(list, ident())
        case TKw("WITH") =>
          eatKw("WITH")
          val distinct = tryKw("DISTINCT")
          val items = parseReturnItems()
          val orderBy = parseOrderBy()
          val skip = if (tryKw("SKIP")) Some(parseNum()) else None
          val limit = if (tryKw("LIMIT")) Some(parseNum()) else None
          val where = if (tryKw("WHERE")) Some(parseExpr()) else None
          clauses += WithClause(items, where, orderBy, skip, limit, distinct)
        case TKw("CREATE") =>
          next()
          clauses += CreateClause(parsePatterns())
        case TKw("MERGE") =>
          next()
          val pat = parsePathPattern()
          var onCreate = Seq.empty[SetItem]
          var onMatch = Seq.empty[SetItem]
          while (tryKw("ON")) {
            val which = ident().toLowerCase
            eatKw("SET")
            val items = parseSetItems()
            which match {
              case "create" => onCreate ++= items
              case "match"  => onMatch ++= items
              case other => fail(s"expected ON CREATE/ON MATCH, got $other")
            }
          }
          clauses += MergeClause(pat, onCreate, onMatch)
        case TKw("SET") =>
          eatKw("SET")
          clauses += SetClause(parseSetItems())
        case TKw("REMOVE") =>
          eatKw("REMOVE")
          clauses += RemoveClause(parseRemoveItems())
        case TKw("DETACH") =>
          eatKw("DETACH"); eatKw("DELETE")
          clauses += DeleteClause(parseVarList(), detach = true)
        case TKw("DELETE") =>
          eatKw("DELETE")
          clauses += DeleteClause(parseVarList(), detach = false)
        case TKw("RETURN") =>
          eatKw("RETURN")
          clauses += parseReturn()
        case TKw("CALL") =>
          eatKw("CALL")
          if (isSym("{")) {
            eatSym("{")
            val sub = parseQueryInner(stopAtBrace = true)
            eatSym("}")
            clauses += CallClause(sub)
          } else {
            // CALL proc(args...) [YIELD a [AS x], ...] — dotted name
            val parts = scala.collection.mutable.ArrayBuffer(ident())
            while (trySym(".")) parts += ident()
            eatSym("(")
            val args = scala.collection.mutable.ArrayBuffer[Expr]()
            if (!isSym(")")) {
              args += parseExpr()
              while (trySym(",")) args += parseExpr()
            }
            eatSym(")")
            val ys = scala.collection.mutable
              .ArrayBuffer[(String, Option[String])]()
            peek match {
              case TIdent(s) if s.equalsIgnoreCase("yield") =>
                pos += 1
                def one(): Unit = {
                  val c = ident()
                  val alias = if (tryKw("AS")) Some(ident()) else None
                  ys += ((c, alias))
                }
                one()
                while (trySym(",")) one()
              case _ =>
            }
            clauses += ProcedureClause(parts.mkString("."), args.toSeq,
              ys.toSeq)
          }
        case TKw("FOREACH") =>
          eatKw("FOREACH"); eatSym("(")
          val v = ident()
          eatKw("IN")
          val list = parseExpr()
          eatSym("|")
          val sub = parseQueryInner(stopAtBrace = false, stopAtParen = true)
          eatSym(")")
          sub.clauses.foreach {
            case _: CreateClause | _: SetClause | _: RemoveClause |
                _: DeleteClause | _: ForeachClause => // update clauses only
            case c => fail(s"FOREACH allows only update clauses, got $c")
          }
          clauses += ForeachClause(v, list, sub.clauses)
        case t => fail(s"unexpected clause start: $t")
      }
    }
    CypherQuery(clauses.toSeq)
  }

  private def parseMatch(optional: Boolean): MatchClause = {
    eatKw("MATCH")
    val pats = parsePatterns()
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    MatchClause(optional, pats, where)
  }

  private def parsePatterns(): Seq[PathPat] = {
    val pats = ArrayBuffer(parsePathPattern())
    while (trySym(",")) pats += parsePathPattern()
    pats.toSeq
  }

  private def parsePathPattern(): PathPat = {
    // p = shortestPath((a)-[*..5]-(b))  |  p = (a)-->(b)  |  (a)-->(b)
    var pathVar: Option[String] = None
    var shortest = false
    peek match {
      case TIdent(name) if toks(pos + 1) == TSym("=") =>
        pathVar = Some(name); pos += 2
      case _ =>
    }
    peek match {
      case TIdent(f) if f.equalsIgnoreCase("shortestPath") ||
          f.equalsIgnoreCase("allShortestPaths") =>
        shortest = true
        val all = f.equalsIgnoreCase("allShortestPaths")
        pos += 1; eatSym("(")
        val p = parseChain(pathVar, shortest, all)
        eatSym(")")
        return p
      case _ =>
    }
    parseChain(pathVar, shortest, all = false)
  }

  private def parseChain(pathVar: Option[String], shortest: Boolean,
      all: Boolean): PathPat = {
    val head = parseNodePat()
    val tail = ArrayBuffer[(RelPat, NodePat)]()
    while (isSym("-") || isSym("<-")) {
      val rel = parseRelPat()
      val node = parseNodePat()
      tail += ((rel, node))
    }
    PathPat(pathVar, shortest, head, tail.toSeq, all)
  }

  private def parseNodePat(): NodePat = {
    eatSym("(")
    var variable: Option[String] = None
    peek match {
      case TIdent(s) => variable = Some(s); pos += 1
      case _ =>
    }
    val labels = ArrayBuffer[String]()
    while (isSym(":") || isSym("&")) {
      next()
      labels += ident()
    }
    // reference also allows `Person&Actor` label syntax (cypher_parser.rs:160-204)
    var done = false
    while (!done) peek match {
      case TSym("&") => pos += 1; labels += ident()
      case _ => done = true
    }
    val props = if (isSym("{")) parsePropMapExpr() else Map.empty[String, Expr]
    eatSym(")")
    NodePat(variable, labels.toSeq, props)
  }

  private def parseRelPat(): RelPat = {
    // <-[r:T]- | -[r:T]-> | -[r]- | --> | <-- | --
    var direction = 0
    val leftArrow = trySym("<-")
    if (!leftArrow) eatSym("-")
    if (leftArrow) direction = -1
    var variable: Option[String] = None
    var types = Seq.empty[String]
    var props = Map.empty[String, Expr]
    var varLength: Option[(Int, Int)] = None
    if (trySym("[")) {
      peek match {
        case TIdent(s) => variable = Some(s); pos += 1
        case _ =>
      }
      if (trySym(":")) {
        val ts = ArrayBuffer(ident())
        while (trySym("|")) {
          trySym(":") // allow [:A|:B]
          ts += ident()
        }
        types = ts.toSeq
      }
      if (trySym("*")) {
        // *  |  *2  |  *1..3  |  *..5
        var min = 1
        var max = 15 // default bound — unbounded explodes; QE uses ..5
        peek match {
          case TNum(a) =>
            pos += 1
            if (trySym("..")) peek match {
              case TNum(b) => pos += 1; min = a.toInt; max = b.toInt
              case _       => min = a.toInt
            } else { min = a.toInt; max = a.toInt }
          case TSym("..") =>
            pos += 1
            peek match {
              case TNum(b) => pos += 1; max = b.toInt
              case _       => fail("expected number after ..")
            }
          case _ =>
        }
        varLength = Some((min, max))
      }
      if (isSym("{")) props = parsePropMapExpr()
      eatSym("]")
    }
    val rightArrow = trySym("->")
    if (!rightArrow) eatSym("-")
    if (rightArrow) {
      if (leftArrow) fail("bidirectional arrow not supported")
      direction = 1
    }
    RelPat(variable, types, direction, props, varLength)
  }

  private def parsePropMapExpr(): Map[String, Expr] = {
    eatSym("{")
    val m = scala.collection.mutable.LinkedHashMap[String, Expr]()
    if (!isSym("}")) {
      var more = true
      while (more) {
        val k = ident()
        eatSym(":")
        m(k) = parseExpr()
        more = trySym(",")
      }
    }
    eatSym("}")
    m.toMap
  }

  private def parsePropMap(): Map[String, Lit] = {
    eatSym("{")
    val m = scala.collection.mutable.LinkedHashMap[String, Lit]()
    if (!isSym("}")) {
      var more = true
      while (more) {
        val k = ident()
        eatSym(":")
        m(k) = parseLit()
        more = trySym(",")
      }
    }
    eatSym("}")
    m.toMap
  }

  private def parseLit(): Lit = peek match {
    case TSym("$")    => pos += 1; paramLit()
    case TStr(s)      => pos += 1; LStr(s)
    case TNum(s)      => pos += 1
      if (s.contains('.')) LFloat(s.toDouble) else LInt(s.toLong)
    case TKw("TRUE")  => pos += 1; LBool(true)
    case TKw("FALSE") => pos += 1; LBool(false)
    case TSym("-")    => pos += 1
      parseLit() match {
        case LInt(v)   => LInt(-v)
        case LFloat(v) => LFloat(-v)
        case other     => fail(s"cannot negate $other")
      }
    case TSym("[") =>
      pos += 1
      val items = ArrayBuffer[Lit]()
      if (!isSym("]")) {
        items += parseLit()
        while (trySym(",")) items += parseLit()
      }
      eatSym("]")
      LList(items.toSeq)
    case TSym("{") => LMap(parsePropMap())
    case t         => fail(s"expected literal, got $t")
  }

  private def parseVarList(): Seq[String] = {
    val vs = ArrayBuffer(ident())
    while (trySym(",")) vs += ident()
    vs.toSeq
  }

  private def parseSetItems(): Seq[SetItem] = {
    val items = ArrayBuffer[SetItem]()
    var more = true
    while (more) {
      val v = ident()
      if (trySym(".")) {
        val k = ident()
        eatSym("=")
        items += SetProp(v, k, parseExpr())
      } else if (trySym(":")) {
        items += SetLabel(v, ident())
      } else if (trySym("+=")) {
        items += SetAll(v, parseExpr(), additive = true)
      } else if (trySym("=")) {
        items += SetAll(v, parseExpr(), additive = false)
      } else fail(
        "expected .prop = value, :Label, = {map} or += {map} after SET var")
      more = trySym(",")
    }
    items.toSeq
  }

  private def parseRemoveItems(): Seq[RemoveItem] = {
    val items = ArrayBuffer[RemoveItem]()
    var more = true
    while (more) {
      val v = ident()
      if (trySym(".")) items += RemoveProp(v, ident())
      else if (trySym(":")) items += RemoveLabel(v, ident())
      else fail("expected .prop or :Label after REMOVE var")
      more = trySym(",")
    }
    items.toSeq
  }

  private def parseOrderBy(): Seq[(Expr, Boolean)] = {
    val orderBy = ArrayBuffer[(Expr, Boolean)]()
    if (tryKw("ORDER")) {
      eatKw("BY")
      var more = true
      while (more) {
        val e = parseExpr()
        val asc =
          if (tryKw("DESC") || tryKw("DESCENDING")) false
          else { tryKw("ASC"); tryKw("ASCENDING"); true }
        orderBy += ((e, asc))
        more = trySym(",")
      }
    }
    orderBy.toSeq
  }

  private def parseReturn(): ReturnClause = {
    val distinct = tryKw("DISTINCT")
    val items = parseReturnItems()
    val orderBy = parseOrderBy()
    val skip = if (tryKw("SKIP")) Some(parseNum()) else None
    val limit = if (tryKw("LIMIT")) Some(parseNum()) else None
    ReturnClause(distinct, items, orderBy, skip, limit)
  }

  private def parseNum(): Long = next() match {
    case TNum(s) => s.toLong
    case t       => fail(s"expected number, got $t")
  }

  private def parseReturnItems(): Seq[ReturnItem] = {
    val items = ArrayBuffer[ReturnItem]()
    var more = true
    while (more) {
      if (isSym("*")) { pos += 1; items += ReturnItem(EVar("*"), None) }
      else {
        val e = parseExpr()
        val alias = if (tryKw("AS")) Some(ident()) else None
        items += ReturnItem(e, alias)
      }
      more = trySym(",")
    }
    items.toSeq
  }

  // ---------- expressions (precedence climbing) ----------
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (tryKw("OR") || tryKw("XOR")) l = EBin("OR", l, parseAnd())
    l
  }

  private def parseAnd(): Expr = {
    var l = parseNot()
    while (tryKw("AND")) l = EBin("AND", l, parseNot())
    l
  }

  private def parseNot(): Expr =
    if (tryKw("NOT")) ENot(parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    val l = parseAdd()
    peek match {
      case TSym(op@("=" | "<>" | "!=" | "<" | "<=" | ">" | ">=" | "=~")) =>
        pos += 1
        EBin(if (op == "!=") "<>" else op, l, parseAdd())
      case TKw("CONTAINS") => pos += 1; EBin("CONTAINS", l, parseAdd())
      case TKw("STARTS")   => pos += 1; eatKw("WITH")
        EBin("STARTS_WITH", l, parseAdd())
      case TKw("ENDS")     => pos += 1; eatKw("WITH")
        EBin("ENDS_WITH", l, parseAdd())
      case TKw("IN")       => pos += 1; EBin("IN", l, parseAdd())
      case TKw("IS")       =>
        pos += 1
        val notNull = tryKw("NOT")
        eatKw("NULL")
        if (notNull) EBin("IS_NOT_NULL", l, ELit(LBool(true)))
        else EBin("IS_NULL", l, ELit(LBool(true)))
      case _ => l
    }
  }

  private def parseAdd(): Expr = {
    var l = parseMul()
    var done = false
    while (!done) peek match {
      case TSym("+") => pos += 1; l = EBin("+", l, parseMul())
      case TSym("-") => pos += 1; l = EBin("-", l, parseMul())
      case _         => done = true
    }
    l
  }

  private def parseMul(): Expr = {
    var l = parseExp()
    var done = false
    while (!done) peek match {
      case TSym("*") => pos += 1; l = EBin("*", l, parseExp())
      case TSym("/") => pos += 1; l = EBin("/", l, parseExp())
      case TSym("%") => pos += 1; l = EBin("%", l, parseExp())
      case _         => done = true
    }
    l
  }

  // Cypher `^` exponentiation: binds tighter than * /, right-assoc
  private def parseExp(): Expr = {
    val base = parseAtom()
    if (trySym("^")) EBin("^", base, parseExp()) else base
  }

  private def parseAtom(): Expr = {
    var e = parseAtomPrimary()
    // postfix subscripts: e[idx], e[from..to], e[..to], e[from..]
    var done = false
    while (!done) {
      if (trySym("[")) {
        if (trySym("..")) {
          val to = if (isSym("]")) None else Some(parseExpr())
          eatSym("]")
          e = ESlice(e, None, to)
        } else {
          val first = parseExpr()
          if (trySym("..")) {
            val to = if (isSym("]")) None else Some(parseExpr())
            eatSym("]")
            e = ESlice(e, Some(first), to)
          } else {
            eatSym("]")
            e = EIndex(e, first)
          }
        }
      } else done = true
    }
    e
  }

  private def parseAtomPrimary(): Expr = peek match {
    case TSym("(") =>
      // Either a parenthesized expression or a PATTERN PREDICATE —
      // `WHERE (a)-[:T]->(b)` / `WHERE NOT (a)-->()` (openCypher sugar
      // for EXISTS). Attempt the path-pattern parse; accept it only if
      // it has at least one relationship (a bare `(x)` is the
      // parenthesized variable), else backtrack.
      val save = pos
      val patOpt =
        try {
          val pat = parsePathPattern()
          if (pat.tail.nonEmpty) Some(pat) else { pos = save; None }
        } catch { case _: ParseException => pos = save; None }
      patOpt match {
        case Some(pat) => ESub(isCount = false, Seq(pat), None)
        case None =>
          pos += 1
          val e = parseExpr()
          eatSym(")")
          e
      }
    case TSym("[") =>
      // list literal, comprehension [x IN xs WHERE p | expr] (either
      // part optional), or pattern comprehension [(a)-[r]->(b) … | expr]
      val save = pos
      pos += 1
      peek match {
        case TIdent(v) if toks(pos + 1) == TKw("IN") =>
          pos += 2
          val src = parseExpr()
          val pred = if (tryKw("WHERE")) Some(parseExpr()) else None
          val hasProj = isSym("|")
          val proj = if (trySym("|")) parseExpr() else EVar(v)
          if (pred.isEmpty && !hasProj)
            fail("list comprehension needs WHERE and/or | projection")
          eatSym("]")
          EListComp(v, src, proj, pred)
        case TSym("(") =>
          // could be a pattern comprehension OR a list literal whose
          // first element is parenthesized ([(1+2), 3]) — attempt the
          // pattern parse, backtrack to the literal on failure
          try {
            val pat = parsePathPattern()
            val where = if (tryKw("WHERE")) Some(parseExpr()) else None
            eatSym("|")
            val proj = parseExpr()
            eatSym("]")
            EPatComp(pat, where, proj)
          } catch {
            case _: ParseException =>
              pos = save
              ELit(parseLit())
          }
        case _ =>
          pos = save
          ELit(parseLit())
      }
    case TStr(_) | TNum(_) | TKw("TRUE") | TKw("FALSE") | TSym("-") |
        TSym("{") | TSym("$") =>
      ELit(parseLit())
    case TKw("NULL") => pos += 1; ELit(LStr(null))
    case TKw("CASE") =>
      pos += 1
      // simple form has a subject expression before the first WHEN
      val subject = if (isKw("WHEN")) None else Some(parseExpr())
      val whens = ArrayBuffer[(Expr, Expr)]()
      while (tryKw("WHEN")) {
        val cond = parseExpr()
        eatKw("THEN")
        whens += ((cond, parseExpr()))
      }
      if (whens.isEmpty) fail("CASE needs at least one WHEN")
      val default = if (tryKw("ELSE")) Some(parseExpr()) else None
      eatKw("END")
      ECase(subject, whens.toSeq, default)
    case TIdent(name)
        if (name.equalsIgnoreCase("exists") ||
          name.equalsIgnoreCase("count")) && toks(pos + 1) == TSym("{") =>
      // EXISTS { … } / COUNT { … } subqueries (optional MATCH keyword)
      pos += 2
      tryKw("MATCH")
      val pats = parsePatterns()
      val where = if (tryKw("WHERE")) Some(parseExpr()) else None
      eatSym("}")
      ESub(name.equalsIgnoreCase("count"), pats, where)
    case t if quantKind(t).isDefined && toks(pos + 1) == TSym("(") &&
        tokAt(pos + 2).isInstanceOf[TIdent] && tokAt(pos + 3) == TKw("IN") =>
      // any/all/none/single(x IN xs WHERE pred) — quantified predicate.
      // ALL lexes as a keyword (UNION ALL), the others as identifiers.
      val kind = quantKind(t).get
      pos += 2
      val v = ident()
      eatKw("IN")
      val src = parseExpr()
      eatKw("WHERE")
      val pred = parseExpr()
      eatSym(")")
      EQuant(kind, v, src, pred)
    case TIdent(name)
        if name.equalsIgnoreCase("reduce") && toks(pos + 1) == TSym("(") =>
      // reduce(acc = init, x IN xs | expr)
      pos += 2
      val acc = ident()
      eatSym("=")
      val init = parseExpr()
      eatSym(",")
      val v = ident()
      eatKw("IN")
      val src = parseExpr()
      eatSym("|")
      val proj = parseExpr()
      eatSym(")")
      EReduce(acc, init, v, src, proj)
    case TIdent(name) =>
      pos += 1
      if (trySym("(")) {
        // function call
        val distinct = tryKw("DISTINCT")
        val args = ArrayBuffer[Expr]()
        if (!isSym(")")) {
          if (isSym("*")) { pos += 1; args += EVar("*") }
          else {
            args += parseExpr()
            while (trySym(",")) args += parseExpr()
          }
        }
        eatSym(")")
        EFunc(name.toLowerCase, args.toSeq, distinct)
      } else if (trySym(".")) {
        EProp(name, ident())
      } else if (isSym("{")) {
        parseMapProjection(name)
      } else EVar(name)
    case t => fail(s"unexpected token in expression: $t")
  }

  /** Map projection body after `v`: `{.key, alias: expr, other, .*}`. */
  private def parseMapProjection(v: String): Expr = {
    eatSym("{")
    val items = ArrayBuffer[(String, Expr)]()
    var star = false
    if (!isSym("}")) {
      var more = true
      while (more) {
        if (trySym(".")) {
          if (trySym("*")) star = true
          else { val k = ident(); items += ((k, EProp(v, k))) }
        } else {
          val k = ident()
          if (trySym(":")) items += ((k, parseExpr()))
          else items += ((k, EVar(k)))
        }
        more = trySym(",")
      }
    }
    eatSym("}")
    EMapProj(v, items.toSeq, star)
  }
}
