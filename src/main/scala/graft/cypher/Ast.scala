package graft.cypher

/** AST for the declared Cypher surface (SURVEY.md §2.B, D1-D32 —
  * reference grammar: lib/src/query_parser/cypher_parser.rs:30-72 and the
  * capability corpus lib/src/storage_engine/queries_examples.txt).
  */
object Ast {

  sealed trait Lit
  final case class LStr(v: String) extends Lit
  final case class LInt(v: Long) extends Lit
  final case class LFloat(v: Double) extends Lit
  final case class LBool(v: Boolean) extends Lit
  final case class LList(vs: Seq[Lit]) extends Lit
  final case class LMap(vs: Map[String, Lit]) extends Lit

  /** (n:Label1:Label2 {k: v}) — prop values are full expressions so that
    * CREATE can reference earlier bindings ({name: user.name}). */
  final case class NodePat(
      variable: Option[String],
      labels: Seq[String],
      props: Map[String, Expr])

  /** -[r:T1|T2 {k: v} *min..max]-> ; direction: 1 = ->, -1 = <-, 0 = -- */
  final case class RelPat(
      variable: Option[String],
      types: Seq[String],
      direction: Int,
      props: Map[String, Expr],
      varLength: Option[(Int, Int)])

  /** Linear chain: node (rel node)*; optionally named path or
    * shortestPath(...) / allShortestPaths(...) wrapper. */
  final case class PathPat(
      pathVar: Option[String],
      shortest: Boolean,
      head: NodePat,
      tail: Seq[(RelPat, NodePat)],
      allPaths: Boolean = false)

  // ---- expressions ----
  sealed trait Expr
  final case class EProp(variable: String, key: String) extends Expr
  final case class EVar(name: String) extends Expr
  final case class ELit(l: Lit) extends Expr
  final case class EFunc(name: String, args: Seq[Expr],
      distinct: Boolean = false) extends Expr
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class ENot(e: Expr) extends Expr
  final case class EListComp(variable: String, source: Expr, proj: Expr,
      pred: Option[Expr] = None)
      extends Expr // [x IN xs WHERE pred | expr] (both parts optional)
  /** Quantified list predicate: any/all/none/single(x IN xs WHERE pred). */
  final case class EQuant(kind: String, variable: String, source: Expr,
      pred: Expr) extends Expr
  /** Pattern comprehension `[(a)-[r:T]->(b) WHERE pred | proj]` —
    * correlated on the pattern's shared outer variables; yields the list
    * of projections (sorted by value: Cypher leaves the order
    * unspecified, a deterministic engine must pick one). */
  final case class EPatComp(pat: PathPat, where: Option[Expr], proj: Expr)
      extends Expr
  /** reduce(acc = init, x IN xs | expr) — list fold. */
  final case class EReduce(acc: String, init: Expr, variable: String,
      source: Expr, proj: Expr) extends Expr
  /** CASE WHEN … THEN … END (searched, subject=None) and
    * CASE x WHEN v THEN … END (simple, subject=Some). */
  final case class ECase(subject: Option[Expr], whens: Seq[(Expr, Expr)],
      default: Option[Expr]) extends Expr
  /** EXISTS { pattern [WHERE …] } / COUNT { pattern [WHERE …] }
    * subqueries, correlated on shared variables. */
  final case class ESub(isCount: Boolean, patterns: Seq[PathPat],
      where: Option[Expr]) extends Expr
  /** Map projection `v {.key, alias: expr, other, .*}` — items are
    * (outputKey, valueExpr) in source order; `star` merges all of v's
    * remaining properties (explicit keys win, Cypher semantics). */
  final case class EMapProj(variable: String, items: Seq[(String, Expr)],
      star: Boolean) extends Expr
  /** List subscript `base[idx]` (single element, 0-based, negative =
    * from the end) and slice `base[from..to]` (from-inclusive,
    * to-exclusive, 0-based; either bound optional). */
  final case class EIndex(base: Expr, idx: Expr) extends Expr
  final case class ESlice(base: Expr, from: Option[Expr],
      to: Option[Expr]) extends Expr

  final case class ReturnItem(expr: Expr, alias: Option[String])

  // ---- clauses ----
  sealed trait Clause
  final case class MatchClause(optional: Boolean, patterns: Seq[PathPat],
      where: Option[Expr]) extends Clause
  final case class UnwindClause(list: Expr, variable: String) extends Clause
  final case class WithClause(items: Seq[ReturnItem], where: Option[Expr],
      orderBy: Seq[(Expr, Boolean)] = Nil, skip: Option[Long] = None,
      limit: Option[Long] = None, distinct: Boolean = false) extends Clause
  final case class CreateClause(patterns: Seq[PathPat]) extends Clause
  /** MERGE: bind the pattern if it matches, otherwise create it. */
  final case class MergeClause(pattern: PathPat,
      onCreate: Seq[SetItem] = Nil, onMatch: Seq[SetItem] = Nil)
      extends Clause
  final case class SetClause(items: Seq[SetItem]) extends Clause
  final case class RemoveClause(items: Seq[RemoveItem]) extends Clause
  final case class DeleteClause(variables: Seq[String], detach: Boolean)
      extends Clause
  final case class ReturnClause(distinct: Boolean, items: Seq[ReturnItem],
      orderBy: Seq[(Expr, Boolean)], skip: Option[Long],
      limit: Option[Long]) extends Clause

  sealed trait SetItem
  final case class SetProp(variable: String, key: String, value: Expr)
      extends SetItem
  final case class SetLabel(variable: String, label: String) extends SetItem
  /** `SET v = {map}` (replace, additive=false) / `SET v += {map}`
    * (merge, additive=true); value must compile to a string map. */
  final case class SetAll(variable: String, value: Expr, additive: Boolean)
      extends SetItem

  sealed trait RemoveItem
  final case class RemoveProp(variable: String, key: String)
      extends RemoveItem
  final case class RemoveLabel(variable: String, label: String)
      extends RemoveItem

  /** `CALL { … }` subquery clause (read-only subqueries: MATCH/UNWIND/
    * import-WITH/RETURN); expands the outer rows with the subquery's
    * returned columns. */
  final case class CallClause(sub: CypherQuery) extends Clause
  /** `CALL proc(args...) [YIELD a [AS x], b [AS y]]` — built-in
    * procedures. Catalog procedures (`db.*`) are single-column and keep
    * the legacy rename semantics (YIELD x names the one column x);
    * graph procedures (`graft.*`) are multi-column with standard
    * openCypher YIELD column-selection + AS aliasing. */
  final case class ProcedureClause(name: String,
    args: Seq[Expr],
    yields: Seq[(String, Option[String])]) extends Clause

  /** `FOREACH (x IN list | update clauses)` — runs the update clauses
    * once per list element; `x` is visible only inside. Elements of
    * `nodes(p)` / `relationships(p)` bind as full node/rel variables. */
  final case class ForeachClause(variable: String, list: Expr,
      updates: Seq[Clause]) extends Clause

  final case class CypherQuery(clauses: Seq[Clause]) {
    def isMutation: Boolean = clauses.exists {
      case _: CreateClause | _: MergeClause | _: SetClause |
          _: RemoveClause | _: DeleteClause | _: ForeachClause => true
      case _ => false
    }
  }
}
