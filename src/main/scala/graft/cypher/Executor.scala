package graft.cypher

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import Ast._
import graft.engine.GraphState

/** Result of a Cypher statement: an optional result set plus the (possibly
  * mutated) graph snapshot — mutations are pure GraphState → GraphState
  * (SURVEY.md §7.5.2). */
final case class CypherResult(df: Option[DataFrame], state: GraphState)

/** Top-level Cypher entry point: parse → compile → execute.
  *
  * Read-only queries compile to a single DataFrame plan. Mutating queries
  * (CREATE / SET / REMOVE / DELETE) fold over the clause list threading a
  * GraphState, mirroring the reference's execute_cypher dispatch
  * (cypher_parser.rs:644-806) with set-oriented semantics instead of
  * row-at-a-time storage calls.
  */
object Cypher {

  def execute(g: GraphState, query: String)(implicit spark: SparkSession)
      : CypherResult = {
    // Cypher SET overwrites existing property keys: map_concat must take
    // the last value rather than throw on duplicates.
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    val ast = Parser.parse(query)
    val compiler = new Compiler(g)
    if (!ast.isMutation)
      CypherResult(Some(compiler.compileRead(ast)), g)
    else
      executeMutation(g, ast)
  }

  /** Convenience: read-only execution returning the DataFrame. */
  def query(g: GraphState, q: String)(implicit spark: SparkSession)
      : DataFrame =
    execute(g, q).df.getOrElse(
      throw new ParseException("statement returned no rows"))

  private def executeMutation(g0: GraphState, ast: CypherQuery)
      (implicit spark: SparkSession): CypherResult = {
    var state = g0
    var compiler = new Compiler(state)
    var frame = compiler.emptyFrame
    var result: Option[DataFrame] = None

    def recompile(): Unit = { compiler = new Compiler(state) }

    ast.clauses.foreach {
      case m: MatchClause =>
        frame = compiler.compileMatch(frame, m)
      case u: UnwindClause =>
        frame = compiler.compileUnwind(frame, u)
      case c: CreateClause =>
        val (st2, fr2) = applyCreate(state, compiler, frame, c)
        state = st2
        frame = fr2
        recompile()
      case m: MergeClause =>
        // Per-ROW match-or-create (Cypher MERGE semantics): each binding
        // row independently either binds the matching pattern or creates
        // it. Rows are tagged, matched via the pattern (whose props may
        // reference frame variables), and the anti-joined remainder goes
        // through the CREATE machinery; both halves then union back into
        // one frame. localCheckpoint pins the row tags across actions.
        val tagged = Compiler.Frame(
          frame.df.withColumn("__merge_row", monotonically_increasing_id())
            .localCheckpoint(),
          frame.vars)
        val matched = compiler.compileMatch(tagged,
          MatchClause(optional = false, Seq(m.pattern), None))
        val unmatched = tagged.df.join(
          matched.df.select(col("__merge_row")).distinct(),
          Seq("__merge_row"), "left_anti")
        if (unmatched.isEmpty) {
          frame = Compiler.Frame(matched.df.drop("__merge_row"),
            matched.vars)
        } else {
          val (st2, fr2) = applyCreate(state, compiler,
            Compiler.Frame(unmatched, tagged.vars),
            CreateClause(Seq(m.pattern)))
          state = st2
          recompile()
          val merged =
            if (matched.df.isEmpty) fr2.df
            else matched.df.unionByName(fr2.df)
          frame = Compiler.Frame(merged.drop("__merge_row"), fr2.vars)
        }
      case s: SetClause =>
        state = applySet(state, compiler, frame, s)
        recompile()
      case r: RemoveClause =>
        state = applyRemove(state, compiler, frame, r)
        recompile()
      case d: DeleteClause =>
        state = applyDelete(state, compiler, frame, d)
        recompile()
      case r: ReturnClause =>
        result = Some(compiler.compileReturn(frame, r))
      case w: WithClause =>
        frame = compiler.compileWith(frame, w)
    }
    CypherResult(result, state)
  }

  // ---------- CREATE ----------

  private def applyCreate(state: GraphState, compiler: Compiler,
      frame0: Compiler.Frame, c: CreateClause)
      (implicit spark: SparkSession)
      : (GraphState, Compiler.Frame) = {
    var st = state
    var frame = frame0
    c.patterns.foreach { pat =>
      // 1. bind/create every node in the chain
      val nodes = pat.head +: pat.tail.map(_._2)
      nodes.foreach { np =>
        val v = np.variable.getOrElse("__unnamed")
        if (np.variable.isEmpty || !frame.has(v)) {
          val vName = np.variable.getOrElse(s"__c${System.identityHashCode(np)}")
          val propCols: Seq[Column] = np.props.toSeq.flatMap { case (k, e) =>
            Seq(lit(k), compiler.compileExpr(e, frame).cast(StringType))
          }
          // localCheckpoint pins the generated uuid(): without it every
          // downstream action would re-evaluate and produce DIFFERENT ids
          // for the vertex write vs the edge write.
          val df2 = frame.df
            .withColumn(s"${vName}__id", expr("uuid()"))
            .withColumn(s"${vName}__label", lit(np.labels.mkString(":")))
            .withColumn(s"${vName}__props",
              if (propCols.isEmpty)
                map().cast("map<string,string>")
              else map(propCols: _*))
            .localCheckpoint()
          frame = Compiler.Frame(df2,
            frame.vars + (vName -> Compiler.NodeVar))
          val newVerts = df2.select(
            col(s"${vName}__id").as("id"),
            col(s"${vName}__label").as("label"),
            col(s"${vName}__props").as("properties"))
          st = st.upsertVertices(newVerts)
        }
      }
      // 2. create the chain's relationships
      var prev = pat.head.variable.getOrElse("__unnamed")
      pat.tail.foreach { case (rp, np) =>
        val nv = np.variable.getOrElse("__unnamed")
        val (srcV, dstV) = if (rp.direction == -1) (nv, prev) else (prev, nv)
        val t = rp.types.headOption.getOrElse("RELATED")
        val propCols: Seq[Column] = rp.props.toSeq.flatMap { case (k, e) =>
          Seq(lit(k), compiler.compileExpr(e, frame).cast(StringType))
        }
        val newEdges = frame.df.select(
          expr("uuid()").as("id"),
          col(s"${srcV}__id").as("src"),
          col(s"${dstV}__id").as("dst"),
          lit(t).as("edge_type"),
          lit("").as("label"),
          (if (propCols.isEmpty) map().cast("map<string,string>")
           else map(propCols: _*)).as("properties"))
        st = st.upsertEdges(newEdges)
        prev = nv
      }
    }
    (st, frame)
  }

  // ---------- SET / REMOVE / DELETE ----------

  private def applySet(state: GraphState, compiler: Compiler,
      frame: Compiler.Frame, s: SetClause): GraphState = {
    var st = state
    s.items.foreach {
      case SetProp(v, k, valueExpr) =>
        val value = compiler.compileExpr(valueExpr, frame).cast(StringType)
        val updates = frame.df.select(
          col(s"${v}__id").as("id"), lit(k).as("key"), value.as("value"))
        st = frame.vars.get(v) match {
          case Some(Compiler.RelVar) => st.setEdgePropertiesRows(updates)
          case _                     => st.setVertexPropertiesRows(updates)
        }
      case SetLabel(v, label) =>
        st = st.addVertexLabel(frame.df.select(col(s"${v}__id")), label)
    }
    st
  }

  private def applyRemove(state: GraphState, compiler: Compiler,
      frame: Compiler.Frame, r: RemoveClause): GraphState = {
    var st = state
    r.items.foreach {
      case RemoveProp(v, k) =>
        st = st.removeVertexProperty(frame.df.select(col(s"${v}__id")), k)
      case RemoveLabel(v, l) =>
        st = st.removeVertexLabel(frame.df.select(col(s"${v}__id")), l)
    }
    st
  }

  private def applyDelete(state: GraphState, compiler: Compiler,
      frame: Compiler.Frame, d: DeleteClause): GraphState = {
    var st = state
    d.variables.foreach { v =>
      frame.vars.get(v) match {
        case Some(Compiler.RelVar) =>
          st = st.deleteEdges(frame.df.select(
            col(s"${v}__src").as("src"), col(s"${v}__type").as("edge_type"),
            col(s"${v}__dst").as("dst")))
        case Some(Compiler.NodeVar) =>
          val ids = frame.df.select(col(s"${v}__id"))
          st =
            if (d.detach) st.detachDeleteVertices(ids)
            else {
              // Cypher refuses to delete a vertex that still has
              // relationships — dangling edges would corrupt the graph.
              val probe = ids.withColumnRenamed(s"${v}__id", "__vid")
              val incident = st.edges.join(probe,
                col("src") === col("__vid") || col("dst") === col("__vid"),
                "left_semi")
              if (!incident.isEmpty)
                throw new ParseException(s"cannot DELETE $v: vertex still " +
                  "has relationships (use DETACH DELETE)")
              GraphState(st.vertices.join(
                probe.withColumnRenamed("__vid", "id"), Seq("id"),
                "left_anti"), st.edges)
            }
        case other =>
          throw new ParseException(s"cannot DELETE $v ($other)")
      }
    }
    st
  }
}
