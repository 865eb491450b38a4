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

  def execute(g: GraphState, query: String,
      params: Map[String, Any] = Map.empty)
      (implicit spark: SparkSession): CypherResult = {
    // Cypher SET overwrites existing property keys: map_concat must take
    // the last value rather than throw on duplicates.
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // EXPLAIN <read-query> (Neo4j-style): return the Spark physical plan
    // as rows instead of executing. Mutations are excluded — their plan
    // is a sequence of snapshot rewrites, not one DataFrame.
    val trimmed = query.trim
    if (trimmed.length >= 8 &&
        trimmed.substring(0, 8).equalsIgnoreCase("EXPLAIN ")) {
      val innerQ = trimmed.substring(8)
      // a mutation must not run as a side effect of being explained
      if (Parser.parseMulti(innerQ, params)._1.exists(_.isMutation))
        throw new ParseException(
          "EXPLAIN supports read-only queries (mutations execute as a " +
            "sequence of snapshot rewrites, not one plan)")
      val df = execute(g, innerQ, params).df.get // read-only: lazy, no jobs
      import spark.implicits._
      return CypherResult(Some(df.queryExecution.executedPlan
        .toString.linesIterator.toSeq.toDF("plan")), g)
    }
    val (parts, unionAll) = Parser.parseMulti(query, params)
    if (parts.size > 1) {
      // UNION chain: read-only parts, matching output columns; UNION
      // dedupes (one distinct over the combined result), UNION ALL
      // concatenates — both a single unionByName plan, no per-part jobs.
      if (parts.exists(_.isMutation))
        throw new ParseException("UNION parts must be read-only queries")
      val dfs = parts.map(p => new Compiler(g).compileRead(p))
      val cols = dfs.head.columns.toSeq
      dfs.tail.foreach { d =>
        if (d.columns.toSeq != cols)
          throw new ParseException(
            s"UNION parts return different columns: $cols vs " +
              d.columns.toSeq)
      }
      val u = dfs.reduce(_ unionByName _)
      return CypherResult(Some(if (unionAll) u else u.distinct()), g)
    }
    val ast = parts.head
    val compiler = new Compiler(g)
    if (!ast.isMutation)
      CypherResult(Some(compiler.compileRead(ast)), g)
    else
      executeMutation(g, ast)
  }

  /** Convenience: read-only execution returning the DataFrame. */
  def query(g: GraphState, q: String,
      params: Map[String, Any] = Map.empty)
      (implicit spark: SparkSession): DataFrame =
    execute(g, q, params).df.getOrElse(
      throw new ParseException("statement returned no rows"))

  private def executeMutation(g0: GraphState, ast: CypherQuery)
      (implicit spark: SparkSession): CypherResult = {
    var state = g0
    var compiler = new Compiler(state)
    var frame = compiler.emptyFrame
    var result: Option[DataFrame] = None
    // Statement-scoped counter for unnamed CREATE pattern nodes: the
    // binding column names (__c1__id, …) are deterministic across JVMs,
    // unlike the identityHashCode names they replace.
    val unnamedSeq = new java.util.concurrent.atomic.AtomicInteger(0)
    def nextUnnamed(): String = s"__c${unnamedSeq.incrementAndGet()}"

    def recompile(): Unit = { compiler = new Compiler(state) }

    ast.clauses.foreach {
      case m: MatchClause =>
        frame = compiler.compileMatch(frame, m)
      case u: UnwindClause =>
        frame = compiler.compileUnwind(frame, u)
      case c: CreateClause =>
        val (st2, fr2) = applyCreate(state, compiler, frame, c, nextUnnamed)
        state = st2
        frame = fr2
        recompile()
      case m: MergeClause =>
        // Per-ROW match-or-create (Cypher MERGE semantics): each binding
        // row independently either binds the matching pattern or creates
        // it. Rows are tagged, matched via the pattern (whose props may
        // reference frame variables), and the anti-joined remainder goes
        // through the CREATE machinery. localCheckpoint pins the row tags
        // across actions. Two refinements for set-oriented correctness:
        //  - duplicate unmatched keys create ONE pattern instance (Neo4j
        //    MERGE sees, and binds, what an earlier row just created);
        //  - both halves project to the SAME carried+named-variable
        //    columns before the union (the matched frame carries extra
        //    internal rel columns the created frame lacks).
        val tagged = Compiler.Frame(
          frame.df.withColumn("__merge_row", monotonically_increasing_id())
            .localCheckpoint(),
          frame.vars)
        val matched0 = compiler.compileMatch(tagged,
          MatchClause(optional = false, Seq(m.pattern), None))
        // the matched side feeds the anti-join, an isEmpty probe, and
        // both output projections — checkpoint it ONCE instead of
        // re-running the pattern join per consumer
        val matched = Compiler.Frame(matched0.df.localCheckpoint(),
          matched0.vars)
        val unmatched = tagged.df.join(
          matched.df.select(col("__merge_row")).distinct(),
          Seq("__merge_row"), "left_anti")
        val patNodes = m.pattern.head +: m.pattern.tail.map(_._2)
        val patVars: Map[String, Compiler.VarKind] =
          (patNodes.flatMap(_.variable)
             .map(_ -> (Compiler.NodeVar: Compiler.VarKind)) ++
           m.pattern.tail.flatMap(_._1.variable)
             .map(_ -> (Compiler.RelVar: Compiler.VarKind))).toMap
        val outVars = tagged.vars ++ patVars
        val outCols = "__merge_row" +: outVars.toSeq.sortBy(_._1)
          .flatMap { case (v, k) => varColumns(v, k) }
        // ON MATCH SET / ON CREATE SET run against exactly the half of
        // the rows that matched / were created (Cypher semantics); the
        // frame's carried props predate the SET, matching plain SET's
        // read-your-own-writes contract (re-query the state to observe).
        def applyOn(items: Seq[SetItem], half: DataFrame): Unit =
          if (items.nonEmpty && !half.isEmpty) {
            state = applySet(state, compiler,
              Compiler.Frame(half, outVars), SetClause(items))
            recompile()
          }
        if (unmatched.isEmpty) {
          val matchedOut =
            matched.df.select(outCols.map(col): _*).drop("__merge_row")
          applyOn(m.onMatch, matchedOut)
          frame = Compiler.Frame(matchedOut, outVars)
        } else {
          // One creation per distinct pattern KEY (the compiled property
          // values, null-safe): duplicate keys within a statement bind
          // the same created instance instead of multiplying it.
          val unFrame = Compiler.Frame(unmatched, tagged.vars)
          val keyExprs = (patNodes.flatMap(_.props.toSeq) ++
            m.pattern.tail.flatMap(_._1.props.toSeq)).map { case (_, e) =>
            coalesce(compiler.compileExpr(e, unFrame).cast(StringType),
              lit("\u0000"))
          }
          val keyed = unmatched.withColumn("__merge_key",
            if (keyExprs.isEmpty) lit("")
            else concat_ws("\u0001", keyExprs: _*))
          val reps = keyed.dropDuplicates("__merge_key")
          val (st2, fr2) = applyCreate(state, compiler,
            Compiler.Frame(reps, tagged.vars),
            CreateClause(Seq(m.pattern)), nextUnnamed)
          state = st2
          recompile()
          // re-bind EVERY unmatched row (incl. key duplicates) to the
          // instance created for its key
          val newCols = patVars.view
            .filterKeys(v => !tagged.vars.contains(v)).toSeq
            .flatMap { case (v, k) => varColumns(v, k) }
          val bindings =
            fr2.df.select(("__merge_key" +: newCols).map(col): _*)
          val createdOut = keyed.join(bindings, Seq("__merge_key"))
            .drop("__merge_key").select(outCols.map(col): _*)
          applyOn(m.onMatch, matched.df.select(outCols.map(col): _*)
            .drop("__merge_row"))
          applyOn(m.onCreate, createdOut.drop("__merge_row"))
          val merged =
            if (matched.df.isEmpty) createdOut
            else matched.df.select(outCols.map(col): _*)
              .unionByName(createdOut)
          frame = Compiler.Frame(merged.drop("__merge_row"), outVars)
        }
      case s: SetClause =>
        state = applySet(state, compiler, frame, s)
        recompile()
      case f: ForeachClause =>
        // FOREACH (x IN list | updates): x binds once per element and is
        // visible only inside — the outer frame is unchanged. Elements
        // of nodes(p)/relationships(p) join back to the state so they
        // bind as FULL node/rel variables (SET/REMOVE/DELETE and
        // property reads on x just work); any other list binds x as a
        // value variable. Set-oriented throughout: one explode + one
        // equi-join, each update clause one distributed action.
        def runForeach(outer: Compiler.Frame, f0: ForeachClause): Unit = {
          val v = f0.variable
          val listCol = compiler.compileExpr(f0.list, outer)
          val exploded = outer.df.withColumn(s"${v}__elem", explode(listCol))
          val (subDf, kind) = f0.list match {
            case EFunc("nodes", _, _) =>
              val verts = state.vertices.select(
                col("id").as(s"${v}__id"), col("label").as(s"${v}__label"),
                col("properties").as(s"${v}__props"))
              (exploded.withColumnRenamed(s"${v}__elem", s"${v}__id")
                 .join(verts, Seq(s"${v}__id")),
                Compiler.NodeVar: Compiler.VarKind)
            case EFunc("relationships", _, _) =>
              val eds = state.edges.select(
                col("id").as(s"${v}__id"), col("src").as(s"${v}__src"),
                col("dst").as(s"${v}__dst"),
                col("edge_type").as(s"${v}__type"),
                col("properties").as(s"${v}__props"))
              (exploded.withColumnRenamed(s"${v}__elem", s"${v}__id")
                 .join(eds, Seq(s"${v}__id")),
                Compiler.RelVar: Compiler.VarKind)
            case _ =>
              (exploded.withColumnRenamed(s"${v}__elem", s"${v}__val"),
                Compiler.ValueVar: Compiler.VarKind)
          }
          var sub = Compiler.Frame(subDf, outer.vars + (v -> kind))
          f0.updates.foreach {
            case s: SetClause =>
              state = applySet(state, compiler, sub, s); recompile()
            case r: RemoveClause =>
              state = applyRemove(state, compiler, sub, r); recompile()
            case d: DeleteClause =>
              state = applyDelete(state, compiler, sub, d); recompile()
            case c: CreateClause =>
              val (st2, fr2) = applyCreate(state, compiler, sub, c,
                nextUnnamed)
              state = st2; sub = fr2; recompile()
            case f2: ForeachClause => runForeach(sub, f2)
            case other => throw new ParseException(
              s"unsupported clause in FOREACH: $other")
          }
        }
        runForeach(frame, f)
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
      case c: CallClause =>
        frame = compiler.compileCall(frame, c)
      case p: ProcedureClause =>
        frame = compiler.compileProcedure(frame, p)
    }
    CypherResult(result, state)
  }

  // ---------- CREATE ----------

  /** Frame column names for a bound variable of the given kind. */
  private def varColumns(v: String, k: Compiler.VarKind): Seq[String] =
    k match {
      case Compiler.NodeVar =>
        Seq(s"${v}__id", s"${v}__label", s"${v}__props")
      case Compiler.RelVar =>
        Seq(s"${v}__id", s"${v}__src", s"${v}__dst", s"${v}__type",
          s"${v}__props")
      case Compiler.ValueVar => Seq(s"${v}__val")
      case Compiler.PathVar  => Seq(s"${v}__path", s"${v}__epath")
    }

  private def applyCreate(state: GraphState, compiler: Compiler,
      frame0: Compiler.Frame, c: CreateClause, nextUnnamed: () => String)
      (implicit spark: SparkSession)
      : (GraphState, Compiler.Frame) = {
    var st = state
    var frame = frame0
    c.patterns.foreach { pat =>
      // 1. bind/create every node in the chain. Unnamed nodes get a
      // deterministic statement-scoped binding name so the edge leg
      // below can reference their generated ids.
      val nodes = pat.head +: pat.tail.map(_._2)
      val nodeNames = nodes.map(np => np.variable.getOrElse(nextUnnamed()))
      nodes.zip(nodeNames).foreach { case (np, vName) =>
        if (np.variable.isEmpty || !frame.has(vName)) {
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
      // 2. create the chain's relationships; NAMED relationships bind
      // into the frame (MERGE's union and later clauses reference them)
      var prev = nodeNames.head
      pat.tail.zip(nodeNames.tail).foreach { case ((rp, np), nv) =>
        val (srcV, dstV) = if (rp.direction == -1) (nv, prev) else (prev, nv)
        val t = rp.types.headOption.getOrElse("RELATED")
        val propCols: Seq[Column] = rp.props.toSeq.flatMap { case (k, e) =>
          Seq(lit(k), compiler.compileExpr(e, frame).cast(StringType))
        }
        val propsCol =
          if (propCols.isEmpty) map().cast("map<string,string>")
          else map(propCols: _*)
        rp.variable match {
          case Some(rv) =>
            val df2 = frame.df
              .withColumn(s"${rv}__id", expr("uuid()"))
              .withColumn(s"${rv}__src", col(s"${srcV}__id"))
              .withColumn(s"${rv}__dst", col(s"${dstV}__id"))
              .withColumn(s"${rv}__type", lit(t))
              .withColumn(s"${rv}__props", propsCol)
              .localCheckpoint()
            frame = Compiler.Frame(df2,
              frame.vars + (rv -> Compiler.RelVar))
            st = st.upsertEdges(df2.select(
              col(s"${rv}__id").as("id"),
              col(s"${rv}__src").as("src"),
              col(s"${rv}__dst").as("dst"),
              col(s"${rv}__type").as("edge_type"),
              lit("").as("label"),
              col(s"${rv}__props").as("properties")))
          case None =>
            st = st.upsertEdges(frame.df.select(
              expr("uuid()").as("id"),
              col(s"${srcV}__id").as("src"),
              col(s"${dstV}__id").as("dst"),
              lit(t).as("edge_type"),
              lit("").as("label"),
              propsCol.as("properties")))
        }
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
      case SetAll(v, valueExpr, additive) =>
        import org.apache.spark.sql.types.{MapType, StringType => StrT}
        val mapCol = compiler.compileExpr(valueExpr, frame)
          .cast(MapType(StrT, StrT))
        val isEdge = frame.vars.get(v).contains(Compiler.RelVar)
        if (additive) {
          // merge: explode to (id, key, value) rows — same upsert path
          // as SET v.k (empty maps contribute nothing, as in Cypher)
          val updates = frame.df
            .select(col(s"${v}__id").as("id"), explode(mapCol))
          st = if (isEdge) st.setEdgePropertiesRows(updates)
            else st.setVertexPropertiesRows(updates)
        } else {
          val repl = frame.df
            .select(col(s"${v}__id").as("id"), mapCol.as("__new"))
          st = if (isEdge) st.replaceEdgeProperties(repl)
            else st.replaceVertexProperties(repl)
        }
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

  /** Edges incident to any probe vertex (`__vid` column). Two
    * equi-semi-joins (src, dst) unioned instead of one OR-condition join:
    * the OR form can only plan as a BroadcastNestedLoopJoin —
    * O(|edges|×|victims|) comparisons — while these hash-join, the same
    * pattern as GraphState.detachDeleteVertices' two anti-joins. */
  private[cypher] def incidentEdges(st: GraphState, probe: DataFrame)
      : DataFrame =
    st.edges.join(probe.withColumnRenamed("__vid", "src"), Seq("src"),
        "left_semi")
      .unionByName(st.edges.join(
        probe.withColumnRenamed("__vid", "dst"), Seq("dst"), "left_semi"))

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
              if (!incidentEdges(st, probe).isEmpty)
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
