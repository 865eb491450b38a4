package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph traversals: bounded BFS, unweighted shortest paths, and
  * variable-length path enumeration (SURVEY.md §2.B D17/D18).
  *
  * The reference's BFS is single-node and buggy (follows `edge_type`
  * instead of `inbound_id`, lib/src/graph_engine/traversal.rs:31-35); we
  * implement the corrected semantics as a driver-orchestrated sequence of
  * distributed joins:
  *
  *  - frontier ⋈ edges per hop (shuffle on the join key; AQE broadcasts
  *    small frontiers),
  *  - `dropDuplicates` + anti-join against the visited set bounds work on
  *    cyclic graphs,
  *  - `localCheckpoint` every few hops cuts the growing lineage so plans
  *    stay compilable at depth (the classic iterative-Spark pitfall).
  *
  * Not expressible as a single Catalyst plan (SURVEY §4.2) — this IS the
  * idiomatic Spark shape for iteration; GraphX Pregel (GraphXBridge) is
  * the alternative for whole-graph analytics.
  */
object Traversals {

  /** Depth at or below which traversals build ONE fully-lazy unrolled
    * plan (zero driver-side actions — the caller's action runs the whole
    * traversal as a single Spark job) instead of the per-hop
    * action-driven loop. At local[32] a scheduled job costs ~0.2–0.4 s of
    * pure latency, so a maxDepth-4 shortest-path query pays more in job
    * scheduling than in data movement; unrolling trades at most
    * `threshold` empty-frontier shuffle stages (cheap: AQE coalesces
    * empty exchanges) for all of that. Deeper traversals keep the loop:
    * early exit actually saves hops there, and a 15-deep unrolled plan
    * with no materialization barrier risks compile-time blowup. */
  private val LazyUnrollDepth = 8

  private def hopEdges(g: GraphState, edgeTypes: Seq[String],
      undirected: Boolean, reversed: Boolean = false): DataFrame = {
    val base = g.edges.select(col("id"), col("src"), col("dst"),
      col("edge_type"))
    val typed = if (edgeTypes.isEmpty) base
      else base.filter(col("edge_type").isin(edgeTypes: _*))
    val fwd = typed.select(col("id").as("eid"), col("src"), col("dst"))
    val bwd = typed.select(col("id").as("eid"), col("dst").as("src"),
      col("src").as("dst"))
    if (undirected) fwd.union(bwd) else if (reversed) bwd else fwd
  }

  /** Bounded-depth BFS from a set of source vertex ids. Returns
    * (id, depth) with the MINIMUM depth per reached vertex (sources at 0).
    * Equivalently: unweighted shortest-path distance ≤ maxDepth.
    *
    * ONE eager Spark job per hop: the frontier is marked for a LAZY
    * local checkpoint and the loop-control `count()` is the action that
    * materializes it (LocalRDDCheckpointData persists every partition at
    * the end of the first job that computes the RDD). The former
    * eager-checkpoint + isEmpty pair cost two scheduled jobs per hop —
    * at local[32] job scheduling, not data, dominates these traversals. */
  def bfs(g: GraphState, sources: DataFrame, maxDepth: Int,
      edgeType: Option[String] = None, undirected: Boolean = false)
      : DataFrame = {
    if (maxDepth <= LazyUnrollDepth)
      return bfsLazy(g, sources, maxDepth, edgeType.toSeq, undirected)
    val edges = hopEdges(g, edgeType.toSeq, undirected)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var visited = sources
        .select(col(sources.columns.head).as("id"), lit(0).as("depth"))
        .dropDuplicates("id")
        .localCheckpoint(eager = false)
      var frontier = visited
      var cnt = frontier.count() // materializes the lazy checkpoint
      var depth = 0
      while (depth < maxDepth && cnt > 0) {
        depth += 1
        frontier = frontier
          .join(edges, frontier("id") === edges("src"))
          .select(col("dst").as("id"), lit(depth).as("depth"))
          .dropDuplicates("id")
          .join(visited.select("id"), Seq("id"), "left_anti")
          .localCheckpoint(eager = false) // cut lineage; frontier is small
        cnt = frontier.count() // the hop's single job
        visited = visited.union(frontier)
        // visited's lineage grows one cheap union per hop — only cut it
        // periodically; the lazy cut materializes inside the NEXT hop's
        // job (the anti-join reads visited), costing no extra job
        if (depth % 3 == 0) visited = visited.localCheckpoint(eager = false)
      }
      visited
    } finally edges.unpersist()
  }

  /** Fully-lazy BFS (maxDepth ≤ [[LazyUnrollDepth]]): the hop chain is
    * unrolled with NO driver actions — per-hop `localCheckpoint(eager =
    * false)` makes each frontier a single shared RDD (both its consumers
    * — the next hop's join and the visited union — reference the same
    * LogicalRDD, so the job computes it once and caches), and the
    * caller's one action evaluates every hop. No persist on the edge
    * table: each hop shuffles the identical edge subplan, which Spark
    * collapses via ReusedExchange. */
  private def bfsLazy(g: GraphState, sources: DataFrame, maxDepth: Int,
      edgeTypes: Seq[String], undirected: Boolean): DataFrame = {
    val edges = hopEdges(g, edgeTypes, undirected)
    var visited = sources
      .select(col(sources.columns.head).as("id"), lit(0).as("depth"))
      .dropDuplicates("id")
      .localCheckpoint(eager = false)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      frontier = frontier
        .join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id"), lit(depth).as("depth"))
        .dropDuplicates("id")
        .join(visited.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(eager = false)
      visited = visited.union(frontier)
      // visited has two consumers per hop (anti-join + final output);
      // the lazy cut keeps it one shared RDD rather than a duplicated
      // subtree, bounding plan size linearly in depth
      visited = visited.localCheckpoint(eager = false)
    }
    visited
  }

  /** Batched multi-source unweighted shortest paths with distributed path
    * reconstruction. `pairs`: two string columns (source id, target id);
    * returns (src, dst, path ARRAY<STRING> of vertex ids, epath
    * ARRAY<STRING> of edge ids, length) — one row per pair whose target
    * is reachable within maxDepth, no rows otherwise.
    *
    * ALL pairs advance through ONE frontier DataFrame keyed by
    * (source, vertex): a MATCH producing thousands of endpoint pairs runs
    * the same bounded number of distributed hops as a single pair — no
    * per-pair driver loop, no per-hop collect. Predecessors resolve by
    * `min` per (source, vertex), making paths deterministic. Sources whose
    * every target is found drop out of the frontier; the loop exits early
    * when no targets remain. Reconstruction walks the predecessor table
    * backward with one join per path hop (≤ the found maximum depth). */
  def shortestPathsPairs(g: GraphState, pairs: DataFrame, maxDepth: Int,
      edgeTypes: Seq[String] = Nil, undirected: Boolean = false,
      all: Boolean = false): DataFrame = {
    if (maxDepth <= LazyUnrollDepth)
      return shortestPathsPairsLazy(g, pairs, maxDepth, edgeTypes,
        undirected, all)
    val edges = hopEdges(g, edgeTypes, undirected)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // `p` stays lazy: `self` is only read in the final union and
      // `targets0` is checkpointed right below — one materialization.
      val p = pairs
        .select(col(pairs.columns(0)).as("__a"),
          col(pairs.columns(1)).as("__b"))
        .dropDuplicates("__a", "__b")
      val self = p.filter(col("__a") === col("__b"))
        .select(col("__a"), col("__b"), array(col("__a")).as("path"),
          array().cast("array<string>").as("epath"), lit(0L).as("length"))
      val targets0 = p.filter(col("__a") =!= col("__b"))
        .localCheckpoint(eager = false)
      var remaining = targets0.count() // materializes targets0's checkpoint
      // predecessor table: (source, id, depth, preds ARRAY<STRUCT<pred,
      // prededge>>) — one entry in the single-path mode, every minimal
      // predecessor in all-shortest-paths mode
      val emptyPreds = array()
        .cast("array<struct<pred:string,prededge:string>>")
      var visited = targets0.select(col("__a").as("source"))
        .dropDuplicates("source")
        .select(col("source"), col("source").as("id"), lit(0).as("depth"),
          emptyPreds.as("preds"))
        .localCheckpoint(eager = false) // materializes inside hop 1's job
      var frontier = visited.select("source", "id")
      var foundParts = List.empty[DataFrame]
      // targets still outstanding: a lazy anti-join accumulation over the
      // (lazily checkpointed) hit batches — never more than maxDepth deep
      var tl = targets0
      var depth = 0
      var maxLen = 0L // deepest hit depth, tracked driver-side
      var frontierNonEmpty = remaining > 0
      while (depth < maxDepth && remaining > 0 && frontierNonEmpty) {
        depth += 1
        // single mode: the deterministic predecessor (min vertex, then
        // min edge). all mode: EVERY minimal predecessor entry, sorted
        // for deterministic reconstruction order.
        val predsAgg =
          if (all) array_sort(collect_set(
            struct(col("src").as("pred"), col("eid").as("prededge"))))
          else array(min(
            struct(col("src").as("pred"), col("eid").as("prededge"))))
        val nxt = frontier
          .join(edges, frontier("id") === edges("src"))
          .groupBy(col("source"), col("dst"))
          .agg(predsAgg.as("preds"))
          .select(col("source"), col("dst").as("id"), lit(depth).as("depth"),
            col("preds"))
          .join(visited.select("source", "id"), Seq("source", "id"),
            "left_anti")
          .localCheckpoint(eager = false)
        // THE hop's one eager job: a single left-outer pass over nxt
        // yields both the frontier size (loop control) and the hit count
        // — and, as the first job computing nxt, materializes its local
        // checkpoint. The former shape (eager checkpoint + hits
        // checkpoint + count + isEmpty) scheduled 4 jobs per hop; on a
        // frontier-bounded query the job overhead WAS the latency.
        val tlMark = tl.select(col("__a"), col("__b"), lit(1).as("__hit"))
        val stats = nxt.join(tlMark,
            nxt("source") === tlMark("__a") && nxt("id") === tlMark("__b"),
            "left_outer") // (source,id) and (__a,__b) both unique: 1:≤1
          .agg(count(lit(1)).as("n"), count(col("__hit")).as("hits"))
          .head()
        val nTotal = stats.getLong(0)
        val nHits = stats.getLong(1)
        visited = visited.union(nxt)
        // lazy cut: materializes inside the NEXT hop's job via the
        // anti-join read — no standalone re-materialization job
        if (depth % 3 == 0) visited = visited.localCheckpoint(eager = false)
        if (nHits > 0) {
          val hits = nxt
            .join(tl, nxt("source") === tl("__a") && nxt("id") === tl("__b"))
            .select(col("__a"), col("__b"), col("depth").cast("long")
              .as("length"))
            .localCheckpoint(eager = false) // computed in next hop's job
          foundParts ::= hits
          tl = tl.join(hits.select("__a", "__b"), Seq("__a", "__b"),
            "left_anti")
          remaining -= nHits
          maxLen = depth.toLong
          // sources with no outstanding targets stop expanding
          frontier = nxt.select("source", "id").join(
            tl.select(col("__a").as("source")), Seq("source"), "left_semi")
        } else frontier = nxt.select("source", "id")
        frontierNonEmpty = nTotal > 0
      }
      if (foundParts.isEmpty) return self
      val found = foundParts.reduce(_.union(_))
      // walk predecessors backward, all pairs at once; finished rows
      // (cur == source) retire from the working set each round. In all
      // mode the explode fans one partial path out per predecessor —
      // every minimal route reconstructs in the same bounded hop count.
      // Still no per-round ACTION — but `working` has TWO consumers per
      // round (the fin filter and the next expansion), so without a
      // lineage cut each round would DUPLICATE the whole upstream
      // subtree (2^rounds plan growth). The per-round lazy checkpoint
      // pins it to one shared RDD per round; everything still evaluates
      // as ONE job at the caller's action.
      val preds = visited.select(col("source"), col("id"), col("preds"))
      var working = found.select(col("__a"), col("__b"), col("length"),
        array(col("__b")).as("path"),
        array().cast("array<string>").as("epath"), col("__b").as("cur"))
        .localCheckpoint(eager = false)
      var done: DataFrame = null
      var i = 0L
      while (i < maxLen) {
        i += 1
        val fin = working.filter(col("cur") === col("__a"))
          .select(col("__a"), col("__b"), col("path"), col("epath"),
            col("length"))
        done = if (done == null) fin else done.union(fin)
        working = working.filter(col("cur") =!= col("__a"))
          .join(preds, col("cur") === preds("id") &&
            col("__a") === preds("source"))
          .select(col("__a"), col("__b"), col("length"), col("path"),
            col("epath"), explode(col("preds")).as("p"))
          .select(col("__a"), col("__b"), col("length"),
            concat(array(col("p.pred")), col("path")).as("path"),
            concat(array(col("p.prededge")), col("epath")).as("epath"),
            col("p.pred").as("cur"))
          .localCheckpoint(eager = false)
      }
      val finished = working.filter(col("cur") === col("__a"))
        .select(col("__a"), col("__b"), col("path"), col("epath"),
          col("length"))
      done = if (done == null) finished else done.union(finished)
      self.union(done.select(col("__a"), col("__b"), col("path"),
        col("epath"), col("length")))
    } finally edges.unpersist()
  }

  /** Fully-lazy batched shortest paths (maxDepth ≤ [[LazyUnrollDepth]]):
    * the SAME dataflow as the action-driven loop — per-hop frontier
    * expansion with min-depth dedup, hit extraction against outstanding
    * targets, target retirement, satisfied-source pruning, and backward
    * path reconstruction — but with ZERO driver-side actions. Every hop
    * and every reconstruction round is built lazily; per-step
    * `localCheckpoint(eager = false)` turns each multiply-consumed frame
    * into one shared RDD (computed once, cached in the job that first
    * evaluates it), so the caller's single action runs the entire
    * traversal as ONE Spark job. A maxDepth-4 query previously paid ~10
    * sequential job latencies (~0.3 s each at local[32]) for a 42-row
    * answer; here those become in-job stages, which AQE further collapses
    * when frontiers go empty. Semantics are identical: a pair found at
    * depth d is anti-joined out of the outstanding set, so it cannot
    * reappear deeper, and in `all` mode every minimal predecessor at the
    * SAME depth is kept. */
  private def shortestPathsPairsLazy(g: GraphState, pairs: DataFrame,
      maxDepth: Int, edgeTypes: Seq[String], undirected: Boolean,
      all: Boolean): DataFrame = {
    val edges = hopEdges(g, edgeTypes, undirected)
    val p = pairs
      .select(col(pairs.columns(0)).as("__a"),
        col(pairs.columns(1)).as("__b"))
      .dropDuplicates("__a", "__b")
      .localCheckpoint(eager = false)
    val self = p.filter(col("__a") === col("__b"))
      .select(col("__a"), col("__b"), array(col("__a")).as("path"),
        array().cast("array<string>").as("epath"), lit(0L).as("length"))
    var tl = p.filter(col("__a") =!= col("__b"))
      .localCheckpoint(eager = false)
    val emptyPreds = array()
      .cast("array<struct<pred:string,prededge:string>>")
    var visited = tl.select(col("__a").as("source"))
      .dropDuplicates("source")
      .select(col("source"), col("source").as("id"), lit(0).as("depth"),
        emptyPreds.as("preds"))
      .localCheckpoint(eager = false)
    var frontier = visited.select("source", "id")
    var foundParts = List.empty[DataFrame]
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      val predsAgg =
        if (all) array_sort(collect_set(
          struct(col("src").as("pred"), col("eid").as("prededge"))))
        else array(min(
          struct(col("src").as("pred"), col("eid").as("prededge"))))
      val nxt = frontier
        .join(edges, frontier("id") === edges("src"))
        .groupBy(col("source"), col("dst"))
        .agg(predsAgg.as("preds"))
        .select(col("source"), col("dst").as("id"), lit(depth).as("depth"),
          col("preds"))
        .join(visited.select("source", "id"), Seq("source", "id"),
          "left_anti")
        .localCheckpoint(eager = false)
      val hits = nxt
        .join(tl, nxt("source") === tl("__a") && nxt("id") === tl("__b"))
        .select(col("__a"), col("__b"),
          col("depth").cast("long").as("length"))
        .localCheckpoint(eager = false)
      foundParts ::= hits
      tl = tl.join(hits.select("__a", "__b"), Seq("__a", "__b"),
        "left_anti").localCheckpoint(eager = false)
      visited = visited.union(nxt).localCheckpoint(eager = false)
      // sources with no outstanding targets stop expanding (pure
      // dataflow pruning — no count needed to decide)
      frontier = nxt.select("source", "id").join(
        tl.select(col("__a").as("source")).dropDuplicates("source"),
        Seq("source"), "left_semi")
    }
    val found = foundParts.reduce(_.union(_))
    val preds = visited.select(col("source"), col("id"), col("preds"))
    var working = found.select(col("__a"), col("__b"), col("length"),
      array(col("__b")).as("path"),
      array().cast("array<string>").as("epath"), col("__b").as("cur"))
      .localCheckpoint(eager = false)
    var done: DataFrame = null
    var i = 0
    while (i < maxDepth) {
      i += 1
      val fin = working.filter(col("cur") === col("__a"))
        .select(col("__a"), col("__b"), col("path"), col("epath"),
          col("length"))
      done = if (done == null) fin else done.union(fin)
      working = working.filter(col("cur") =!= col("__a"))
        .join(preds, col("cur") === preds("id") &&
          col("__a") === preds("source"))
        .select(col("__a"), col("__b"), col("length"), col("path"),
          col("epath"), explode(col("preds")).as("p"))
        .select(col("__a"), col("__b"), col("length"),
          concat(array(col("p.pred")), col("path")).as("path"),
          concat(array(col("p.prededge")), col("epath")).as("epath"),
          col("p.pred").as("cur"))
        .localCheckpoint(eager = false)
    }
    val finished = working.filter(col("cur") === col("__a"))
      .select(col("__a"), col("__b"), col("path"), col("epath"),
        col("length"))
    done = if (done == null) finished else done.union(finished)
    self.union(done.select(col("__a"), col("__b"), col("path"),
      col("epath"), col("length")))
  }

  /** Single-pair convenience over the batched engine (kept for API
    * compatibility; point lookups share the distributed path). */
  def shortestPathBetween(g: GraphState, srcId: String, dstId: String,
      maxDepth: Int, edgeType: Option[String] = None,
      undirected: Boolean = false)(implicit spark: SparkSession)
      : Option[Seq[String]] = {
    import spark.implicits._
    val pairs = Seq((srcId, dstId)).toDF("__a", "__b")
    shortestPathsPairs(g, pairs, maxDepth, edgeType.toSeq, undirected)
      .collect().headOption.map(_.getSeq[String](2))
  }

  /** Variable-length path enumeration `[*minDepth..maxDepth]` (QE:115-118):
    * returns (path ARRAY<STRING>, endId, depth) for every simple path
    * (cycle-guard: a vertex appears at most once per path). Exponential by
    * nature — always bound maxDepth; each expansion is one join. */
  def paths(g: GraphState, sources: DataFrame, minDepth: Int, maxDepth: Int,
      t: Seq[String] = Nil, undirected: Boolean = false,
      reversed: Boolean = false): DataFrame = {
    require(maxDepth >= 1 && minDepth >= 1 && minDepth <= maxDepth)
    val edges = hopEdges(g, t, undirected, reversed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cur = sources
        .select(array(col(sources.columns.head)).as("path"),
          array().cast("array<string>").as("epath"),
          col(sources.columns.head).as("endId"), lit(0).as("depth"))
      var acc: DataFrame = null
      var depth = 0
      var cnt = cur.count()
      while (depth < maxDepth && cnt > 0) {
        depth += 1
        // Cypher trail semantics: a RELATIONSHIP may not repeat within a
        // path (vertices may — (a)-[e1]->(b)-[e2]->(a) is a valid trail).
        cur = cur
          .join(edges, cur("endId") === edges("src"))
          .filter(!array_contains(col("epath"), col("eid")))
          .select(concat(col("path"), array(col("dst"))).as("path"),
            concat(col("epath"), array(col("eid"))).as("epath"),
            col("dst").as("endId"), lit(depth).as("depth"))
          .localCheckpoint(eager = false)
        cnt = cur.count() // one job: loop control + checkpoint in one pass
        if (depth >= minDepth)
          acc = if (acc == null) cur else acc.union(cur)
      }
      val out = if (acc == null) cur.limit(0) else acc
      out.select(col("path"), col("endId"), col("depth"))
    } finally edges.unpersist()
  }
}
