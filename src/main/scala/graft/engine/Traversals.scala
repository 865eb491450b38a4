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
    * Equivalently: unweighted shortest-path distance ≤ maxDepth. */
  def bfs(g: GraphState, sources: DataFrame, maxDepth: Int,
      edgeType: Option[String] = None, undirected: Boolean = false)
      : DataFrame = {
    val edges = hopEdges(g, edgeType.toSeq, undirected)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var visited = sources
        .select(col(sources.columns.head).as("id"), lit(0).as("depth"))
        .dropDuplicates("id")
        .localCheckpoint()
      var frontier = visited
      var depth = 0
      while (depth < maxDepth && !frontier.isEmpty) {
        depth += 1
        frontier = frontier
          .join(edges, frontier("id") === edges("src"))
          .select(col("dst").as("id"), lit(depth).as("depth"))
          .dropDuplicates("id")
          .join(visited.select("id"), Seq("id"), "left_anti")
          .localCheckpoint() // cut lineage every hop; frontier is small
        visited = visited.union(frontier)
        // visited's lineage grows one cheap union per hop — only cut it
        // periodically (each cut re-materializes the whole visited set)
        if (depth % 3 == 0) visited = visited.localCheckpoint()
      }
      visited
    } finally edges.unpersist()
  }

  /** Unweighted single-pair shortest path with path reconstruction:
    * returns (path array, length), or no rows if unreachable within
    * maxDepth. BFS with predecessor tracking; path rebuilt driver-side
    * from the bounded predecessor table (size ≤ reached vertices). */
  def shortestPathBetween(g: GraphState, srcId: String, dstId: String,
      maxDepth: Int, edgeType: Option[String] = None,
      undirected: Boolean = false)(implicit spark: SparkSession)
      : Option[Seq[String]] = {
    if (srcId == dstId) return Some(Seq(srcId))
    val edges = hopEdges(g, edgeType.toSeq, undirected)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var preds = Map[String, String]() // first-discovered predecessor
      var visitedIds = Set(srcId)
      var frontier: Seq[String] = Seq(srcId)
      var depth = 0
      var found = false
      while (!found && depth < maxDepth && frontier.nonEmpty) {
        depth += 1
        // One distributed hop; the *frontier* is collected (bounded by the
        // reached set, which for point-to-point search is acceptable — the
        // all-pairs variant stays fully distributed in `bfs`).
        val next = edges
          .filter(col("src").isin(frontier: _*))
          .select("src", "dst").collect()
          .map(r => (r.getString(0), r.getString(1)))
        val fresh = next.filter { case (_, d) => !visitedIds.contains(d) }
        val newPreds = fresh.groupBy(_._2).map { case (d, es) =>
          d -> es.map(_._1).min // deterministic predecessor choice
        }
        preds ++= newPreds
        visitedIds ++= newPreds.keys
        frontier = newPreds.keys.toSeq
        found = preds.contains(dstId)
      }
      if (!found) None
      else {
        val path = Iterator.iterate(dstId)(preds)
          .takeWhile(_ != srcId).toSeq.reverse
        Some(srcId +: path)
      }
    } finally edges.unpersist()
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
      while (depth < maxDepth && !cur.isEmpty) {
        depth += 1
        // Cypher trail semantics: a RELATIONSHIP may not repeat within a
        // path (vertices may — (a)-[e1]->(b)-[e2]->(a) is a valid trail).
        cur = cur
          .join(edges, cur("endId") === edges("src"))
          .filter(!array_contains(col("epath"), col("eid")))
          .select(concat(col("path"), array(col("dst"))).as("path"),
            concat(col("epath"), array(col("eid"))).as("epath"),
            col("dst").as("endId"), lit(depth).as("depth"))
          .localCheckpoint()
        if (depth >= minDepth)
          acc = if (acc == null) cur else acc.union(cur)
      }
      val out = if (acc == null) cur.limit(0) else acc
      out.select(col("path"), col("endId"), col("depth"))
    } finally edges.unpersist()
  }
}
