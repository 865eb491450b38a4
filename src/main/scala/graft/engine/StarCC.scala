package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components as a pure DataFrame fixpoint — the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14): O(log n) rounds,
  * each round two grouped aggregations + joins over the edge list, no
  * RDD conversion and no Pregel machinery.
  *
  * Why it exists alongside `GraphXBridge.connectedComponents`: the
  * GraphX path pays a fixed per-superstep cost (RDD caching, Pregel
  * scheduling) that dominates when components are shallow — the sf1
  * rehearsal measured ~15 s for CC over a 249k-edge near-dup pair
  * graph whose chains converge in a handful of rounds. The DataFrame
  * form keeps the whole loop in Tungsten, converges in O(log n) rounds
  * REGARDLESS of component diameter (star contraction, not frontier
  * propagation), and inherits AQE sizing per round. GraphX remains the
  * surface for the gx01 bridge operator; the dedup cluster family
  * routes here.
  *
  * Semantics: given undirected edges (id1, id2) over LONG ids, returns
  * (id, component) where component = the MINIMUM id in the node's
  * component — identical labeling to GraphX CC, pinned by
  * TraversalSpec's equivalence test. Nodes appear in the output iff
  * they appear in at least one edge; callers union in singletons.
  *
  * Hybrid execution: the distinct canonical edge count is measured
  * first (one job, also the checkpoint materializer), and graphs at or
  * under `spark.graft.starcc.driverCollectBound` edges (default 2^19 ≈
  * 8 MB of id pairs) run a driver-side union-find instead of the
  * distributed fixpoint. Rationale: each star round is ~8 scheduled
  * stages, and the near-dup pair graphs the dedup gates feed here are
  * KBs at any tested SF — the loop's cost was pure stage latency
  * (measured: d07/d11/p23 ≈ 2.0–2.4 s wall on 0.1 MB of shuffle).
  * The bound is checked against a MEASURED count, so the collect is
  * provably bounded — a corpus-scale pair graph (near-dup pairs grow
  * with corpus size; sf1 already produces 249k) takes the distributed
  * path unchanged. Both paths produce identical labels, pinned against
  * GraphX CC and against each other in TraversalSpec.
  */
object StarCC {
  /** Distinct-canonical-edge count at or under which the driver
    * union-find path runs. 2^19 edges = 8 MB of long pairs. */
  val DefaultDriverCollectBound: Long = 1L << 19

  /** (id, component) for every node incident to at least one edge. */
  def components(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import org.apache.spark.sql.graft.shims
    // canonical undirected edge set, self-loops dropped
    var e = edges
      .select(least(col("id1"), col("id2")).cast("long").as("a"),
        greatest(col("id1"), col("id2")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    var eCount = e.count() // materializes the lazy checkpoint

    val boundKey = "spark.graft.starcc.driverCollectBound"
    val driverBound = spark.conf.getOption(boundKey)
      .map(v => try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$boundKey must be a long edge count (0 disables the driver " +
            s"path), got: '$v'")
      })
      .getOrElse(DefaultDriverCollectBound)
    // bound 0 (or negative) disables the driver path outright — even an
    // EMPTY canonical edge set then runs the distributed fixpoint, so a
    // test forcing the distributed leg really exercises it.
    // the chosen leg is observable (stderr, spark.graft.debug-gated —
    // engine code must not print unconditionally): the sf10
    // rehearsal's "does a big pair graph route to the distributed leg
    // NATURALLY" check reads this line rather than inferring from
    // wall time
    graft.util.Dbg(spark, s"[starcc] canonical_edges=$eCount " +
      s"bound=$driverBound leg=" +
      (if (driverBound > 0 && eCount <= driverBound) "driver"
       else "distributed"))
    if (driverBound > 0 && eCount <= driverBound) {
      // bounded by the measured count: ≤ driverBound (a,b) long pairs
      val out = driverUnionFind(e.collect().map(r =>
        (r.getLong(0), r.getLong(1))))
      shims.releaseLocalCheckpoint(e)
      import spark.implicits._
      return out.toSeq.toDF("id", "component")
    }

    // large-star: every neighbor v > u links to m = min(N(u) ∪ {u});
    // small-star: every neighbor v ≤ u links to m = min of the smaller
    // neighborhood (plus u itself). Alternating the two contracts every
    // component to a star on its minimum in O(log n) rounds.
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.select(col("a").as("u"), col("b").as("v"))
        .unionAll(cur.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    def smallStar(cur: DataFrame): DataFrame = {
      // orient every edge toward its LARGER endpoint: (u = max, v = min)
      val oriented = cur.select(col("b").as("u"), col("a").as("v"))
      val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val relink = oriented.join(mins, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
      relink.unionAll(mins.select(col("m").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
    }

    var converged = false
    var rounds = 0
    val maxRounds = 64 // ≫ log₂ of any node count a long id can hold
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // True fixpoint test (not a checksum) in ONE job per round: both
      // sides are distinct, so set equality ⟺ |E'| == |E| AND every E'
      // row matches an E row. A single left-outer pass yields |E'| and
      // the match count together — and, as the first job computing
      // `next`, it materializes next's lazy checkpoint. The former
      // count+count+anti-isEmpty shape scheduled 3–4 jobs per round,
      // a fixed ~1 s/gate cost at small SF (round-7 verdict item).
      val stats = next.join(
          e.select(col("a"), col("b"), lit(1).as("__in")),
          Seq("a", "b"), "left_outer")
        .agg(count(lit(1)).as("n"), count(col("__in")).as("matched"))
        .head()
      val n = stats.getLong(0)
      converged = n == eCount && stats.getLong(1) == n
      val prev = e
      e = next
      eCount = n
      // INVARIANT (do not reorder): releasing prev's local-checkpoint
      // blocks is safe ONLY because the stats `.head()` above has
      // already run — it is the first job computing `next`, so next's
      // lazy checkpoint is fully materialized and its lineage no longer
      // reaches prev. Local-checkpoint blocks are UNRECOVERABLE once
      // unpersisted: if a future edit skips or moves that action (e.g.
      // short-circuiting the stats job on the last round), this release
      // turns into a runtime "checkpoint block not found" failure, not
      // a recompute. Guarded by shims.assertLocallyCheckpointed.
      shims.assertLocallyCheckpointed(e)
      shims.releaseLocalCheckpoint(prev)
    }
    require(converged, s"StarCC did not converge in $maxRounds rounds")
    // At the fixpoint every edge is (component-min, member): label both
    // endpoints, the min labels itself.
    e.select(col("b").as("id"), col("a").as("component"))
      .unionAll(e.select(col("a").as("id"), col("a").as("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
  }

  /** Union-find with path compression over the collected canonical
    * edge list; roots are kept at the component MINIMUM (union always
    * parents the larger root under the smaller), so `find(x)` IS the
    * min-id label the distributed loop produces. Deep trees from
    * min-rooting are flattened by compression; at the 2^19-edge bound
    * this is microseconds. Returns one (id, minLabel) per node. */
  private[engine] def driverUnionFind(
      edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    val nodes = new java.util.LinkedHashSet[Long](edges.length * 2)
    for ((a, b) <- edges) {
      nodes.add(a); nodes.add(b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val out = new Array[(Long, Long)](nodes.size)
    val it = nodes.iterator()
    var i = 0
    while (it.hasNext) {
      val n = it.next()
      out(i) = (n, find(n))
      i += 1
    }
    out
  }
}
