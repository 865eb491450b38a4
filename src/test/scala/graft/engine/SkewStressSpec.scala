package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skewed-degree stress fixture (round-6 brief item 3): a power-law-ish
  * graph with ONE 10,000-degree hub, exercising the wedge/walk family
  * exactly where degree skew breaks naive formulations:
  *
  *   hub 0 — leaves 1..10000 (star), plus path edges (i, i+1) for
  *   i in 1..999, so the first 1000 leaves chain into 999 hub-closing
  *   triangles.
  *
  * Closed forms this shape admits:
  *   - triangles = 999 (one per path edge, all through the hub);
  *   - support(path edge) = 1; support(0—i) = #path-neighbors of i
  *     (2 for 2 ≤ i ≤ 999, 1 for i ∈ {1, 1000}, 0 for i > 1000);
  *   - with the hub capped out of wedge centers, link-prediction
  *     candidates are exactly {(i−1, i+1) : 2 ≤ i ≤ 999}, common 1.
  *
  * The SCALE point: degree orientation bounds the hub's oriented
  * out-degree at 0 (max degree ⇒ nothing points FROM it), so wedge
  * work is Σ C(outdeg ≤ 3, 2) ≈ 1k intersections — the unoriented
  * Σ deg² formulation would enumerate C(10000, 2) ≈ 50M wedges at the
  * hub. The wall-clock of the support pass on this fixture is recorded
  * in PLANS.md (seconds, not the minutes a deg² blowup would cost).
  */
class SkewStressSpec extends SparkSpec {

  private lazy val hubFixture = {
    val star = spark.range(1, 10001)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val path = spark.range(1, 1000)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    star.unionAll(path).localCheckpoint()
  }

  test("hub fixture: edgeTriangleSupport closed form at 10k-degree skew") {
    val t0 = System.nanoTime()
    val sup = GraphXBridge.edgeTriangleSupport(hubFixture)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"support pass over 10,999 edges with a 10k-degree hub: $secs%.2f s")
    assert(sup.size == 10999)
    // path edges: exactly one triangle each (through the hub)
    (1L until 1000L).foreach(i => assert(sup((i, i + 1)) == 1L))
    // star edges: support = path-degree of the leaf
    assert(sup((0L, 1L)) == 1L && sup((0L, 1000L)) == 1L)
    assert(sup((0L, 500L)) == 2L)
    assert(sup((0L, 5000L)) == 0L)
    // Σ support = 3 × triangle count = 3 × 999
    assert(sup.values.sum == 3L * 999L)
    // and the skew must not take minutes: a Σdeg² formulation pays
    // ~50M hub wedges; the oriented one pays ~1k intersections
    assert(secs < 120.0, s"support pass took $secs s — deg² blowup?")
  }

  test("hub fixture: linkPredictionScores at the hub-cap boundary") {
    // cap 16 excludes ONLY the hub (leaf degrees ≤ 3): candidates are
    // the path-wedge pairs (i−1, i+1), common exactly 1
    val out = GraphXBridge
      .linkPredictionScores(hubFixture, maxCenterDegree = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 998)
    assert(out.keySet == (2L until 1000L).map(i => (i - 1, i + 1)).toSet)
    assert(out.values.forall(_._1 == 1L))
    // endpoints: deg(1) = 2 (hub + vertex 2), deg(3) = 3 →
    // jaccard_bp = floor(10000 / (2+3−1)) = 2500, pref = 6
    assert(out((1L, 3L)) == ((1L, 2500L, 6L)))
    // interior: deg = 3 both sides → floor(10000/5) = 2000, pref = 9
    assert(out((500L, 502L)) == ((1L, 2000L, 9L)))
    // cap boundary is EXACT: capping at 9999 (just below the hub's
    // 10000) must equal capping at 16, capping at 10000 re-admits it
    val at9999 = GraphXBridge
      .linkPredictionScores(hubFixture, maxCenterDegree = 9999).count()
    assert(at9999 == 998L)
  }

  test("hub fixture: topLinkPredictions cuts before the wide joins") {
    val top = GraphXBridge
      .topLinkPredictions(hubFixture, k = 50, maxCenterDegree = 16)
    // plan shape: the k-cut is TakeOrderedAndProject (partition-local
    // top-k + driver merge), not a global Sort exchange over the
    // candidate set
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    val rows = top.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 50)
    // total order: common all 1 → (id1, id2) ascending from (1,3)
    assert(rows.head == ((1L, 3L, 1L)))
    assert(rows.last == ((50L, 52L, 1L)))
  }

  test("hub fixture: sampleNeighbors ships k rows from the hub, " +
      "plan uses a window group limit") {
    implicit val s = spark
    val out = GraphXBridge.sampleNeighbors(hubFixture, k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    val byId = out.collect().groupBy(_.getLong(0))
    // the 10k-degree hub contributes exactly k rows, ranked 1..k
    assert(byId(0L).map(_.getLong(1)).sorted.toSeq == (1L to 5L))
    // a pendant leaf keeps its single neighbor
    assert(byId(5000L).map(_.getLong(2)).toSeq == Seq(0L))
    // every vertex ships min(deg, k)
    assert(out.count() ==
      5 + // hub
        (1L to 1000L).map(i => math.min(
          1 + (if (i > 1) 1 else 0) + (if (i < 1000) 1 else 0), 5)).sum +
        9000L) // pendant leaves
  }

  test("hub fixture: deterministicWalks stays frontier-shaped on the hub") {
    implicit val s = spark
    import s.implicits._
    // 8 walks of 3 steps from the hub: frontier rows stay |starts|·W
    // after each step's argmin collapse (the hub fans each row 10k ways
    // map-side, the partial min folds it back)
    val starts = Seq(0L).toDF("id")
    val walks = GraphXBridge
      .deterministicWalks(hubFixture, starts, walksPerNode = 8, steps = 3)
      .collect()
    assert(walks.length == 8)
    // determinism: the same walk ids re-run to the same paths
    val again = GraphXBridge
      .deterministicWalks(hubFixture, starts, walksPerNode = 8, steps = 3)
      .collect()
    assert(walks.map(_.getString(3)).sorted.sameElements(
      again.map(_.getString(3)).sorted))
  }
}
