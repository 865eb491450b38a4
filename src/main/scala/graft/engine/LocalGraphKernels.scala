package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Size-gated LOCAL kernels for the wedge/triangle operator family.
  *
  * Rationale (optimization guide §8: move decisions to small data —
  * measured in OPTIMIZATION_r13.md): at sf0.1 the co-purchase graph is
  * 20k vertices / 1.2M canonical edges ≈ 10 MB as a CSR array, yet the
  * distributed wedge formulation shuffles the FULL Σ C(deg,2) wedge
  * stream (148M packed longs ≈ 1.0 GB measured) just to count pair
  * multiplicities that a broadcast adjacency can count in-place. This
  * is the same strategy decision as a broadcast-hash join: when one
  * side (here, the whole adjacency) fits comfortably in memory, ship
  * it everywhere once and never shuffle the big derived stream at all.
  *
  * The gate is a hard row-count probe (`limit(max+1).collect()` — one
  * bounded pass, never an unbounded driver fetch) against
  * [[LocalGraphKernels.MaxEdgesKey]]; above the threshold the caller
  * falls back to the unchanged distributed (and, past the disk budget,
  * bucketed) plan — the 100 TB path is untouched. The collected edge
  * list is bounded by the same conf (default 4M edges ≈ 64 MB — the
  * broadcast-relation size class, far below Spark's own 8 GB broadcast
  * cap) and is rebuilt from the parquet-derived input on every run —
  * nothing is memoized across runs.
  *
  * Determinism: dense vertex indices are assigned in ascending id
  * order, so dense order == id order and every tie-break below
  * reproduces the distributed plan's (common DESC, id1, id2) /
  * canonical-edge ordering exactly; counts are exact integers.
  * Equivalence is pinned in ScaleSpec (kernel vs distributed on the
  * same graphs, long ids; string-id inputs always take the distributed
  * path).
  */
private[graft] object LocalGraphKernels {

  /** Conf: max canonical edge count for the local kernels (shared by
    * the link-prediction and triangle-support fast paths); 0 disables
    * them. Default 4M edges ≈ 64 MB collected / ~40 MB as broadcast
    * CSR — small-broadcast class on any driver. Production note
    * (OPTIMIZATION_r13.md): this is a per-GRAPH bound, not a per-SF
    * bound — a 100 TB run whose extracted subgraph is still ≤ 4M edges
    * (e.g. a per-tenant slice) legitimately takes this path; the full
    * co-purchase graph at sf1+ exceeds it and keeps the distributed
    * plan. */
  val MaxEdgesKey = "spark.graft.graph.localKernelMaxEdges"

  private def maxEdges(spark: SparkSession): Int =
    spark.conf.get(MaxEdgesKey, "4000000").toInt

  /** Both id columns integral (the dense-index mapping needs a total
    * numeric order; string graphs keep the distributed plan). */
  private def integralIds(edges: DataFrame): Boolean =
    Seq("src", "dst").forall(c => edges.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    })

  /** Symmetric CSR adjacency in dense index space: `ids` sorted
    * ascending (dense idx → original id), `off`/`nbr` the usual
    * offsets/targets arrays with each neighbor segment sorted. */
  final case class Csr(ids: Array[Long], off: Array[Int],
      nbr: Array[Int]) {
    def n: Int = ids.length
  }

  /** One bounded probe: collect the canonical edge list iff it is
    * ≤ maxEdges rows (limit(max+1) caps the fetch; an over-limit graph
    * costs one truncated collect and returns None). */
  private def collectIfSmall(edges: DataFrame, max: Int)
      : Option[Array[Long]] = {
    if (max <= 0 || !integralIds(edges)) return None
    val rows = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .limit(max + 1).collect()
    if (rows.length > max) None
    else {
      val packed = new Array[Long](rows.length * 2)
      var i = 0
      while (i < rows.length) {
        packed(2 * i) = rows(i).getLong(0)
        packed(2 * i + 1) = rows(i).getLong(1)
        i += 1
      }
      Some(packed)
    }
  }

  private def buildCsr(packed: Array[Long]): Csr = {
    val m = packed.length / 2
    // dense ids: sorted distinct endpoints
    val all = new Array[Long](2 * m)
    System.arraycopy(packed, 0, all, 0, 2 * m)
    java.util.Arrays.sort(all)
    var nDistinct = 0
    var i = 0
    while (i < all.length) {
      if (nDistinct == 0 || all(i) != all(nDistinct - 1)) {
        all(nDistinct) = all(i); nDistinct += 1
      }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(all, nDistinct)
    def idx(id: Long): Int = {
      val p = java.util.Arrays.binarySearch(ids, id)
      p // inputs are endpoints by construction; always found
    }
    val off = new Array[Int](nDistinct + 1)
    i = 0
    while (i < m) {
      off(idx(packed(2 * i)) + 1) += 1
      off(idx(packed(2 * i + 1)) + 1) += 1
      i += 1
    }
    var j = 0
    while (j < nDistinct) { off(j + 1) += off(j); j += 1 }
    val cursor = java.util.Arrays.copyOf(off, nDistinct)
    val nbr = new Array[Int](2 * m)
    i = 0
    while (i < m) {
      val u = idx(packed(2 * i)); val v = idx(packed(2 * i + 1))
      nbr(cursor(u)) = v; cursor(u) += 1
      nbr(cursor(v)) = u; cursor(v) += 1
      i += 1
    }
    j = 0
    while (j < nDistinct) {
      java.util.Arrays.sort(nbr, off(j), off(j + 1))
      j += 1
    }
    Csr(ids, off, nbr)
  }

  /** First index in nbr[lo, hi) with value > u (segment sorted). */
  private def firstGreater(nbr: Array[Int], lo: Int, hi: Int, u: Int)
      : Int = {
    var a = lo; var b = hi
    while (a < b) {
      val mid = (a + b) >>> 1
      if (nbr(mid) <= u) a = mid + 1 else b = mid
    }
    a
  }

  private def chunkRanges(n: Int, spark: SparkSession)
      : Seq[(Int, Int)] = {
    val nChunks = math.max(1,
      math.min(256, math.min(n, spark.sparkContext.defaultParallelism * 8)))
    val sz = (n + nChunks - 1) / nChunks
    (0 until nChunks).map(c => (c * sz, math.min(n, (c + 1) * sz)))
  }

  /** Local top-k common-neighbor candidates: exactly the distributed
    * pipeline's non-adjacent (id1 < id2, common = #shared neighbors)
    * pairs, cut to the global top-k under (common DESC, id1, id2) — a
    * total order, so the per-chunk top-k union contains the global
    * top-k (each pair is scored in exactly one chunk: its id1's).
    * Returns None when the graph exceeds the conf bound or ids are
    * non-integral. */
  def topCommonNeighbors(edges: DataFrame, k: Int)
      : Option[(DataFrame, DataFrame)] = {
    val spark = edges.sparkSession
    collectIfSmall(edges, maxEdges(spark)).map { packed =>
      val csr = buildCsr(packed)
      graft.util.Dbg(spark,
        s"[linkpred] local kernel: n=${csr.n} m=${packed.length / 2}")
      // the (id, deg) frame for scoring comes straight off the CSR —
      // the distributed path's sym-union groupBy + localCheckpoint
      // jobs are pure overhead once the adjacency is already on the
      // driver
      val degDf = {
        import spark.implicits._
        (0 until csr.n).map(i =>
            (csr.ids(i), (csr.off(i + 1) - csr.off(i)).toLong))
          .toDF("id", "deg")
      }
      val bc = spark.sparkContext.broadcast(csr)
      import spark.implicits._
      val ranges = chunkRanges(csr.n, spark)
      val out = spark.createDataset(ranges).repartition(ranges.size)
        .mapPartitions { it =>
          val c = bc.value
          val n = c.n
          val counts = new Array[Int](n)
          val marks = new Array[Boolean](n)
          val touched = new Array[Int](n)
          // bounded worst-first heap under (common DESC, id1, id2):
          // head = the candidate that drops first
          val ord = new java.util.Comparator[Array[Long]] {
            def compare(a: Array[Long], b: Array[Long]): Int = {
              if (a(2) != b(2)) java.lang.Long.compare(a(2), b(2))
              else if (a(0) != b(0)) java.lang.Long.compare(b(0), a(0))
              else java.lang.Long.compare(b(1), a(1))
            }
          }
          val heap = new java.util.PriorityQueue[Array[Long]](k, ord)
          it.foreach { case (lo, hi) =>
            var u = lo
            while (u < hi) {
              val us = c.off(u); val ue = c.off(u + 1)
              var t = us
              while (t < ue) { marks(c.nbr(t)) = true; t += 1 }
              var nTouched = 0
              t = us
              while (t < ue) {
                val w = c.nbr(t)
                val we = c.off(w + 1)
                var t2 = firstGreater(c.nbr, c.off(w), we, u)
                while (t2 < we) {
                  val v = c.nbr(t2)
                  if (counts(v) == 0) { touched(nTouched) = v; nTouched += 1 }
                  counts(v) += 1
                  t2 += 1
                }
                t += 1
              }
              var ti = 0
              while (ti < nTouched) {
                val v = touched(ti)
                val cm = counts(v); counts(v) = 0
                if (!marks(v)) {
                  val cand = Array(c.ids(u), c.ids(v), cm.toLong)
                  if (heap.size < k) heap.add(cand)
                  else if (ord.compare(cand, heap.peek) > 0) {
                    heap.poll(); heap.add(cand)
                  }
                }
                ti += 1
              }
              t = us
              while (t < ue) { marks(c.nbr(t)) = false; t += 1 }
              u += 1
            }
          }
          val buf = scala.collection.mutable.ArrayBuffer.empty[
            (Long, Long, Long)]
          while (!heap.isEmpty) {
            val a = heap.poll(); buf += ((a(0), a(1), a(2)))
          }
          buf.iterator
        }
        .toDF("id1", "id2", "common")
      (out.orderBy(col("common").desc, col("id1"), col("id2")).limit(k),
        degDf)
    }
  }

  /** Local per-edge triangle support: |N(src) ∩ N(dst)| for every
    * canonical (src < dst) input edge, zero-support edges included —
    * exactly [[GraphXBridge.edgeTriangleSupport]]'s contract. Each
    * canonical edge is emitted from its src's chunk. Returns None
    * above the conf bound / non-integral ids. */
  def triangleSupport(edges: DataFrame): Option[DataFrame] = {
    val spark = edges.sparkSession
    collectIfSmall(edges, maxEdges(spark)).map { packed =>
      val csr = buildCsr(packed)
      graft.util.Dbg(spark,
        s"[trisupport] local kernel: n=${csr.n} m=${packed.length / 2}")
      val bc = spark.sparkContext.broadcast(csr)
      import spark.implicits._
      val ranges = chunkRanges(csr.n, spark)
      spark.createDataset(ranges).repartition(ranges.size)
        .mapPartitions { it =>
          val c = bc.value
          val marks = new Array[Boolean](c.n)
          it.flatMap { case (lo, hi) =>
            (lo until hi).iterator.flatMap { u =>
              val us = c.off(u); val ue = c.off(u + 1)
              var t = us
              while (t < ue) { marks(c.nbr(t)) = true; t += 1 }
              val vStart = firstGreater(c.nbr, us, ue, u)
              val rows = new Array[(Long, Long, Long)](ue - vStart)
              var r = 0
              var tv = vStart
              while (tv < ue) {
                val v = c.nbr(tv)
                var cm = 0
                var t2 = c.off(v); val ve = c.off(v + 1)
                while (t2 < ve) {
                  if (marks(c.nbr(t2))) cm += 1
                  t2 += 1
                }
                rows(r) = (c.ids(u), c.ids(v), cm.toLong)
                r += 1
                tv += 1
              }
              t = us
              while (t < ue) { marks(c.nbr(t)) = false; t += 1 }
              rows.iterator
            }
          }
        }
        .toDF("src", "dst", "support")
    }
  }
}
