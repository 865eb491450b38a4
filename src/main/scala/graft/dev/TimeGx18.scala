package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-wise cost breakdown + variant lab for the gx18 full-graph
  * link-prediction plan (scratch tool; the winning variant lands in
  * GraphXBridge.linkCandidates).
  */
object TimeGx18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.count() // warm page cache
    val e0 = li.select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val edges = e0.as("a").join(e0.as("b"), col("a.k") === col("b.k")
        && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .distinct()
      .localCheckpoint()
    println(s"[gx18lab] edges: ${edges.count()}")

    val sym = edges.select(col("src").as("id"), col("dst").as("nbr"))
      .unionAll(edges.select(col("dst").as("id"), col("src").as("nbr")))
    val adj = sym.select(col("nbr").as("w"), col("id"))
      .groupBy(col("w"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))

    def pairs: DataFrame = adj
      .select(posexplode(col("ids")).as(Seq("i", "id1")), col("ids"))
      .select(col("id1"),
        explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[gx18lab] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    // A: raw wedge generation only (no agg) — generator + scan cost
    time("A_wedges_only")(pairs.groupBy().count().head().getLong(0))

    // B: current two-long-key aggregation
    def commonB = pairs.groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("common"))
    time("B_agg_2key")(commonB.groupBy().count().head().getLong(0))

    // C: packed single-long-key aggregation
    def commonC = pairs
      .select((shiftleft(col("id1"), 32) + col("id2")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("common"))
    time("C_agg_packed")(commonC.groupBy().count().head().getLong(0))

    // D: B + left_anti (as today, no broadcast hint)
    time("D_B_anti")(commonB.join(
        edges.select(col("src").as("id1"), col("dst").as("id2")),
        Seq("id1", "id2"), "left_anti")
      .groupBy().count().head().getLong(0))

    // E: B + BROADCAST left_anti
    time("E_B_bcast_anti")(commonB.join(
        broadcast(edges.select(col("src").as("id1"), col("dst").as("id2"))),
        Seq("id1", "id2"), "left_anti")
      .groupBy().count().head().getLong(0))

    // F: full current plan: B + anti + TakeOrdered(50)
    time("F_full_today") {
      commonB.join(
          edges.select(col("src").as("id1"), col("dst").as("id2")),
          Seq("id1", "id2"), "left_anti")
        .orderBy(col("common").desc, col("id1"), col("id2")).limit(50)
        .count()
    }

    // G: packed agg + packed BROADCAST anti + TakeOrdered, unpack after
    time("G_full_packed") {
      val edgePk = edges.select(
        (shiftleft(col("src"), 32) + col("dst")).as("pk"))
      commonC.join(broadcast(edgePk), Seq("pk"), "left_anti")
        .orderBy(col("common").desc, col("pk"))
        .limit(50)
        .select(shiftright(col("pk"), 32).as("id1"),
          col("pk").bitwiseAND(lit((1L << 32) - 1)).as("id2"),
          col("common"))
        .count()
    }
    // H: packed + repartition-by-key BEFORE the agg — the exchange's
    // hash partitioning satisfies the aggregate's distribution, so the
    // planner emits ONE complete HashAggregate instead of partial+final
    // (multiplicity is 1.46: the partial pass hashes 148M rows to save
    // almost nothing)
    time("H_full_packed_noPartial") {
      val agg = pairs
        .select((shiftleft(col("id1"), 32) + col("id2")).as("pk"))
        .repartition(col("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("common"))
      val edgePk = edges.select(
        (shiftleft(col("src"), 32) + col("dst")).as("pk"))
      agg.join(broadcast(edgePk), Seq("pk"), "left_anti")
        .orderBy(col("common").desc, col("pk"))
        .limit(50)
        .count()
    }
    // I: same but let AQE coalesce nothing — explicit 64 partitions for
    // smaller per-partition hash tables
    time("I_packed_64parts") {
      val agg = pairs
        .select((shiftleft(col("id1"), 32) + col("id2")).as("pk"))
        .repartition(64, col("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("common"))
      val edgePk = edges.select(
        (shiftleft(col("src"), 32) + col("dst")).as("pk"))
      agg.join(broadcast(edgePk), Seq("pk"), "left_anti")
        .orderBy(col("common").desc, col("pk"))
        .limit(50)
        .count()
    }
    spark.stop()
  }
}
