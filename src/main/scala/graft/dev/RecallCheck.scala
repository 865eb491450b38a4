package graft.dev

import org.apache.spark.sql.SparkSession

import graft.functions.SimilarityOps
import graft.sources.Tables

/** Verifies the banded-LSH near-dup path has recall 1.0 vs the exact
  * brute-force baseline at a given scale factor (the d05 gate hash-matches
  * the exact DuckDB oracle only when no qualifying pair is missed).
  *
  *   sbt "runMain graft.dev.RecallCheck /root/testdata/sf0.1"
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables(spark, dir).embeddings
    val exact = SimilarityOps.cosineNearDupPairsExact(
        emb, "vec_id", "embedding", 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = SimilarityOps.cosineNearDupPairs(
        emb, "vec_id", "embedding", dim = 64, threshold = 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val missed = exact -- lsh
    val extra = lsh -- exact
    println(s"dir=$dir exact=${exact.size} lsh=${lsh.size} " +
      s"missed=${missed.size} extra=${extra.size}")
    if (missed.nonEmpty) println(s"MISSED: ${missed.take(10)}")
    if (extra.nonEmpty) println(s"EXTRA: ${extra.take(10)}")
    // ANN recall@5 for the banded annTopK (the s04 gate invariant)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val exactTop = SimilarityOps.cosineTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val annTop = SimilarityOps.annTopK(emb, q, "vec_id", "embedding", 5,
        dim = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val annMissed = exactTop -- annTop
    println(s"annTopK: exact=${exactTop.size} ann=${annTop.size} " +
      s"missed=${annMissed.size} recall=${
        1.0 - annMissed.size.toDouble / exactTop.size}")
    if (annMissed.nonEmpty) println(s"ANN MISSED: ${annMissed.take(10)}")
    spark.stop()
    if (missed.nonEmpty || extra.nonEmpty || annMissed.nonEmpty) sys.exit(1)
  }
}
