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
    spark.stop()
    if (missed.nonEmpty || extra.nonEmpty) sys.exit(1)
  }
}
