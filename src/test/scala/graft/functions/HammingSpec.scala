package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class HammingSpec extends SparkSpec {

  test("hamming64 native expression: eval + codegen paths agree") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    val d = df(schema,
      Row(0L, 0L), Row(0L, -1L), Row(0b1011L, 0b0001L),
      Row(Long.MinValue, 0L))
    val out = d.select(HammingDistance.hamming64(col("a"), col("b")))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 64L, 2L, 1L))
  }

  test("hamming64 registers for SQL") {
    HammingDistance.register(spark)
    val r = spark.sql("SELECT hamming64(7, 1) AS d").collect().head.getLong(0)
    assert(r == 2L)
  }

  test("simhashNearDups pairs near-identical docs via native distance") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val base = "spark catalyst tungsten codegen shuffle partition " * 4
    val docs = df(schema,
      Row(1L, base), Row(2L, base + " extra token"),
      Row(3L, "entirely different content about nothing relevant here"))
    val sig = DedupOps.simhash(docs, "id", "text")
    val pairs = DedupOps.simhashNearDups(sig, "id", maxDistance = 12,
        bucketBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
