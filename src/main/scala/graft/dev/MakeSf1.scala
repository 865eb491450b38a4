package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off ~sf1 dataset builder for the scale rehearsal (PLANS.md):
  * unions the driver's sf0.1 tables 10× with key-space remapping, so
  * the heavy operator family can be timed at 10× the proven SF without
  * touching /root/testdata.
  *
  *   sbt "runMain graft.dev.MakeSf1 /root/testdata/sf0.1 /tmp/sf1 10"
  *
  * Remap discipline (what makes the copy honest):
  *   - every key column shifts by replica × (its table's key span), so
  *     joins keep referential integrity and key cardinality grows 10×
  *     (orderkeys, custkeys, partkeys, doc_ids, vec_ids, user_ids);
  *   - `documents.text` gets a per-replica suffix token: replicas are
  *     NEAR-duplicates (~10-doc clusters), so dedup/LSH operators face
  *     10× docs AND realistic cluster structure, not 10× exact copies;
  *   - `embeddings.embedding` gets a per-replica first-component nudge
  *     (+0.01·replica) — cosine geometry shifts slightly per replica
  *     instead of collapsing to 10 identical points per vector;
  *   - `events` shifts user/event ids (10× users, same per-user
  *     activity shape; ts untouched so window/watermark density grows
  *     10× per time bucket — the hard direction).
  *   - nation/region/part/customer/supplier/orders scale with their
  *     key shifts; region/nation stay fixed (they are fixed in TPC-H
  *     at every SF).
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, src)

    // span = a round power of ten above the max key, so remapped ids
    // stay human-readable (replica digit in a fixed position)
    def span(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key).cast("long"))).head().getLong(0)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionByName _)

    val okSpan = span(t.orders, "o_orderkey")
    val ckSpan = span(t.customer, "c_custkey")
    val pkSpan = span(t.part, "p_partkey")
    val skSpan = span(t.supplier, "s_suppkey")
    val docSpan = span(t.documents, "doc_id")
    val vecSpan = span(t.embeddings, "vec_id")
    val evSpan = span(t.events, "event_id")
    val userSpan = span(t.events, "user_id")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[sf1] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed-size dimensions: pass through
    write("region", t.region)
    write("nation", t.nation)

    write("customer", replicate(t.customer) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * ckSpan))
    })
    write("supplier", replicate(t.supplier) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * skSpan))
    })
    write("part", replicate(t.part) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * pkSpan))
    })
    write("orders", replicate(t.orders) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * okSpan))
        .withColumn("o_custkey", col("o_custkey") + lit(i * ckSpan))
    })
    write("lineitem", replicate(t.lineitem) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * okSpan))
        .withColumn("l_partkey", col("l_partkey") + lit(i * pkSpan))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * skSpan))
    })
    write("documents", replicate(t.documents) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text",
          if (i == 0) col("text")
          else concat(col("text"), lit(s" r$i")))
    })
    write("embeddings", replicate(t.embeddings) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecSpan))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) =>
            when(j === 0, x + lit(0.01f * i)).otherwise(x)))
    })
    write("events", replicate(t.events) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * evSpan))
        .withColumn("user_id", col("user_id") + lit(i * userSpan))
    })
    spark.stop()
  }
}
