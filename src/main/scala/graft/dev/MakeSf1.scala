package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off ~sfN dataset builder for the scale rehearsals (PLANS.md):
  * unions the driver's sf0.1 tables N× with key-space remapping, so
  * the heavy operator family can be timed at N× the proven SF without
  * touching /root/testdata.
  *
  *   sbt "runMain graft.dev.MakeSf1 /root/testdata/sf0.1 /tmp/sf1 10"
  *   sbt "runMain graft.dev.MakeSf1 /root/testdata/sf0.1 /tmp/sf10 100"
  *
  * Remap discipline (what makes the copy honest):
  *   - every key column shifts by replica × (its table's key span), so
  *     joins keep referential integrity and key cardinality grows N×
  *     (orderkeys, custkeys, partkeys, doc_ids, vec_ids, user_ids);
  *   - `documents.text` gets a per-replica suffix token: replicas are
  *     NEAR-duplicates (~10-doc clusters), so dedup/LSH operators face
  *     N× docs AND realistic cluster structure, not N× exact copies;
  *   - `embeddings.embedding` gets a per-replica first-component nudge
  *     (+0.01·replica) — cosine geometry shifts slightly per replica
  *     instead of collapsing to N identical points per vector;
  *   - `events` shifts user/event ids (N× users, same per-user
  *     activity shape; ts untouched so window/watermark density grows
  *     N× per time bucket — the hard direction).
  *   - nation/region/part/customer/supplier/orders scale with their
  *     key shifts; region/nation stay fixed (they are fixed in TPC-H
  *     at every SF).
  *
  * Past 10 copies the replicas form GROUPS of 10 (group = replica/10):
  * near-duplicate structure stays within a group, and a group-specific
  * transform breaks similarity ACROSS groups — documents get a
  * per-group prefix on every word (shingle sets become disjoint),
  * customer names a per-group two-letter tag (edit distance ≥2 between
  * any two groups). Without this, 100 naive copies would make every
  * dedup cluster and fuzzy-name bucket 100 rows wide — output growing
  * with the SQUARE of the scale factor is a fixture artifact, not what
  * 10× more real data looks like (real corpora grow in cluster COUNT,
  * not cluster width). Replicas 0-9 are bit-identical to the sf1
  * build at any copy count, so the pinned sf1 manifest stays valid.
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // the per-group customer tag is a single repeated letter a-z: past
    // group 26 (copies > 270) it would walk into punctuation and break
    // the documented edit-distance-≥2 property between groups
    require(copies <= 270,
      s"copies=$copies > 270: single-letter group tags run out at 'z' " +
        "(group 26) — extend the tag to two base-26 letters first")
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
      val g = i / 10
      df.withColumn("c_custkey", col("c_custkey") + lit(i * ckSpan))
        .withColumn("c_name",
          if (g == 0) col("c_name")
          // two repeated letters: edit distance ≥2 between any two
          // groups and vs the untagged group 0 — fuzzy (dist ≤1)
          // name clusters stay 10 wide at any copy count
          else concat(col("c_name"),
            lit(s" q${('a' + g - 1).toChar}${('a' + g - 1).toChar}")))
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
      val g = i / 10; val m = i % 10
      // per-group word prefix first (disjoint shingle sets across
      // groups), then the within-group near-dup suffix — each group
      // mirrors the sf1 cluster structure over fresh text
      val grouped =
        if (g == 0) col("text")
        else array_join(
          transform(split(col("text"), " "),
            w => concat(lit(s"g${g}_"), w)), " ")
      df.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text",
          if (m == 0) grouped else concat(grouped, lit(s" r$m")))
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
