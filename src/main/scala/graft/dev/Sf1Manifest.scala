package graft.dev

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins the sf1 rehearsal fixture (PLANS.md "sf1 rehearsal") as a
  * checked-in manifest so every rehearsal run asserts it is measuring
  * the same dataset: per-table row count + an order-insensitive
  * content checksum (bit_xor of per-row xxhash64 over every column —
  * XOR is commutative, so parquet task/row ordering cannot shift it,
  * and remapped keys make full-row duplicates impossible).
  *
  *   sbt "runMain graft.dev.Sf1Manifest write /tmp/sf1 dev/sf1_manifest.json"
  *   sbt "runMain graft.dev.Sf1Manifest check /tmp/sf1 dev/sf1_manifest.json"
  *
  * `check` exits 1 on any count/checksum mismatch (fixture drift — e.g.
  * the driver regenerated /root/testdata between rounds, or MakeSf1's
  * remap changed); rehearsal timings taken after a failed check are
  * not comparable to the PLANS.md tables and must say so.
  */
object Sf1Manifest {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("check")
    val dir = args.lift(1).getOrElse("/tmp/sf1")
    val path = args.lift(2).getOrElse("dev/sf1_manifest.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fingerprint(name: String): (Long, Long) = {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      val cols = df.columns.sorted.map(col).toSeq
      val row = df.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(cols: _*)), lit(0L)).as("x")).head()
      (row.getLong(0), row.getLong(1))
    }

    val computed = tables.map(t => t -> fingerprint(t))
    mode match {
      case "write" =>
        val json = computed.map { case (t, (n, x)) =>
          s"""  "$t": {"rows": $n, "xor64": $x}"""
        }.mkString("{\n", ",\n", "\n}\n")
        Files.writeString(Paths.get(path), json)
        println(s"[manifest] wrote $path")
        computed.foreach { case (t, (n, x)) =>
          println(f"[manifest] $t%-10s rows=$n%9d xor64=$x%20d") }
      case "check" =>
        val pinned = Files.readString(Paths.get(path))
        var bad = 0
        computed.foreach { case (t, (n, x)) =>
          val want = s""""$t": {"rows": $n, "xor64": $x}"""
          if (pinned.contains(want)) println(s"[manifest] $t OK ($n rows)")
          else { bad += 1
            println(s"[manifest] $t MISMATCH: computed rows=$n xor64=$x") }
        }
        spark.stop()
        if (bad > 0) { println(s"[manifest] $bad table(s) drifted"); sys.exit(1) }
        println("[manifest] fixture matches pinned manifest")
      case other => sys.error(s"unknown mode $other (write|check)")
    }
    spark.stop()
  }
}
