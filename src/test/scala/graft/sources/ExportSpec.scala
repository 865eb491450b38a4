package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SamplingOps

class ExportSpec extends SparkSpec {

  test("sharded export: deterministic membership, complete manifest") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i", i % 7 + 1))
      .toDF("doc_id", "text", "n_tokens")
    val dir = Files.createTempDirectory("graft_shards").toString
    val manifest = ShardedExport.write(docs, "doc_id", nShards = 4,
      dir, countCols = Seq("n_tokens")).collect()

    // manifest covers every row and every token, across all 4 shards
    assert(manifest.map(_.getLong(1)).sum == 200L)
    assert(manifest.map(_.getLong(2)).sum ==
      (0L until 200L).map(_ % 7 + 1).sum)
    assert(manifest.map(_.getInt(0)).toSet == Set(0, 1, 2, 3))
    // no empty shard at this size (uniformity smoke)
    assert(manifest.forall(_.getLong(1) > 0))

    // read-back shard column equals the pure shardKey function of the id:
    // membership is a property of the DATA, not of the write parallelism
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("shard").cast("int").as("shard"))
    val expected = docs.select(col("doc_id"),
      SamplingOps.shardKey(col("doc_id"), 4).as("shard"))
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)

    // re-writing after an unrelated repartition changes nothing
    val dir2 = Files.createTempDirectory("graft_shards2").toString
    ShardedExport.write(docs.repartition(13), "doc_id", 4, dir2,
      Seq("n_tokens"))
    val back2 = spark.read.parquet(dir2)
      .select(col("doc_id"), col("shard").cast("int").as("shard"))
    assert(back.exceptAll(back2).isEmpty && back2.exceptAll(back).isEmpty)
  }

  test("hive-partitioned store: filter prunes to exactly the touched " +
      "partitions (io09's scale argument)") {
    import spark.implicits._
    val rows = Seq((1L, "purchase"), (2L, "view"), (3L, "error"),
      (4L, "view"), (5L, "purchase"), (6L, "click"))
      .toDF("event_id", "event_type")
    val dir = Files.createTempDirectory("graft_part_store").toString
    rows.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_type").isin("purchase", "error"))
    // 4 partition dirs exist; the scan must select exactly the 2 hit
    // by the predicate — directory pruning, no row data consulted
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount == 2,
      s"selected ${scans.head.selectedPartitions.partitionCount} partitions")
    // the predicate lives in PartitionFilters (metadata), NOT in the
    // data filters the parquet reader evaluates per row group
    assert(scans.head.partitionFilters.nonEmpty)
    assert(q.select(col("event_id")).collect().map(_.getLong(0)).toSet
      == Set(1L, 3L, 5L))
  }
}
