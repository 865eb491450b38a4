package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: documents are
  * concatenated in a deterministic order and cut into fixed
  * token-budget bins; each doc needs its global token START OFFSET
  * (and thus its bin). The naive Spark form —
  * `sum(x).over(Window.orderBy(id))` with no partitionBy — collapses
  * the whole dataset into ONE task; at 100 TB that is the job.
  */
object PackingOps {

  /** Global inclusive running total of `valueCol` in `orderCol` order
    * WITHOUT a single-reducer window — the standard two-pass fix:
    *
    *  1. range-repartition on the order key (partition p holds an
    *     order-contiguous slice; RangePartitioner's sampling is
    *     seeded, so the split is deterministic);
    *  2. one tiny per-partition partial-sum aggregation, collected and
    *     prefix-summed on the driver (numPartitions rows, a constant);
    *  3. a WITHIN-partition window plus the broadcast partition offset.
    *
    * localCheckpoint pins the partitioning so passes 2 and 3 see the
    * same split. */
  def globalCumsum(df: DataFrame, orderCol: String, valueCol: String,
      partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partials = parted.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partials.scanLeft((0, 0L)) {
      case ((_, acc), (pid, psum)) => (pid, acc + psum)
    }.sliding(2).collect { case Array((_, prevAcc), (pid, _)) =>
      (pid, prevAcc)
    }.toSeq
    val offsetsDf = offsets.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    parted.join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("cumsum", col("__off") + sum(col(valueCol)).over(w))
      .drop("__pid", "__off")
  }

  /** Concat-and-chunk packing: every doc labeled with its global token
    * start offset and the `budget`-sized bin that offset falls in (the
    * pretraining "pack the token stream, cut every `budget` tokens"
    * layout; a doc straddling a boundary starts in its labeled bin). */
  def packTokens(docs: DataFrame, orderCol: String, tokensCol: String,
      budget: Long, partitions: Int = 32): DataFrame =
    globalCumsum(docs, orderCol, tokensCol, partitions)
      .withColumn("start_offset", col("cumsum") - col(tokensCol))
      .withColumn("bin",
        floor(col("start_offset") / budget.toDouble).cast("long"))
}
