package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** COUNT(*) grouped by a single LONG key, as a dedicated physical
  * operator — the engine-level half of the full-graph link-prediction
  * plan (gx18). Plan-shape work landed in round 6 (one complete
  * aggregate after a by-key exchange, packed single-long key); what
  * remained was aggregation machinery: Spark's `HashAggregateExec`
  * routes every probe through an `UnsafeFixedWidthAggregationMap`
  * (UnsafeRow key + UnsafeRow buffer inside a `BytesToBytesMap`, ~48+
  * bytes and several indirections per entry), where a count-by-long
  * needs exactly two flat long arrays. DuckDB's radix hash aggregate
  * is the single-node yardstick (~5 s for the 148M-wedge / 101M-key
  * core that HashAggregateExec does in ~12 s); this operator is the
  * Spark-side equivalent: open-addressed long→long table, linear
  * probing, multiplicative hashing, 16 bytes per entry, zero per-row
  * allocation.
  *
  * Semantics: exactly `child.groupBy(key).agg(count(lit(1)))` —
  * including the null-key group (counted and emitted as one row with
  * a NULL key), so it is a drop-in for the generic aggregate.
  *
  * Scale contract (same as any correctly-sized hash aggregate): one
  * partition's DISTINCT keys × 16 B must fit on the executor heap —
  * at 100 TB you size `spark.sql.shuffle.partitions` for the key
  * cardinality, exactly as you would for `HashAggregateExec`, whose
  * spill path at that load is itself a performance cliff. The map
  * grows by doubling from 64 Ki entries, so small partitions stay
  * small.
  *
  * Used by `GraphXBridge.linkCandidates` when the pair key packs into
  * one long (conf `spark.graft.packedCountAgg`, default on);
  * registered for deployment via [[graft.api.GraftExtensions]] and
  * imperatively (idempotent `experimental.extraStrategies` append) by
  * [[PackedCountAgg.countByKey]] so any session can plan it.
  */
case class PackedKeyCountNode(
    child: LogicalPlan,
    countAttr: AttributeReference)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ countAttr
  override def producedAttributes: AttributeSet = AttributeSet(countAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PackedKeyCountNode = copy(child = newChild)
}

case class PackedKeyCountExec(
    countAttr: AttributeReference,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ countAttr
  override def producedAttributes: AttributeSet = AttributeSet(countAttr)

  /** The whole point: ONE exchange hash-partitioned on the key, then a
    * single complete aggregate per partition (partial aggregation is a
    * measured pessimization at the near-unique key multiplicity this
    * operator exists for — PLANS.md round-6 gx18 table). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(child.output) :: Nil

  /** Key attr is passed through with its exprId, so downstream
    * same-key joins (gx18's left-anti edge removal) reuse the
    * aggregation exchange — no second shuffle, no sort. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitionsInternal { iter =>
      // Open-addressed long→long, linear probing, key 0 reserved as
      // the empty sentinel (a real 0 key and nulls get dedicated
      // counters below). Doubles at 5/8 load: worst-case probe chains
      // stay short while steady-state memory is 16 B per distinct key.
      var cap = 1 << 16
      var mask = cap - 1
      var keys = new Array[Long](cap)
      var cnts = new Array[Long](cap)
      var used = 0
      var zeroCnt = 0L
      var nullCnt = 0L
      @inline def idx(k: Long): Int = {
        // multiplicative (Fibonacci) hash + fold — one multiply and
        // one shift per probe start; ample for keys that are packed
        // (id1 << 32 | id2) pairs
        val h = k * -7046029254386353131L // golden-ratio odd constant
        ((h ^ (h >>> 32)).toInt) & mask
      }
      def grow(): Unit = {
        val ncap = cap << 1
        val nmask = ncap - 1
        val nk = new Array[Long](ncap)
        val nc = new Array[Long](ncap)
        var i = 0
        while (i < cap) {
          val k = keys(i)
          if (k != 0L) {
            val h = k * -7046029254386353131L
            var p = ((h ^ (h >>> 32)).toInt) & nmask
            while (nk(p) != 0L) p = (p + 1) & nmask
            nk(p) = k
            nc(p) = cnts(i)
          }
          i += 1
        }
        cap = ncap; mask = nmask; keys = nk; cnts = nc
      }
      while (iter.hasNext) {
        val row = iter.next()
        if (row.isNullAt(0)) nullCnt += 1L
        else {
          val k = row.getLong(0)
          if (k == 0L) zeroCnt += 1L
          else {
            var p = idx(k)
            var kp = keys(p)
            while (kp != 0L && kp != k) { p = (p + 1) & mask; kp = keys(p) }
            if (kp == 0L) {
              keys(p) = k
              cnts(p) = 1L
              used += 1
              if (used > cap - (cap >> 2) - (cap >> 3)) grow() // 5/8 load
            } else cnts(p) += 1L
          }
        }
      }
      val out = new SpecificInternalRow(Seq(LongType, LongType))
      val proj = UnsafeProjection.create(
        Array[org.apache.spark.sql.types.DataType](LongType, LongType))
      new Iterator[InternalRow] {
        private var i = 0
        private var zeroLeft = zeroCnt > 0L
        private var nullLeft = nullCnt > 0L
        private def advance(): Unit =
          while (i < cap && keys(i) == 0L) i += 1
        advance()
        override def hasNext: Boolean = i < cap || zeroLeft || nullLeft
        override def next(): InternalRow = {
          numOutputRows += 1
          if (i < cap) {
            out.setLong(0, keys(i)); out.setLong(1, cnts(i))
            i += 1; advance()
          } else if (zeroLeft) {
            out.setLong(0, 0L); out.setLong(1, zeroCnt)
            zeroLeft = false
          } else {
            out.setNullAt(0); out.setLong(1, nullCnt)
            nullLeft = false
          }
          proj(out)
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): PackedKeyCountExec = copy(child = newChild)
}

object PackedCountAgg {

  /** Session conf gate (default ON): set to false to fall back to the
    * generic `groupBy(pk).count()` plan. */
  val ConfKey = "spark.graft.packedCountAgg"

  def enabled(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get(ConfKey, "true").toBoolean

  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case PackedKeyCountNode(child, countAttr) =>
        PackedKeyCountExec(countAttr, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  /** `df.groupBy(<the single LONG column>).agg(count(lit(1)) as
    * countName)` through [[PackedKeyCountExec]]. Registers the planner
    * strategy on the frame's session if absent (idempotent), so the
    * operator works on sessions built without [[graft.api.GraftExtensions]].
    */
  def countByKey(df: DataFrame, countName: String): DataFrame = {
    val schema = df.schema
    require(schema.length == 1 && schema.head.dataType == LongType,
      s"countByKey wants exactly one LONG key column, got: $schema")
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val session = cdf.sparkSession
    if (!session.experimental.extraStrategies.contains(Strategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ Strategy
    val countAttr = AttributeReference(countName, LongType,
      nullable = false)()
    classic.Dataset.ofRows(session,
      PackedKeyCountNode(cdf.queryExecution.analyzed, countAttr))
  }
}
