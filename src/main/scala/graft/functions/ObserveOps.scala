package graft.functions

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline observability: quality counters computed INSIDE
  * the job that does the work, via Spark's `observe` (CollectMetrics).
  *
  * At 100 TB a curation pipeline cannot afford a second scan per stage
  * to know what it kept and dropped — `observe` rides the existing
  * pass: each counter is an aggregate the executors fold alongside the
  * real work, delivered to the driver with the job's completion event
  * (zero extra shuffle, zero extra scan, unaffected by whole-stage
  * codegen). BATCH ONLY: the `Observation` API rejects streaming
  * Datasets — a streaming pipeline uses the name-based
  * `df.observe(name, exprs*)` plus a `StreamingQueryListener` to read
  * the same counters per micro-batch.
  *
  * Usage: thread each stage through [[stageCounters]], run the terminal
  * action, then read every [[Observation]] — the spec pins the counters
  * against independently recomputed aggregates.
  */
object ObserveOps {

  /** Attach standard quality counters to a pipeline stage over `textCol`:
    * row count, total characters, empty-text rows. Returns the observed
    * frame (plan-identical for the data path — CollectMetrics is a
    * pass-through node) and the Observation to read AFTER an action. */
  def stageCounters(df: DataFrame, name: String, textCol: String)
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("rows"),
      coalesce(sum(length(col(textCol))), lit(0L)).as("chars"),
      coalesce(sum(when(length(trim(col(textCol))) === 0, 1L)
        .otherwise(0L)), lit(0L)).as("empty_docs"))
    (observed, obs)
  }

  /** Drop-rate accounting across a filter stage: observations BEFORE and
    * AFTER the predicate in one pass each side of the filter (still the
    * same single job — the filter is a plan node between two
    * CollectMetrics nodes, not a second scan). */
  def observedFilter(df: DataFrame, predicate: org.apache.spark.sql.Column,
      name: String, textCol: String)
      : (DataFrame, Observation, Observation) = {
    val (in, obsIn) = stageCounters(df, s"${name}_in", textCol)
    val (out, obsOut) = stageCounters(in.filter(predicate), s"${name}_kept",
      textCol)
    (out, obsIn, obsOut)
  }
}
