package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-graph operators (reference: lib/src/graph_evolution):
  * change-event logs, point-in-time replay, interval-validity edges.
  *
  * The reference replays by scanning a Vec of (ts, node?, edge?) events
  * (change_tracker.rs:28-44, last-write-wins for nodes, HashSet-dedup for
  * edges). Here the change log is an append-only DataFrame and replay is
  * one window function — a single shuffle on the entity key, at any scale.
  */
object Temporal {

  /** Point-in-time state: latest record per entity with ts <= asOf.
    * Deletes (op = 'delete') tombstone the entity away.
    * changeLog schema: (id, ts, op, ...payload). */
  def replayAsOf(changeLog: DataFrame, asOf: Column,
      idCol: String = "id", tsCol: String = "ts", opCol: String = "op")
      : DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(tsCol).desc)
    changeLog
      .filter(col(tsCol) <= asOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "delete")
      .drop("__rn")
  }

  /** TimeWindow.contains (time_window.rs:14-16): inclusive [start, end]. */
  def inWindow(ts: Column, start: Column, end: Column): Column =
    ts.between(start, end)

  /** SCD-2 interval-validity filter: rows valid at `t`
    * (graph_evolution/models.rs:6-31 — start_time/end_time options;
    * open end = still valid). */
  def validAt(t: Column, startCol: Column, endCol: Column): Column =
    startCol <= t && (endCol.isNull || endCol > t)

  /** Close open intervals for updated entities: given a current SCD-2
    * table and fresh rows, end-date the old version and append the new
    * (the reference's GraphEvolution.update closing behavior). */
  def scd2Upsert(current: DataFrame, fresh: DataFrame, idCol: String,
      tsCol: String): DataFrame = {
    val freshIds = fresh.select(col(idCol)).distinct()
    val freshStarts = fresh.groupBy(col(idCol))
      .agg(min(col(tsCol)).as("__new_start"))
    val closed = current.join(freshStarts, Seq(idCol), "left")
      .withColumn("end_time",
        when(col("__new_start").isNotNull && col("end_time").isNull,
          col("__new_start")).otherwise(col("end_time")))
      .drop("__new_start")
    closed.unionByName(
      fresh.withColumn("end_time", lit(null).cast("timestamp")),
      allowMissingColumns = true)
  }
}
