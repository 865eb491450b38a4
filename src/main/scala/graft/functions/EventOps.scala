package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the (user, type, timestamp) shape —
  * ordered funnels and cohort retention, the two queries every
  * product-events pipeline runs.
  *
  * Scale shape: both operators are chains of per-user aggregations —
  * shuffles keyed by the user id with map-side partial aggregation, no
  * windows over raw events, no per-user event lists materialized. A
  * k-stage funnel is k filtered passes (each pass reads only its
  * stage's events — predicate pushed to the scan); retention is two
  * aggregations and one join on the user key.
  */
object EventOps {

  /** Ordered funnel: stage i counts only at-or-after the user's stage
    * i−1 time; each stage time is the EARLIEST such event. Returns one
    * row per user who entered the funnel: (user, t1..tk epoch-millis,
    * depth = completed prefix length). tk is NULL (and depth stops)
    * once a stage is missing — `min(when(ts ≥ t_prev))` propagates the
    * null through later stages, so depth is always a prefix count. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("user"))
      .agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val k = i + 1
      val ev = events.filter(col(typeCol) === stage)
        .select(col(userCol).as("user"), col(tsCol).as("__ts"))
      val carried = (1 to i).map(j => col(s"t$j"))
      acc = acc.join(ev, Seq("user"), "left")
        .groupBy(col("user") +: carried: _*)
        .agg(min(when(col("__ts") >= col(s"t$i"), col("__ts")))
          .as(s"t$k"))
    }
    val depth = (1 to stages.length)
      .map(j => col(s"t$j").isNotNull.cast("long")).reduce(_ + _)
    val millis = (1 to stages.length)
      .map(j => unix_millis(col(s"t$j")).as(s"t$j"))
    acc.select((col("user") +: millis) :+ depth.as("depth"): _*)
  }

  /** Weekly cohort retention: users are cohorted by the Monday-start
    * week of their FIRST event; n_users counts the cohort's distinct
    * users active in each later week. Returns
    * (cohort_week 'yyyy-MM-dd', week_offset ≥ 0, n_users). */
  def retentionWeekly(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol).as("user"))
      .agg(date_trunc("week", min(col(tsCol))).as("cw"))
    val active = events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).as("w")).distinct()
    active.join(first, Seq("user"))
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("w").cast("date"), col("cw").cast("date")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
